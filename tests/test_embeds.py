from __future__ import annotations

from project_discord_knowledge_graph_spark.functions.embeds import (
    EMBED_SCHEMA, flatten_embeds, total_reactions_expr,
)


def test_flatten_embeds_and_reactions(spark):
    rows = [
        ("m1",
         [("t1", "http://x", "d1", "red",
           [("price", "100"), ("target", "120")], "f1"),
          ("t2", None, None, None, None, None)],
         [("🔥", 3), ("👍", 2)]),
        ("m2", [], []),
    ]
    schema = (f"message_id string, embeds {EMBED_SCHEMA}, "
              "reactions array<struct<emoji:string, count:int>>")
    df = spark.createDataFrame(rows, schema)

    flat = flatten_embeds(df)
    got = {(r.message_id, r.title): r for r in flat.collect()}
    assert len(got) == 2  # m2 has no embeds -> no rows
    assert got[("m1", "t1")].fields == {"price": "100", "target": "120"}
    assert got[("m1", "t2")].fields == {}

    totals = {r.message_id: r.total
              for r in df.select("message_id",
                                 total_reactions_expr().alias("total"))
              .collect()}
    assert totals == {"m1": 5, "m2": 0}
