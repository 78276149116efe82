"""P10: embed flatten (reference ingestion/streamlit_app.py:28-78).

The reference turns each message's embeds[] into one row per embed
with dynamically named pandas columns `field_<name>`.  Dynamic column
sets don't exist in a fixed-schema engine; the Spark-correct shape is
one row per embed with the dynamic fields as a MapType column
(`map_from_entries`), plus the reference's per-message reaction total
(A12: streamlit_app.py:48-49) as a native array aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EMBED_SCHEMA = (
    "array<struct<title:string, url:string, description:string,"
    " color:string, fields:array<struct<name:string, value:string>>,"
    " footer:string>>"
)


def flatten_embeds(messages: DataFrame, embeds_col: str = "embeds",
                   id_col: str = "message_id") -> DataFrame:
    """messages with embeds[] -> one row per embed; dynamic embed
    fields become a map<string,string> column."""
    e = F.explode(F.col(embeds_col)).alias("embed")
    out = messages.select(F.col(id_col), e)
    return out.select(
        id_col,
        F.col("embed.title").alias("title"),
        F.col("embed.url").alias("url"),
        F.col("embed.description").alias("description"),
        F.col("embed.color").alias("color"),
        F.col("embed.footer").alias("footer"),
        F.when(F.col("embed.fields").isNull(),
               F.map_from_entries(F.array().cast(
                   "array<struct<name:string,value:string>>")))
         .otherwise(F.map_from_entries(F.col("embed.fields")))
         .alias("fields"),
    )


def total_reactions_expr(reactions_col: str = "reactions"):
    """A12: sum(r.count for r in reactions) as a native aggregate
    (streamlit_app.py:48-49)."""
    return F.aggregate(F.col(reactions_col), F.lit(0),
                       lambda acc, r: acc + r["count"])
