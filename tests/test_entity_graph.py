"""Entity linking, connected components, graph materialization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.operators.components import (
    connected_components,
)
from project_discord_knowledge_graph_spark.operators.entity import (
    canonicalize, extract_mentions, link_entities, lsh_candidate_pairs,
    score_pairs,
)
from project_discord_knowledge_graph_spark.operators.graph import (
    build_edges, build_nodes,
)


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f")],
        ["src", "dst"])
    got = {(r.node, r.component)
           for r in connected_components(edges).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"),
                   ("d", "d"), ("e", "d"), ("f", "f")}


def test_connected_components_chain_converges(spark):
    # a long path graph stresses the iteration count
    n = 40
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)], ["src", "dst"])
    comps = connected_components(edges).collect()
    assert {r.component for r in comps} == {"n00"}
    assert len(comps) == n + 1


def test_long_chain_converges(spark):
    # pathological diameter-300 path: min-label propagation would need
    # ~300 rounds; the alternating star algorithm must finish in
    # O(log^2 n) — well under 20 double-rounds empirically.
    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"])
    labels, stats = connected_components(edges, return_stats=True)
    comps = labels.collect()
    assert stats["converged"]
    assert stats["rounds"] <= 20
    assert {r.component for r in comps} == {0}
    assert len(comps) == n + 1


def test_nonconvergence_raises(spark):
    import pytest as _pytest
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["src", "dst"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


@pytest.fixture(scope="module")
def mention_triples(spark):
    rows = [
        ("bitcoin", "mentions_asset", "BTC"),
        ("bitcoins", "mentions_asset", "BTC"),
        ("bitcoin", "mentions_asset", "ethereum"),
        ("covered call strategy", "recommends", "wheel strategy"),
        ("covered calls strategy", "recommends", "wheel strategies"),
        ("alpha", "discusses", "zzz_unrelated_entity"),
    ]
    return spark.createDataFrame(
        [(s, p, o, f"m{i}", "seg", "2024-01-01T00:00:00+00:00", 0.8)
         for i, (s, p, o) in enumerate(rows)],
        ["subject", "predicate", "object", "message_id", "segment_id",
         "timestamp", "confidence"])


def test_extract_mentions_counts(spark, mention_triples):
    m = {r.mention: r.n_occurrences
         for r in extract_mentions(mention_triples).collect()}
    assert m["bitcoin"] == 2  # subject twice
    assert m["btc"] == 2      # object twice (normalized lower)
    assert m["alpha"] == 1


def test_lsh_blocking_and_scoring(spark, mention_triples):
    mentions = extract_mentions(mention_triples)
    cands = lsh_candidate_pairs(mentions, jaccard_distance=0.6)
    scored = score_pairs(cands, min_jaccard=0.5)
    pairs = {(r.mention_a, r.mention_b) for r in scored.collect()}
    assert ("bitcoin", "bitcoins") in pairs
    assert ("covered call strategy", "covered calls strategy") in pairs
    # dissimilar strings must not pair
    assert not any("zzz_unrelated_entity" in p for pair in pairs
                   for p in pair)


def test_canonicalize_and_graph(spark, mention_triples):
    cmap = link_entities(mention_triples, jaccard_threshold=0.5)
    rows = {r.mention: r.canonical_id for r in cmap.collect()}
    # variants share a canonical id; the id is the lexicographic min
    assert rows["bitcoin"] == rows["bitcoins"] == "bitcoin"
    assert rows["alpha"] == "alpha"  # singleton maps to itself

    nodes = build_nodes(cmap)
    bitcoin_node = nodes.where(F.col("canonical_id") == "bitcoin").first()
    assert set(bitcoin_node.mentions) == {"bitcoin", "bitcoins"}

    edges = build_edges(mention_triples, cmap)
    e = edges.where(F.col("subject") == "bitcoins").first()
    assert e.src == "bitcoin"  # rekeyed to the canonical id
    assert edges.count() == mention_triples.count()


def test_extract_mentions_salt_spreads_head_mention(spark):
    """Review regression: the retry-deterministic salt must hash a
    row-VARYING column, not just the mention — hashing only the
    grouping key gives every occurrence of an identically-spelled
    head mention one salt (one reducer, the hot-spot the salt exists
    to break).  A 2000-occurrence head mention must both count
    correctly and spread over most of the salt space."""
    from project_discord_knowledge_graph_spark.operators.entity import (
        N_SALTS, extract_mentions,
    )

    triples = spark.range(2000).select(
        F.lit("BTC").alias("subject"),
        F.lit("asks_about").alias("predicate"),
        F.concat(F.lit("what about entry "), "id").alias("object"),
        F.concat(F.lit("m"), "id").alias("message_id"))
    m = {r.mention: r.n_occurrences
         for r in extract_mentions(triples).collect()}
    assert m["btc"] == 2000
    # the operator's own salt expression over this head mention
    spread = (triples.select(
        F.pmod(F.xxhash64(F.lit("btc"), "message_id"),
               F.lit(N_SALTS)).alias("s")).distinct().count())
    assert spread > N_SALTS // 2, (spread, N_SALTS)
