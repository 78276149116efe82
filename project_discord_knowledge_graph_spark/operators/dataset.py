"""Corpus-curation operators: the dedup family.

Deduplication strategies a web-scale training-data pipeline needs,
each expressed Spark-first:

- exact: fingerprint groupBy, keep-min survivor (one shuffle).
- minhash signatures: native explode/min over character shingles
  (SQL-expressible, oracle-checked) — the banding building block.
- minhash LSH near-dup pairs: native banded-MinHash join
  (operators/lsh.py, the scale path — AND-amplified bands +
  stats-reported bucket cap; candidates only collide within
  buckets).  The ml.feature.MinHashLSH variant is kept for small
  corpora; its OR-amplified tables hot-bucket on shared shingles at
  >=1M items (measured on mentions, BENCH.md round 5).
- simhash: per-document bit signature from word-hash majorities
  (native bit ops via md5 hex-char parity; hamming-adjacent buckets
  find near-dups).
- n-gram Jaccard: exact set overlap for a bounded candidate set.
- embedding cosine near-dup: see operators/ann.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MINHASH_SEEDS = ("a", "b", "c", "d")


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per normalized-text fingerprint.

    Returns (fingerprint, keep_id, n_dups).  One hash shuffle on the
    fingerprint; the fingerprint is uniform (md5) so never skewed.
    """
    from ..functions.textmetrics import fingerprint_expr
    return (df
            .withColumn("fingerprint", fingerprint_expr(F.col(text_col)))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("keep_id"),
                 (F.count("*") - 1).alias("n_dups")))


def _shingles_expr(text_col: str, k: int = 8) -> str:
    return (f"transform(sequence(1, greatest(length({text_col}) - {k - 1},"
            f" 1)), i -> substr({text_col}, i, {k}))")


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 8) -> DataFrame:
    """k-char-shingle MinHash with len(MINHASH_SEEDS) hash functions,
    h_j(doc) = min over shingles of md5(seed_j || shingle).

    Pure native plan: explode -> groupBy(min...) — one shuffle whose
    key (doc id) is unique, so perfectly balanced.  md5-based hashing
    keeps the signature engine-portable (same values in DuckDB).
    """
    exploded = df.select(
        F.col(id_col),
        F.explode(F.expr(_shingles_expr(text_col, k))).alias("sh"))
    aggs = [F.min(F.md5(F.concat(F.lit(s), F.col("sh")))).alias(f"mh_{s}")
            for s in MINHASH_SEEDS]
    return exploded.groupBy(id_col).agg(*aggs)


def shingle_sets(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", shingle: int = 8) -> DataFrame:
    """(id, distinct k-char shingles) — the shared input of LSH
    blocking AND exact-Jaccard verification; compute it once per
    corpus scan and feed both (see near_dedup)."""
    return df.select(
        F.col(id_col),
        F.expr(f"array_distinct({_shingles_expr(text_col, shingle)})")
         .alias("shingles")).where(F.size("shingles") > 0)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      jaccard_distance: float = 0.3,
                      num_hash_tables: int = 6,
                      shingle: int = 8,
                      grams: DataFrame | None = None) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH band bucketing
    (shingle -> minhash -> band -> bucket-join).  Returns
    (id_a, id_b, lsh_distance) with id_a < id_b.

    `grams` optionally supplies a precomputed shingle_sets frame
    (columns id, shingles) so a caller staging it can avoid a second
    scan of the text column."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    if grams is None:
        grams = shingle_sets(df, text_col, id_col, shingle)
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    feat = tf.transform(grams)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, jaccard_distance,
                                       distCol="lsh_distance")
    return (pairs.select(
        F.col(f"datasetA.{id_col}").alias("id_a"),
        F.col(f"datasetB.{id_col}").alias("id_b"),
        F.round("lsh_distance", 6).alias("lsh_distance"))
        .where(F.col("id_a") < F.col("id_b")))


SIMHASH_BITS = 16


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, simhash bitstring).  explode words -> per-word md5 ->
    groupBy id with per-bit signed sums -> concat bits."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w"))
    per_bit = [
        F.sum(2 * (F.ascii(F.substring(F.md5("w"), j + 1, 1)) % 2) - 1)
         .alias(f"b{j}")
        for j in range(bits)]
    sums = words.groupBy(id_col).agg(*per_bit)
    bitstr = F.concat(*[
        F.when(F.col(f"b{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(bits)])
    return sums.select(F.col(id_col), bitstr.alias("simhash"))


def minhash_lsh_pairs_banded(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             shingle: int = 8,
                             grams: DataFrame | None = None,
                             **banded_kw) -> DataFrame:
    """Document near-dup candidates via the native banded-MinHash
    primitive (operators/lsh.banded_minhash_pairs) — the at-scale
    replacement for `minhash_lsh_pairs`, whose ml
    approxSimilarityJoin hot-buckets on shared shingles (boilerplate
    headers, licence blocks — every web corpus has them) exactly as
    measured for entity mentions in BENCH.md round 5.  Candidates
    only: verify with exact shingle Jaccard (near_dedup does)."""
    from .lsh import banded_minhash_pairs

    if grams is None:
        grams = shingle_sets(df, text_col, id_col, shingle)
    return banded_minhash_pairs(
        grams.select(F.col(id_col), F.col("shingles")),
        id_col, "shingles", **banded_kw)


def near_dedup(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               jaccard_distance: float = 0.3,
               min_exact_jaccard: float = 0.7,
               num_hash_tables: int = 6, shingle: int = 8,
               blocking: str = "banded",
               n_bands: int = 20, rows_per_band: int = 3,
               bucket_cap: int = 1024,
               return_stats: bool = False):
    """The production near-duplicate dedup composition:

        MinHash-LSH blocking  ->  exact shingle-Jaccard verify
          ->  connected components over surviving pairs
          ->  keep the min-id representative per duplicate cluster

    Returns (doc_id, keep_id, is_dup): every input row, mapped to its
    cluster representative (itself when unique); with
    return_stats=True also {'candidate_pairs', 'verified_pairs'}
    (costs one extra pass over the blocked pair list).  Each stage is the
    already-tested operator (minhash_lsh_pairs /
    operators.components.connected_components), so the composite adds
    no new shuffle pattern: candidates only ever exist inside LSH
    buckets — never all-pairs — and the CC pass runs on the (sparse)
    verified-pair edge list, which for near-dup clusters is shallow
    (2-4 rounds).

    The shingle sets are computed ONCE (shingle_sets) and persisted:
    LSH blocking and the exact-Jaccard verify both read the staged
    frame, so the corpus text is scanned and shingled a single time
    instead of once per stage.  The verified pair list (tiny: only
    surviving candidates) is materialized eagerly via localCheckpoint
    — one action computing the whole block+verify DAG with the grams
    cache hot — and the cache is released immediately after, so the
    composite leaves nothing persisted behind.  (CC is already eager:
    its convergence loop runs actions.)  On a real cluster prefer
    reliable checkpoints for the CC stage; the verified list here is
    small enough that recompute-on-executor-loss is a non-issue.
    """
    from .components import connected_components

    grams = shingle_sets(df, text_col, id_col, shingle).persist()
    if blocking == "banded":
        # native banded blocking (see minhash_lsh_pairs_banded): the
        # path that survives boilerplate-heavy corpora at scale.
        # jaccard_distance/num_hash_tables are ml-blocking knobs: a
        # caller who tuned them must not silently get fixed banding,
        # so a non-default value here fails loudly instead.
        if jaccard_distance != 0.3 or num_hash_tables != 6:
            raise ValueError(
                "jaccard_distance/num_hash_tables tune the ml "
                "blocking; with blocking='banded' tune n_bands/"
                "rows_per_band/bucket_cap instead (or pass "
                "blocking='ml' to keep the ml path)")
        pairs = minhash_lsh_pairs_banded(
            df, text_col, id_col, shingle, grams=grams,
            n_bands=n_bands, rows_per_band=rows_per_band,
            bucket_cap=bucket_cap)
    else:
        pairs = minhash_lsh_pairs(df, text_col, id_col,
                                  jaccard_distance, num_hash_tables,
                                  shingle, grams=grams)
    n_cand = None
    if return_stats:
        pairs = pairs.persist()
        n_cand = pairs.count()
    # exact verify: true shingle jaccard on candidates only, reading
    # the SAME staged shingle frame as the blocking stage
    a = grams.select(F.col(id_col).alias("id_a"),
                     F.col("shingles").alias("ga"))
    b = grams.select(F.col(id_col).alias("id_b"),
                     F.col("shingles").alias("gb"))
    verified = (pairs.join(a, "id_a").join(b, "id_b")
                .where(F.size(F.array_intersect("ga", "gb"))
                       / F.size(F.array_union("ga", "gb"))
                       >= min_exact_jaccard)
                .select("id_a", "id_b")
                .localCheckpoint(eager=True))
    grams.unpersist(blocking=False)
    if return_stats:
        n_ver = verified.count()
        pairs.unpersist(blocking=False)
    # verified is already an eager localCheckpoint (above) — skip
    # CC's own input cut, it would materialize the same rows twice
    comp = connected_components(verified, src="id_a", dst="id_b",
                                checkpoint_input=False)
    out = (df.select(F.col(id_col))
           .join(comp.withColumnRenamed("node", id_col), id_col, "left")
           .select(id_col,
                   F.coalesce("component", F.col(id_col))
                    .alias("keep_id"))
           .withColumn("is_dup", F.col("keep_id") != F.col(id_col)))
    if return_stats:
        return out, {"candidate_pairs": n_cand,
                     "verified_pairs": n_ver}
    return out


def ngram_jaccard_pairs(left: DataFrame, right: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n_words: int = 3,
                        min_jaccard: float = 0.0) -> DataFrame:
    """Exact word-n-gram Jaccard between two (small x large) doc sets.

    left is broadcast (the bounded query set); shingle sets compare
    via native array_intersect/union.  Returns
    (id_a, id_b, jaccard) for id_a != id_b.
    """
    def grams(df, suffix):
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        ng = F.expr(
            f"array_distinct(transform(sequence(1, greatest("
            f"size(split(trim({text_col}), '\\\\s+')) - {n_words - 1}, 1)),"
            f" i -> concat_ws(' ', slice(split(trim({text_col}),"
            f" '\\\\s+'), i, {n_words}))))")
        _ = toks
        return df.select(F.col(id_col).alias(f"id_{suffix}"),
                         ng.alias(f"ng_{suffix}"))

    a = F.broadcast(grams(left, "a"))
    b = grams(right, "b")
    # filter on the UNROUNDED value (round only the projected column)
    # so the cut matches an exact-arithmetic oracle at the boundary
    raw = (F.size(F.array_intersect("ng_a", "ng_b"))
           / F.size(F.array_union("ng_a", "ng_b")))
    return (a.crossJoin(b)
            .where(F.col("id_a") != F.col("id_b"))
            .withColumn("_j", raw)
            .where(F.col("_j") >= min_jaccard)
            .select("id_a", "id_b", F.round("_j", 6).alias("jaccard")))
