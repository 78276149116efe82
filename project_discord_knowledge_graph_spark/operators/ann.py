"""Similarity search over embedding columns.

Two strategies over an `array<float>` embedding column:

- `cosine_topk` — exact brute force: broadcast the (small) query set,
  score every (query, candidate) pair with a native zip_with dot
  product, take top-k per query with a window.  The correctness
  baseline; O(Q x N) but fully codegen'd and shuffle-free until the
  final per-query top-k.
- `lsh_topk` — the scale path: random-hyperplane (sign) LSH buckets;
  candidates collide only within a bucket, so the join is equi on the
  bucket key instead of a cross product.  Hyperplane components are
  deterministic (hash-derived), so results are reproducible without
  driver-side randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (native, no UDF).

    NULL (not an error) when either vector has zero norm: under this
    project's ANSI-on session a bare division raises DIVIDE_BY_ZERO
    the moment an upstream embedder emits an all-zero vector (e.g. a
    count-style embedder on empty text), crashing the whole job; a
    NULL sim simply fails every `sim > threshold` admission test —
    the same no-link outcome the streaming linker's zero-norm skip
    produces, keeping the batch and stateful J3 paths equal on this
    input too."""
    denom = _norm(a) * _norm(b)
    return F.when(denom != 0.0, _dot(a, b) / denom)


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def _pair_sim(q_vec: str, c_vec: str, q_norm: str, c_norm: str) -> Column:
    """cosine_expr with the two norms precomputed per SIDE instead of
    per pair: a scored join evaluates O(|Q| x |C|) pairs but only
    |Q| + |C| distinct norms — hoisting them out of the pair loop
    removes two of the three per-pair array aggregates (guide 2.3,
    compute less per row).  Arithmetic is bit-identical to
    cosine_expr: same sqrt-of-sum-of-squares per vector, same product
    / division order, same NULL-on-zero-denominator policy."""
    denom = F.col(q_norm) * F.col(c_norm)
    return F.when(denom != 0.0,
                  _dot(F.col(q_vec), F.col(c_vec)) / denom)


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding"
                ) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Output: (query_id, neighbor_id, rank) — rank 1..k by (cosine
    desc, neighbor_id asc); self-matches excluded.  Similarity is
    computed in double and rounded to 6 places *before* ranking so
    the ordering is stable across engines/architectures.
    """
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("q_vec"))
        .withColumn("_qn", _norm(F.col("q_vec"))))
    c = (corpus.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(vec_col).alias("c_vec"))
         .withColumn("_cn", _norm(F.col("c_vec"))))
    scored = (q.crossJoin(c)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", F.round(
                  _pair_sim("q_vec", "c_vec", "_qn", "_cn"), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def plane_components(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic +-1 hyperplane components from md5 parity of
    'hp:{plane}:{dim}' — computed once at plan-build time, so the
    same constants are available to the Spark plan, the DuckDB
    oracle, and any external re-implementation."""
    import hashlib
    return [[2.0 * (ord(hashlib.md5(f"hp:{p}:{d}".encode())
                        .hexdigest()[0]) % 2) - 1.0
             for d in range(dim)]
            for p in range(n_planes)]


def with_lsh_bucket(df: DataFrame, n_planes: int = 12, dim: int = 64,
                    vec_col: str = "embedding",
                    out_col: str = "bucket") -> DataFrame:
    """Random-hyperplane signature: bit p = sign(v . h_p), h_p a
    deterministic +-1 vector.  Emits a bitstring bucket key.

    Each dot product is one aggregate over a zip_with against a
    literal plane array — n_planes expressions total, independent of
    dim, instead of n_planes*dim unrolled terms (which hits codegen
    limits at dim 768).

    Vectors longer than `dim` are sliced to the first dim components
    (a fixed projection — without the slice, zip_with would pad the
    plane with nulls and null-poison every dot product into the
    all-zeros bucket).  Vectors SHORTER than dim null out their dot
    products and land in the all-zeros bucket; pass the true dim."""
    v = F.slice(_as_double(vec_col), 1, dim)
    bits = []
    for row in plane_components(n_planes, dim):
        plane = F.array(*[F.lit(x) for x in row])
        dot = F.aggregate(F.zip_with(v, plane, lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn(out_col, F.concat(*bits))


def probe_buckets_expr(bucket_col: str, n_planes: int,
                       hamming: int = 1):
    """Multi-probe expansion: the bucket itself plus every bucket at
    Hamming distance 1 (bit flips).  hamming=0 -> just the bucket.
    Returns an array column; explode it on the (smaller) query side.
    """
    if hamming == 0:
        return F.array(F.col(bucket_col))
    if hamming > 1:
        raise ValueError(
            f"probe_buckets_expr implements distance-1 expansion only; "
            f"got hamming={hamming}")
    return F.expr(
        f"array_union(array({bucket_col}), transform(sequence(1,"
        f" {n_planes}), i -> concat(substr({bucket_col}, 1, i - 1),"
        f" case when substr({bucket_col}, i, 1) = '1' then '0' else '1'"
        f" end, substr({bucket_col}, i + 1, {n_planes}))))")


def lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 3,
             n_planes: int = 8, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             probe_hamming: int = 0) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on the signature), exact cosine re-rank within.
    Recall tunes with n_planes (fewer planes = bigger buckets) and
    probe_hamming (1 = also probe every Hamming-adjacent bucket,
    recovering recall at high plane counts for ~n_planes x the
    candidate volume — still bucket-bounded, never all-pairs).

    The probe expansion explodes on the query side (the small side);
    a corpus vector lives in exactly one bucket, so probes never
    produce duplicate (query, neighbor) pairs."""
    qb = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("q_vec"),
                       F.col(vec_col)),
        n_planes, dim).drop(vec_col)
    qb = qb.select(
        "query_id", "q_vec", _norm(F.col("q_vec")).alias("_qn"),
        F.explode(probe_buckets_expr("bucket", n_planes,
                                     probe_hamming)).alias("bucket"))
    cb = with_lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(vec_col).alias("c_vec"),
                      F.col(vec_col)),
        n_planes, dim).drop(vec_col) \
        .withColumn("_cn", _norm(F.col("c_vec")))
    scored = (qb.join(cb, "bucket")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", F.round(
                  _pair_sim("q_vec", "c_vec", "_qn", "_cn"), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "sim"))


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 3,
             n_cells: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: DataFrame | None = None) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization —
    the other classic ANN scale path next to lsh_topk:

    1. corpus rows assign to their nearest of n_cells centroid cells
       (one broadcast join against the tiny centroid set + a map-side-
       combinable max_by per row group — no window over the corpus);
    2. each query probes its nprobe nearest cells;
    3. exact cosine re-rank over only the probed cells' members
       (candidates ~ corpus * nprobe / n_cells, never all-pairs).

    `centroids` defaults to the corpus vectors with id < n_cells — a
    deterministic stand-in for trained k-means centroids (no MLlib
    training dependency in the correctness gate; production passes
    KMeans.fit centroids through the same parameter).  Similarities
    round to 6 places before every argmax/rank, and ties break toward
    the smaller cell/neighbor id, so the result is engine-portable.
    Output: (query_id, neighbor_id, rank, sim)."""
    cents = centroids if centroids is not None else \
        corpus.where(F.col(id_col) < n_cells)
    # Localize the centroid set on the driver and rebuild it as a
    # local relation: centroids are a MODEL artifact (the IVF coarse
    # quantizer), not a dataset.  The frame is broadcast twice —
    # corpus assignment and query probing — and without this each
    # broadcast re-derived the subframe from its source plan
    # (plan-verified: two BroadcastExchanges, no ReusedExchange;
    # a persist() instead would leak a cache entry per call, since
    # the returned DataFrame is lazy and has no unpersist point).
    # NOTE this makes plan construction EAGER (one small job here);
    # the take() is bounded at n_cells+1 so an oversized caller-
    # supplied centroid frame fails fast instead of OOMing the
    # driver.
    cents_df = cents.select(F.col(id_col).alias("cell"),
                            _as_double(vec_col).alias("cv"))
    rows = cents_df.take(n_cells + 1)
    if len(rows) > n_cells:
        raise ValueError(
            f"centroids has more than n_cells={n_cells} rows; "
            "pass the trained quantizer's centroid set, not a corpus")
    cents = F.broadcast(cents.sparkSession.createDataFrame(
        rows, cents_df.schema))

    sim_c = F.round(cosine_expr(F.col("v"), F.col("cv")), 6)
    # nearest cell per corpus row: hash agg on the unique row id
    # (max of (sim, -cell) breaks ties toward the smaller cell id)
    assigned = (corpus
                .select(F.col(id_col).alias("neighbor_id"),
                        _as_double(vec_col).alias("v"))
                .crossJoin(cents)
                .groupBy("neighbor_id")
                .agg(F.max(F.struct(sim_c.alias("s"),
                                    (-F.col("cell")).alias("nc"),
                                    F.col("v").alias("v"))).alias("m"))
                .select("neighbor_id", (-F.col("m.nc")).alias("cell"),
                        F.col("m.v").alias("c_vec")))

    wq = Window.partitionBy("query_id").orderBy(
        F.desc("s"), "cell")
    probes = (queries
              .select(F.col(id_col).alias("query_id"),
                      _as_double(vec_col).alias("v"))
              .crossJoin(cents)
              .select("query_id", "cell", F.col("v").alias("q_vec"),
                      sim_c.alias("s"))
              .withColumn("_rn", F.row_number().over(wq))
              .where(F.col("_rn") <= nprobe)
              .select("query_id", "cell", "q_vec"))

    scored = (probes.join(assigned, "cell")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("sim", F.round(
                  cosine_expr(F.col("q_vec"), F.col("c_vec")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"),
                                               "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "sim"))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                             n_planes: int = 8, dim: int = 64,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             probe_hamming: int = 0) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing:
    (id_a, id_b, sim) with sim >= threshold, id_a < id_b.

    probe_hamming=1 also joins Hamming-adjacent buckets (one-sided
    probing suffices for pairs: if the two signatures differ in at
    most one bit, a's probe set contains b's bucket), trading
    ~n_planes x candidate volume for recall on boundary-straddling
    near-dups."""
    b = with_lsh_bucket(
        df.select(F.col(id_col).alias("id"),
                  _as_double(vec_col).alias("v"), F.col(vec_col)),
        n_planes, dim).drop(vec_col)
    a = b.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                 _norm(F.col("v")).alias("_na"),
                 F.explode(probe_buckets_expr("bucket", n_planes,
                                              probe_hamming))
                  .alias("bucket"))
    c = b.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                 _norm(F.col("v")).alias("_nb"), "bucket")
    return (a.join(c, "bucket")
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", F.round(
                _pair_sim("va", "vb", "_na", "_nb"), 6))
            .where(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim").distinct())
