"""Dedup family, ANN, multimodal plumbing — unit tests for the
operators whose scale path (LSH banding, bucketed ANN) is not
SQL-expressible; the exact variants are oracle-checked in
test_entry_oracle.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_discord_knowledge_graph_spark.operators.ann import (
    cosine_topk, embedding_near_dup_pairs, lsh_topk,
)
from project_discord_knowledge_graph_spark.operators.dataset import (
    exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash,
)
from project_discord_knowledge_graph_spark.operators.multimodal import (
    FEATURES_SCHEMA, MEDIA_SCHEMA, decode_media, frame_sample_plan,
    media_repartition,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base + " with a tiny suffix change"),    # near dup of 0
        (3, "completely different content about spark shuffles and joins"),
        (4, "  THE quick   brown fox jumps over the lazy dog again and again "),  # ws/case dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_normalizes(spark, docs):
    out = {r.keep_id: r.n_dups for r in exact_dedup(docs).collect()}
    # 0, 1 and 4 share a fingerprint (case/whitespace normalized)
    assert out[0] == 2
    assert out[2] == 0 and out[3] == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b)
             for r in minhash_lsh_pairs(docs, jaccard_distance=0.4,
                                        shingle=6).collect()}
    assert (0, 1) in pairs          # identical
    assert (0, 2) in pairs          # near dup
    assert not any(3 in p for p in pairs)  # unrelated stays out


def test_simhash_near_dup_hamming(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert sh[0] == sh[1]
    # short docs carry a weak signal; near-dup must still be closer
    assert ham(sh[0], sh[2]) <= 6
    assert ham(sh[0], sh[3]) > ham(sh[0], sh[2])


def test_ngram_jaccard(spark, docs):
    out = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(docs.where(F.col("doc_id") == 0),
                                        docs).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.3 < out[(0, 2)] < 1.0
    assert out[(0, 3)] == 0.0


@pytest.fixture(scope="module")
def vectors(spark):
    import math
    rows = []
    for i in range(50):
        angle = (i % 10) / 10 * math.pi / 2
        vec = [math.cos(angle), math.sin(angle)] + [0.0] * 6
        # id 40+: near-identical copies of id 0's direction
        if i >= 40:
            vec = [1.0, 0.001 * (i - 40)] + [0.0] * 6
        rows.append((i, [float(x) for x in vec], i % 3))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_cosine_topk_exact(spark, vectors):
    out = cosine_topk(vectors.where(F.col("vec_id") == 40), vectors, k=3)
    rows = sorted((r.rank, r.neighbor_id) for r in out.collect())
    assert rows[0][1] == 0 or rows[0][1] in range(40, 50)
    assert len(rows) == 3


def test_lsh_topk_recall_vs_exact(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(queries, vectors, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in lsh_topk(queries, vectors, k=3, n_planes=4,
                                dim=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # loose: 4 planes on an 8-dim toy set


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """Deterministic clustered corpus (20 clusters x 25 points, 64-dim,
    md5-derived): the neighbor structure real embedding spaces have,
    which the uniform-random testdata embeddings lack (their cosines
    are all ~0, so 'recall' there measures noise, not the index)."""
    import hashlib
    import math

    def unit(seed, dim=64):
        v, i = [], 0
        while len(v) < dim:
            h = hashlib.md5(f"{seed}:{i}".encode()).digest()
            v.extend(b / 255.0 - 0.5 for b in h)
            i += 1
        v = v[:dim]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = []
    for c in range(20):
        center = unit(f"c{c}")
        for j in range(25):
            noise = unit(f"n{c}:{j}")
            rows.append((c * 25 + j,
                         [float(x + 0.15 * y)
                          for x, y in zip(center, noise)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_bucket_slices_long_vectors(spark, clustered_vectors):
    """A 64-dim corpus bucketed with dim=8 must project onto the
    first 8 components — NOT null-poison every row into the all-zeros
    bucket (zip_with pads the shorter literal plane with nulls)."""
    from project_discord_knowledge_graph_spark.operators.ann import (
        with_lsh_bucket,
    )
    b = with_lsh_bucket(clustered_vectors, n_planes=4, dim=8)
    buckets = {r.bucket for r in b.select("bucket").distinct().collect()}
    assert len(buckets) > 1
    assert buckets != {"0000"}


def test_lsh_topk_recall_gate(spark, clustered_vectors):
    """The scale path's hard number: bucketed ANN with Hamming-1
    multi-probe must recover >= 0.9 of the exact top-5, and
    multi-probe must strictly improve on single-probe (measured
    0.95 vs 0.70 on this fixture)."""
    q = clustered_vectors.where(F.col("vec_id") % 25 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(q, clustered_vectors, k=5).collect()}
    single = {(r.query_id, r.neighbor_id)
              for r in lsh_topk(q, clustered_vectors, k=5, n_planes=4,
                                dim=64, probe_hamming=0).collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in lsh_topk(q, clustered_vectors, k=5, n_planes=4,
                               dim=64, probe_hamming=1).collect()}
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= 0.9, (r_single, r_multi)
    assert r_multi > r_single


def test_ivf_topk_recall_gate(spark, clustered_vectors):
    """IVF with cluster-center-ish centroids must recover >= 0.9 of
    the exact top-5 when probing a quarter of the cells; probing more
    cells must not lose recall."""
    from project_discord_knowledge_graph_spark.operators.ann import (
        ivf_topk,
    )
    q = clustered_vectors.where(F.col("vec_id") % 25 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(q, clustered_vectors, k=5).collect()}
    # centroids = one member per true cluster (vec_id % 25 == 1)
    cents = clustered_vectors.where(F.col("vec_id") % 25 == 1)
    few = {(r.query_id, r.neighbor_id)
           for r in ivf_topk(q, clustered_vectors, k=5, n_cells=20,
                             nprobe=2, centroids=cents).collect()}
    more = {(r.query_id, r.neighbor_id)
            for r in ivf_topk(q, clustered_vectors, k=5, n_cells=20,
                              nprobe=6, centroids=cents).collect()}
    r_few = len(exact & few) / len(exact)
    r_more = len(exact & more) / len(exact)
    assert r_few >= 0.9, (r_few, r_more)
    assert r_more >= r_few


def test_ivf_topk_kmeans_centroids(spark, clustered_vectors):
    """Production parameter path: centroids TRAINED with
    pyspark.ml.clustering.KMeans (not the deterministic stand-in)
    passed through ivf_topk(centroids=) must clear the same >= 0.9
    recall gate — proving the trained-centroid path end to end."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from project_discord_knowledge_graph_spark.operators.ann import (
        ivf_topk,
    )

    feats = clustered_vectors.select(
        "vec_id", array_to_vector(F.col("embedding").cast(
            "array<double>")).alias("features"))
    model = KMeans(k=20, seed=42, maxIter=10).fit(feats)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c])
         for i, c in enumerate(model.clusterCenters())],
        ["vec_id", "embedding"])

    q = clustered_vectors.where(F.col("vec_id") % 25 == 0)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(q, clustered_vectors, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(q, clustered_vectors, k=5, n_cells=20,
                                nprobe=5, centroids=cents).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_minhash_lsh_recall_gate(spark):
    """Banded MinHash-LSH must find >= 0.9 of true near-duplicate
    pairs on a deterministic perturbed-copy corpus."""
    import hashlib
    vocab = [f"word{i}" for i in range(200)]

    def words(seed, n=30):
        out = []
        for i in range(n):
            h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), 16)
            out.append(vocab[h % len(vocab)])
        return out

    rows = []
    for d in range(40):
        base = words(f"d{d}")
        pert = list(base)
        pert[3] = "CHANGED"
        pert[17] = "ALSO"
        rows.append((2 * d, " ".join(base)))
        rows.append((2 * d + 1, " ".join(pert)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.id_a, r.id_b)
             for r in minhash_lsh_pairs(docs, jaccard_distance=0.5,
                                        shingle=6).collect()}
    true_pairs = {(2 * d, 2 * d + 1) for d in range(40)}
    recall = len(true_pairs & pairs) / len(true_pairs)
    assert recall >= 0.9, recall


def test_near_dedup_composition(spark):
    """LSH block -> exact verify -> CC -> keep-min, end to end: every
    perturbed copy collapses onto its base doc; unrelated docs
    survive as their own representatives."""
    import hashlib

    from project_discord_knowledge_graph_spark.operators.dataset import (
        near_dedup,
    )
    vocab = [f"tok{i}" for i in range(300)]

    def words(seed, n=40):
        return [vocab[int(hashlib.md5(f"{seed}:{i}".encode())
                          .hexdigest(), 16) % len(vocab)]
                for i in range(n)]

    rows = []
    for d in range(15):
        base = words(f"base{d}")
        pert = list(base)
        pert[5] = "zzz"
        rows.append((2 * d, " ".join(base)))
        rows.append((2 * d + 1, " ".join(pert)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out_df = near_dedup(docs, jaccard_distance=0.4,
                        min_exact_jaccard=0.7, shingle=6,
                        blocking="ml")
    out = {r.doc_id: (r.keep_id, r.is_dup) for r in out_df.collect()}
    assert len(out) == 30
    collapsed = 0
    for d in range(15):
        assert out[2 * d] == (2 * d, False)          # base keeps itself
        keep, dup = out[2 * d + 1]
        if dup:
            assert keep == 2 * d
            collapsed += 1
    assert collapsed >= 13  # LSH recall >= ~0.9 on near-identical docs

    # single text scan: the composite stages the shingle sets, so the
    # RETURNED plan carries no shingle computation at all (it happened
    # once, upstream, before the eager pair checkpoint)...
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("transform(sequence") == 0, plan


def test_near_dedup_single_shingle_scan(spark):
    """...and in the block+verify DAG itself, every consumer of the
    staged shingle frame reads the cache (InMemoryTableScan), so the
    text column is shingled exactly once at runtime."""
    from project_discord_knowledge_graph_spark.operators.dataset import (
        minhash_lsh_pairs, shingle_sets,
    )
    docs = spark.createDataFrame(
        [(i, f"some document text number {i} " * 4) for i in range(10)],
        ["doc_id", "text"])
    grams = shingle_sets(docs, shingle=6).persist()
    try:
        pairs = minhash_lsh_pairs(docs, shingle=6, grams=grams)
        a = grams.select(F.col("doc_id").alias("id_a"),
                         F.col("shingles").alias("ga"))
        verify = pairs.join(a, "id_a")
        plan = verify._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 2, plan
    finally:
        grams.unpersist()


def test_embedding_near_dup(spark, vectors):
    pairs = embedding_near_dup_pairs(vectors, threshold=0.999,
                                     n_planes=4, dim=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # the 40..49 block are near-identical directions
    assert (40, 41) in got
    assert all(a >= 40 or b >= 40 or a % 10 == b % 10 for a, b in got)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"img{i}", "image", bytes([i]) * (100 + i), "image/png",
         10, 10, None) for i in range(5)
    ] + [
        ("vid0", "video", b"\x00" * 1000, "video/mp4", None, None, 3500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_stub(spark, media):
    out = decode_media(media)
    assert out.schema == FEATURES_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert rows["img0"].n_bytes == 100
    assert len(rows["img3"].feature) == 12
    assert out.count() == 6


def test_decode_media_requires_codec(spark, media):
    with pytest.raises(NotImplementedError):
        decode_media(media, require_real_codec=True).collect()


def test_media_repartition_by_bytes(spark, media):
    out = media_repartition(media, target_bytes=300)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 6


def test_media_repartition_bounds_skewed_sizes(spark):
    """Pathological mix: many thumbnails + a few huge videos.  Size-
    class slotting must keep the max partition's payload near target
    (round-robin row balancing could stack several videos together)."""
    rows = ([(f"t{i}", "image", b"x" * 100, "image/png", 1, 1, None)
             for i in range(200)] +
            [(f"v{i}", "video", bytes([i]) * 50_000, "video/mp4",
              None, None, 1000) for i in range(8)])
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(1)
    target = 60_000
    out = media_repartition(media, target_bytes=target)
    per_part = out.select(
        F.spark_partition_id().alias("p"),
        F.length("payload").alias("b")).groupBy("p").sum("b").collect()
    max_bytes = max(r["sum(b)"] for r in per_part)
    # worst case bounded by ~target + one max row (50k), not unbounded
    assert max_bytes <= target + 50_000, per_part
    assert out.count() == 208


def test_decode_media_batch_byte_cap(spark):
    """No decoder call may see more than max_batch_bytes of payload,
    however rows landed in partitions."""
    from project_discord_knowledge_graph_spark.operators.multimodal \
        import slice_batch_by_bytes
    import pandas as pd
    batch = pd.DataFrame({
        "media_id": [f"m{i}" for i in range(7)],
        "payload": [b"a" * n for n in
                    (100, 100, 900, 5000, 10, 10, 10)]})
    subs = list(slice_batch_by_bytes(batch, max_bytes=1000))
    assert [list(s.media_id) for s in subs] == [
        ["m0", "m1"], ["m2"], ["m3"], ["m4", "m5", "m6"]]
    # oversized single row (5000 > 1000) still flows through, alone
    sizes = [s.payload.map(len).sum() for s in subs]
    assert sizes == [200, 900, 5000, 30]

    rows = [(f"m{i}", "image", b"z" * 700, "image/png", 1, 1, None)
            for i in range(20)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(1)

    def reporting_decoder(b):
        # decoder runs in the executor worker: smuggle the batch's
        # payload byte sum out through the feature column
        total = int(b.payload.map(len).sum())
        return pd.DataFrame({
            "media_id": b.media_id,
            "n_bytes": b.payload.map(len).astype("int64"),
            "feature": [str(total)] * len(b)})

    out = decode_media(media, decoder=reporting_decoder,
                       max_batch_bytes=2000).collect()
    assert len(out) == 20
    batch_sums = {int(r.feature) for r in out}
    assert max(batch_sums) <= 2000, batch_sums


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000)
    got = sorted(r.frame_ts_ms for r in frames.collect())
    assert got == [0, 1000, 2000, 3000]


def test_banded_doc_pairs_match_ml_blocking(spark):
    """The native banded document blocking must (a) produce candidate
    pairs that, after the exact shingle-Jaccard verify, equal the ml
    approxSimilarityJoin path's verified pairs on a near-dup corpus
    (same blocking contract, different mechanics), and (b) plug into
    near_dedup (the default blocking) with identical cluster output."""
    from project_discord_knowledge_graph_spark.operators.dataset import (
        minhash_lsh_pairs, minhash_lsh_pairs_banded, near_dedup,
        shingle_sets,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight!"),
        (3, "the quick brown fox leaps over the lazy dog tonight"),
        (4, "completely different payload with no shared shingles"),
        (5, "another unrelated document about parquet partitioning"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    grams = shingle_sets(docs).persist()

    def verified(pairs):
        a = grams.selectExpr("doc_id id_a", "shingles ga")
        b = grams.selectExpr("doc_id id_b", "shingles gb")
        j = (F.size(F.array_intersect("ga", "gb"))
             / F.size(F.array_union("ga", "gb")))
        return {(r.id_a, r.id_b) for r in
                pairs.join(a, "id_a").join(b, "id_b")
                .where(j >= 0.7).select("id_a", "id_b").collect()}

    ml = verified(minhash_lsh_pairs(docs, jaccard_distance=0.5,
                                    grams=grams))
    banded = verified(minhash_lsh_pairs_banded(docs, grams=grams))
    assert banded == ml and banded  # same verified set, non-empty

    out = {(r.doc_id, r.keep_id, r.is_dup)
           for r in near_dedup(docs, min_exact_jaccard=0.7).collect()}
    out_ml = {(r.doc_id, r.keep_id, r.is_dup)
              for r in near_dedup(docs, min_exact_jaccard=0.7,
                                  blocking="ml").collect()}
    assert out == out_ml
    assert (2, 1, True) in out
    grams.unpersist()
