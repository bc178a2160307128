import pytest

from html_to_document_spark.operators.similarity import cosine_topk, lsh_ann_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_cosine_topk_exact(spark, emb):
    queries = emb.filter("vec_id < 3")
    got = cosine_topk(queries, emb, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) == 3
        sims = [r.cosine for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.candidate_id != q for r in rows)
        assert all(-1.0001 <= s <= 1.0001 for s in sims)


def test_lsh_ann_recall(spark, emb):
    """ANN top-k should recover a decent fraction of the exact top-k."""
    queries = emb.filter("vec_id < 10")
    exact = cosine_topk(queries, emb, k=5).collect()
    # synthetic embeddings are near-isotropic (no cluster structure), the
    # hardest case for hyperplane LSH — use shallow buckets, many tables
    approx = lsh_ann_topk(queries, emb, k=5, dim=64,
                          bits_per_table=4, num_tables=16).collect()
    exact_set = {(r.query_id, r.candidate_id) for r in exact}
    approx_set = {(r.query_id, r.candidate_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"ANN recall too low: {recall}"


def test_embedding_near_dup_pairs(spark, emb):
    """Planted duplicates + slight perturbations must be found."""
    from pyspark.sql import functions as F
    from html_to_document_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    base = emb.filter("vec_id < 100")
    exact_dup = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    corpus = base.unionByName(exact_dup)
    pairs = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(corpus, threshold=0.99).collect()
    }
    # every planted exact duplicate is recovered (identical vectors ->
    # identical buckets in every table)
    for i in range(100):
        assert (i, i + 1000) in pairs and pairs[(i, i + 1000)] == 1.0
    # no spurious high-cosine pairs among random vectors
    assert all(a + 1000 == b for (a, b) in pairs)


def test_ivf_ann_recall(spark, emb):
    """IVF coarse-quantized ANN recovers most of the exact top-k; with
    n_probe == n_cells it degenerates to exact search (recall 1.0)."""
    from html_to_document_spark.operators.similarity import ivf_ann_topk

    queries = emb.filter("vec_id < 10")
    exact = cosine_topk(queries, emb, k=5).collect()
    exact_set = {(r.query_id, r.candidate_id) for r in exact}

    approx = ivf_ann_topk(queries, emb, k=5, n_cells=8, n_probe=4).collect()
    approx_set = {(r.query_id, r.candidate_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"

    # full probe == exact: every cell is searched
    full = ivf_ann_topk(queries, emb, k=5, n_cells=8, n_probe=8).collect()
    full_set = {(r.query_id, r.candidate_id) for r in full}
    assert full_set == exact_set


def test_hot_bucket_cap_embedding_pairs_linear(spark):
    """VERDICT r2 #1 gate (embedding flavor): m identical vectors share
    every LSH bucket; the capped path emits O(m) star pairs."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    m = 1500
    vec = [float((i % 7) - 3) for i in range(16)]
    df = spark.range(m).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(x) for x in vec]).alias("embedding"),
    )
    rows = embedding_near_dup_pairs(
        df, threshold=0.95, dim=16, bucket_cap=64
    ).collect()
    assert len(rows) == m - 1
    assert all(r.id_a == 0 and r.cosine == 1.0 for r in rows)


def test_ivf_literal_centroids_mirror_recall(spark, emb):
    """r5 provable band: literal centroids skip the KMeans fit, cell
    assignment is the same sq-euclid argmin as probing, and an exact
    mirror lands in its original's cell by identity — so with
    n_probe=1 the mirrors are guaranteed candidates and the top-k is
    exactly the mirror set."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.similarity import ivf_ann_topk

    centroids = []
    for j in range(8):
        c = [0.0] * 64
        for d in range(j * 8, (j + 1) * 8):
            c[d] = 1.0
        centroids.append(c)

    corpus = emb
    for off in (10_000_000, 20_000_000, 30_000_000):
        corpus = corpus.unionByName(emb.select(
            (F.col("vec_id") + off).alias("vec_id"), "embedding", "label"
        ))
    got = ivf_ann_topk(
        emb.filter("vec_id < 3"), corpus, k=3, n_cells=8, n_probe=1,
        centroids=centroids,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.candidate_id for r in rows] == [
            q + 10_000_000, q + 20_000_000, q + 30_000_000]
        assert all(r.cosine == 1.0 for r in rows)


def test_ivf_literal_centroids_count_mismatch(spark, emb):
    from html_to_document_spark.operators.similarity import ivf_ann_topk

    with pytest.raises(ValueError):
        ivf_ann_topk(emb, emb, n_cells=4, centroids=[[0.0] * 64] * 8)


def test_lsh_scaled_clone_buckets(spark, emb):
    """r5 provable band: sign(dot(s*v, p)) == sign(dot(v, p)) for
    s > 0, so power-of-two-scaled clones share every bucket and the
    top-k is exactly the clone set at cosine 1.0."""
    from pyspark.sql import functions as F

    corpus = emb
    for off, s in ((10_000_000, 2.0), (20_000_000, 0.5),
                   (30_000_000, 4.0)):
        corpus = corpus.unionByName(emb.select(
            (F.col("vec_id") + off).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (x.cast("double") * F.lit(s)).cast("float"),
            ).alias("embedding"),
            "label",
        ))
    got = lsh_ann_topk(
        emb.filter("vec_id < 3"), corpus, k=3, dim=64,
        bits_per_table=4, num_tables=16,
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.candidate_id for r in rows] == [
            q + 10_000_000, q + 20_000_000, q + 30_000_000]
        assert all(r.cosine == 1.0 for r in rows)


def test_ivf_literal_assignment_keeps_duplicate_ids_and_is_shuffle_free(spark):
    """review r5: the literal-centroid assignment must be a per-row
    projection — a partitionBy(id) window both shuffled the corpus
    and collapsed duplicate-id rows the KMeans branch keeps."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.similarity import ivf_ann_topk

    centroids = [[1.0, 0.0], [0.0, 1.0]]
    # two DIFFERENT vectors share vec_id=7, one per cell
    corpus = spark.createDataFrame(
        [(7, [1.0, 0.05]), (7, [0.05, 1.0]), (8, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    got = ivf_ann_topk(
        queries, corpus, k=2, n_cells=2, n_probe=1, centroids=centroids
    ).collect()
    # cell 1 is probed; the [0.05, 1.0] copy of id 7 must still exist
    assert [(r.candidate_id, r.rank) for r in got] == [(7, 1)]
    assert got[0].cosine > 0.99

    plan = ivf_ann_topk(
        queries, corpus, k=2, n_cells=2, n_probe=1, centroids=centroids
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus-assignment side must not shuffle: the only exchanges
    # allowed are the broadcast of the probed queries and the top-k
    # window over the (tiny) candidate set
    import re
    assert not re.search(r"Exchange hashpartitioning\(candidate_id", plan)
