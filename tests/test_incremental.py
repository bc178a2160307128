"""Partitioned-Bloom incremental dedup (operators/incremental.py)."""

import math

import pytest
from pyspark.sql import functions as F

from html_to_document_spark.operators.incremental import (
    bloom_probe,
    build_bloom_index,
    incremental_dedup,
    suggest_bits,
)

HIST = [(i, f"hist-text-{i % 20}") for i in range(100)]
NEW = [(1000 + i, f"hist-text-{i}" if i < 10 else f"fresh-{i}")
       for i in range(40)]
# -> new rows 0..9 duplicate history templates 0..9; 10..39 are fresh


@pytest.fixture(scope="module")
def hist_df(spark):
    return spark.createDataFrame(HIST, "doc_id long, text string")


@pytest.fixture(scope="module")
def new_df(spark):
    return spark.createDataFrame(NEW, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(hist_df):
    return build_bloom_index(
        hist_df, num_buckets=8, bits_per_bucket=1 << 14
    ).cache()


def test_index_shape(index):
    rows = index.collect()
    assert len(rows) <= 8
    assert all(len(r["bloom"]) == (1 << 14) // 8 for r in rows)


def test_no_false_negatives(new_df, index):
    out = bloom_probe(
        new_df, index, num_buckets=8, bits_per_bucket=1 << 14
    ).collect()
    flagged = {r["doc_id"] for r in out if r["maybe_dup"]}
    true_dups = {1000 + i for i in range(10)}
    # every true duplicate MUST be flagged (Bloom guarantees this)
    assert true_dups <= flagged


def test_probe_passthrough_columns(spark, index):
    df = spark.createDataFrame(
        [(1, "hist-text-3", "x")], "doc_id long, text string, extra string"
    )
    out = bloom_probe(df, index, num_buckets=8, bits_per_bucket=1 << 14)
    assert out.columns == ["doc_id", "text", "extra", "maybe_dup"]
    r = out.collect()[0]
    assert r["extra"] == "x" and r["maybe_dup"]


def test_cogroup_mode_matches_broadcast(new_df, index):
    kw = dict(num_buckets=8, bits_per_bucket=1 << 14)
    bcast = {
        (r["doc_id"], r["maybe_dup"])
        for r in bloom_probe(new_df, index, **kw).collect()
    }
    cg = {
        (r["doc_id"], r["maybe_dup"])
        for r in bloom_probe(new_df, index, mode="cogroup", **kw).collect()
    }
    assert bcast == cg


def test_incremental_dedup_exact_at_good_sizing(spark, hist_df, new_df):
    out = incremental_dedup(
        new_df, hist_df, num_buckets=8, bits_per_bucket=1 << 16
    )
    kept = {r["doc_id"] for r in out.collect()}
    # at 16 bits/doc the planted corpus has no false positives, so the
    # Bloom output equals the exact anti-join (deterministic: fixed
    # text, fixed seeds)
    assert kept == {1000 + i for i in range(10, 40)}


def test_exact_confirm_rescues_false_positives(spark, hist_df, new_df):
    # 64-bit bucket bitmaps with 100 history docs -> heavy FP rate;
    # exact_confirm must still recover the precise answer
    out = incremental_dedup(
        new_df, hist_df, num_buckets=4, bits_per_bucket=64,
        num_hashes=2, exact_confirm=True,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1000 + i for i in range(10, 40)}
    # sanity: without confirmation the tiny bloom really does over-flag
    noconf = incremental_dedup(
        new_df, hist_df, num_buckets=4, bits_per_bucket=64, num_hashes=2
    )
    assert noconf.count() < 30


def test_index_deterministic_under_partitioning(hist_df, index):
    idx2 = build_bloom_index(
        hist_df.repartition(13), num_buckets=8, bits_per_bucket=1 << 14
    )
    a = {r["bucket"]: r["bloom"] for r in index.collect()}
    b = {r["bucket"]: r["bloom"] for r in idx2.collect()}
    assert a == b


def test_suggest_bits():
    m = suggest_bits(1_000_000, 0.001)
    assert 13 * 1_000_000 < m < 16 * 1_000_000
    assert suggest_bits(0) == 64
    # k = m/n * ln2 ~ 10 hashes at 0.1%
    assert round(m / 1_000_000 * math.log(2)) == 10


def test_empty_history_flags_nothing(spark, new_df, hist_df):
    empty = hist_df.filter(F.lit(False))
    out = incremental_dedup(new_df, empty, num_buckets=8,
                            bits_per_bucket=1 << 14)
    assert out.count() == len(NEW)


def test_merge_bloom_indexes_equals_union_build(spark, hist_df):
    """Rolling-snapshot merge: OR of two snapshot indexes must be
    byte-identical to the index built over the concatenated history."""
    from html_to_document_spark.operators.incremental import (
        merge_bloom_indexes,
    )

    kw = dict(num_buckets=8, bits_per_bucket=1 << 14)
    a = hist_df.filter(F.col("doc_id") < 50)
    b = hist_df.filter(F.col("doc_id") >= 50)
    merged = merge_bloom_indexes(
        build_bloom_index(a, **kw), build_bloom_index(b, **kw)
    )
    full = build_bloom_index(hist_df, **kw)
    m = {r["bucket"]: r["bloom"] for r in merged.collect()}
    f = {r["bucket"]: r["bloom"] for r in full.collect()}
    assert m == f
    # idempotent: re-merging a snapshot changes nothing
    again = merge_bloom_indexes(merged, build_bloom_index(a, **kw))
    assert {r["bucket"]: r["bloom"] for r in again.collect()} == f


def test_snapshot_novelty_exact_only(spark):
    from html_to_document_spark.operators.incremental import (
        snapshot_novelty,
    )

    hist = spark.createDataFrame(
        [(100, "alpha text"), (101, "beta text")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha text", "a"),   # exact dup of history
            (2, "fresh one", "a"),
            (3, "beta text", "b"),    # exact dup
            (4, "fresh two", "b"),
            (5, "fresh three", "b"),
        ],
        "doc_id long, text string, host string",
    )
    out = {
        r.group_key: r
        for r in snapshot_novelty(new, hist, group_col="host").collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n_new, a.n_exact_dup, a.n_near_dup, a.n_novel) == (2, 1, 0, 1)
    assert a.novelty_rate == 0.5
    assert (b.n_new, b.n_exact_dup, b.n_near_dup, b.n_novel) == (3, 1, 0, 2)
    assert b.novelty_rate == 0.6667
    # ungrouped: one 'all' row
    allrow = snapshot_novelty(new, hist).collect()
    assert len(allrow) == 1 and allrow[0].group_key == "all"
    assert allrow[0].n_new == 5 and allrow[0].n_exact_dup == 2


def test_snapshot_novelty_near_excludes_exact(spark):
    from html_to_document_spark.operators.incremental import (
        snapshot_novelty,
    )

    # history phrase repeated 4x; near-dup = same phrase repeated 6x
    # (identical 3-gram shingle set -> est 1.0, the provable band);
    # exact dup = the identical 4x text (near-matched too, but must be
    # counted as exact only)
    p = " ".join(f"w{i}" for i in range(10))
    hist = spark.createDataFrame(
        [(100, " ".join([p] * 4))], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (1, " ".join([p] * 4)),      # exact
            (2, " ".join([p] * 6)),      # near only
            (3, "totally different words here nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    row = snapshot_novelty(
        new, hist, near=True, threshold=0.85, exact_verify=True
    ).collect()[0]
    assert (row.n_new, row.n_exact_dup, row.n_near_dup, row.n_novel) == (
        3, 1, 1, 1,
    )
    assert row.novelty_rate == 0.3333
