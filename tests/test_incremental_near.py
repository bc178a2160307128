"""Incremental near-dup dedup (new batch vs history MinHash-LSH,
operators/incremental.py::incremental_near_pairs/_dedup): provable
matches via identical shingle sets, history-signature reuse, hot
history-bucket routing, and the asymmetry contract."""

import pytest


def _phrase(k, reps):
    # 10 salted words repeated `reps` times: any >= 2 repetitions have
    # the IDENTICAL 3-gram shingle SET (boundary shingles included),
    # so MinHash signatures agree on every band -> est_jaccard == 1.0
    words = " ".join(f"p{i}k{k}" for i in range(10))
    return " ".join([words] * reps)


@pytest.fixture(scope="module")
def frames(spark):
    hist = spark.createDataFrame(
        [(100 + k, _phrase(k, 4)) for k in range(5)], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        # 0-4: near-copies of history templates (6x vs history's 4x —
        # different strings, same shingle set); 10-14: salted uniques
        [(k, _phrase(k, 6)) for k in range(5)]
        + [(10 + k, " ".join(f"u{k}w{i}" for i in range(12)))
           for k in range(5)],
        ["doc_id", "text"],
    )
    return hist, new


def test_planted_near_copies_dropped(spark, frames):
    from html_to_document_spark.operators.incremental import (
        incremental_near_dedup, incremental_near_pairs,
    )

    hist, new = frames
    pairs = incremental_near_pairs(new, hist, threshold=0.85).collect()
    assert {(r["new_id"], r["hist_id"]) for r in pairs} == {
        (k, 100 + k) for k in range(5)
    }
    assert all(r["est_jaccard"] == 1.0 for r in pairs)
    survivors = {
        r["doc_id"] for r in incremental_near_dedup(
            new, hist, threshold=0.85
        ).collect()
    }
    assert survivors == {10, 11, 12, 13, 14}


def test_exact_verify_adds_true_jaccard(spark, frames):
    from html_to_document_spark.operators.incremental import (
        incremental_near_pairs,
    )

    hist, new = frames
    rows = incremental_near_pairs(
        new, hist, threshold=0.85, exact_verify=True
    ).collect()
    assert {(r["new_id"], r["hist_id"]) for r in rows} == {
        (k, 100 + k) for k in range(5)
    }
    assert all(r["jaccard"] == 1.0 for r in rows)


def test_history_sigs_path_equivalent(spark, frames):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.dedup import minhash_signature
    from html_to_document_spark.operators.incremental import (
        incremental_near_pairs,
    )

    hist, new = frames
    sigs = minhash_signature(hist)
    via_text = incremental_near_pairs(new, hist, threshold=0.85)
    via_sigs = incremental_near_pairs(
        new, hist.limit(0), threshold=0.85, history_sigs=sigs
    )
    assert sorted(map(tuple, via_text.collect())) == sorted(
        map(tuple, via_sigs.collect())
    )


def test_hot_history_bucket_routes_to_representative(spark):
    from html_to_document_spark.operators.incremental import (
        incremental_near_pairs,
    )

    # 10 identical history copies of one template; cap 3 -> every band
    # bucket is hot and collapses to the min-id representative (200)
    hist = spark.createDataFrame(
        [(200 + j, _phrase(0, 4)) for j in range(10)], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, _phrase(0, 6)), (2, "x0 x1 x2 x3 x4 x5")], ["doc_id", "text"]
    )
    rows = incremental_near_pairs(
        new, hist, threshold=0.85, bucket_cap=3
    ).collect()
    assert {(r["new_id"], r["hist_id"]) for r in rows} == {(1, 200)}


def test_asymmetry_new_new_dups_survive(spark):
    from html_to_document_spark.operators.incremental import (
        incremental_near_dedup,
    )

    # two identical NEW docs with no history counterpart both survive:
    # intra-batch dedup is the batch job's business, not this one's
    hist = spark.createDataFrame(
        [(100, _phrase(9, 4))], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, _phrase(3, 6)), (2, _phrase(3, 6))], ["doc_id", "text"]
    )
    survivors = {
        r["doc_id"]
        for r in incremental_near_dedup(new, hist, threshold=0.85).collect()
    }
    assert survivors == {1, 2}


def test_streaming_near_dedup_rolls_forward(spark, tmp_path):
    """Streaming wiring: micro-batches near-dedup against the standing
    signature table, and survivors' signatures roll forward so later
    batches match earlier survivors."""
    from html_to_document_spark.operators.dedup import minhash_signature
    from html_to_document_spark.streaming.stateful import (
        run_streaming_near_dedup,
    )

    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    sig_path = str(tmp_path / "sigs")

    hist = spark.createDataFrame(
        [(100, _phrase(0, 4))], ["doc_id", "text"]
    )
    minhash_signature(hist).write.parquet(sig_path)

    # batch 1: near-copy of history (dropped) + a fresh salted phrase
    spark.createDataFrame(
        [(1, _phrase(0, 6)), (2, _phrase(7, 4))], ["doc_id", "text"]
    ).write.parquet(in_path)
    run_streaming_near_dedup(spark, in_path, out_path, ckpt, sig_path)
    assert {r.doc_id for r in spark.read.parquet(out_path).collect()} == {2}

    # batch 2: near-copy of batch-1 SURVIVOR (dropped via roll-forward)
    # + fresh doc
    spark.createDataFrame(
        [(3, _phrase(7, 6)), (4, _phrase(8, 4))], ["doc_id", "text"]
    ).write.mode("append").parquet(in_path)
    run_streaming_near_dedup(spark, in_path, out_path, ckpt, sig_path)
    assert {r.doc_id for r in spark.read.parquet(out_path).collect()} == {
        2, 4,
    }

    # batch 3: another near-copy of the ORIGINAL history (still dropped)
    spark.createDataFrame(
        [(5, _phrase(0, 6))], ["doc_id", "text"]
    ).write.mode("append").parquet(in_path)
    run_streaming_near_dedup(spark, in_path, out_path, ckpt, sig_path)
    assert {r.doc_id for r in spark.read.parquet(out_path).collect()} == {
        2, 4,
    }


def test_history_df_none_requires_sigs(spark, frames):
    import pytest as _pytest

    from html_to_document_spark.operators.incremental import (
        incremental_near_pairs,
    )

    hist, new = frames
    with _pytest.raises(ValueError):
        incremental_near_pairs(new, None, threshold=0.85)
    from html_to_document_spark.operators.dedup import minhash_signature

    with _pytest.raises(ValueError):
        incremental_near_pairs(
            new, None, threshold=0.85,
            history_sigs=minhash_signature(hist), exact_verify=True,
        )
