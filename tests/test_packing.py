"""Sequence packing: budget invariants, determinism, utilization."""

import pytest
from pyspark.sql import functions as F

from html_to_document_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _corpus(spark, n=300, seed=5):
    import random

    rng = random.Random(seed)
    rows = [(f"d{i:04d}", " ".join("w" * 1 for _ in range(rng.randint(1, 400))))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_pack_invariants(spark):
    df = _corpus(spark)
    out = pack_sequences(df, budget=512, num_partitions=4).collect()
    # every doc assigned exactly once
    assert sorted(r.doc_id for r in out) == sorted(
        r.doc_id for r in df.select("doc_id").collect())
    # no regular bin exceeds the budget
    fills = {}
    for r in out:
        if not r.oversize:
            fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
    assert fills and all(v <= 512 for v in fills.values())
    # oversize docs sit alone in their bin
    over_bins = [r.bin_id for r in out if r.oversize]
    all_bins = [r.bin_id for r in out]
    for b in over_bins:
        assert all_bins.count(b) == 1


def test_pack_oversize_flagged(spark):
    df = spark.createDataFrame(
        [("big", " ".join(["w"] * 1000)), ("small", "a b c")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in
           pack_sequences(df, budget=100, num_partitions=1).collect()}
    assert out["big"].oversize and not out["small"].oversize
    assert out["big"].n_tokens == 1000


def test_pack_deterministic_for_fixed_partitioning(spark):
    df = _corpus(spark, seed=9)
    a = sorted(map(tuple, pack_sequences(df, 256, num_partitions=4).collect()))
    b = sorted(map(tuple, pack_sequences(
        df.repartition(13), 256, num_partitions=4).collect()))
    assert a == b  # routing is by hash of doc_id, not input layout


def test_packing_utilization(spark):
    df = _corpus(spark, n=500, seed=11)
    packed = pack_sequences(df, budget=512, num_partitions=4)
    stats = packing_stats(packed, 512).first()
    # FFD on many small docs should fill bins well; all but each
    # partition's last bin are >= 50% full by the FFD property — the
    # MEAN should be comfortably high
    assert stats.mean_fill > 0.7, stats
    assert stats.n_bins > 0


def test_pack_budget_validation(spark):
    with pytest.raises(ValueError):
        pack_sequences(_corpus(spark, n=5), budget=0)


def test_null_counts_pack_as_zero(spark):
    # regression (r4 ADVICE): a NULL count surfaced as NaN in the
    # pandas batch and int(n) failed the whole task for one bad row;
    # NULL counts now pack as 0-token docs (no budget, never oversize)
    df = spark.createDataFrame(
        [("a", "x y z", 3), ("b", None, None), ("c", "q", None)],
        "doc_id string, text string, nt long",
    )
    by_tok = {r.doc_id: r for r in pack_sequences(
        df, budget=10, num_partitions=1, tokens_col="nt").collect()}
    assert by_tok["b"].n_tokens == 0 and not by_tok["b"].oversize
    assert by_tok["c"].n_tokens == 0
    assert by_tok["a"].n_tokens == 3
    by_ws = {r.doc_id: r for r in pack_sequences(
        df, budget=10, num_partitions=1).collect()}
    assert by_ws["b"].n_tokens == 0  # NULL text, whitespace path


def test_chunk_sentence_windows_greedy(spark):
    from html_to_document_spark.operators.packing import (
        chunk_sentence_windows,
    )

    df = spark.createDataFrame(
        [
            (0, "One two three. Four five six! Seven eight nine ten? "
                "Tail."),
            (1, "Single sentence without boundary"),
            (2, "this single sentence is way over the budget limit "
                "set here. ok."),
            (3, ""),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        chunk_sentence_windows(df, max_tokens=7).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    got = [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk) for r in out]
    assert got == [
        # 3+3 fits, 4 would overflow; 4+1 fits in the next chunk
        (0, 0, 6, "One two three. Four five six!"),
        (0, 1, 5, "Seven eight nine ten? Tail."),
        (1, 0, 4, "Single sentence without boundary"),
        # oversized sentence becomes its own oversized chunk
        (2, 0, 11,
         "this single sentence is way over the budget limit set here."),
        (2, 1, 1, "ok."),
        # empty / whitespace docs emit no chunks
    ]


def test_chunk_sentence_windows_never_splits_sentences(spark):
    from html_to_document_spark.operators.packing import (
        chunk_sentence_windows,
        sentences_col,
    )
    from pyspark.sql import functions as F

    text = ("alpha bravo charlie. delta echo! foxtrot golf hotel "
            "india? juliet kilo. lima mike november oscar papa.")
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    sents = df.select(sentences_col("text").alias("s")).collect()[0]["s"]
    chunks = [
        r.chunk
        for r in chunk_sentence_windows(df, max_tokens=6).collect()
    ]
    # reassembled chunks == original sentence sequence
    reassembled = " ".join(chunks)
    assert reassembled == " ".join(sents) == text
    # every sentence appears whole inside exactly one chunk
    for s in sents:
        assert sum(s in c for c in chunks) >= 1
    # no chunk exceeds the budget unless it is a single sentence
    for r in chunk_sentence_windows(df, max_tokens=6).collect():
        n_sents = sum(1 for s in sents if s in r.chunk)
        assert r.n_tokens <= 6 or n_sents == 1


def test_chunk_sentence_windows_plan_no_exchange(spark):
    from html_to_document_spark.operators.packing import (
        chunk_sentence_windows,
    )

    df = spark.createDataFrame(
        [(0, "a b. c d. e f.")], "doc_id long, text string"
    )
    plan = (
        chunk_sentence_windows(df, max_tokens=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM fold


def test_packing_stats(spark):
    from html_to_document_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )

    rows = [(f"d{i}", "w " * n) for i, n in
            enumerate([60, 50, 40, 30, 20, 150])]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    packed = pack_sequences(df, budget=100, num_partitions=1)
    s = packing_stats(packed, budget=100).collect()[0]
    # FFD on [60,50,40,30,20]: bins {60+40}, {50+30+20} -> 2 full bins
    assert s["n_bins"] == 2
    assert s["n_docs"] == 5
    assert s["total_tokens"] == 200
    assert s["mean_fill"] == 1.0
    assert s["min_bin_fill"] == 1.0
    assert s["p50_bin_fill"] == 1.0
    assert s["n_oversize"] == 1  # the 150-token doc
    # a straggler bin shows up in min/median
    packed2 = pack_sequences(
        spark.createDataFrame(
            [("a", "w " * 80), ("b", "w " * 70), ("c", "w " * 10)],
            "doc_id string, text string",
        ),
        budget=100, num_partitions=1,
    )
    s2 = packing_stats(packed2, budget=100).collect()[0]
    # bins: {80+10}, {70} -> fills 0.9 and 0.7
    assert s2["n_bins"] == 2
    assert s2["mean_fill"] == 0.8
    assert s2["min_bin_fill"] == 0.7
    assert s2["p50_bin_fill"] == 0.8  # exact median of [0.7, 0.9]
    assert s2["n_oversize"] == 0
