"""Context-window chunking (packing.chunk_token_windows) and
mojibake repair (corpus_hygiene.fix_mojibake)."""

from __future__ import annotations

import pytest

from html_to_document_spark.operators.corpus_hygiene import (
    MOJIBAKE_MAP,
    _MOJIBAKE_ORDER,
    fix_mojibake,
    fix_mojibake_col,
)
from html_to_document_spark.operators.packing import chunk_token_windows


# ------------------------------------------------------------------
# chunk_token_windows
# ------------------------------------------------------------------

def _doc(spark, n_words, doc_id=1):
    text = " ".join(f"w{i}" for i in range(n_words))
    return spark.createDataFrame(
        [(doc_id, text)], "doc_id long, text string"
    )


def test_chunks_cover_every_token_with_overlap(spark):
    out = chunk_token_windows(
        _doc(spark, 11), window=4, stride=3
    ).collect()
    out.sort(key=lambda r: r.chunk_id)
    assert [r.chunk for r in out] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9 w10",
    ]
    assert [r.n_tokens for r in out] == [4, 4, 4, 2]


def test_exact_fit_has_no_tail_chunk(spark):
    out = chunk_token_windows(
        _doc(spark, 10), window=4, stride=3
    ).collect()
    # starts 0,3,6: chunk at 6 reaches token 9 == end, no start-9 tail
    assert len(out) == 3
    assert min(r.n_tokens for r in out) == 4


def test_short_doc_single_chunk(spark):
    out = chunk_token_windows(_doc(spark, 3), window=10, stride=5).collect()
    assert len(out) == 1
    assert out[0].chunk == "w0 w1 w2"
    assert out[0].n_tokens == 3


def test_empty_and_null_docs_yield_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "a b")],
        "doc_id long, text string",
    )
    rows = chunk_token_windows(df, window=4, stride=4).collect()
    assert [r.doc_id for r in rows] == [4]


def test_stride_equal_window_partitions_exactly(spark):
    out = chunk_token_windows(_doc(spark, 8), window=4, stride=4).collect()
    out.sort(key=lambda r: r.chunk_id)
    assert [r.chunk for r in out] == ["w0 w1 w2 w3", "w4 w5 w6 w7"]


def test_chunker_arg_validation(spark):
    df = _doc(spark, 4)
    with pytest.raises(ValueError):
        chunk_token_windows(df, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_token_windows(df, window=0, stride=1)


def test_chunker_plan_is_shuffle_free(spark):
    plan = chunk_token_windows(
        _doc(spark, 20), window=4, stride=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM expressions


def test_loss_mask_counts_every_token_once(spark):
    out = chunk_token_windows(
        _doc(spark, 11), window=4, stride=3
    ).collect()
    out.sort(key=lambda r: r.chunk_id)
    # chunk 0 masks nothing; later chunks mask the window-stride=1
    # head token the previous chunk already covered
    assert [r.loss_start for r in out] == [0, 1, 1, 1]
    assert [r.n_loss_tokens for r in out] == [4, 3, 3, 1]
    assert sum(r.n_loss_tokens for r in out) == 11

    # heavy overlap: window=10 stride=3 over 14 tokens
    out = chunk_token_windows(
        _doc(spark, 14), window=10, stride=3
    ).collect()
    out.sort(key=lambda r: r.chunk_id)
    # starts 0,3,6 -> n_tokens 10,10,8; each later chunk repeats 7
    # tokens of the previous chunk's coverage
    assert [r.loss_start for r in out] == [0, 7, 7]
    assert [r.n_loss_tokens for r in out] == [10, 3, 1]
    assert sum(r.n_loss_tokens for r in out) == 14

    # stride == window: nothing overlaps, nothing masked
    out = chunk_token_windows(_doc(spark, 8), window=4, stride=4).collect()
    assert all(r.loss_start == 0 for r in out)
    assert sum(r.n_loss_tokens for r in out) == 8


def test_loss_mask_single_and_short_chunks(spark):
    # single short chunk: all tokens are loss tokens
    out = chunk_token_windows(_doc(spark, 3), window=10, stride=5).collect()
    assert out[0].loss_start == 0 and out[0].n_loss_tokens == 3


# ------------------------------------------------------------------
# fix_mojibake
# ------------------------------------------------------------------

def test_map_roundtrips_every_entry(spark):
    # one row per mojibake digraph: fix(corrupted) must equal the
    # original character, for ALL 165+ generated entries
    rows = [
        (i, f"x {moji} y", f"x {MOJIBAKE_MAP[moji]} y")
        for i, moji in enumerate(_MOJIBAKE_ORDER)
    ]
    df = spark.createDataFrame(rows, "i long, corrupted string, want string")
    from pyspark.sql import functions as F

    bad = df.filter(
        fix_mojibake_col("corrupted") != F.col("want")
    ).collect()
    assert bad == []


def test_realistic_sentence(spark):
    corrupted = "Itâ€™s naÃ¯ve â€” a rÃ©sumÃ© for â‚¬5 â€œquotedâ€\x9d"
    want = "It’s naïve — a résumé for €5 “quoted”"
    df = spark.createDataFrame([(corrupted,)], "text string")
    got = df.select(fix_mojibake_col("text").alias("t")).first().t
    assert got == want


def test_clean_text_untouched_and_flagged(spark):
    df = spark.createDataFrame(
        [(1, "plain ascii"), (2, "already é fine — ok"),
         (3, "broken Ã© here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in fix_mojibake(df).collect()}
    assert out[1].text == "plain ascii" and not out[1].was_mojibake
    assert out[2].text == "already é fine — ok" and not out[2].was_mojibake
    assert out[3].text == "broken é here" and out[3].was_mojibake


def test_single_pass_semantics_double_encoding(spark):
    # doubly-mojibaked text needs two applications (documented): one
    # pass peels exactly one layer
    once = "é".encode("utf-8").decode("cp1252")          # 'Ã©'
    twice = once.encode("utf-8").decode("cp1252")        # 'ÃƒÂ©'
    df = spark.createDataFrame([(twice,)], "text string")
    peeled = df.select(fix_mojibake_col("text").alias("t")).first().t
    assert peeled == once
    df2 = spark.createDataFrame([(peeled,)], "text string")
    assert df2.select(fix_mojibake_col("text").alias("t")).first().t == "é"


def test_mojibake_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("x",)], "text string")
    plan = df.select(
        fix_mojibake_col("text").alias("t")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
