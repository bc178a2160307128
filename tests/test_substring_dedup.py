"""Exact substring dedup (Lee et al. 2021 hash-marking form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from html_to_document_spark.operators.substring_dedup import (
    exact_substring_dedup,
    exact_substring_ranges,
)

SHARED = " ".join(f"boiler{i}" for i in range(8))  # 8-word shared block


def _corpus(spark):
    rows = [
        ("a", "alpha one two three " + SHARED + " tail aaa bbb"),
        ("b", "totally different words " + SHARED + " ending here now"),
        ("c", "no overlap with anything else at all whatsoever today"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_ranges_mark_non_keeper_only(spark):
    df = _corpus(spark)
    marked = {(r.doc_id, r.pos)
              for r in exact_substring_ranges(df, n=8).collect()}
    # SHARED starts at word 4 in doc a (keeper: min (doc_id, pos)) and
    # word 3 in doc b -> only b's occurrence is marked
    assert ("b", 3) in marked
    assert all(d != "a" for d, _ in marked) or ("a", 4) not in marked
    assert all(d != "c" for d, _ in marked)


def test_dedup_removes_from_non_keeper(spark):
    df = _corpus(spark)
    out = {r.doc_id: r for r in exact_substring_dedup(df, n=8).collect()}
    assert out["a"].text == (
        "alpha one two three " + SHARED + " tail aaa bbb"
    )
    assert out["a"].n_words_removed == 0
    assert SHARED.split()[0] not in out["b"].text
    assert out["b"].text == "totally different words ending here now"
    assert out["b"].n_words_removed == 8
    assert out["c"].n_words_removed == 0


def test_within_doc_repeat_keeps_first(spark):
    text = SHARED + " middle words go here " + SHARED
    df = spark.createDataFrame([("x", text)], "doc_id string, text string")
    out = exact_substring_dedup(df, n=8).collect()[0]
    assert out.text == SHARED + " middle words go here"
    assert out.n_words_removed == 8


def test_overlapping_ranges_merge(spark):
    # a 10-word shared block yields three overlapping 8-gram marks in
    # the non-keeper; coverage must merge, not triple-count
    block = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame(
        [("a", "lead words " + block), ("b", block + " trail words")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in exact_substring_dedup(df, n=8).collect()}
    assert out["b"].text == "trail words"
    assert out["b"].n_words_removed == 10


def test_doc_fully_covered_is_dropped(spark):
    df = spark.createDataFrame(
        [("a", SHARED + " and some extra"), ("b", SHARED)],
        "doc_id string, text string",
    )
    ids = {r.doc_id for r in exact_substring_dedup(df, n=8).collect()}
    assert ids == {"a"}


def test_short_docs_pass_through(spark):
    df = spark.createDataFrame(
        [("a", "tiny"), ("b", "also small")], "doc_id string, text string"
    )
    out = {r.doc_id: r.text for r in exact_substring_dedup(df, n=8).collect()}
    assert out == {"a": "tiny", "b": "also small"}


def test_deterministic_under_repartition(spark):
    df = _corpus(spark)
    a = sorted(
        (r.doc_id, r.text)
        for r in exact_substring_dedup(df.repartition(7), n=8).collect()
    )
    b = sorted(
        (r.doc_id, r.text)
        for r in exact_substring_dedup(df.coalesce(1), n=8).collect()
    )
    assert a == b


def test_custom_id_col_keeps_name_and_type(spark):
    df = spark.createDataFrame(
        [(1, "lead words " + SHARED), (2, SHARED + " trail words")],
        "page_id long, text string",
    )
    out = exact_substring_dedup(df, id_col="page_id", n=8)
    assert "page_id" in out.columns and "doc_id" not in out.columns
    rows = {r.page_id: r for r in out.collect()}
    assert isinstance(list(rows)[0], int)  # bigint preserved
    assert rows[2].text == "trail words"


def test_fixpoint_chain_converges_on_pass_two(spark):
    # removal stitches doc z's neighbors "x y | z w" together, creating
    # the 3-gram "y z w" that duplicates doc c's — invisible to pass 1,
    # caught by pass 2; pass 3 must be a no-op
    rows = [
        ("a_keep", "D E F"),                 # keeper for "D E F"
        ("c_other", "q y z w r"),            # keeper for "y z w"
        ("z_doc", "x y D E F z w"),          # loses both, one per pass
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    one = {r.doc_id: r for r in exact_substring_dedup(df, n=3).collect()}
    assert one["z_doc"].text == "x y z w"
    assert one["z_doc"].n_words_removed == 3
    # residual dup mass after pass 1: the stitched gram is still there
    residual = exact_substring_ranges(
        spark.createDataFrame(
            [(k, v.text) for k, v in one.items()],
            "doc_id string, text string",
        ),
        n=3,
    ).count()
    assert residual == 1

    for passes in (2, 3, 5):
        multi = {
            r.doc_id: r
            for r in exact_substring_dedup(
                df, n=3, max_passes=passes
            ).collect()
        }
        assert multi["z_doc"].text == "x"
        assert multi["z_doc"].n_words_removed == 6
        assert multi["a_keep"].text == "D E F"
        assert multi["c_other"].text == "q y z w r"


def test_fixpoint_invalid_passes(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with _pytest.raises(ValueError):
        exact_substring_dedup(df, max_passes=0)


def test_fixpoint_detects_pass_that_only_empties_docs(spark):
    # review r5: a pass whose removals EMPTY documents has a zero
    # removed-word sum over survivors; convergence must also compare
    # row counts or the emptied duplicate gets resurrected
    rows = [
        ("a", "D E F"),
        ("b", "A B C"),
        ("z", "D E A B C F"),  # pass 1 strips "A B C" -> "D E F";
                               # pass 2 empties it as a's duplicate
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r.text
           for r in exact_substring_dedup(df, n=3, max_passes=5).collect()}
    assert out == {"a": "D E F", "b": "A B C"}
    one = {r.doc_id: r.text
           for r in exact_substring_dedup(df, n=3).collect()}
    assert one["z"] == "D E F"  # the single-pass residue, documented


def test_dup_gram_stats_cross_doc_mass(spark):
    from html_to_document_spark.operators.substring_dedup import (
        dup_gram_stats,
    )

    d = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6"),
            (2, "z0 w1 w2 w3 w4 q9"),  # shares exactly one 4-gram with 1
            (3, "u1 u2 u3"),  # shorter than n: zero windows
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_frac)
        for r in dup_gram_stats(d, n=4).collect()
    }
    assert out[1] == (3, 1, 1.0 / 3.0)
    assert out[2] == (3, 1, 1.0 / 3.0)
    assert out[3] == (0, 0, 0.0)


def test_dup_gram_stats_within_doc_repeats_dont_count(spark):
    from html_to_document_spark.operators.substring_dedup import (
        dup_gram_stats,
    )

    # the bigram "r1 r2" repeats inside doc 1 but exists in no OTHER
    # doc — cross-doc mass must read 0 (the tagger is the cross-doc
    # complement of gopher_repetition's within-doc signals)
    d = spark.createDataFrame(
        [(1, "r1 r2 r1 r2 r1 r2"), (2, "s1 s2 s3")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in dup_gram_stats(d, n=2).collect()
    }
    assert out[1] == (5, 0)
    assert out[2] == (2, 0)
