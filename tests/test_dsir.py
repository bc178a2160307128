"""DSIR importance resampling (operators/dsir.py)."""

import math
import zlib

import pytest

from html_to_document_spark.operators.dsir import (
    UNK,
    _score_text,
    _words,
    dsir_log_weight,
    dsir_select,
    fit_dsir,
    gumbel_key_col,
)

TARGET_ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the fish"),
    (2, "a cat and the cat"),
]
RAW_ROWS = [
    (10, "stock market prices fell today"),
    (11, "the market closed lower again"),
    (12, "prices of the stock fell"),
    (13, "the cat sat on the mat"),
]


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(TARGET_ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW_ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(target_df, raw_df):
    return fit_dsir(target_df, raw_df, min_count=2, alpha=0.5)


def _py_grams(text):
    words = text.split()
    return words + [
        words[i] + " " + words[i + 1] for i in range(len(words) - 1)
    ]


def test_fit_counts_exact(model):
    # target unigrams: the=5, cat=4, sat/on/mat/ate/fish/a/and once
    assert model["mode"] == "gram"
    assert model["ct"]["the"] == 5
    assert model["ct"]["cat"] == 4
    # bigram "the cat" appears in docs 0(no: "the cat" yes at start),
    # 1 ("the cat" no -> "the cat ate": yes), 2 ("the cat" at end)
    assert model["ct"]["the cat"] == 3
    # vocab = grams with target count >= 2
    assert "the" in model["vocab"] and "cat" in model["vocab"]
    assert "mat" not in model["vocab"]
    # Nt = total target grams (unigrams + bigrams)
    exp_nt = sum(len(_py_grams(t)) for _, t in TARGET_ROWS)
    assert model["Nt"] == exp_nt
    assert model["Nr"] == sum(len(_py_grams(t)) for _, t in RAW_ROWS)
    # raw counts mapped through the TARGET feature space: "market"
    # is outside the vocab -> pooled into <unk>
    assert "market" not in model["cr"]
    assert model["cr"][UNK] > 0
    # B = |vocab| + 1 (the <unk> cell)
    assert model["B"] == len(model["vocab"]) + 1


def test_fit_deterministic_under_partitioning(target_df, raw_df, model):
    m2 = fit_dsir(
        target_df.repartition(5),
        raw_df.repartition(3),
        min_count=2,
        alpha=0.5,
    )
    assert m2 == model


def test_vocab_cap_deterministic(target_df, raw_df):
    m = fit_dsir(target_df, raw_df, min_count=1, vocab_cap=2)
    # top-2 target grams by (count desc, gram asc): the(5), cat(4)
    assert m["vocab"] == {"the", "cat"}
    # raw side still mapped through the capped space
    assert set(m["cr"]) <= {"the", "cat", UNK}


def test_hashed_mode_matches_python_crc32(target_df, raw_df):
    B = 64
    m = fit_dsir(target_df, raw_df, num_buckets=B)
    assert m["mode"] == "hash" and len(m["ct"]) == B
    # recompute target bucket counts in pure python: JVM crc32 over
    # utf-8 bytes must agree with zlib.crc32
    exp = [0] * B
    for _, t in TARGET_ROWS:
        for g in _py_grams(t):
            exp[zlib.crc32(g.encode("utf-8")) % B] += 1
    assert m["ct"] == exp
    assert m["Nt"] == sum(exp)


def test_score_hand_computation(model):
    a, B, Nt, Nr = model["alpha"], model["B"], model["Nt"], model["Nr"]
    ct, cr = model["ct"], model["cr"]
    exp = math.log((ct["the"] + a) / (a * B + Nt)) - math.log(
        (cr.get("the", 0) + a) / (a * B + Nr)
    )
    n, lw = _score_text("the", model)
    assert n == 1
    assert lw == pytest.approx(exp, rel=1e-12)


def test_empty_text(model):
    assert _score_text("", model) == (0, 0.0)
    assert _score_text("   ", model) == (0, 0.0)


def test_target_like_beats_raw_like(spark, model):
    df = spark.createDataFrame(
        [(20, "the cat sat on the mat"), (21, "stock market prices fell")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_log_weight(df, model).collect()}
    assert rows[20]["log_weight"] > rows[21]["log_weight"]
    assert rows[20]["n_grams"] == 11  # 6 unigrams + 5 bigrams


def test_log_weight_passthrough_and_determinism(spark, model):
    df = spark.createDataFrame(
        [(20, "the cat", "k"), (21, "stock market", "r")],
        "doc_id long, text string, tag string",
    )
    out = dsir_log_weight(df, model)
    assert out.columns == ["doc_id", "text", "tag", "n_grams", "log_weight"]
    a = sorted(out.collect())
    b = sorted(dsir_log_weight(df.repartition(4), model).collect())
    assert a == b
    assert a[0]["tag"] == "k"


def test_hashed_scoring_runs(spark, target_df, raw_df):
    m = fit_dsir(target_df, raw_df, num_buckets=128)
    df = spark.createDataFrame(
        [(20, "the cat sat"), (21, "market prices")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_log_weight(df, m).collect()}
    assert rows[20]["log_weight"] > rows[21]["log_weight"]


def test_select_deterministic_and_monotone(spark, model):
    df = spark.createDataFrame(
        [(i, "the cat sat" if i % 2 else "stock prices fell")
         for i in range(200)],
        "doc_id long, text string",
    )
    scored = dsir_log_weight(df, model)
    w = {r["doc_id"]: r["log_weight"] for r in scored.collect()}
    w_hi, w_lo = w[1], w[0]  # target-like vs raw-like weight
    assert w_hi - w_lo > 3  # gap >> Gumbel noise scale (~1.28)
    mid = (w_hi + w_lo) / 2
    lo = {r["doc_id"] for r in
          dsir_select(scored, min_gumbel_key=mid - 3).collect()}
    hi = {r["doc_id"] for r in
          dsir_select(scored, min_gumbel_key=mid).collect()}
    # higher threshold selects a subset
    assert hi <= lo and len(hi) < len(lo)
    # deterministic under repartitioning (seeded hash noise, no rand())
    hi2 = {r["doc_id"] for r in dsir_select(
        dsir_log_weight(df.repartition(8), model), min_gumbel_key=mid
    ).collect()}
    assert hi2 == hi
    # target-like docs selected at a higher rate than raw-like
    odd = sum(1 for d in hi if d % 2)
    even = len(hi) - odd
    assert odd > even


def test_gumbel_seed_changes_sample(spark, model):
    df = spark.createDataFrame(
        [(i, "the cat sat on a mat") for i in range(300)],
        "doc_id long, text string",
    )
    scored = dsir_log_weight(df, model)
    s1 = {r["doc_id"] for r in
          dsir_select(scored, min_gumbel_key=1.0, seed=1).collect()}
    s2 = {r["doc_id"] for r in
          dsir_select(scored, min_gumbel_key=1.0, seed=2).collect()}
    assert s1 and s2 and s1 != s2


def test_fit_fraction_samples(target_df, raw_df):
    m = fit_dsir(target_df, raw_df, min_count=1, fit_fraction=0.99, seed=7)
    assert m["Nr"] > 0


def test_gumbel_key_col_is_finite(spark, model):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "the cat") for i in range(50)], "doc_id long, text string"
    )
    keys = dsir_log_weight(df, model).select(
        gumbel_key_col().alias("k")
    ).collect()
    assert all(math.isfinite(r["k"]) for r in keys)


def test_null_text_scores_zero_not_none_token(spark, model):
    # regression (r4-cont review): astype(str) turned a NULL row into
    # the literal token "None" with a nonzero importance weight
    df = spark.createDataFrame(
        [(1, None), (2, "the cat")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dsir_log_weight(df, model).collect()}
    assert rows[1]["n_grams"] == 0
    assert rows[1]["log_weight"] == 0.0


def test_interior_unicode_whitespace_is_one_word():
    # ASCII \s: match the JVM fit and RE2 oracle tokenizers on NBSP
    assert _words("foo bar") == ["foo bar"]
    assert _words(None) == []


def test_fit_filters_empty_tokens(spark, raw_df):
    # regression (r4 ADVICE): same empty-token fit/score asymmetry as
    # lm_filter — a leading tab/newline must not count a '' gram
    df = spark.createDataFrame(
        [(0, "\tthe cat\n")], "doc_id long, text string"
    )
    m = fit_dsir(df, raw_df, min_count=1, alpha=0.5)
    assert "" not in m["ct"]
    assert not any(g.startswith(" ") or g.endswith(" ") for g in m["ct"])
    assert m["Nt"] == 3  # 2 unigrams + 1 bigram
    assert "the cat" in m["ct"]


def test_default_vocab_cap_is_bounded(target_df, raw_df, model):
    # r5: bounded collect by default, None = explicit opt-out
    import inspect

    default = inspect.signature(fit_dsir).parameters["vocab_cap"].default
    assert default == 65536
    m_unc = fit_dsir(target_df, raw_df, min_count=2, vocab_cap=None)
    assert m_unc == model  # the model fixture uses the default cap


def test_nbsp_edge_fit_score_consistency(spark):
    """review r5: Python str.strip() is Unicode-aware — a doc with a
    leading NBSP must tokenize identically on the JVM fit side (ASCII
    \\s keeps '\\u00a0abc' as one token) and the Python scorer."""
    from html_to_document_spark.operators.dsir import (
        _words,
        dsir_log_weight,
        fit_dsir,
    )

    nb = " abc def"
    assert _words(nb) == [" abc", "def"]  # NBSP stays glued

    df = spark.createDataFrame([(1, nb), (2, "other words here")],
                               "doc_id long, text string")
    model = fit_dsir(df.filter("doc_id = 1"), df, min_count=1)
    out = {r.doc_id: r for r in dsir_log_weight(df, model).collect()}
    # the target doc's grams must all be found in the fitted counts:
    # a strip()-based scorer would query 'abc' (unfitted) and skew
    # the weight; a consistent one scores every gram as seen
    assert out[1].n_grams == 3  # 2 unigrams + 1 bigram
    assert out[1].log_weight > out[2].log_weight
