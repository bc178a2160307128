"""CCNet-style n-gram LM perplexity filter (operators/lm_filter.py)."""

import math

import pytest

from html_to_document_spark.operators.lm_filter import (
    UNK,
    _score_text,
    fit_ngram_lm,
    lm_filter,
    perplexity,
)

REF_ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the rug"),
    (2, "the cat ate the fish"),
    (3, "a dog and a cat"),
]


@pytest.fixture(scope="module")
def ref_df(spark):
    return spark.createDataFrame(REF_ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def model(ref_df):
    return fit_ngram_lm(ref_df, min_count=2, k=0.5, lam=0.9)


def test_fit_counts_exact(model):
    # "the" appears 6x, "cat" 3x, "sat"/"on"/"dog"/"a" 2x; "mat",
    # "rug", "ate", "fish", "and" once each -> <unk>
    assert model["c1"]["the"] == 6
    assert model["c1"]["cat"] == 3
    assert model["c1"][UNK] == 5
    assert model["vocab"] == {"the", "cat", "sat", "on", "dog", "a"}
    assert model["N"] == sum(len(t.split()) for _, t in REF_ROWS)
    # V = vocab + observed <unk>
    assert model["V"] == 7
    # bigram: "the cat" occurs twice; history count of "the" = 6
    # occurrences of "the" followed by something = 5 (one doc-final
    # "the"? none end in "the" -> check by hand: every "the" has a
    # successor except none; docs: 6 "the" tokens, none doc-final)
    assert model["c2"][("the", "cat")] == 2
    assert model["h"]["the"] == 6


def test_fit_deterministic_under_partitioning(spark, ref_df, model):
    m2 = fit_ngram_lm(ref_df.repartition(7), min_count=2, k=0.5, lam=0.9)
    assert m2 == model


def test_vocab_cap_deterministic(ref_df):
    m = fit_ngram_lm(ref_df, min_count=1, vocab_cap=3)
    # top-3 by (count desc, word asc): the(6), cat(3), then a/dog/on/
    # sat all tie at 2 -> "a" wins lexicographically
    assert m["vocab"] == {"the", "cat", "a"}


def test_score_matches_hand_computation(model):
    # one-word doc: ppl = p1(w)^-1
    k, N, V = model["k"], model["N"], model["V"]
    p1_the = (model["c1"]["the"] + k) / (N + k * (V + 1))
    n, ppl = _score_text("the", model)
    assert n == 1
    assert ppl == pytest.approx(math.floor(1.0 / p1_the * 1e4 + 0.5) / 1e4, abs=1e-4)


def test_reference_like_beats_gibberish(spark, ref_df, model):
    df = spark.createDataFrame(
        [(10, "the cat sat on the rug"), (11, "zz qq ww ee rr tt")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in perplexity(df, model).collect()}
    assert rows[10]["ppl"] < rows[11]["ppl"]
    assert rows[10]["n_tokens"] == 6


def test_lm_filter_passthrough_and_threshold(spark, model):
    df = spark.createDataFrame(
        [(10, "the cat sat on the rug", "keep"),
         (11, "zz qq ww ee rr tt", "drop")],
        "doc_id long, text string, tag string",
    )
    ref_ppl = {r["doc_id"]: r["ppl"]
               for r in perplexity(df, model).collect()}
    cut = (ref_ppl[10] + ref_ppl[11]) / 2
    out = lm_filter(df, model, max_ppl=cut).collect()
    assert [r["doc_id"] for r in out] == [10]
    assert out[0]["tag"] == "keep"
    assert out[0]["ppl"] == ref_ppl[10]


def test_empty_and_whitespace_text(model):
    n, ppl = _score_text("", model)
    assert n == 0 and math.isnan(ppl)
    n, ppl = _score_text("   ", model)
    assert n == 0 and math.isnan(ppl)


def test_unseen_history_backoff(model):
    # "mat" maps to <unk>; <unk> as history exists. A vocab word that
    # never appears as a history (none here) would hit h.get default 0
    # -> uniform 1/(V+1) bigram term; exercise via a synthetic model
    m = dict(model)
    m["h"] = dict(model["h"])
    m["h"].pop("on", None)
    n, ppl = _score_text("on the", m)
    assert n == 2 and ppl > 0


def test_fit_fraction_samples(ref_df):
    m = fit_ngram_lm(ref_df, min_count=1, fit_fraction=0.99, seed=7)
    assert m["N"] > 0


def test_null_and_empty_rows_survive_spark_path(spark, model):
    # regression (r4-cont review): _r4(nan) raised ValueError inside
    # the mapInPandas worker — one image-only/empty doc failed the
    # whole stage. Empty/NULL docs score (0, NaN); the pandas->Arrow
    # bridge surfaces the NaN as SQL NULL, and NULL <= max_ppl is
    # NULL, so lm_filter deterministically drops such docs.
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in perplexity(df, model).collect()}
    assert rows[1]["n_tokens"] == 3 and not math.isnan(rows[1]["ppl"])
    for d in (2, 3, 4):
        assert rows[d]["n_tokens"] == 0
        assert rows[d]["ppl"] is None or math.isnan(rows[d]["ppl"])
    kept = [r["doc_id"]
            for r in lm_filter(df, model, max_ppl=1e9).collect()]
    assert kept == [1]


def test_interior_unicode_whitespace_is_one_token(model):
    # regression: Python's default Unicode \s split "foo\xa0bar" into
    # tokens the JVM fit (Java \s, ASCII) never counted; the ASCII
    # flag keeps scoring in the fitted feature space
    n, _ = _score_text("foo bar", model)
    assert n == 1


def test_vocab_cap_bounds_collect_and_matches_driver_mapping(ref_df):
    # regression: vocab_cap capped the model but the bigram collect
    # was still the raw bigram vocabulary; the JVM-side InSet mapping
    # must produce byte-identical c2/h to driver-side mapping
    m = fit_ngram_lm(ref_df, min_count=1, vocab_cap=3)
    vocab = m["vocab"]
    exp_c2, exp_h = {}, {}
    for _, t in REF_ROWS:
        ws = [w if w in vocab else UNK for w in t.split()]
        for a, b in zip(ws, ws[1:]):
            exp_c2[(a, b)] = exp_c2.get((a, b), 0) + 1
            exp_h[a] = exp_h.get(a, 0) + 1
    assert m["c2"] == exp_c2
    assert m["h"] == exp_h


def test_fit_filters_empty_tokens(spark):
    # regression (r4 ADVICE): F.trim strips ASCII spaces only — a
    # leading tab/newline contributed a '' token to the fitted counts
    # that _score_text's .strip() tokenization never emits, silently
    # inflating N/V on real web text
    df = spark.createDataFrame(
        [(0, "\tthe cat\n"), (1, "\n\nthe cat")],
        "doc_id long, text string",
    )
    m = fit_ngram_lm(df, min_count=1, k=0.5, lam=0.9)
    assert "" not in m["c1"] and "" not in m["vocab"]
    assert m["N"] == 4
    assert m["c2"] == {("the", "cat"): 2}
    # fit/score consistency: the scorer sees the same 2 tokens
    n, ppl = _score_text("\tthe cat\n", m)
    assert n == 2 and ppl > 0


def test_default_vocab_cap_is_bounded(ref_df):
    # r5: the 100 TB-safe bounded collect is the DEFAULT; None is the
    # explicit opt-out. A cap far above the vocab is a no-op.
    import inspect

    default = inspect.signature(fit_ngram_lm).parameters["vocab_cap"].default
    assert default == 65536
    m_default = fit_ngram_lm(ref_df, min_count=2)
    m_uncapped = fit_ngram_lm(ref_df, min_count=2, vocab_cap=None)
    assert m_default == m_uncapped


def test_nbsp_edge_fit_score_consistency(spark):
    """review r5: the scorer must not Unicode-strip an edge NBSP the
    ASCII-\\s fit keeps glued to its word."""
    from html_to_document_spark.operators.lm_filter import (
        _score_text,
        fit_ngram_lm,
        perplexity,
    )

    nb = " abc def"
    df = spark.createDataFrame([(1, nb)], "doc_id long, text string")
    model = fit_ngram_lm(df, min_count=1)
    assert " abc" in model["c1"] and "abc" not in model["c1"]
    n, ppl = _score_text(nb, model)
    assert n == 2
    # every scored gram was fitted -> low perplexity; a strip()-based
    # scorer would hit <unk> on the first token instead
    import math

    row = perplexity(df, model).collect()[0]
    assert row.ppl == math.floor(ppl * 10000 + 0.5) / 10000  # r4 rounding
    ws_only, nan_ppl = _score_text(" ", model)
    assert ws_only == 1  # one NBSP 'word', same as the fit side


# ---------------------------------------------------------------------------
# CCNet head/middle/tail bucketing (fit_ppl_thresholds + ppl_bucket_col)
# ---------------------------------------------------------------------------

def test_ppl_thresholds_are_rank_statistics(spark):
    from html_to_document_spark.operators.lm_filter import (
        fit_ppl_thresholds,
    )

    # 9 rows, ppl 1..9 -> ceil(9/3)=3rd and ceil(18/3)=6th smallest
    rows = [(i, float(i)) for i in range(1, 10)]
    df = spark.createDataFrame(rows, ["doc_id", "ppl"])
    assert fit_ppl_thresholds(df) == [3.0, 6.0]
    # ties resolve by doc_id order, NULLs excluded from the fit
    rows = [(1, 5.0), (2, 5.0), (3, 5.0), (4, None), (5, 7.0), (6, 9.0)]
    df = spark.createDataFrame(rows, ["doc_id", "ppl"])
    # n=5 -> ranks ceil(5/3)=2, ceil(10/3)=4 -> values 5.0, 7.0
    assert fit_ppl_thresholds(df) == [5.0, 7.0]


def test_ppl_bucket_labels(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.lm_filter import ppl_bucket_col

    rows = [(1, 2.0), (2, 3.0), (3, 5.5), (4, 9.0), (5, None)]
    df = spark.createDataFrame(rows, ["doc_id", "ppl"])
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", ppl_bucket_col("ppl", [3.0, 6.0]).alias("b")
        ).collect()
    }
    # boundary value belongs to the lower bucket (<=), NULL stays NULL
    assert got == {1: "head", 2: "head", 3: "middle", 4: "tail", 5: None}


def test_ppl_fit_validation(spark):
    import pytest

    from html_to_document_spark.operators.lm_filter import (
        fit_ppl_thresholds, ppl_bucket_col,
    )

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["doc_id", "ppl"])
    with pytest.raises(ValueError):
        fit_ppl_thresholds(df)  # n=2 < 3 buckets
    with pytest.raises(ValueError):
        fit_ppl_thresholds(df, n_buckets=1)
    with pytest.raises(ValueError):
        ppl_bucket_col("ppl", [1.0], labels=("a", "b", "c"))
