import pytest
from pyspark.sql import functions as F

from html_to_document_spark.operators.text_analysis import (
    FINGERPRINT_MOD,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is big"),
            (2, "el perro de la casa que los gatos"),
            (3, "xyzzy plugh"),
            (4, "a b  c"),
        ],
        "doc_id long, text string",
    )


def test_token_stats(spark, docs):
    rows = {r.doc_id: r for r in token_stats(docs).collect()}
    assert rows[1].n_tokens_ws == 10
    assert rows[4].n_tokens_ws == 3
    assert rows[4].n_tokens_bpe == 3
    assert rows[1].n_chars_measured == 39


def test_lang_id(spark, docs):
    rows = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert rows[1] == "en"
    assert rows[2] == "es"
    assert rows[3] == "und"


def test_lang_id_case_insensitive(spark):
    """Sentence-initial stopwords ('The', 'El') must count (ADVICE r1)."""
    docs = spark.createDataFrame(
        [(1, "The dog. The cat. The bird."), (2, "El perro. La casa. Los gatos.")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert rows[1] == "en"
    assert rows[2] == "es"


def test_quality_score_bounds(spark, docs):
    for r in quality_score(docs).collect():
        assert 0.0 <= r.quality <= 1.0
    rows = {r.doc_id: r for r in quality_score(docs).collect()}
    assert rows[1].quality > rows[3].quality  # stopword-rich beats gibberish


def test_fingerprint_matches_reference_formula(spark, docs):
    rows = {r.doc_id: r.fp for r in fingerprint(docs).collect()}

    def ref_fp(text):
        total = 0
        for i, w in enumerate(text.split()):
            total += (i + 1) * (ord(w[0]) * 31 + len(w))
        return total % FINGERPRINT_MOD

    # doc 4 has a double space: split(r"\s+") produces 3 words
    assert rows[1] == ref_fp("the cat and the dog of the house is big")
    assert rows[3] == ref_fp("xyzzy plugh")
    assert rows[4] == ref_fp("a b c")


def test_repetition_stats(spark):
    from html_to_document_spark.operators.text_analysis import repetition_stats

    df = spark.createDataFrame(
        [(1, "aaa\nbbb\naaa\nccc"), (2, "x\ny"), (3, "only\n\nonly")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].n_lines == 4 and rows[1].n_distinct_lines == 3
    assert rows[1].dup_line_frac == 0.25
    assert rows[1].dup_line_char_frac == 0.5  # 'aaa' twice = 6 of 12 chars
    assert rows[2].dup_line_frac == 0.0
    assert rows[3].n_lines == 2  # blank line dropped
    assert rows[3].dup_line_frac == 0.5


def test_corpus_stats(spark):
    from html_to_document_spark.operators.text_analysis import corpus_stats

    df = spark.createDataFrame(
        [(1, "aaaa", "en"), (2, "bb", "en"), (3, "c", "de")],
        "doc_id long, text string, lang string",
    )
    rows = {r.lang: r for r in corpus_stats(df).collect()}
    assert rows["en"].n_docs == 2 and rows["en"].total_chars == 6
    assert rows["en"].p50_chars == 3.0  # exact interpolated median of {2,4}
    assert rows["de"].max_chars == 1
    # datasheet columns (r5-cont): single-word docs -> 1 token each
    assert rows["en"].total_words == 2 and rows["en"].p50_words == 1.0
    assert rows["de"].total_words == 1

    # mean_quality: exact integer-sum mean of the 4-decimal per-doc
    # quality — verified against quality_score on a mixed corpus
    from html_to_document_spark.operators.text_analysis import quality_score

    df2 = spark.createDataFrame(
        [(1, "the cat and the dog is of note to all", "en"),
         (2, "x! y? z.", "en"),
         (3, "wort und das ist mehr", "de")],
        "doc_id long, text string, lang string",
    )
    per_doc = {r.doc_id: r.quality for r in quality_score(df2).collect()}
    want_en = round(
        ((per_doc[1] + per_doc[2]) * 10000) / (2 * 10000.0), 4
    )
    got = {r.lang: r.mean_quality for r in corpus_stats(df2).collect()}
    assert abs(got["en"] - want_en) < 5e-5
    assert got["de"] == per_doc[3]


def test_top_ngram_stats(spark):
    from html_to_document_spark.operators.text_analysis import top_ngram_stats

    df = spark.createDataFrame(
        [(1, "buy now buy now buy now ok"), (2, "single")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in top_ngram_stats(df, n=2).collect()}
    assert rows[1].top_gram == "buy now" and rows[1].top_gram_count == 3
    assert rows[1].top_gram_char_frac == 0.8077  # 3*7 chars of 26
    # single-word doc: the "gram" degenerates to the word itself
    assert rows[2].top_gram == "single" and rows[2].top_gram_count == 1


def test_readability_scores(spark):
    from html_to_document_spark.operators.text_analysis import (
        readability_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran! Did it?"),
            (2, "word"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in readability_scores(df).collect()}
    r1 = rows[1]
    assert r1.n_sentences == 3
    # vowel groups: the/cat/sat/the/dog/ran/did/it -> 1 each = 8
    assert r1.n_syllables == 8
    # words=8: 206.835 - 1.015*(8/3) - 84.6*(8/8)
    want = round(206.835 - 1.015 * (8 / 3) - 84.6 * 1.0, 4)
    assert abs(r1.flesch - want) < 1e-9
    # single word, no terminator: 1 sentence, 1 syllable
    assert rows[2].n_sentences == 1 and rows[2].n_syllables == 1
    # empty doc: floors keep the formula finite
    assert rows[3].n_sentences == 1 and rows[3].n_syllables == 0
    plan = (
        readability_scores(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_script_profile_counts_and_dominant(spark):
    from html_to_document_spark.operators.text_analysis import (
        script_profile,
    )

    rows = [
        (0, "hello world"),               # pure latin
        (1, "Привет мир"),                # cyrillic
        (2, "你好 世界"),                  # cjk
        (3, "مرحبا"),                      # arabic
        (4, "mixed Привет text here"),    # latin-dominant mix
        (5, "12345 !!!"),                 # no script chars at all
        (6, "καλημέρα"),                  # greek
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}
    assert got[0]["dominant_script"] == "latin"
    assert got[0]["n_latin"] == 10 and got[0]["n_script_chars"] == 10
    assert got[1]["dominant_script"] == "cyrillic"
    assert got[1]["n_cyrillic"] == 9  # "Приветмир"
    assert got[2]["dominant_script"] == "cjk" and got[2]["n_cjk"] == 4
    assert got[3]["dominant_script"] == "arabic"
    assert got[4]["dominant_script"] == "latin"
    assert got[4]["n_cyrillic"] == 6
    assert got[5]["dominant_script"] == "other"
    assert got[5]["n_latin"] == 0
    assert got[6]["dominant_script"] == "greek"
    # fractions r4-rounded and consistent
    assert got[1]["cyrillic_frac"] == 1.0
    assert got[4]["latin_frac"] + got[4]["cyrillic_frac"] <= 1.0001


def test_script_profile_duckdb_pattern_parity(spark):
    """The gate's argument at unit scale: the literal-codepoint class
    strings count identically under Java regex and RE2."""
    import duckdb

    from html_to_document_spark.operators.text_analysis import (
        SCRIPT_CLASSES,
        script_profile,
    )

    texts = ["abc Привет 你好 مرحبا καλός", "édition française", "漢字かなカナ 한글"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        for name, cls in SCRIPT_CLASSES.items():
            want = con.execute(
                "select length(?) - length(regexp_replace(?, ?, '', 'g'))",
                [t, t, cls],
            ).fetchone()[0]
            assert got[i][f"n_{name}"] == want, (i, name)


def test_extraction_f1(spark):
    from html_to_document_spark.operators.text_analysis import (
        extraction_f1,
    )

    pred = spark.createDataFrame(
        [("d1", "a b c x"),       # one spurious token
         ("d2", "a a b"),          # multiset: double 'a' vs single
         ("d3", ""),               # empty prediction
         ("d4", "exact match")],
        "doc_id string, text string",
    )
    gold = spark.createDataFrame(
        [("d1", "a b c"), ("d2", "a b b"), ("d3", "missed words"),
         ("d4", "exact match"), ("d5", "gold only doc")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in extraction_f1(pred, gold).collect()}
    r1 = rows["d1"]
    assert (r1["n_pred"], r1["n_gold"], r1["n_overlap"]) == (4, 3, 3)
    assert (r1["precision"], r1["recall"]) == (0.75, 1.0)
    assert r1["f1"] == round(2 * 0.75 / 1.75, 4)
    # multiset: overlap = min(2,1)['a'] + min(1,2)['b'] = 2
    r2 = rows["d2"]
    assert (r2["n_pred"], r2["n_gold"], r2["n_overlap"]) == (3, 3, 2)
    # one-sided docs score zero, both-sided-empty absent
    assert rows["d3"]["precision"] == 0.0 and rows["d3"]["recall"] == 0.0
    assert rows["d5"]["n_pred"] == 0 and rows["d5"]["f1"] == 0.0
    assert rows["d4"]["f1"] == 1.0
