"""Corpus-hygiene operators: paragraph-level dedup accounting,
benchmark decontamination (broadcast semi-join shape), PII scrub."""

import pytest
from pyspark.sql import functions as F

from html_to_document_spark.operators.corpus_hygiene import (
    decontaminate,
    paragraph_dedup_stats,
    pii_scrub,
    pii_scrub_col,
)


def test_paragraph_dedup_stats(spark):
    rows = [
        (1, "alpha beta. gamma delta. alpha beta"),   # internal repeat
        (2, "alpha beta. unique two"),                # cross-doc repeat
        (3, "totally new. gamma delta"),              # cross-doc repeat
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in paragraph_dedup_stats(df).collect()}
    # doc 1 owns the first occurrences of both repeated paragraphs
    assert (out[1].n_paras, out[1].n_unique_first, out[1].n_dupes) == (3, 2, 1)
    assert (out[2].n_paras, out[2].n_unique_first, out[2].n_dupes) == (2, 1, 1)
    assert (out[3].n_paras, out[3].n_unique_first, out[3].n_dupes) == (2, 1, 1)
    # invariants: counts add up, firsts equal distinct paragraphs
    assert all(r.n_paras == r.n_unique_first + r.n_dupes for r in out.values())
    assert sum(r.n_unique_first for r in out.values()) == 4


def test_paragraph_dedup_repartition_stable(spark):
    df = spark.createDataFrame(
        [(i, f"shared para. own {i}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(paragraph_dedup_stats(df).collect())
    b = sorted(paragraph_dedup_stats(df.repartition(7)).collect())
    assert a == b
    assert sum(r.n_dupes for r in a) == 39  # one first, 39 repeats


def test_decontaminate_broadcasts_benchmark(spark):
    train = spark.createDataFrame(
        [(1, "clean doc. nothing shared"),
         (2, "has leak. eval question one"),
         (3, "eval question one. eval question two")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "eval question one. eval question two")],
        "doc_id long, text string",
    )
    out = decontaminate(train, bench)
    rows = {r.doc_id: r.n_contaminated_paras for r in out.collect()}
    assert rows == {2: 1, 3: 2}  # doc 1 absent (clean)
    # scale shape: the benchmark side must broadcast (no corpus shuffle)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_scrub(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jane.doe1@example.com today"),
         (2, "card 12345678901 and pin 123"),
         (3, "nothing sensitive here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert out[1].scrubbed == "mail me at <EMAIL> today"
    assert out[2].scrubbed == "card <NUM> and pin 123"  # short runs kept
    assert out[3].scrubbed == "nothing sensitive here"
    assert (out[1].was_redacted, out[2].was_redacted,
            out[3].was_redacted) == (True, True, False)


def test_pii_scrub_col_is_projection(spark):
    """Join-free composition: the column form adds redaction to any
    frame without changing its plan shape (no shuffle, no UDF)."""
    df = spark.range(10).select(
        F.col("id"),
        F.concat(F.lit("u"), F.col("id").cast("string"),
                 F.lit("@x.io")).alias("contact"),
    )
    out = df.select("id", pii_scrub_col("contact").alias("c"))
    assert out.filter(F.col("c") != "<EMAIL>").count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: zero shuffles


def test_exact_dedup_normalized(spark):
    from html_to_document_spark.operators.dedup import (
        exact_dedup_normalized,
    )

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "  hello world "), (3, "HELLO\nWORLD"),
         (4, "different doc")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup_normalized(df).collect())
    assert kept == [1, 4]


def test_pipeline_pii_and_decontaminate(spark):
    """The composed pipeline's optional hygiene stages: PII scrubbed
    from the assembled text (projection), benchmark-overlapping docs
    dropped (broadcast anti-join)."""
    from pyspark.sql import functions as F

    from html_to_document_spark.plans.pipeline import build_training_pipeline
    from html_to_document_spark.sources.synthetic import generate_corpus

    docs = generate_corpus(spark, 120, seed=11, giant_frac=0.0)
    # plant PII inside one doc's text span
    docs = docs.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(
                    (F.col("doc_id") == "doc-000000000003")
                    & (s["offset"] == 0),
                    F.concat(F.lit("<p>write to leak@site.com now</p>"),
                             s["text"]),
                ).otherwise(s["text"]).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    base = build_training_pipeline(docs, min_quality=0.0, pii_scrub=True)
    rows = {r.doc_id: r.text for r in base.collect()}
    assert any("<EMAIL>" in t for t in rows.values())
    assert not any("leak@site.com" in t for t in rows.values())

    # benchmark = one of the surviving docs' exact text -> it must drop
    victim = sorted(rows)[0]
    bench = spark.createDataFrame(
        [(999, rows[victim])], "doc_id long, text string"
    )
    cleaned = build_training_pipeline(
        docs, min_quality=0.0, pii_scrub=True, benchmark=bench
    )
    ids = {r.doc_id for r in cleaned.collect()}
    assert victim not in ids
    assert len(ids) < len(rows)


def test_verify_pairs_jaccard(spark):
    from html_to_document_spark.operators.dedup import verify_pairs_jaccard

    corpus = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z"), (4, "a b c d")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {(r.id_a, r.id_b): r.jaccard
           for r in verify_pairs_jaccard(corpus, pairs, threshold=0.0).collect()}
    assert out[(1, 2)] == 0.6     # |{a,b,c}| / |{a,b,c,d,e}|
    assert out[(1, 3)] == 0.0
    assert out[(1, 4)] == 1.0
    kept = verify_pairs_jaccard(corpus, pairs, threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in kept} == {(1, 2), (1, 4)}


def test_decontaminate_ngrams_catches_reflowed(spark):
    """Reflowed contamination: the benchmark sentence appears inside a
    training doc with different paragraph breaks, so exact-paragraph
    decontamination misses it — the sliding 13-gram mode must not."""
    from html_to_document_spark.operators.corpus_hygiene import (
        decontaminate_ngrams,
    )

    leak = ("one two three four five six seven eight nine ten "
            "eleven twelve thirteen")
    train = spark.createDataFrame(
        [(1, f"intro words. {leak} extra tail"),
         (2, "totally clean. unrelated text")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, leak)], "doc_id long, text string"
    )
    # paragraph mode misses: train's paragraph carries the extra tail
    assert decontaminate(train, bench).count() == 0
    out = {r.doc_id: r.n_contaminated_ngrams
           for r in decontaminate_ngrams(train, bench, n=13).collect()}
    assert out == {1: 1}
    # broadcast shape: benchmark gram set must broadcast
    plan = (decontaminate_ngrams(train, bench, n=13)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_decontaminate_ngrams_short_docs_no_partial_grams(spark):
    """A doc with fewer than n words yields NO grams (strict windows):
    a 3-word doc must not match a benchmark gram prefix."""
    from html_to_document_spark.operators.corpus_hygiene import (
        decontaminate_ngrams,
    )

    train = spark.createDataFrame(
        [(1, "one two three")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "one two three four five")], "doc_id long, text string"
    )
    assert decontaminate_ngrams(train, bench, n=5).count() == 0
    # and an exact 5-word doc produces exactly its one gram
    train2 = spark.createDataFrame(
        [(2, "one two three four five")], "doc_id long, text string"
    )
    out = decontaminate_ngrams(train2, bench, n=5).collect()
    assert [(r.doc_id, r.n_contaminated_ngrams) for r in out] == [(2, 1)]


def test_pii_scrub_widened_patterns(spark):
    """The r3 verdict's documented under-redactions must now scrub:
    case-mixed locals, +tags, hyphenated multi-label domains, NANP
    phones, dotted quads."""
    df = spark.createDataFrame(
        [(1, "write John.Doe@Example.COM now"),
         (2, "tagged user+tag@mail.co please"),
         (3, "hyphen a@b-c.co.uk domain"),
         (4, "call 555-123-4567 or (555) 123 4567"),
         (5, "host 192.168.10.1 up"),
         (6, "dotted 123.456.7890 is a phone not an ip"),
         (7, "version v1.2.3 stays, pin 123 stays")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.scrubbed for r in pii_scrub(df).collect()}
    assert out[1] == "write <EMAIL> now"
    assert out[2] == "tagged <EMAIL> please"
    assert out[3] == "hyphen <EMAIL> domain"
    assert out[4] == "call <PHONE> or <PHONE>"
    assert out[5] == "host <IP> up"
    assert out[6] == "dotted <PHONE> is a phone not an ip"
    assert out[7] == "version v1.2.3 stays, pin 123 stays"


def test_remove_repeated_paragraphs_keep_first(spark):
    """r5: CCNet/C4-style rewrite — each paragraph keeps its first
    corpus occurrence (earliest (doc_id, position)); later occurrences
    are deleted from their documents; untouched docs keep their text
    byte-for-byte; a doc whose every paragraph repeats goes empty."""
    from html_to_document_spark.operators.corpus_hygiene import (
        remove_repeated_paragraphs,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha one. shared boiler. beta two"),
            (2, "shared boiler. gamma three"),
            (3, "shared boiler"),
            (4, "delta four. epsilon five"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_repeated_paragraphs(docs).collect()}
    assert out[1].text == "alpha one. shared boiler. beta two"
    assert out[1].n_paras_removed == 0
    assert out[2].text == "gamma three" and out[2].n_paras_removed == 1
    assert out[3].text == "" and out[3].n_paras_removed == 1
    assert out[4].text == "delta four. epsilon five"
    assert out[4].n_paras_removed == 0


def test_remove_repeated_paragraphs_drop_hot(spark):
    """drop_hot deletes EVERY occurrence of a paragraph whose corpus
    count exceeds max_occurrences (boilerplate stop-list semantics),
    including the first one keep_first would preserve."""
    from html_to_document_spark.operators.corpus_hygiene import (
        remove_repeated_paragraphs,
    )

    rows = [(i, f"unique {i}. cookie banner") for i in range(4)]
    rows.append((99, "twice seen. lone paragraph"))
    rows.append((100, "twice seen"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in remove_repeated_paragraphs(
            docs, mode="drop_hot", max_occurrences=3
        ).collect()
    }
    for i in range(4):  # "cookie banner" count=4 > 3 -> gone everywhere
        assert out[i].text == f"unique {i}"
        assert out[i].n_paras_removed == 1
    # "twice seen" count=2 <= 3 -> survives in BOTH docs
    assert out[99].text == "twice seen. lone paragraph"
    assert out[100].text == "twice seen"
    assert out[99].n_paras_removed == 0


def test_dedup_lines_in_doc_keep_first_within_doc(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.corpus_hygiene import (
        dedup_lines_in_doc,
    )

    rows = [
        (1, "nav menu. body text. nav menu. footer. body text"),
        (2, "unique one. unique two"),
        (3, "same. same. same"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in dedup_lines_in_doc(df).collect()
    }
    assert got[1] == ("nav menu. body text. footer", 2)
    assert got[2] == ("unique one. unique two", 0)
    assert got[3] == ("same", 2)
    assert got[4] == ("", 0)
    # cross-document repeats are NOT touched (that is the corpus-level
    # operator's job): two docs sharing a line both keep it
    df2 = spark.createDataFrame(
        [(1, "shared. a"), (2, "shared. b")], "doc_id long, text string"
    )
    got2 = {r["doc_id"]: r["text"] for r in dedup_lines_in_doc(df2).collect()}
    assert got2 == {1: "shared. a", 2: "shared. b"}
    # zero-shuffle, zero-Python plan: a pure projection
    plan = dedup_lines_in_doc(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_dedup_lines_in_doc_newline_sep_and_empty_segments(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        dedup_lines_in_doc,
    )

    df = spark.createDataFrame(
        [(1, "a\n\na\nb\n"), (2, "x\ny")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in dedup_lines_in_doc(df, sep="\n").collect()
    }
    # empty segments (consecutive separators, trailing sep) collapse
    # and never count as removals
    assert got[1] == ("a\nb", 1)
    assert got[2] == ("x\ny", 0)


def test_remove_host_template_lines_basic(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        remove_host_template_lines,
    )

    rows = [
        # host a: "cookie banner" on 3 distinct docs -> template
        (1, "a", "cookie banner. page one"),
        (2, "a", "cookie banner. page two"),
        (3, "a", "page three. cookie banner"),
        # host a: "twice" on only 2 docs -> kept
        (4, "a", "twice. body four"),
        (5, "a", "twice. body five"),
        # host b: same "cookie banner" line but only 1 doc -> kept
        (6, "b", "cookie banner. other site"),
        # NULL host: untouched even though the line is a's template
        (7, None, "cookie banner. no host"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {
        r.doc_id: (r.text, r.n_tmpl_removed)
        for r in remove_host_template_lines(docs).collect()
    }
    assert out[1] == ("page one", 1)
    assert out[2] == ("page two", 1)
    assert out[3] == ("page three", 1)
    assert out[4] == ("twice. body four", 0)
    assert out[5] == ("twice. body five", 0)
    assert out[6] == ("cookie banner. other site", 0)
    assert out[7] == ("cookie banner. no host", 0)


def test_remove_host_template_distinct_docs_not_occurrences(spark):
    # one page repeating a line 5x does NOT make it a site template
    from html_to_document_spark.operators.corpus_hygiene import (
        remove_host_template_lines,
    )

    rows = [
        (1, "a", "footer. footer. footer. footer. footer. body"),
        (2, "a", "footer. second page"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {
        r.doc_id: (r.text, r.n_tmpl_removed)
        for r in remove_host_template_lines(docs, min_docs=3).collect()
    }
    assert out[1][1] == 0 and out[2][1] == 0
    # but a third distinct doc tips it, and then EVERY occurrence of
    # the template line goes (all 5 repeats on page 1)
    rows.append((3, "a", "footer. third page"))
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {
        r.doc_id: (r.text, r.n_tmpl_removed)
        for r in remove_host_template_lines(docs, min_docs=3).collect()
    }
    assert out[1] == ("body", 5)
    assert out[2] == ("second page", 1)
    assert out[3] == ("third page", 1)


def test_remove_host_template_newline_sep_untouched_bytes(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        remove_host_template_lines,
    )

    rows = [
        (1, "a", "nav\nbody.. one\n"),  # untouched doc keeps raw bytes
        (2, "b", "nav\nx"),
        (3, "b", "nav\ny"),
        (4, "b", "nav\nz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {
        r.doc_id: (r.text, r.n_tmpl_removed)
        for r in remove_host_template_lines(docs, min_docs=3, sep="\n").collect()
    }
    assert out[1] == ("nav\nbody.. one\n", 0)  # host a never reaches 3 docs
    assert out[2] == ("x", 1)
    assert out[3] == ("y", 1)
    assert out[4] == ("z", 1)


def test_clean_control_chars(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        clean_control_chars,
    )

    rows = [
        # ZWSP/SHY deleted, NBSP -> space, BEL deleted, CRLF -> LF
        (1, " A\u200bB\u00adC\u00a0D\x07E\r\nF"),
        (2, "plain ascii stays byte-for-byte"),
        # C1 control (NEL), BOM, word joiner deleted; ideographic
        # space -> ASCII space; tab and LF survive
        (3, "x\x85y\ufeffz\u2060w a\u3000b\tc\nd"),
        # ZWNJ/ZWJ are meaningful and must SURVIVE
        (4, "e\u200cf\u200dg"),
        # lone CR normalizes to LF
        (5, "p\rq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.text, r.had_control)
        for r in clean_control_chars(df).collect()
    }
    assert out[1] == (" ABC DE\nF", True)
    assert out[2] == ("plain ascii stays byte-for-byte", False)
    assert out[3] == ("xyzw a b\tc\nd", True)
    assert out[4] == ("e\u200cf\u200dg", False)
    assert out[5] == ("p\nq", True)
    # zero-shuffle, zero-Python plan
    plan = (
        clean_control_chars(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_clean_control_chars_duckdb_dialect_parity(spark):
    # the SAME pattern strings must behave identically in DuckDB's
    # RE2 — this is the property the oracle gate relies on
    import duckdb

    from html_to_document_spark.operators.corpus_hygiene import (
        CTRL_DELETE_RE,
        CTRL_SPACE_RE,
        clean_control_chars_col,
    )

    samples = [
        " A\u200bB\u00adC\u00a0D\x07E\r\nF",
        "x\x85y\ufeffz\u2060w a\u3000b\tc\nd",
        "e\u200cf\u200dg",
        "p\rq",
        "ascii only",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got_spark = [
        r.c for r in df.select(
            clean_control_chars_col("text").alias("c")
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "select regexp_replace(regexp_replace(regexp_replace("
            "?, '\\r\\n?', chr(10), 'g'), ?, '', 'g'), ?, ' ', 'g')",
            [s, CTRL_DELETE_RE, CTRL_SPACE_RE],
        ).fetchone()[0]
        for s in samples
    ]
    assert got_spark == got_duck


def test_unicode_normalize_nfc(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        unicode_normalize,
    )

    rows = [
        # decomposed accents compose
        (0, "café Ångström"),
        # singleton fold + canonical mark reordering
        (1, "Å q̣̇"),
        # NFKC-only ligature must SURVIVE under NFC
        (2, "ﬁn"),
        # already-NFC text is identity
        (3, "plain ascii"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: (r["text"], r["was_denormalized"])
        for r in unicode_normalize(df).collect()
    }
    assert out[0] == ("café Ångström", True)
    assert out[1] == ("Å q̣̇", True)
    assert out[2] == ("ﬁn", False)
    assert out[3] == ("plain ascii", False)
    assert out[4] == (None, False)


def test_unicode_normalize_nfkc_folds_compat(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        unicode_normalize,
    )

    # ligature and fullwidth digits fold under NFKC only
    df = spark.createDataFrame(
        [(0, "ﬁn １２")], "doc_id int, text string"
    )
    (row,) = unicode_normalize(df, form="NFKC").collect()
    assert row["text"] == "fin 12"
    assert row["was_denormalized"] is True


def test_unicode_normalize_rejects_unknown_form():
    import pytest

    from html_to_document_spark.operators.corpus_hygiene import (
        unicode_normalize_udf,
    )

    with pytest.raises(ValueError, match="normalization form"):
        unicode_normalize_udf("NFX")


def test_unicode_normalize_duckdb_parity(spark):
    """The gate's argument at unit scale: DuckDB's nfc_normalize and
    CPython's unicodedata agree over the planted repertoire."""
    import duckdb

    from html_to_document_spark.operators.corpus_hygiene import (
        unicode_normalize,
    )

    texts = [
        "café Ångström Å q̣̇ ﬁn",
        "ṩ ṩ",  # s-dot NFC singleton vs raw marks
        "plain",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: r["text"] for r in unicode_normalize(df).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        assert got[i] == con.execute(
            "select nfc_normalize(?)", [t]
        ).fetchone()[0]


def test_contamination_fraction(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        contamination_fraction,
    )

    # doc 0: 4 words -> 2 distinct 3-grams, 1 contaminated -> 0.5
    # doc 1: clean, 5 words -> 3 grams, 0 hits -> 0.0
    # doc 2: under n words -> n_grams 0, frac 0.0
    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "one two three four five"),
            (2, "too short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "xx alpha beta gamma yy")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_contaminated_ngrams"],
            r["contamination_frac"],
        )
        for r in contamination_fraction(train, bench, n=3).collect()
    }
    assert got[0] == (2, 1, 0.5)
    assert got[1] == (3, 0, 0.0)
    assert got[2] == (0, 0, 0.0)


def test_contamination_fraction_duplicate_grams_counted_once(spark):
    from html_to_document_spark.operators.corpus_hygiene import (
        contamination_fraction,
    )

    # repeated contaminated gram counts once (distinct-gram semantics)
    train = spark.createDataFrame(
        [(0, "a b c a b c")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "a b c")], "doc_id long, text string"
    )
    (row,) = contamination_fraction(train, bench, n=3).collect()
    # distinct grams of [a b c a b c]: "a b c","b c a","c a b" -> 3
    assert row["n_grams"] == 3
    assert row["n_contaminated_ngrams"] == 1
    assert abs(row["contamination_frac"] - 1 / 3) < 1e-12
