"""Interleaved-document curation (operators/interleaved.py)."""

import pytest
from pyspark.sql import functions as F

from html_to_document_spark.operators.interleaved import (
    MAX_HOT_REFS,
    drop_hot_media,
    hot_media_refs,
    interleaved_keep_col,
    interleaved_stats,
)

SPANS_TYPE = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
SCHEMA = f"doc_id string, spans {SPANS_TYPE}"


def t(text, off):
    return ("text", text, None, off)


def img(ref, off):
    return ("image", None, ref, off)


def mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def docs(spark):
    return mk(
        spark,
        [
            # plain text-only doc
            ("d0", [t("hello world", 0), t("more text here", 1)]),
            # banner-led: 2 leading images, then text/image interleave
            (
                "d1",
                [
                    img("media://logo", 0),
                    img("media://logo", 1),
                    t("body text", 2),
                    img("media://pic1", 3),
                    t("tail", 4),
                ],
            ),
            # gallery: run of 3 images mid-doc
            (
                "d2",
                [
                    t("intro", 0),
                    img("media://a", 1),
                    img("media://b", 2),
                    img("media://c", 3),
                    t("outro", 4),
                ],
            ),
            # all-images doc
            ("d3", [img("media://a", 0), img("media://logo", 1)]),
            # empty doc
            ("d4", []),
            # table span is neither text nor image for the buckets
            ("d5", [("table", "a\tb", None, 0), t("x", 1)]),
            # image with NULL ref (missing pointer, not a logo)
            ("d6", [t("y", 0), img(None, 1)]),
        ],
    )


def _stats(docs):
    return {
        r["doc_id"]: r.asDict() for r in interleaved_stats(docs).collect()
    }


def test_stats_counts_and_chars(docs):
    s = _stats(docs)
    assert s["d0"]["n_spans"] == 2
    assert s["d0"]["n_text"] == 2
    assert s["d0"]["n_images"] == 0
    assert s["d0"]["text_chars"] == len("hello world") + len("more text here")
    assert s["d0"]["chars_per_image"] is None
    assert s["d0"]["image_ratio"] == 0.0
    assert s["d5"]["n_spans"] == 2
    assert s["d5"]["n_text"] == 1  # table span in neither bucket
    assert s["d5"]["text_chars"] == 1


def test_stats_runs_and_leading(docs):
    s = _stats(docs)
    assert s["d1"]["leading_images"] == 2
    assert s["d1"]["max_image_run"] == 2
    assert s["d2"]["leading_images"] == 0
    assert s["d2"]["max_image_run"] == 3
    assert s["d3"]["leading_images"] == 2
    assert s["d3"]["max_image_run"] == 2
    assert s["d3"]["image_ratio"] == 1.0
    assert s["d4"]["n_spans"] == 0
    assert s["d4"]["max_image_run"] == 0
    assert s["d4"]["leading_images"] == 0
    assert s["d4"]["image_ratio"] == 0.0


def test_keep_col_rules(docs):
    kept = {
        r["doc_id"]: r["keep"]
        for r in interleaved_stats(docs)
        .select(
            "doc_id",
            interleaved_keep_col(
                min_text_chars=5,
                max_image_ratio=0.9,
                max_image_run=2,
                max_leading_images=1,
            ).alias("keep"),
        )
        .collect()
    }
    assert kept["d0"] is True
    assert kept["d1"] is False  # 2 leading images > 1
    assert kept["d2"] is False  # run of 3 > 2
    assert kept["d3"] is False  # ratio 1.0 and no text
    assert kept["d4"] is False  # no text
    assert kept["d6"] is False  # text_chars 1 < 5


def test_keep_col_is_single_stage(docs):
    plan = (
        interleaved_stats(docs)
        .where(interleaved_keep_col(min_text_chars=1))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hot_media_refs_doc_frequency(docs):
    hot = {
        r["media_ref"]: r["n_docs"]
        for r in hot_media_refs(docs, min_docs=2).collect()
    }
    # logo appears in d1 (twice -> counted once) and d3; 'a' in d2+d3
    assert hot == {"media://logo": 2, "media://a": 2}


def test_drop_hot_media_strips_and_renumbers(spark, docs):
    hot = hot_media_refs(docs, min_docs=2)
    out = {
        r["doc_id"]: r["spans"]
        for r in drop_hot_media(docs, hot).collect()
    }
    d1 = out["d1"]
    assert [s["kind"] for s in d1] == ["text", "image", "text"]
    assert [s["offset"] for s in d1] == [0, 1, 2]
    assert d1[1]["media_ref"] == "media://pic1"
    # d3 keeps only the non-hot 'b'? no — d3 has a (hot) and logo (hot)
    assert out["d3"] == []
    # NULL-ref image is kept
    assert [s["kind"] for s in out["d6"]] == ["text", "image"]
    # text spans untouched
    assert out["d0"][0]["text"] == "hello world"


def test_drop_hot_media_accepts_iterable_and_empty(spark, docs):
    out = {
        r["doc_id"]: r["spans"]
        for r in drop_hot_media(docs, ["media://a", "media://b"]).collect()
    }
    assert [s["kind"] for s in out["d2"]] == ["text", "image", "text"]
    assert out["d2"][1]["media_ref"] == "media://c"
    # empty hot set: arrays unchanged (modulo offset renumber = identity)
    same = {
        r["doc_id"]: r["spans"] for r in drop_hot_media(docs, []).collect()
    }
    assert same["d1"] == docs.where("doc_id='d1'").collect()[0]["spans"]


def test_drop_hot_media_refuses_oversized_set(docs):
    with pytest.raises(ValueError, match="min_docs"):
        drop_hot_media(docs, (f"r{i}" for i in range(MAX_HOT_REFS + 1)))


def test_hot_media_shuffle_carries_refs_only(docs):
    plan = (
        hot_media_refs(docs, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one exchange keyed by media_ref, with a partial aggregate below it
    assert plan.count("Exchange") == 1
    assert "media_ref" in plan.split("Exchange")[1]


def test_null_spans_counts_as_empty_doc(spark):
    # regression (r4-cont review): size(NULL) is -1 under Spark's
    # legacy sizeOfNull, so a failed-extraction row got n_spans=-1
    # and NULL fold stats that silently poisoned keep rules; NULL
    # spans must behave exactly like an empty array
    df = mk(spark, [("dnull", None), ("dempty", [])])
    s = {r["doc_id"]: r.asDict()
         for r in interleaved_stats(df).collect()}
    for k in ("n_spans", "n_text", "n_images", "text_chars",
              "max_image_run", "leading_images", "image_ratio",
              "chars_per_image"):
        assert s["dnull"][k] == s["dempty"][k], k
    assert s["dnull"]["n_spans"] == 0
    assert s["dnull"]["image_ratio"] == 0.0
    # keep rule evaluates to a deterministic boolean, not NULL
    kept = interleaved_stats(df).select(
        "doc_id", interleaved_keep_col().alias("keep")
    ).collect()
    assert all(r["keep"] is False for r in kept)


# ---------------------------------------------------------------------------
# span-level hygiene bridge (transform_span_text / pii_scrub_spans)
# ---------------------------------------------------------------------------

def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


SPAN_SCHEMA = (
    "doc_id long, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def test_pii_scrub_spans_matches_column_scrub(spark):
    """Bit-parity chain: scrubbing inside the spans array must equal
    the oracle-gated pii_scrub_col applied to each text span's text;
    media spans pass through byte-identical."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.corpus_hygiene import (
        pii_scrub_col,
    )
    from html_to_document_spark.operators.interleaved import (
        pii_scrub_spans,
    )

    rows = [
        (1, [
            _span("text", "mail me at a.b@ex.com now", None, 0),
            _span("image", None, "media://logo", 1),
            _span("text", "call (555) 123-4567 or 10.0.0.1", None, 2),
        ]),
        (2, [
            _span("image", None, "media://x", 0),
            _span("text", "clean text", None, 1),
        ]),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = pii_scrub_spans(df)
    got = {r["doc_id"]: (r["spans"], r["was_redacted"])
           for r in out.collect()}
    # media span untouched, offsets/kinds preserved
    assert got[1][0][1].asDict() == _span("image", None, "media://logo", 1)
    assert [s["offset"] for s in got[1][0]] == [0, 1, 2]
    # text spans equal the column scrub's output
    exploded = (
        df.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "text")
        .select("doc_id", F.col("s.offset").alias("off"),
                pii_scrub_col(F.col("s.text")).alias("t"))
    )
    expect = {(r["doc_id"], r["off"]): r["t"] for r in exploded.collect()}
    for doc_id, (spans, _) in got.items():
        for s in spans:
            if s["kind"] == "text":
                assert s["text"] == expect[(doc_id, s["offset"])]
    assert got[1][1] is True and got[2][1] is False


def test_transform_span_text_single_stage_plan(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.interleaved import (
        transform_span_text,
    )

    df = spark.createDataFrame(
        [(1, [_span("text", "a 1234567 b", None, 0)])], SPAN_SCHEMA
    )
    out = transform_span_text(
        df, lambda c: F.regexp_replace(c, "[0-9]+", "<NUM>"),
        flag_col="chg",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    row = out.collect()[0]
    assert row["spans"][0]["text"] == "a <NUM> b" and row["chg"] is True


def test_mojibake_spans_bridge(spark):
    from html_to_document_spark.operators.interleaved import (
        fix_mojibake_spans,
    )

    df = spark.createDataFrame(
        [(1, [_span("text", "cafÃ© crowd", None, 0),
              _span("image", None, "media://m", 1)])],
        SPAN_SCHEMA,
    )
    row = fix_mojibake_spans(df).collect()[0]
    assert row["spans"][0]["text"] == "café crowd"
    assert row["was_mojibake"] is True


def test_curate_interleaved_composed(spark):
    """Composed pipeline: encoding repair -> pii scrub -> logo strip ->
    stats -> keep, with the text-pipeline's repair-first ordering."""
    from html_to_document_spark.operators.interleaved import (
        curate_interleaved,
    )

    text = "cafÃ© and details a.b@ex.com " + "w " * 80
    rows = [
        # doc 1: survives — enough text, logo stripped
        (1, [_span("text", text, None, 0),
             _span("image", None, "media://logo", 1)]),
        # doc 2: same logo, text too short -> filtered by keep rule
        (2, [_span("text", "tiny", None, 0),
             _span("image", None, "media://logo", 1)]),
        # doc 3: image-only after logo strip -> filtered
        (3, [_span("image", None, "media://logo", 0)]),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = curate_interleaved(
        df,
        fix_encoding=True,
        scrub_pii=True,
        hot_media_min_docs=3,
        keep={"min_text_chars": 50},
    ).collect()
    assert [r["doc_id"] for r in out] == [1]
    spans = out[0]["spans"]
    # logo stripped, text repaired AND scrubbed
    assert all(s["kind"] == "text" for s in spans)
    assert "café" in spans[0]["text"] and "<EMAIL>" in spans[0]["text"]
    assert out[0]["n_images"] == 0


def test_materialize_packed_sequences(spark):
    from html_to_document_spark.operators.packing import (
        materialize_packed, pack_sequences,
    )

    rows = [(i, " ".join(f"d{i}w{j}" for j in range(4))) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_sequences(df, budget=8, num_partitions=1)
    seqs = materialize_packed(df, packed, sep=" <eod> ").collect()
    # every bin's text is its members' texts in ascending doc_id order
    by_bin = {}
    for r in packed.collect():
        by_bin.setdefault(r["bin_id"], []).append(r["doc_id"])
    assert len(seqs) == len(by_bin)
    texts = {str(i): t for i, t in rows}
    for r in seqs:
        # pack_sequences emits doc_id as string; sort as the operator
        # does (ascending id_col on the packed frame's own type)
        members = sorted(by_bin[r["bin_id"]])
        assert r["text"] == " <eod> ".join(texts[str(m)] for m in members)
        assert r["n_docs"] == len(members)
        assert r["n_tokens"] == 4 * len(members) <= 8


def test_span_scrub_null_spans_flag_false(spark):
    """NULL spans (failed extraction) -> unchanged row, flag FALSE not
    NULL (a NULL flag silently drops the row from boolean filters)."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.interleaved import (
        pii_scrub_spans,
    )

    df = spark.createDataFrame(
        [(1, None), (2, [_span("text", "a.b@ex.com", None, 0)])],
        SPAN_SCHEMA,
    )
    out = {r["doc_id"]: r for r in pii_scrub_spans(df).collect()}
    assert out[1]["spans"] is None and out[1]["was_redacted"] is False
    assert out[2]["was_redacted"] is True
    kept = pii_scrub_spans(df).filter(~F.col("was_redacted")).count()
    assert kept == 1  # doc 1 survives the negated filter


def test_span_lang_stats(spark):
    from html_to_document_spark.operators.interleaved import span_lang_stats

    def t(text):
        return ("text", text, None)

    rows = [
        # 2 en spans + 1 es span -> en plurality, 2 langs, frac 2/3
        (1, [t("the cat and the dog"), ("image", None, "m://x"),
             t("el perro de la casa"), t("of the house is big")]),
        # all spans agree
        (2, [t("the cat and the dog"), t("of the house is big")]),
        # gibberish -> und
        (3, [t("xyzzy plugh")]),
        # no text spans at all
        (4, [("image", None, "m://y")]),
        (5, None),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<"
        "kind:string,text:string,media_ref:string>>",
    )
    out = {r.doc_id: r for r in span_lang_stats(df).collect()}
    assert out[1].main_span_lang == "en"
    assert out[1].main_span_lang_n == 2 and out[1].n_span_langs == 2
    assert out[1].span_lang_frac == 0.6667
    assert out[2].main_span_lang == "en" and out[2].span_lang_frac == 1.0
    assert out[3].main_span_lang == "und" and out[3].n_span_langs == 1
    assert out[4].main_span_lang == "und"
    assert out[4].main_span_lang_n == 0 and out[4].span_lang_frac == 0.0
    assert out[5].main_span_lang == "und" and out[5].n_span_langs == 0
    # shuffle-free, Python-free plan
    plan = (
        span_lang_stats(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEval" not in plan and "BatchEval" not in plan


def test_curate_interleaved_span_lang_gate(spark):
    from html_to_document_spark.operators.interleaved import (
        curate_interleaved,
    )

    def t(text):
        return ("text", text, None, 0)

    rows = [
        # consistent english page
        (1, [t("the cat and the dog"), t("of the house is big")]),
        # half english / half spanish -> frac 0.5, dropped at 0.75
        (2, [t("the cat and the dog"), t("el perro de la casa")]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>",
    )
    kept = {
        r.doc_id
        for r in curate_interleaved(df, min_span_lang_frac=0.75).collect()
    }
    assert kept == {1}
    # without the gate both survive
    both = {r.doc_id for r in curate_interleaved(df).collect()}
    assert both == {1, 2}


def test_render_interleaved(spark):
    from html_to_document_spark.operators.interleaved import (
        render_interleaved,
    )

    df = mk(
        spark,
        [
            ("d0", [t("one two", 0), img("m://a", 1), t("three", 2),
                    img("m://b", 3)]),
            ("d1", [t("  ", 0), t(None, 1), t("solo", 2)]),
            ("d2", None),  # failed extraction upstream
        ],
    )
    out = {r["doc_id"]: r
           for r in render_interleaved(df, image_token_cost=10).collect()}
    r0 = out["d0"]
    assert r0["mm_text"] == "one two <image> three <image>"
    assert r0["mm_media_refs"] == ["m://a", "m://b"]
    assert r0["mm_text_tokens"] == 3
    assert r0["mm_tokens"] == 3 + 2 * 10
    # whitespace-only and NULL text spans count 0 tokens; the render
    # keeps their (empty) slots in sequence order
    r1 = out["d1"]
    assert r1["mm_text_tokens"] == 1 and r1["mm_tokens"] == 1
    assert r1["mm_media_refs"] == []
    # NULL spans: NULL render, 0 tokens, never a crash
    r2 = out["d2"]
    assert r2["mm_text"] is None and r2["mm_tokens"] == 0


def test_render_interleaved_shuffle_free(spark):
    from html_to_document_spark.operators.interleaved import (
        render_interleaved,
    )

    df = mk(spark, [("d0", [t("a b", 0), img("m://x", 1)])])
    plan = render_interleaved(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM array HOFs


def test_pack_interleaved(spark):
    from html_to_document_spark.operators.interleaved import (
        pack_interleaved,
    )

    # 12 docs x (5 text tokens + 1 image @ 15) = 20 mm tokens each;
    # budget 40 -> 2 docs per bin, 6 bins, nothing oversize
    rows = [
        (f"d{i}", [t("a b c d e", 0), img(f"m://{i}", 1)])
        for i in range(12)
    ]
    out = pack_interleaved(
        mk(spark, rows), budget=40, image_token_cost=15,
        num_partitions=2,
    ).collect()
    assert len(out) == 12
    assert all(r["n_tokens"] == 20 and not r["oversize"] for r in out)
    fills = {}
    for r in out:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    assert len(fills) == 6 and all(v == 40 for v in fills.values())


def test_image_caption_pairs(spark):
    from html_to_document_spark.core.extract import ExtractOptions
    from html_to_document_spark.operators.extract_spans import (
        extract_spans_from_html,
    )
    from html_to_document_spark.operators.interleaved import (
        image_caption_pairs,
    )

    html = (
        '<figure><img src="i1"><figcaption>below</figcaption></figure>'
        '<img src="i2" alt="alt wins"><figcaption>ignored</figcaption>'
        '<figure><figcaption>above</figcaption><img src="i3"></figure>'
        "<p>plain text</p><img src='i4'>"
        '<img src="i5" alt="">'  # empty alt falls through to none
        '<img src="i6">'  # first neighbor is an image, not a caption
    )
    df = spark.createDataFrame([("d", html)], "doc_id string, html string")
    out = image_caption_pairs(
        extract_spans_from_html(df, options=ExtractOptions(with_meta=True))
    )
    got = [
        (r["media_ref"], r["caption"], r["caption_source"])
        for r in out.orderBy("offset").collect()
    ]
    assert got == [
        ("i1", "below", "figcaption_after"),
        ("i2", "alt wins", "alt"),
        ("i3", "above", "figcaption_before"),
        ("i4", None, "none"),
        ("i5", None, "none"),
        ("i6", None, "none"),
    ]
    # after beats before when both neighbors are figcaptions
    html2 = ('<figure><figcaption>pre</figcaption><img src="m">'
             "<figcaption>post</figcaption></figure>")
    df2 = spark.createDataFrame([("d", html2)], "doc_id string, html string")
    row = image_caption_pairs(
        extract_spans_from_html(df2, options=ExtractOptions(with_meta=True))
    ).collect()[0]
    assert (row["caption"], row["caption_source"]) == (
        "post", "figcaption_after"
    )


def test_resolve_media_refs_and_caption_dataset(spark):
    from html_to_document_spark.core.extract import ExtractOptions
    from html_to_document_spark.operators.extract_spans import (
        extract_spans_from_html,
    )
    from html_to_document_spark.operators.interleaved import (
        build_caption_dataset,
        resolve_media_refs,
    )

    html = (
        '<figure><img src="img/cat.jpg">'
        "<figcaption>a cat photo</figcaption></figure>"
        '<img src="//cdn.example/dog.png" alt="a dog"><p>words</p>'
        '<img src="http://abs.example/x.gif" alt="ok">'
        '<img src="bare.webp">'  # uncaptioned: excluded from dataset
        '<img src="short.png" alt="x">'  # caption below min length
    )
    docs = spark.createDataFrame(
        [("d1", html), ("d2", "<img src='rel.png' alt='no url row'>")],
        "doc_id string, html string",
    )
    urls = spark.createDataFrame(
        [("d1", "http://site.example/a/page.html")],
        "doc_id string, url string",
    )
    spans = extract_spans_from_html(
        docs, options=ExtractOptions(with_meta=True)
    )
    fixed = resolve_media_refs(spans, urls)
    refs = {
        (row["doc_id"], r["offset"]): r["media_ref"]
        for row in fixed.collect()
        for r in row["spans"]
        if r["kind"] == "image"
    }
    assert refs[("d1", 0)] == "http://site.example/a/img/cat.jpg"
    assert refs[("d1", 2)] == "http://cdn.example/dog.png"
    assert refs[("d1", 4)] == "http://abs.example/x.gif"
    # no url row: ref kept verbatim
    assert refs[("d2", 0)] == "rel.png"
    # text spans untouched
    texts = [
        r["text"]
        for row in fixed.collect() if row["doc_id"] == "d1"
        for r in row["spans"] if r["kind"] == "text"
    ]
    assert "words" in texts

    ds = build_caption_dataset(spans, urls)
    got = sorted(
        (r["media_ref"], r["caption"], r["caption_source"])
        for r in ds.collect()
    )
    assert got == [
        ("http://cdn.example/dog.png", "a dog", "alt"),
        ("http://site.example/a/img/cat.jpg", "a cat photo",
         "figcaption_after"),
        # d2 has no url row: ref stays verbatim but the pair survives
        ("rel.png", "no url row", "alt"),
        # absent: bare.webp (no caption), x.gif ("ok" under the
        # 3-char minimum), short.png ("x" likewise)
    ]


def test_caption_never_leaks_across_figure_boundary(spark):
    """Review find: a figcaption must caption only images of ITS OWN
    figure — span adjacency alone mislabeled the neighbor."""
    from html_to_document_spark.core.extract import ExtractOptions
    from html_to_document_spark.operators.extract_spans import (
        extract_spans_from_html,
    )
    from html_to_document_spark.operators.interleaved import (
        image_caption_pairs,
    )

    html = (
        # uncaptioned img directly before a caption-first figure:
        # 'cat photo' belongs to img b only
        '<img src="a">'
        '<figure><figcaption>cat photo</figcaption><img src="b"></figure>'
        # two adjacent figures: captions stay within their own
        '<figure><img src="c"><figcaption>for c</figcaption></figure>'
        '<figure><figcaption>for d</figcaption><img src="d"></figure>'
        # orphan figcaption outside any figure captions nothing
        "<figcaption>orphan</figcaption><img src='e'>"
    )
    df = spark.createDataFrame([("d", html)], "doc_id string, html string")
    got = {
        r["media_ref"]: (r["caption"], r["caption_source"])
        for r in image_caption_pairs(
            extract_spans_from_html(
                df, options=ExtractOptions(with_meta=True)
            )
        ).collect()
    }
    assert got == {
        "a": (None, "none"),
        "b": ("cat photo", "figcaption_before"),
        "c": ("for c", "figcaption_after"),
        "d": ("for d", "figcaption_before"),
        "e": (None, "none"),
    }
