"""Page-metadata extraction: title / meta description / OpenGraph /
published date / declared language over raw crawl HTML, plus the
recency filter and the declared-vs-detected language mismatch flag."""

from pyspark.sql import functions as F

from html_to_document_spark.operators.page_meta import (
    attach_page_meta,
    declared_lang_col,
    decode_entities_col,
    description_col,
    drop_stale,
    lang_mismatch_col,
    og_col,
    published_date_col,
    published_time_col,
    title_col,
)


def _vals(spark, html, col):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_title_trim_decode_and_absent(spark):
    assert (
        _vals(spark, "<head><title> A &amp; B &lt;ok&gt; </title></head>",
              title_col("html"))
        == "A & B <ok>"
    )
    # attributes on the tag, uppercase tag name
    assert _vals(spark, '<TITLE id="t">x</TITLE>', title_col("html")) == "x"
    assert _vals(spark, "<p>no title</p>", title_col("html")) is None
    assert _vals(spark, "<title>   </title>", title_col("html")) is None
    assert _vals(spark, None, title_col("html")) is None


def test_entity_decode_single_layer(spark):
    # '&amp;lt;' is an ESCAPED '&lt;' — one decode layer only
    assert _vals(
        spark, "<title>&amp;lt;tag&amp;gt; &quot;q&quot; &#39;a&#39;"
        "</title>", title_col("html")
    ) == "&lt;tag&gt; \"q\" 'a'"
    df = spark.createDataFrame([("&apos;y&apos;",)], "s string")
    assert df.select(
        decode_entities_col("s").alias("v")
    ).collect()[0]["v"] == "'y'"


def test_meta_description_both_orders(spark):
    a = '<meta name="description" content="first order">'
    b = '<meta content="second order" property="x" name="description">'
    b2 = '<meta content="reversed" name="description">'
    assert _vals(spark, a, description_col("html")) == "first order"
    assert _vals(spark, b2, description_col("html")) == "reversed"
    # name= of a DIFFERENT meta must not match
    assert _vals(
        spark, '<meta name="keywords" content="k">',
        description_col("html")
    ) is None
    assert _vals(spark, b, description_col("html")) == "second order"


def test_og_properties(spark):
    h = (
        '<meta property="og:title" content="OG Title">'
        '<meta content="http://img/x.png" property="og:image">'
    )
    assert _vals(spark, h, og_col("html", "title")) == "OG Title"
    assert _vals(spark, h, og_col("html", "image")) == "http://img/x.png"
    # og:title must not satisfy og:image (prefix discipline)
    assert _vals(
        spark, '<meta property="og:title" content="t">',
        og_col("html", "image")
    ) is None


def test_published_time_and_date(spark):
    h = ('<meta property="article:published_time" '
         'content="2024-03-15T08:30:00Z">')
    assert _vals(spark, h, published_time_col("html")) == (
        "2024-03-15T08:30:00Z"
    )
    assert _vals(spark, h, published_date_col("html")) == "2024-03-15"
    # bare date, no time part
    h2 = '<meta property="article:published_time" content="2020-01-02">'
    assert _vals(spark, h2, published_date_col("html")) == "2020-01-02"
    # garbage date -> NULL, absent -> NULL
    h3 = '<meta property="article:published_time" content="yesterday">'
    assert _vals(spark, h3, published_date_col("html")) is None
    assert _vals(spark, "<p>x</p>", published_date_col("html")) is None


def test_declared_lang_primary_subtag(spark):
    assert _vals(spark, '<html lang="en-US"><p>x</p>',
                 declared_lang_col("html")) == "en"
    assert _vals(spark, "<html LANG='DE'>", declared_lang_col("html")) \
        == "de"
    assert _vals(spark, "<html><p>x</p>", declared_lang_col("html")) is None
    # lang= on a non-html tag must not match
    assert _vals(spark, '<p lang="fr">x</p>',
                 declared_lang_col("html")) is None


def test_lang_mismatch_flag(spark):
    df = spark.createDataFrame(
        [("en", "en"), ("en", "de"), (None, "en"), ("en", None),
         (None, None)],
        "decl string, det string",
    )
    got = [
        r["m"]
        for r in df.select(
            lang_mismatch_col("decl", "det").alias("m")
        ).collect()
    ]
    assert got == [False, True, False, False, False]


def test_attach_and_drop_stale(spark):
    def page(day):
        t = (f'<meta property="article:published_time" '
             f'content="{day}T00:00:00Z">') if day else ""
        return f'<html lang="en"><title>t</title>{t}<p>body</p>'

    df = spark.createDataFrame(
        [(1, page("2019-12-31")), (2, page("2020-01-01")),
         (3, page(None)), (4, None)],
        "doc_id long, html string",
    )
    out = attach_page_meta(df)
    assert {"page_title", "meta_description", "og_title", "og_image",
            "published_date", "declared_lang"} <= set(out.columns)
    kept = {r["doc_id"]
            for r in drop_stale(df, "2020-01-01").collect()}
    # provably-old dropped; on-cutoff, undated and NULL-html kept
    assert kept == {2, 3, 4}
