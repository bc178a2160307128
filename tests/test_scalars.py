import pytest

from html_to_document_spark.functions.scalars import (
    color_normalize,
    css_len_px,
    image_type_col,
    image_type_parse,
)


def test_color_normalize():
    assert color_normalize("#ff00aa") == "FF00AA"
    assert color_normalize("ff00aa") == "FF00AA"
    assert color_normalize("#abc") == "AABBCC"
    assert color_normalize("red") == "FF0000"
    assert color_normalize("grey") == "808080"
    # full CSS named-color table (VERDICT r1): names beyond the old
    # 24-entry subset must resolve, not fall back to 000000
    assert color_normalize("tomato") == "FF6347"
    assert color_normalize("rebeccapurple") == "663399"
    assert color_normalize("DodgerBlue") == "1E90FF"
    assert color_normalize("lightgoldenrodyellow") == "FAFAD2"
    assert color_normalize("notacolor") == "000000"
    assert color_normalize(None) == "000000"


def test_css_len_px():
    assert css_len_px("10px") == 10.0
    assert css_len_px("10") == 10.0
    assert css_len_px(12) == 12.0
    assert css_len_px("1in") == 96.0
    assert css_len_px("2.54cm") == 96.0
    assert css_len_px("72pt") == 96.0
    assert css_len_px("bogus") is None


def test_image_type_parse():
    assert image_type_parse("data:image/png;base64,AAAA") == "png"
    assert image_type_parse("data:image/jpeg;base64,AAAA") == "jpg"
    assert image_type_parse("data:image/svg+xml,<svg/>") == "svg"
    assert image_type_parse("http://x/y.JPEG?w=1") == "jpg"
    assert image_type_parse("media://abcdef") is None
    assert image_type_parse("file.webp") is None  # not whitelisted


def test_image_type_col_matches_python(spark):
    refs = [
        "data:image/png;base64,AAAA",
        "data:image/jpeg;base64,AAAA",
        "data:image/svg+xml,<svg/>",
        "http://x/y.gif",
        "a/b.BMP",
        "media://abcdef",
        "file.webp",
    ]
    df = spark.createDataFrame([(r,) for r in refs], "ref string")
    got = [r.t for r in df.select(image_type_col("ref").alias("t")).collect()]
    assert got == [image_type_parse(r) for r in refs]


def test_outlinks_and_link_stats(spark):
    from pyspark.sql import functions as F
    from html_to_document_spark.functions.scalars import (
        link_stats_cols,
        outlinks_col,
    )

    df = spark.createDataFrame(
        [(1, '<a href="/a">x</a><a href=\'/a\'>y</a>'
             '<a href="https://e.com/b">z</a><p>href = nope</p>')],
        "doc_id long, html string",
    )
    row = df.select(
        outlinks_col(F.col("html")).alias("links"),
        *[v.alias(k) for k, v in link_stats_cols(F.col("html")).items()],
    ).first()
    assert sorted(row.links) == ["/a", "/a", "https://e.com/b"]
    assert row.n_links == 3
    assert row.n_unique_links == 2
    assert row.n_absolute_links == 1
