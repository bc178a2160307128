"""Head-directive curation: robots-noindex detection, canonical-URL
extraction, and canonical-key mirror dedup over raw crawl HTML."""

from pyspark.sql import functions as F

from html_to_document_spark.operators.html_head import (
    canonical_dedup,
    canonical_url_col,
    drop_noindex,
    head_directive_cols,
    robots_noindex_col,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, html string"
    )


def test_noindex_detection_variants(spark):
    rows = [
        (1, "u", '<head><meta name="robots" content="noindex"></head>'),
        (2, "u", "<meta NAME='ROBOTS' CONTENT='NOINDEX, nofollow'/>"),
        (3, "u", '<meta content="noindex,follow" name="robots">'),
        (4, "u", '<meta name="robots" content="index, follow">'),
        (5, "u", '<meta name="viewport" content="noindex">'),  # not robots
        (6, "u", "<p>plain noindex text</p>"),
        (7, "u", None),  # binary/PDF record sharing the frame
    ]
    got = {
        r["doc_id"]: r["f"]
        for r in _df(spark, rows)
        .select("doc_id", robots_noindex_col("html").alias("f"))
        .collect()
    }
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False,
                   6: False, 7: False}
    kept = {r["doc_id"] for r in drop_noindex(_df(spark, rows)).collect()}
    assert kept == {4, 5, 6, 7}


def test_canonical_extraction_variants(spark):
    rows = [
        (1, "u", '<link rel="canonical" href="http://a.com/x">'),
        (2, "u", "<LINK HREF='http://b.com/y' REL='canonical'/>"),
        (3, "u", '<link rel="stylesheet" href="http://c.com/z.css">'),
        (4, "u", "<p>no links</p>"),
        (5, "u", None),
    ]
    got = {
        r["doc_id"]: r["c"]
        for r in _df(spark, rows)
        .select("doc_id", canonical_url_col("html").alias("c"))
        .collect()
    }
    assert got == {1: "http://a.com/x", 2: "http://b.com/y",
                   3: None, 4: None, 5: None}


def test_canonical_dedup_collapses_mirrors(spark):
    canon = '<link rel="canonical" href="http://site.com/article">'
    rows = [
        # three mirrors of one article: print view, session id, m-dot
        (1, "http://site.com/article?print=1", f"<p>a</p>{canon}"),
        (2, "http://site.com/article;jsid", f"<p>b</p>{canon}"),
        (3, "http://m.site.com/article", f"<p>c</p>{canon}"),
        # no canonical: dedups on its OWN normalized url — tracking
        # params collapse (4 and 5 are one page)
        (4, "http://other.com/p?utm_source=x&a=1", "<p>d</p>"),
        (5, "http://OTHER.com/p?a=1#frag", "<p>e</p>"),
        # unparsable url, no canonical: never deduped
        (6, "not a url", "<p>f</p>"),
        (7, "not a url", "<p>g</p>"),
    ]
    kept = {r["doc_id"] for r in canonical_dedup(_df(spark, rows)).collect()}
    assert kept == {1, 4, 6, 7}
    out = canonical_dedup(_df(spark, rows))
    assert out.columns == ["doc_id", "url", "html"]  # key col dropped


def test_head_directive_cols_one_projection(spark):
    rows = [(1, "u", '<meta name="robots" content="noindex">'
                     '<link rel="canonical" href="http://a.com/">')]
    out = head_directive_cols(_df(spark, rows)).first()
    assert out["robots_noindex"] is True
    assert out["canonical_url"] == "http://a.com/"
    plan = (
        head_directive_cols(_df(spark, rows))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_base_href_and_resolution_composition(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.html_head import base_href_col
    from html_to_document_spark.operators.url_filter import (
        resolve_href_col,
    )

    rows = [
        # absolute base redirects relative links off-page
        ("http://a.example/dir/p.html",
         '<base href="http://cdn.example/assets/">x', "img/i.png",
         "http://cdn.example/assets/img/i.png"),
        # relative base resolves against the document URL first
        ("http://a.example/dir/p.html",
         "<base href=sub/>x", "f.css",
         "http://a.example/dir/sub/f.css"),
        # no base element: plain document-relative resolution
        ("http://a.example/dir/p.html", "<p>no base</p>", "f.css",
         "http://a.example/dir/f.css"),
        # NULL html (binary rows sharing the frame): document URL
        ("http://a.example/dir/p.html", None, "f.css",
         "http://a.example/dir/f.css"),
    ]
    df = spark.createDataFrame(
        [(u, h, r) for u, h, r, _ in rows],
        "url string, html string, href string",
    )
    base = F.coalesce(
        resolve_href_col("url", base_href_col("html")), F.col("url")
    )
    got = [
        r[0]
        for r in df.select(resolve_href_col(base, "href")).collect()
    ]
    assert got == [w for _, _, _, w in rows]
    assert df.select(base_href_col("html")).collect()[2][0] is None
