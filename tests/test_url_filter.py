"""URL/domain filtering: suffix semantics, plan shape, WARC synergy."""

from pyspark.sql import functions as F

from html_to_document_spark.operators.url_filter import (
    blocked_hosts,
    filter_blocked_domains,
    flag_blocked_domains,
    host_col,
    host_suffixes,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "http://a.b.example.com/page?q=1"),
            (2, "https://example.com/"),
            (3, "http://example.com.evil.net/x"),   # NOT example.com
            (4, "https://notexample.com/y"),        # NOT a subdomain
            (5, "http://sub.blocked.org/z"),
            (6, "https://keep.io/ok"),
            (7, "not a url"),
        ],
        "doc_id long, url string",
    )


def _blocklist(spark):
    return spark.createDataFrame(
        [("example.com",), ("BLOCKED.org",)], "domain string"
    )


def test_host_suffixes(spark):
    out = spark.range(1).select(
        host_suffixes(F.lit("a.b.example.com")).alias("s"),
        host_suffixes(F.lit(None).cast("string")).alias("n"),
    ).first()
    assert out.s == ["a.b.example.com", "b.example.com", "example.com",
                     "com"]
    assert out.n == []


def test_filter_blocked_domains_suffix_semantics(spark):
    kept = {r.doc_id for r in filter_blocked_domains(
        _corpus(spark), _blocklist(spark)).collect()}
    # 1 (subdomain), 2 (exact), 5 (subdomain, case-folded) dropped;
    # 3 and 4 are lookalikes that must survive; 7 has no host
    assert kept == {3, 4, 6, 7}


def test_flag_blocked_domains(spark):
    flags = {r.doc_id: r.blocked for r in flag_blocked_domains(
        _corpus(spark), _blocklist(spark)).collect()}
    assert flags == {1: True, 2: True, 3: False, 4: False, 5: True,
                     6: False, 7: False}


def test_blocked_hosts_is_small_and_plan_is_broadcast(spark):
    df, bl = _corpus(spark), _blocklist(spark)
    hosts = {r.host for r in blocked_hosts(df, bl).collect()}
    assert hosts == {"a.b.example.com", "example.com", "sub.blocked.org"}
    plan = (filter_blocked_domains(df, bl)
            ._jdf.queryExecution().executedPlan().toString())
    # corpus side: broadcast anti-join, no sort-merge join anywhere
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_warc_to_url_filter_to_extraction(spark, tmp_path):
    """The crawl-ingestion front half end-to-end: WARC scan -> domain
    filter -> span extraction."""
    from tests.test_warc import _fixture
    from html_to_document_spark.sources.warc import read_warc
    from html_to_document_spark.operators.extract_spans import (
        exploded,
        extract_spans_from_html,
    )

    (tmp_path / "c.warc").write_bytes(_fixture())
    df = read_warc(spark, str(tmp_path))
    bl = spark.createDataFrame([("b.example",)], "domain string")
    kept = filter_blocked_domains(df, bl)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {"urn:uuid:r1", "urn:uuid:r3"}  # r2 was b.example/x
    spans = exploded(extract_spans_from_html(
        kept.filter(F.col("doc_id") == "urn:uuid:r1")))
    assert [r.text for r in spans.orderBy("offset").collect()] == [
        "Title", "body one"]
