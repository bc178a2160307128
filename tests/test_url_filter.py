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


def _url_corpus(spark, per_host):
    """doc_ids 0..n assigned round-robin-ish: hosts with the given
    sizes, plus one malformed-URL row (NULL host, never capped)."""
    rows, did = [], 0
    for host, n in per_host.items():
        for _ in range(n):
            rows.append((did, f"http://{host}/p/{did}"))
            did += 1
    rows.append((did, "not a url at all"))
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_domain_share_min_id_exact(spark):
    """min_id selector keeps exactly max_docs smallest ids per
    over-cap host; under-cap hosts and NULL-host rows are untouched."""
    from html_to_document_spark.operators.url_filter import (
        cap_domain_share,
        domain_share_flags,
    )

    df = _url_corpus(spark, {"big.example.com": 10, "small.org": 3})
    out = {
        r.doc_id: r.keep_domain_capped
        for r in domain_share_flags(
            df, max_docs=4, selector="min_id"
        ).collect()
    }
    assert len(out) == 14
    assert [out[i] for i in range(10)] == [True] * 4 + [False] * 6
    assert all(out[i] for i in range(10, 14))  # small.org + NULL host
    kept = cap_domain_share(df, max_docs=4, selector="min_id")
    assert kept.columns == ["doc_id", "url"]
    assert kept.count() == 8


def test_domain_share_hash_rate(spark):
    """hash selector: under-cap hosts keep everything; an over-cap
    host keeps ~max_docs (Binomial) — deterministic per seed, and the
    kept set is a subset of the host's docs. rate = cap/n = 0.5 over
    n=400 -> P(outside [120, 280]) < 1e-15."""
    from html_to_document_spark.operators.url_filter import (
        domain_share_flags,
    )

    df = _url_corpus(spark, {"hot.net": 400, "cold.net": 5})
    out = domain_share_flags(df, max_docs=200, selector="hash", seed=7)
    kept_hot = out.filter(
        "keep_domain_capped and url like '%hot.net%'"
    ).count()
    assert 120 <= kept_hot <= 280
    assert out.filter(
        "not keep_domain_capped and url not like '%hot.net%'"
    ).count() == 0
    again = domain_share_flags(
        df.repartition(7), max_docs=200, selector="hash", seed=7
    )
    assert sorted(
        r.doc_id for r in again.filter("keep_domain_capped").collect()
    ) == sorted(
        r.doc_id for r in out.filter("keep_domain_capped").collect()
    )


def test_normalize_url(spark):
    """r5: URL canonicalization for URL-level dedup — host/scheme case,
    fragments, tracking params, param order, trailing slash; NULL for
    unparsable input; tracking-free query preserved sorted."""
    from html_to_document_spark.operators.url_filter import (
        normalize_url_col,
    )

    cases = [
        ("HTTP://WWW.Example.COM/Page/",
         "http://www.example.com/Page"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/#section-2", "http://example.com/"),
        ("http://example.com/a?utm_source=x&id=3&utm_campaign=y",
         "http://example.com/a?id=3"),
        ("http://example.com/a?b=2&a=1&fbclid=XYZ",
         "http://example.com/a?a=1&b=2"),
        ("http://example.com/a?utm_source=x&gclid=1",
         "http://example.com/a"),
        ("https://Host.org/x/y?z=1#frag", "https://host.org/x/y?z=1"),
        ("not a url at all", None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {r.i: r.n for r in df.select(
        "i", normalize_url_col("url").alias("n")
    ).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)

    # the normalized column IS the URL-dedup key: the first five rows
    # above collapse to 4 distinct pages via exact_dedup
    from html_to_document_spark.operators.dedup import exact_dedup

    pages = spark.createDataFrame(
        [(1, "http://example.com/a?utm_source=x&id=3"),
         (2, "http://example.com/a?id=3&gclid=z"),
         (3, "http://example.com/b")],
        "doc_id long, url string",
    )
    kept = exact_dedup(
        pages.withColumn("norm_url", normalize_url_col("url")),
        text_col="norm_url",
    )
    assert {r.doc_id for r in kept.collect()} == {1, 3}


def test_url_features(spark):
    from html_to_document_spark.operators.url_filter import url_features

    rows = [
        (1, "https://a.b.example.com/x/y/z.html?p=1&q=2#frag"),
        (2, "http://spam-01-deals.biz/"),
        (3, "http://192.168.0.1/admin"),
        (4, "http://example.org"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in url_features(df).collect()}
    r1 = out[1]
    assert r1.url_host_depth == 4
    assert r1.url_path_depth == 3 and r1.url_path_len == len("/x/y/z.html")
    assert r1.url_n_params == 2
    assert r1.url_has_fragment is True and r1.url_is_https is True
    assert r1.url_digit_ratio == 0.0 and r1.url_host_hyphens == 0
    r2 = out[2]
    assert r2.url_host_hyphens == 2
    assert r2.url_digit_ratio == round(2 / len("spam-01-deals.biz"), 4)
    assert r2.url_is_https is False and r2.url_n_params == 0
    r3 = out[3]
    # IP-literal host: 8 digits of 11 chars
    assert r3.url_digit_ratio == round(8 / 11, 4)
    assert r3.url_path_depth == 1
    r4_ = out[4]
    assert r4_.url_path_depth == 0 and r4_.url_n_params == 0
    assert r4_.url_has_fragment is False
    # NULL url: host features NULL, counts 0, no error
    assert out[5].url_host_depth is None
    assert out[5].url_path_depth == 0 and out[5].url_n_params == 0
    # shuffle-free, Python-free
    plan = url_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_resolve_href_col(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.url_filter import (
        resolve_href_col,
    )

    cases = [
        # same-directory, rooted, protocol-relative, subdir
        ("http://a.example/dir/page.html", "other.html",
         "http://a.example/dir/other.html"),
        ("http://a.example/dir/page.html", "/rooted/x",
         "http://a.example/rooted/x"),
        ("http://a.example/dir/page.html", "//cdn.example/lib.js",
         "http://cdn.example/lib.js"),
        ("https://a.example/dir/", "sub/two.html",
         "https://a.example/dir/sub/two.html"),
        # dot-segment folding, one and two levels
        ("http://a.example/dir/page.html", "../up.html",
         "http://a.example/up.html"),
        ("http://a.example/a/b/c.html", "../../top.html",
         "http://a.example/top.html"),
        ("http://a.example/dir/page.html", "./same.html",
         "http://a.example/dir/same.html"),
        # self-links: fragment-only and empty href -> base sans frag
        ("http://a.example/dir/page.html#frag", "#sec",
         "http://a.example/dir/page.html"),
        ("http://a.example/dir/page.html", "",
         "http://a.example/dir/page.html"),
        # absolute hrefs pass through (any scheme), even on a bad base
        ("http://a.example/d/p", "https://b.example/abs",
         "https://b.example/abs"),
        ("http://a.example/d/p", "mailto:x@y.z", "mailto:x@y.z"),
        ("not a url", "http://ok.example/x", "http://ok.example/x"),
        # authority keeps its port, lowercased; rootless base path
        ("http://A.Example:8080/dir/p", "x.html",
         "http://a.example:8080/dir/x.html"),
        ("http://a.example", "x.html", "http://a.example/x.html"),
        # NULL results: relative href on a bad base, NULL href
        ("not a url", "rel.html", None),
        ("http://a.example/d/p", None, None),
        # ../ underflow clamps at the root and NEVER eats the
        # authority (review find: '/a.example/../' must not fold)
        ("http://a.example/", "../x", "http://a.example/x"),
        ("http://a.example/dir/page.html", "../../x",
         "http://a.example/x"),
        ("http://a.example/d/p.html", "../../../../deep",
         "http://a.example/deep"),
        # query-only hrefs keep the base path (RFC 3986 §5.3 —
        # pagination links)
        ("http://h.example/dir/page.html", "?page=2",
         "http://h.example/dir/page.html?page=2"),
        ("http://h.example/dir/page.html?old=1", "?page=2",
         "http://h.example/dir/page.html?page=2"),
        ("http://h.example", "?q", "http://h.example/?q"),
        # absolute hrefs with dot segments fold, authority intact
        ("http://b.example/", "http://c.example/../b",
         "http://c.example/b"),
    ]
    df = spark.createDataFrame(
        [(b, h) for b, h, _ in cases], "base string, href string"
    )
    got = [
        r[0] for r in df.select(resolve_href_col("base", "href")).collect()
    ]
    assert got == [w for _, _, w in cases]

    # pure projection: no Exchange, no Python in the plan
    plan = df.select(
        resolve_href_col("base", "href")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
