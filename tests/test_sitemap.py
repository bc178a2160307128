"""Sitemap parsing (operators/sitemap.py): urlset + sitemapindex,
entity unescape, lastmod hints, frontier dedup."""

from pyspark.sql import functions as F

from html_to_document_spark.operators.sitemap import (
    seed_frontier,
    sitemap_entries,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://s.example/page?a=1&amp;b=2 </loc>
    <lastmod>2024-03-05</lastmod>
  </url>
  <url><loc>http://s.example/two</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://s.example/three</loc>
       <lastmod>2023-12-31T23:59:59+00:00</lastmod></url>
</urlset>"""

_INDEX = """<sitemapindex>
  <sitemap><loc>http://s.example/maps/a.xml</loc>
           <lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>http://s.example/maps/b.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_entries_urlset(spark):
    df = spark.createDataFrame([("d1", _URLSET)], "doc_id string, xml string")
    rows = sitemap_entries(df).orderBy("loc").collect()
    # the loc-less entry is dropped
    assert [(r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
        ("url", "http://s.example/page?a=1&b=2", "2024-03-05"),
        ("url", "http://s.example/three", "2023-12-31T23:59:59+00:00"),
        ("url", "http://s.example/two", None),
    ]
    assert rows[0]["doc_id"] == "d1"


def test_sitemap_entries_index_and_null(spark):
    df = spark.createDataFrame(
        [("i1", _INDEX), ("n1", None)], "doc_id string, xml string"
    )
    rows = sitemap_entries(df).orderBy("loc").collect()
    assert [(r["doc_id"], r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
        ("i1", "sitemap", "http://s.example/maps/a.xml", "2024-02-02"),
        ("i1", "sitemap", "http://s.example/maps/b.xml", None),
    ]


def test_sitemap_entity_unescape_order(spark):
    # &amp;lt; must decode to the literal '&lt;', not '<'
    xml = "<urlset><url><loc>http://s.example/x?q=&amp;lt;tag</loc></url></urlset>"
    df = spark.createDataFrame([("d", xml)], "doc_id string, xml string")
    assert sitemap_entries(df).collect()[0]["loc"] == (
        "http://s.example/x?q=&lt;tag"
    )


def test_sitemap_parse_is_jvm_only(spark):
    df = spark.createDataFrame([("d", _URLSET)], "doc_id string, xml string")
    plan = (
        sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_seed_frontier_dedup_and_cutoff(spark):
    xml = (
        "<urlset>"
        # same page twice under junk variations -> one frontier URL
        "<url><loc>HTTP://S.Example/p?utm_x=1&amp;a=2#f</loc>"
        "<lastmod>2024-05-01</lastmod></url>"
        "<url><loc>http://s.example/p?a=2</loc></url>"
        # stale entry drops under the cutoff; undated survives
        "<url><loc>http://s.example/old</loc>"
        "<lastmod>2020-01-01</lastmod></url>"
        "<url><loc>http://s.example/undated</loc></url>"
        # datetime lastmod compares by its date prefix
        "<url><loc>http://s.example/fresh</loc>"
        "<lastmod>2024-06-07T01:02:03Z</lastmod></url>"
        # index entries never enter the frontier
        "<sitemap><loc>http://s.example/maps/x.xml</loc></sitemap>"
        "</urlset>"
    )
    df = spark.createDataFrame([("d", xml)], "doc_id string, xml string")
    entries = sitemap_entries(df)
    got = sorted(
        r["url"] for r in seed_frontier(entries, min_lastmod="2024-01-01")
        .collect()
    )
    assert got == [
        "http://s.example/fresh",
        "http://s.example/p?a=2",
        "http://s.example/undated",
    ]
    # no cutoff: the stale page joins too
    assert seed_frontier(entries).count() == 4


def test_schedule_frontier_waves_and_delays(spark):
    from html_to_document_spark.operators.robots import (
        robots_crawl_delays,
    )
    from html_to_document_spark.operators.sitemap import (
        schedule_frontier,
    )

    urls = spark.createDataFrame(
        [("http://a.example/1",), ("http://a.example/2",),
         ("http://a.example/3",), ("http://b.example/x",),
         ("http://b.example/y",), ("not a url",)],
        "url string",
    )
    robots = spark.createDataFrame(
        [("a.example",
          "User-agent: *\nCrawl-delay: 2.5\nDisallow: /private"),
         ("b.example", "User-agent: *\nDisallow:"),  # no delay line
         ("c.example", "User-agent: *\nCrawl-delay: 99999"),  # clamps
         ("d.example", "User-agent: *\nCrawl-delay: junk")],
        "host string, robots_txt string",
    )
    delays = robots_crawl_delays(robots)
    got = {
        (r["host"], r["wave"]): r["not_before"]
        for r in schedule_frontier(urls, delays=delays).collect()
    }
    # per-host waves 0..n-1 in URL order; a.example honors 2.5s
    assert got[("a.example", 0)] == 0.0
    assert got[("a.example", 1)] == 2.5
    assert got[("a.example", 2)] == 5.0
    # b.example falls back to the 1.0s default
    assert got[("b.example", 0)] == 0.0
    assert got[("b.example", 1)] == 1.0
    # unparsable URL dropped
    assert len(got) == 5
    # hostile delay clamps at max_delay
    d = {r["host"]: r["crawl_delay"] for r in delays.collect()}
    assert d == {"a.example": 2.5, "c.example": 60.0}


def test_crawl_delay_agent_groups(spark):
    from html_to_document_spark.operators.robots import (
        robots_crawl_delays,
    )

    robots = spark.createDataFrame(
        [("x.example",
          "User-agent: bot\nCrawl-delay: 9\n\n"
          "User-agent: *\nCrawl-delay: 3")],
        "host string, robots_txt string",
    )
    star = robots_crawl_delays(robots).collect()[0]["crawl_delay"]
    bot = robots_crawl_delays(robots, agent="bot").collect()[0][
        "crawl_delay"
    ]
    assert (star, bot) == (3.0, 9.0)


def test_crawl_delay_group_formation_review_pins(spark):
    """Review pins: (a) an exact-agent group that declares NO delay
    means no delay — never fall back to '*'s hostile default; (b)
    unknown keys (Host:) end the header run exactly as the
    allow/disallow parser's groups do; (c) Crawl-delay: NaN/inf are
    rejected, not clamped into the scheduler."""
    from html_to_document_spark.operators.robots import (
        robots_crawl_delays,
    )

    robots = spark.createDataFrame(
        [
            # exempted bot: own group, no delay line
            ("h1", "User-agent: mybot\nDisallow:\n\n"
                   "User-agent: *\nCrawl-delay: 30"),
            # Host: ends the header run, so agents a and b are
            # SEPARATE groups and a has no delay
            ("h2", "User-agent: a\nHost: example.com\n"
                   "User-agent: b\nCrawl-delay: 5"),
            # hostile non-finite values rejected
            ("h3", "User-agent: *\nCrawl-delay: NaN"),
            ("h4", "User-agent: *\nCrawl-delay: inf"),
        ],
        "host string, robots_txt string",
    )
    star = {r["host"]: r["crawl_delay"]
            for r in robots_crawl_delays(robots).collect()}
    # h2 declares no '*' group at all -> omitted for agent '*'
    assert star == {"h1": 30.0}
    assert "h3" not in star and "h4" not in star

    mybot = {r["host"]: r["crawl_delay"]
             for r in robots_crawl_delays(robots, agent="mybot").collect()}
    assert "h1" not in mybot  # exempted: no delay, no fallback to 30

    a = {r["host"]: r["crawl_delay"]
         for r in robots_crawl_delays(robots, agent="a").collect()}
    assert "h2" not in a  # separate group, no delay

    b = {r["host"]: r["crawl_delay"]
         for r in robots_crawl_delays(robots, agent="b").collect()}
    assert b.get("h2") == 5.0
