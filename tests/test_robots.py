"""robots.txt parsing + URL allow/deny (operators/robots.py):
RFC 9309 semantics — group merge, agent selection, longest-match,
tie-to-allow, $ anchor, * wildcard, empty Disallow — plus the Spark
plan contract (corpus never shuffles; broadcast join + array HOFs)."""

import pytest


def _rules(txt, agent="*"):
    from html_to_document_spark.operators.robots import parse_robots_txt

    return parse_robots_txt(txt, agent)


def test_parser_groups_merge_and_agent_selection():
    txt = (
        "User-agent: GoogleBot\n"
        "Disallow: /a/\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /b/\n"
        "\n"
        "User-agent: googlebot\n"  # second group for same agent MERGES
        "Allow: /a/ok\n"
    )
    got = _rules(txt, "googlebot")
    assert ("^/a/", 3, False) in got and ("^/a/ok", 5, True) in got
    assert all("/b/" not in r[0] for r in got)
    # unknown agent falls back to the * group
    assert _rules(txt, "otherbot") == [("^/b/", 3, False)]


def test_parser_shared_header_comments_empty_disallow():
    txt = (
        "# banner comment\n"
        "User-agent: a\n"
        "User-agent: b\n"      # two agents share one rule block
        "Disallow: /x  # trailing comment\n"
        "Crawl-delay: 10\n"    # unknown key ends the header run only
        "Allow: /x/pub\n"
        "User-agent: c\n"
        "Disallow:\n"          # empty value == no rule
    )
    for agent in ("a", "b"):
        assert _rules(txt, agent) == [
            ("^/x", 2, False), ("^/x/pub", 6, True)
        ]
    assert _rules(txt, "c") == []
    assert _rules("", "x") == []
    assert _rules(None, "x") == []


def test_pattern_wildcard_and_anchor():
    from html_to_document_spark.operators.robots import _pattern_to_regex

    assert _pattern_to_regex("/a*b$") == "^/a.*b$"
    assert _pattern_to_regex("/p") == "^/p"
    # regex metachars in the path stay literal
    assert _pattern_to_regex("/a.b+c") == "^/a\\.b\\+c"
    # only a TRAILING $ anchors; an interior one is literal
    assert _pattern_to_regex("/a$b") == "^/a\\$b"


def test_spark_verdicts_longest_match_tie_allow(spark):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.robots import (
        compile_robots,
        filter_robots_disallowed,
        robots_allowed,
    )

    robots = spark.createDataFrame(
        [
            # /private/ disallowed but the longer Allow carves out pub
            ("a.com",
             "User-agent: *\nDisallow: /private/\nAllow: /private/pub"),
            # total block
            ("b.com", "User-agent: *\nDisallow: /"),
            # length TIE between Allow and Disallow -> Allow wins
            ("t.com", "User-agent: *\nDisallow: /dir\nAllow: /dir"),
            # $ anchor: /exact blocked, /exactly fine
            ("e.com", "User-agent: *\nDisallow: /exact$"),
            # wildcard: any path containing /tmp/ segment
            ("w.com", "User-agent: *\nDisallow: /*/tmp/"),
        ],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [
            (1, "http://a.com/private/secret"),
            (2, "http://a.com/private/pub/x"),
            (3, "http://b.com/anything"),
            (4, "http://t.com/dir/page"),
            (5, "http://e.com/exact"),
            (6, "http://e.com/exactly"),
            (7, "http://w.com/a/tmp/f"),
            (8, "http://w.com/tmp-top"),
            (9, "http://norules.org/z"),
            (10, "not a url"),
        ],
        "doc_id long, url string",
    )
    out = robots_allowed(docs, compile_robots(robots))
    got = {r["doc_id"]: r["robots_allowed"] for r in out.collect()}
    assert got == {
        1: False, 2: True, 3: False, 4: True, 5: False,
        6: True, 7: False, 8: True, 9: True, 10: True,
    }
    kept = filter_robots_disallowed(docs, robots)
    assert sorted(r["doc_id"] for r in kept.collect()) == [
        2, 4, 6, 8, 9, 10,
    ]
    assert "robots_allowed" not in kept.columns
    # plan contract: the corpus side never shuffles — the only join is
    # a broadcast hash join, and the verdict is an array-HOF projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    corpus_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_side


def test_spark_agent_specific_group(spark):
    from html_to_document_spark.operators.robots import (
        compile_robots,
        robots_allowed,
    )

    robots = spark.createDataFrame(
        [("c.com",
          "User-agent: bot\nDisallow: /x\n\nUser-agent: *\nDisallow:")],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [(1, "http://c.com/x"), (2, "http://c.com/y")],
        "doc_id long, url string",
    )
    star = robots_allowed(docs, compile_robots(robots, agent="*"))
    bot = robots_allowed(docs, compile_robots(robots, agent="bot"))
    assert {r["doc_id"]: r["robots_allowed"] for r in star.collect()} == {
        1: True, 2: True,
    }
    assert {r["doc_id"]: r["robots_allowed"] for r in bot.collect()} == {
        1: False, 2: True,
    }


def test_compile_rule_cap_keeps_winning_rules(spark):
    from html_to_document_spark.operators.robots import compile_robots

    # 3 rules, cap 2: the two LONGEST survive (they are the only ones
    # that can win longest-match), tie-break prefers Disallow first in
    # the sort but both sides of a tie are kept under any sane cap
    txt = (
        "User-agent: *\nDisallow: /a\nDisallow: /longer/rule\n"
        "Allow: /mid\n"
    )
    robots = spark.createDataFrame(
        [("h.com", txt)], "host string, robots_txt string"
    )
    rules = compile_robots(robots, max_rules_per_host=2).collect()[0][
        "rules"
    ]
    assert [r["plen"] for r in rules] == [12, 4]


def test_robots_sitemaps_discovery(spark):
    from html_to_document_spark.operators.robots import robots_sitemaps

    rows = [
        ("a.example",
         "User-agent: *\nDisallow: /x\n"
         "Sitemap: http://a.example/sitemap.xml\n"
         "  sitemap:\thttp://a.example/news.xml # archive\n"
         "# Sitemap: http://a.example/commented-out.xml\n"),
        ("b.example", "User-agent: *\nDisallow:\n"),
        ("c.example", None),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = sorted(
        (r["host"], r["sitemap_url"]) for r in robots_sitemaps(df).collect()
    )
    assert got == [
        ("a.example", "http://a.example/news.xml"),
        ("a.example", "http://a.example/sitemap.xml"),
    ]
    plan = (
        robots_sitemaps(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
