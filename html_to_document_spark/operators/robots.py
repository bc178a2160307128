"""robots.txt parsing and URL allow/deny for crawl curation — the
politeness/compliance half of the crawl-side family (the reference's
scope stops at per-page conversion; a crawl pipeline must also decide
which URLs it was ALLOWED to keep. CommonCrawl honors robots.txt at
fetch time and re-checks at processing time; curation recipes built
on it — C4, RefinedWeb — inherit the filter).

Semantics follow RFC 9309 (Koster et al. 2022) with Google's
documented extensions, the de-facto web dialect:

- groups of ``User-agent`` lines share the rule block that follows;
  a ``User-agent`` line after rules starts a new group; multiple
  groups for the same agent MERGE (RFC 9309 §2.2.1);
- the group chosen for a crawler is the case-insensitive exact agent
  match when one exists, else the ``*`` group (we implement exact —
  not longest-prefix — product-token matching; document crawlers in
  this pipeline pass their own token);
- ``Allow``/``Disallow`` values are path patterns: ``*`` matches any
  octet sequence, a TRAILING ``$`` anchors the end, everything else
  is literal prefix matching;
- the rule that applies is the MOST SPECIFIC match (longest pattern);
  on a length tie the ``Allow`` wins (RFC 9309 §2.2.2);
- no group, no matching rule, or an empty ``Disallow:`` value →
  allowed (the default is permissive).

Percent-decoding of patterns/paths and ``Crawl-delay`` are out of
scope (both engines would need identical URL canonicalization first;
``url_filter.normalize_url_col`` is the place that owns it).

100 TB shape: robots.txt rows number ONE PER HOST — orders of
magnitude below the corpus — and parsing them is the only Python in
the operator (one Arrow-batched ``mapInPandas`` over the hosts
frame, the same budget class as the model fits). The compiled rules
aggregate to ONE short row per host (an array of (regex, len,
allow) structs, ``max_rules_per_host``-capped) and broadcast; the
corpus itself is touched by a single broadcast hash join on host
plus a pure array-HOF projection (``regexp_like`` inside a
``filter`` lambda + ``array_max`` struct argmax — longest-match,
tie-to-allow, JVM-side). The corpus never shuffles and no per-row
Python runs on it.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

# a compiled-rules frame bigger than this refuses to broadcast —
# same guard philosophy as url_filter.MAX_HOT_DOMAINS
MAX_RULE_HOSTS = 5_000_000


def _pattern_to_regex(pattern: str) -> str:
    """robots path pattern -> Java/RE2-common regex: ``*`` -> ``.*``,
    one TRAILING ``$`` -> end anchor, all else literal; anchored at
    the start (prefix semantics come from the anchor + no trailing
    wildcard)."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def parse_robots_txt(text: str, agent: str = "*") -> list[tuple]:
    """Pure-Python single-document parser (the executable spec the
    Spark stage maps over): robots.txt body -> [(regex, pattern_len,
    allow)] for ``agent``, merged across that agent's groups. Exact
    case-insensitive agent match wins over the ``*`` group."""
    groups: dict[str, list] = {}
    current_agents: list[str] = []
    in_header = True
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_header:
                current_agents = []
            in_header = True
            current_agents.append(value.lower())
            for a in current_agents:
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            in_header = False
            if not value:
                # empty Disallow == allow everything == no rule;
                # empty Allow is likewise a no-op
                continue
            for a in current_agents:
                groups.setdefault(a, []).append(
                    (
                        _pattern_to_regex(value),
                        len(value),
                        key == "allow",
                    )
                )
        else:
            # sitemap / crawl-delay / unknown keys end the header run
            # but do not end the group (RFC 9309 treats them as
            # non-group lines)
            if key != "sitemap":
                in_header = False
    rules = groups.get(agent.lower())
    if rules is None:
        rules = groups.get("*", [])
    return rules


def compile_robots(
    robots: "DataFrame",
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
    max_rules_per_host: int = 1024,
) -> "DataFrame":
    """(host, robots_txt) -> (host, rules array<struct<rx, plen,
    allow>>) for ``agent``. One Arrow-batched mapInPandas over the
    hosts-sized frame (the only Python in the family); rules beyond
    ``max_rules_per_host`` are dropped longest-first-SAFE — they are
    sorted by (plen desc, allow asc) before the cap, so the rules
    that can WIN longest-match are the ones kept."""
    import pandas as pd
    from pyspark.sql import functions as F

    out_schema = (
        "host string, rules array<struct<rx:string,plen:int,"
        "allow:boolean>>"
    )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for h, t in zip(pdf[host_col], pdf[text_col]):
                rules = parse_robots_txt(t, agent)
                rules.sort(key=lambda r: (-r[1], r[2]))
                rows.append((h, rules[:max_rules_per_host]))
            yield pd.DataFrame(rows, columns=["host", "rules"])

    return (
        robots.select(host_col, text_col)
        .mapInPandas(_parse, schema=out_schema)
        .filter(F.size("rules") > 0)
    )


def robots_allowed(
    docs: "DataFrame",
    compiled: "DataFrame",
    url_col: str = "url",
    out_col: str = "robots_allowed",
) -> "DataFrame":
    """Annotate every row with the RFC 9309 verdict for its URL under
    the compiled rules: longest matching pattern wins, tie goes to
    Allow, hosts without rules (or URLs whose host/path don't parse)
    are allowed.

    The corpus never shuffles: ``compiled`` (one short row per host
    with rules) broadcast-joins on host and the verdict is a pure
    array-HOF projection — ``filter`` with a ``regexp_like`` lambda
    selects the matching rules, ``array_max`` over (plen, allow)
    structs is the longest-match/tie-allow argmax."""
    from pyspark.sql import functions as F

    from .url_filter import host_col as _host_col

    n = compiled.limit(MAX_RULE_HOSTS + 1).count()
    if n > MAX_RULE_HOSTS:
        raise ValueError(
            f"compiled robots rules cover > {MAX_RULE_HOSTS} hosts; "
            "too large to broadcast — pre-filter to the corpus's "
            "distinct hosts (join the rules frame against "
            "docs.select(host).distinct()) or raise MAX_RULE_HOSTS"
        )
    path = F.coalesce(
        F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")
    )
    joined = docs.withColumn("_rhost", _host_col(url_col)).join(
        F.broadcast(compiled.withColumnRenamed("host", "_rhost")),
        "_rhost",
        "left",
    )
    matched = F.filter(
        F.col("rules"),
        lambda r: F.regexp_like(F.col("_path"), r["rx"]),
    )
    winner = F.array_max(
        F.transform(
            F.col("_matched"),
            lambda r: F.struct(
                r["plen"].alias("plen"), r["allow"].alias("allow")
            ),
        )
    )
    return (
        joined.withColumn("_path", path)
        .withColumn("_matched", matched)
        .withColumn(
            out_col,
            F.when(F.col("rules").isNull(), F.lit(True))
            .when(F.size("_matched") == 0, F.lit(True))
            .otherwise(winner["allow"]),
        )
        .drop("_rhost", "_path", "_matched", "rules")
    )


def filter_robots_disallowed(
    docs: "DataFrame",
    robots: "DataFrame",
    agent: str = "*",
    url_col: str = "url",
) -> "DataFrame":
    """Drop rows whose URL the host's robots.txt disallows for
    ``agent`` — compile + annotate + filter in one call (the crawl
    pipeline's entry point)."""
    compiled = compile_robots(robots, agent)
    out = robots_allowed(docs, compiled, url_col)
    return out.filter(out["robots_allowed"]).drop("robots_allowed")


def robots_sitemaps(
    df: "DataFrame",
    robots_col: str = "robots_txt",
) -> "DataFrame":
    """Sitemap discovery from robots.txt (RFC 9309 §2.3's non-group
    ``Sitemap:`` record — the standard place a site declares its
    sitemaps, and where real crawlers find them): all original
    columns except ``robots_col`` plus one ``sitemap_url`` row per
    declared sitemap. Pure JVM — one (?im) line-anchored
    ``regexp_extract_all`` + explode, zero Python, zero shuffle.
    Fetch the URLs and hand the payloads to
    ``operators.sitemap.sitemap_entries`` -> ``seed_frontier`` to
    close the discovery loop. Hosts with no Sitemap line contribute
    zero rows (as does NULL robots text)."""
    from pyspark.sql import functions as F

    keep = [c for c in df.columns if c != robots_col]
    urls = F.regexp_extract_all(
        F.col(robots_col), F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), 1
    )
    return df.select(
        *keep, F.explode(urls).alias("sitemap_url")
    ).filter(F.col("sitemap_url") != "")


def robots_crawl_delays(
    df: "DataFrame",
    robots_col: str = "robots_txt",
    agent: str = "*",
    max_delay: float = 60.0,
) -> "DataFrame":
    """Per-host ``Crawl-delay`` extraction -> (host…, crawl_delay
    double). Non-standard but honored by most crawlers; group
    FORMATION and selection mirror ``parse_robots_txt`` exactly —
    the same User-agent runs, the same header-ending keys (any
    non-group key except Sitemap), and the same
    exact-agent-over-``*`` rule, under which an exact-agent group
    that declares NO delay means "no delay for this bot" rather than
    falling back to ``*``'s (a site that exempts its own bot must not
    inherit the hostile default). Values clamp to ``max_delay`` and
    reject non-finite input (``Crawl-delay: NaN`` would otherwise
    poison every not_before the scheduler derives); hosts without a
    delay for the selected group are omitted (callers coalesce their
    own default). Runs in the same Arrow-batched stage shape as
    ``compile_robots``."""
    import math

    import pandas as pd

    keep = [c for c in df.columns if c != robots_col]

    def delay_of(text: str | None) -> float | None:
        groups: dict[str, float | None] = {}
        current: list[str] = []
        in_header = True
        for raw in (text or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not in_header:
                    current = []
                in_header = True
                current.append(value.lower())
                for a in current:
                    groups.setdefault(a, None)
            elif key == "crawl-delay":
                in_header = False
                try:
                    d = float(value)
                except ValueError:
                    continue
                if not math.isfinite(d) or d < 0:
                    continue
                for a in current:
                    if groups.get(a) is None:
                        groups[a] = min(d, max_delay)
            elif key in ("allow", "disallow"):
                in_header = False
            elif key != "sitemap":
                in_header = False
        a = agent.lower()
        return groups[a] if a in groups else groups.get("*")

    def fn(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            out["crawl_delay"] = [
                delay_of(t) for t in pdf[robots_col]
            ]
            yield out

    in_schema = df.select(*keep).schema
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields
    ) + ", crawl_delay double"
    return df.mapInPandas(fn, schema).filter(
        "crawl_delay is not null"
    )
