"""URL/domain filtering for crawl ingestion (the stage between a WARC
scan and extraction: drop blocklisted hosts before paying for parsing).

All JVM-side: host extraction is Spark's built-in ``parse_url``;
subdomain matching is an EQUI-join on exploded host SUFFIXES
(``a.b.example.com -> [a.b.example.com, b.example.com, example.com,
com]``), so a blocklist entry matches every subdomain through hash
joins — never an ``endswith`` theta-join (BroadcastNestedLoop,
O(rows x blocklist) compares).

100 TB shape: the suffix match runs on the corpus's DISTINCT HOST SET,
not its rows — hosts are orders of magnitude fewer than pages, so the
expensive semantics (explode + semi-join) touch a tiny frame, and the
result (hosts to drop) is broadcast back as a map-side anti-join on
host equality. The corpus itself is scanned once and never shuffled;
the only shuffle in the whole operator is the host ``distinct()``
(narrow: one string column).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame


def host_col(url_col: "Column | str") -> "Column":
    """Lower-cased host of a URL (codegen'd try_parse_url — a crawl
    corpus always contains malformed URLs; they yield NULL, never
    fail the job)."""
    from pyspark.sql import functions as F

    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def host_suffixes(host: "Column") -> "Column":
    """All dot-suffixes of a host as an array, e.g. ``a.b.example.com
    -> [a.b.example.com, b.example.com, example.com, com]`` (empty
    array for null/empty hosts)."""
    from pyspark.sql import functions as F

    def suffixes(hb):
        labels = F.split(hb, r"\.")
        k = F.size(labels)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(".", F.slice(labels, i, k)),
        )

    return F.when(
        host.isNull() | (host == ""), F.array().cast("array<string>")
    ).otherwise(
        # one-element-array transform = let-binding (split runs once)
        F.flatten(F.transform(F.array(host), suffixes))
    )


def blocked_hosts(
    df: "DataFrame",
    blocklist: "DataFrame",
    url_col: str = "url",
    domain_col: str = "domain",
) -> "DataFrame":
    """The corpus's distinct hosts that equal a blocklisted domain or
    are a subdomain of one — a one-column ``(host)`` frame, small by
    construction (distinct hosts << rows)."""
    from pyspark.sql import functions as F

    bl = F.broadcast(
        blocklist.select(
            F.lower(F.col(domain_col)).alias("_bl_domain")
        ).distinct()
    )
    hosts = (
        df.select(host_col(url_col).alias("host"))
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
        .distinct()
    )
    return (
        hosts.select("host", F.explode(host_suffixes(F.col("host"))).alias("_sfx"))
        .join(bl, F.col("_sfx") == F.col("_bl_domain"), "left_semi")
        .select("host")
        .distinct()
    )


def filter_blocked_domains(
    df: "DataFrame",
    blocklist: "DataFrame",
    url_col: str = "url",
    domain_col: str = "domain",
) -> "DataFrame":
    """Drop rows whose URL host equals a blocklisted domain or is a
    subdomain of one. ``blocklist`` is a one-column frame of bare
    domains (``example.com``). Keeps the input schema; the corpus is
    never shuffled (broadcast anti-join on host equality)."""
    from pyspark.sql import functions as F

    bad = F.broadcast(blocked_hosts(df, blocklist, url_col, domain_col))
    return df.join(
        bad, host_col(url_col) == bad["host"], "left_anti"
    )


def flag_blocked_domains(
    df: "DataFrame",
    blocklist: "DataFrame",
    url_col: str = "url",
    domain_col: str = "domain",
) -> "DataFrame":
    """Non-dropping variant: adds a boolean ``blocked`` column (audit /
    stats passes). Same broadcast host-set shape, via a map-side left
    join + null check."""
    from pyspark.sql import functions as F

    bad = F.broadcast(
        blocked_hosts(df, blocklist, url_col, domain_col).withColumn(
            "_hit", F.lit(True)
        )
    )
    out = df.join(bad, host_col(url_col) == bad["host"], "left")
    return out.select(
        *df.columns, F.coalesce("_hit", F.lit(False)).alias("blocked")
    )
