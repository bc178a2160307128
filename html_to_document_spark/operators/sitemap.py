"""Sitemap ingestion: parse sitemap.org XML (urlset + sitemapindex)
into a URL frontier frame — the crawl-side discovery channel next to
the link graph (``operators/link_graph.py`` finds URLs the web links
TO; sitemaps are the URLs a site itself declares, with freshness
hints). The reference has no crawl surface; scope here follows the
public sitemaps.org protocol the way ``operators/robots.py`` follows
RFC 9309.

Spark shape: parsing is pure JVM Column work — one
``regexp_extract_all`` per record type ((?s) dotall patterns, valid
verbatim in Java regex and RE2), per-block ``<loc>``/``<lastmod>``
extraction inside an array ``transform``, a replace-chain entity
unescape (the protocol REQUIRES escaped URLs, so ``&amp;`` is the
norm, not the exception), then ONE explode. Zero Python, zero
shuffle until the frontier dedup's digest exchange. A 50 k-URL
sitemap explodes inside the scan task; nothing re-shuffles XML text.

Out of scope, documented: gzip sitemap payloads (decompress at the
source read, as ``sources/warc.py`` does), RSS/Atom feeds, and
attribute-carrying ``<url>`` tags (the protocol defines none).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

__all__ = ["sitemap_entries", "seed_frontier", "schedule_frontier"]


def _unescape(col: "Column") -> "Column":
    """Protocol entity unescape (the 5 XML predefined entities);
    ``&amp;`` last so ``&amp;lt;`` yields the literal ``&lt;``."""
    from pyspark.sql import functions as F

    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def sitemap_entries(
    df: "DataFrame", xml_col: str = "xml"
) -> "DataFrame":
    """(…, <sitemap xml>) -> one row per declared entry:
    all original columns except ``xml_col`` plus

    - ``kind``: ``'url'`` (page entry) or ``'sitemap'`` (index entry
      pointing at a child sitemap — feed those back through the
      fetcher and this parser to walk an index);
    - ``loc``: the declared URL, whitespace-trimmed and
      entity-unescaped;
    - ``lastmod``: the freshness hint verbatim (ISO date or datetime),
      NULL when absent.

    Entries without a ``<loc>`` are dropped (they declare nothing to
    fetch). NULL xml yields zero rows, the corpus policy everywhere
    in this engine."""
    from pyspark.sql import functions as F

    keep = [c for c in df.columns if c != xml_col]

    def entries(tag: str) -> "Column":
        blocks = F.regexp_extract_all(
            F.col(xml_col), F.lit(f"(?s)<{tag}>(.*?)</{tag}>"), 1
        )
        return F.transform(
            blocks,
            lambda b: F.struct(
                F.lit(tag).alias("kind"),
                _unescape(
                    F.trim(
                        F.regexp_extract(b, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
                    )
                ).alias("loc"),
                F.nullif(
                    F.trim(
                        F.regexp_extract(
                            b, r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1
                        )
                    ),
                    F.lit(""),
                ).alias("lastmod"),
            ),
        )

    both = F.concat(entries("url"), entries("sitemap"))
    return (
        df.select(*keep, F.explode(both).alias("_e"))
        .select(*keep, "_e.kind", "_e.loc", "_e.lastmod")
        .filter(F.col("loc") != "")
    )


def seed_frontier(
    entries: "DataFrame",
    min_lastmod: str | None = None,
) -> "DataFrame":
    """Page entries -> deduplicated crawl frontier: one ``url`` column
    of distinct canonical URLs (``url_filter.normalize_url_col`` —
    the same key URL-level dedup hashes, so frontier and corpus agree
    on identity). ``min_lastmod`` ('yyyy-MM-dd') drops entries whose
    declared date-prefix is provably older; undated entries SURVIVE
    (absence of evidence — the ``drop_stale`` policy). The
    ``distinct()`` on one short string column is the only shuffle."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.url_filter import (
        normalize_url_col,
    )

    urls = entries.filter(F.col("kind") == "url")
    if min_lastmod is not None:
        urls = urls.filter(
            F.col("lastmod").isNull()
            | (F.substring("lastmod", 1, 10) >= min_lastmod)
        )
    return (
        urls.select(normalize_url_col("loc").alias("url"))
        .filter(F.col("url").isNotNull())
        .distinct()
    )


def schedule_frontier(
    frontier: "DataFrame",
    url_col: str = "url",
    delays: "DataFrame | None" = None,
    default_delay: float = 1.0,
) -> "DataFrame":
    """Politeness scheduling for a URL frontier: assign each URL a
    per-host fetch ``wave`` (0, 1, 2, … in deterministic URL order)
    and a ``not_before`` second offset (wave x the host's
    crawl-delay). Fetch wave N across all hosts concurrently and no
    host ever sees two simultaneous requests; the cumulative offset
    additionally honors per-host ``Crawl-delay`` when a
    (host, crawl_delay) frame — e.g. from
    ``robots.robots_crawl_delays`` — is supplied (``default_delay``
    seconds otherwise).

    Output: (url, host, wave, not_before). Scale shape: ONE window
    keyed by host ordered by URL. A host's URLs are inherently
    sequential (that is the politeness constraint), so the per-host
    window partition is the irreducible unit of work; window state is
    a single row counter. NULL-host URLs (unparsable) are dropped —
    they cannot be fetched anyway."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from html_to_document_spark.operators.url_filter import host_col

    with_host = frontier.withColumn(
        "host", host_col(url_col)
    ).filter(F.col("host").isNotNull())
    w = Window.partitionBy("host").orderBy(F.col(url_col))
    out = with_host.withColumn(
        "wave", (F.row_number().over(w) - 1).cast("int")
    )
    if delays is not None:
        out = out.join(F.broadcast(delays), "host", "left")
        delay = F.coalesce(
            F.col("crawl_delay"), F.lit(float(default_delay))
        )
    else:
        delay = F.lit(float(default_delay))
    return out.select(
        url_col, "host", "wave",
        (F.col("wave") * delay).cast("double").alias("not_before"),
    )
