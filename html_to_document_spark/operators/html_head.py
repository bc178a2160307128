"""Head-directive curation for raw crawl HTML: the two page-level
signals real crawl pipelines honor BEFORE any content processing —

- ``<meta name="robots" content="... noindex ...">`` — the publisher
  said "do not index this page"; respectful corpora (C4's crawl base,
  CCBot) drop it.
- ``<link rel="canonical" href="...">`` — the publisher named the
  page's canonical URL; print views, session-id variants and m.-dot
  mirrors all point at one canonical, so deduping on
  ``canonical ?? own URL`` collapses whole mirror families WITHOUT
  comparing content.

Both are pure JVM regex projections over the raw HTML column (the
standard cheap treatment — a full head parse buys nothing here), with
both attribute orders handled (``name`` before ``content`` and the
reverse), so the corpus is never shuffled and no Python runs.
``canonical_dedup`` then reuses the exact-dedup digest shuffle on the
NORMALIZED canonical key (8-byte shuffle keys, text never moves —
``operators/dedup.py`` / ``url_filter.normalize_url_col`` semantics).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

# attribute order varies in the wild; two alternatives cover both.
# [^>]* keeps the match inside one tag; (?i) is shared Java/RE2 syntax
_NOINDEX_NAME_FIRST = (
    r"(?i)<meta[^>]*name\s*=\s*[\"']?robots[\"']?[^>]*"
    r"content\s*=\s*[\"'][^\"']*noindex"
)
_NOINDEX_CONTENT_FIRST = (
    r"(?i)<meta[^>]*content\s*=\s*[\"'][^\"']*noindex[^\"']*[\"']"
    r"[^>]*name\s*=\s*[\"']?robots"
)
_CANONICAL_REL_FIRST = (
    r"(?i)<link[^>]*rel\s*=\s*[\"']?canonical[\"']?[^>]*"
    r"href\s*=\s*[\"']([^\"'>\s]+)"
)
_CANONICAL_HREF_FIRST = (
    r"(?i)<link[^>]*href\s*=\s*[\"']([^\"'>\s]+)[\"']"
    r"[^>]*rel\s*=\s*[\"']?canonical"
)
_BASE_HREF_FIRST = (
    r"(?i)<base[^>]*href\s*=\s*[\"']?([^\"'>\s]+)"
)


def robots_noindex_col(html_col: "Column | str") -> "Column":
    """True when the page carries a robots-noindex meta directive."""
    from pyspark.sql import functions as F

    c = F.col(html_col) if isinstance(html_col, str) else html_col
    # NULL html (e.g. binary PDF records sharing the frame) is "no
    # directive", not a drop — NULL would silently fail the ~filter
    return F.coalesce(
        c.rlike(_NOINDEX_NAME_FIRST) | c.rlike(_NOINDEX_CONTENT_FIRST),
        F.lit(False),
    )


def canonical_url_col(html_col: "Column | str") -> "Column":
    """The page's declared canonical URL, NULL when absent."""
    from pyspark.sql import functions as F

    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.coalesce(
        F.nullif(F.regexp_extract(c, _CANONICAL_REL_FIRST, 1), F.lit("")),
        F.nullif(
            F.regexp_extract(c, _CANONICAL_HREF_FIRST, 1), F.lit("")
        ),
    )


def base_href_col(html_col: "Column | str") -> "Column":
    """The page's declared ``<base href>``, NULL when absent. A base
    element changes what every relative href on the page resolves
    against, so link work composes it with
    ``url_filter.resolve_href_col``::

        base = F.coalesce(
            resolve_href_col("url", base_href_col("html")),  # <base>
            F.col("url"),                                    # default
        )
        absolute = resolve_href_col(base, "href")

    (a base href may itself be relative — browsers resolve it against
    the document URL first, which the outer coalesce mirrors)."""
    from pyspark.sql import functions as F

    c = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.nullif(F.regexp_extract(c, _BASE_HREF_FIRST, 1), F.lit(""))


def head_directive_cols(
    df: "DataFrame", html_col: str = "html"
) -> "DataFrame":
    """Annotate raw-HTML rows with ``robots_noindex`` and
    ``canonical_url`` in one codegen projection."""
    return df.withColumn(
        "robots_noindex", robots_noindex_col(html_col)
    ).withColumn("canonical_url", canonical_url_col(html_col))


def drop_noindex(df: "DataFrame", html_col: str = "html") -> "DataFrame":
    """Respect the publisher's noindex directive (zero shuffle)."""
    return df.filter(~robots_noindex_col(html_col))


def canonical_dedup(
    df: "DataFrame",
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Keep one document per canonical URL: the dedup key is the
    NORMALIZED declared canonical when present, else the page's own
    normalized URL — print/mobile/session-parameter mirrors of one
    page collapse before any content comparison. Min-id keeper, one
    8-byte digest shuffle (the ``exact_dedup`` shape); rows whose key
    is NULL (unparsable URL and no canonical) are never deduped
    against each other."""
    from pyspark.sql import functions as F

    from .dedup import exact_dedup
    from .url_filter import normalize_url_col

    key = F.coalesce(
        normalize_url_col(canonical_url_col(html_col)),
        normalize_url_col(url_col),
    )
    with_key = df.withColumn("_canon_key", key)
    keyed = exact_dedup(
        with_key.filter(F.col("_canon_key").isNotNull()),
        text_col="_canon_key",
        id_col=id_col,
    )
    keyless = with_key.filter(F.col("_canon_key").isNull())
    return keyed.unionByName(keyless).drop("_canon_key")
