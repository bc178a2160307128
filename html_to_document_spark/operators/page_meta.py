"""Page-metadata extraction for raw crawl HTML: the trafilatura-style
head-metadata stage real corpora record per document —

- ``<title>`` — the page's own name (corpus datasheets, retrieval
  display, title-based quality heuristics all want it).
- ``<meta name="description" content="...">`` — publisher summary.
- ``<meta property="og:*" content="...">`` — OpenGraph fields
  (``og:title``, ``og:image``, …) that social crawlers standardized.
- ``<meta property="article:published_time" content="ISO8601">`` —
  the publication date, the key for recency filters (drop pages
  provably older than a cutoff; undated pages are NOT dropped — no
  date is absence of evidence, the usual crawl-recency rule).
- ``<html lang="en-US">`` — the publisher's declared language;
  compared against detected language, a mismatch is a spam/MT signal
  (CCNet logs it; fastText-vs-declared disagreement feeds quality).

All extraction is pure JVM ``regexp_extract`` projections over the
raw HTML column — zero Python, zero shuffle, and every pattern string
is shared Java/RE2 syntax so the DuckDB gate runs the IDENTICAL
strings (the ``clean_control_chars_col`` precedent: the oracle pins
cross-engine regex dialect, not just a ground-truth plant). Titles
are entity-decoded through a fixed 6-entity replace chain (amp last,
so ``&amp;lt;`` decodes to the literal ``&lt;`` exactly once).

NULL html (binary PDF records sharing the frame) yields NULL metadata
throughout — never a crash, never a spurious drop.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

# [^<]* keeps the title match inside the element (a '<' ends it);
# (?i) and the classes below are shared Java/RE2 syntax.
_TITLE = r"(?i)<title[^>]*>([^<]*)"

# declared language: capture only the primary subtag (letters up to
# the first '-' or quote) — 'en-US' and 'en' both read as 'en'
_HTML_LANG = r"(?i)<html[^>]*\slang\s*=\s*[\"']([A-Za-z]{2,3})"

# ISO-8601 date prefix; anything else (garbage, relative dates) is NULL
_ISO_DATE_PREFIX = r"^\d{4}-\d{2}-\d{2}"

# decode order: every non-amp entity first, &amp; LAST — '&amp;lt;'
# contains no '&lt;' substring, so the single amp-last pass decodes
# exactly one layer (the HTML serializer's escape set, inverted)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _c(col: "Column | str") -> "Column":
    from pyspark.sql import functions as F

    return F.col(col) if isinstance(col, str) else col


def meta_patterns(name: str, attr: str = "name") -> tuple[str, str]:
    """The (attr-first, content-first) pattern pair for one meta tag.

    ``name`` must be a regex-safe literal (every name this module
    ships is: 'description', 'og:title', 'article:published_time').
    Exposed so the gate's DuckDB oracle can run the IDENTICAL strings.
    """
    first = (
        rf"(?i)<meta[^>]*{attr}\s*=\s*[\"']{name}[\"']"
        rf"[^>]*content\s*=\s*[\"']([^\"']*)"
    )
    second = (
        rf"(?i)<meta[^>]*content\s*=\s*[\"']([^\"']*)[\"']"
        rf"[^>]*{attr}\s*=\s*[\"']{name}[\"']"
    )
    return first, second


def decode_entities_col(col: "Column | str") -> "Column":
    """One-layer decode of the serializer's entity set (amp last)."""
    from pyspark.sql import functions as F

    c = _c(col)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def meta_content_col(
    html_col: "Column | str", name: str, attr: str = "name"
) -> "Column":
    """content= of ``<meta {attr}={name}>``, either attribute order;
    NULL when the tag is absent or its content is empty."""
    from pyspark.sql import functions as F

    c = _c(html_col)
    first, second = meta_patterns(name, attr)
    return F.coalesce(
        F.nullif(F.regexp_extract(c, first, 1), F.lit("")),
        F.nullif(F.regexp_extract(c, second, 1), F.lit("")),
    )


def title_col(html_col: "Column | str") -> "Column":
    """Trimmed, entity-decoded ``<title>`` text; NULL when absent."""
    from pyspark.sql import functions as F

    raw = F.trim(F.regexp_extract(_c(html_col), _TITLE, 1))
    return decode_entities_col(F.nullif(raw, F.lit("")))


def description_col(html_col: "Column | str") -> "Column":
    return meta_content_col(html_col, "description", attr="name")


def og_col(html_col: "Column | str", prop: str) -> "Column":
    """OpenGraph property content, e.g. ``og_col(c, 'title')``."""
    return meta_content_col(html_col, f"og:{prop}", attr="property")


def published_time_col(html_col: "Column | str") -> "Column":
    """Raw ``article:published_time`` string (ISO-8601 as published)."""
    return meta_content_col(
        html_col, "article:published_time", attr="property"
    )


def published_date_col(html_col: "Column | str") -> "Column":
    """'yyyy-MM-dd' prefix of the published time, NULL unless the
    string actually starts with an ISO date (kept as a string: lexical
    order IS date order for this shape, and no engine's timestamp
    parser enters the contract)."""
    from pyspark.sql import functions as F

    ts = published_time_col(html_col)
    day = F.substring(ts, 1, 10)
    return F.when(day.rlike(_ISO_DATE_PREFIX), day)


def declared_lang_col(html_col: "Column | str") -> "Column":
    """Lowercased primary subtag of ``<html lang=...>``; NULL when
    the attribute is absent."""
    from pyspark.sql import functions as F

    return F.lower(
        F.nullif(
            F.regexp_extract(_c(html_col), _HTML_LANG, 1), F.lit("")
        )
    )


def lang_mismatch_col(
    declared: "Column | str", detected: "Column | str"
) -> "Column":
    """True when the publisher declared a language and the detector
    disagrees — the CCNet spam/MT signal. No declaration (or no
    detection) is False: absence of evidence never flags."""
    from pyspark.sql import functions as F

    d, p = _c(declared), _c(detected)
    return F.coalesce(d.isNotNull() & p.isNotNull() & (d != p),
                      F.lit(False))


def page_meta_cols(html_col: "Column | str") -> dict[str, "Column"]:
    """The standard metadata projection, ready for ``withColumns``."""
    return {
        "page_title": title_col(html_col),
        "meta_description": description_col(html_col),
        "og_title": og_col(html_col, "title"),
        "og_image": og_col(html_col, "image"),
        "published_date": published_date_col(html_col),
        "declared_lang": declared_lang_col(html_col),
    }


def attach_page_meta(
    df: "DataFrame", html_col: str = "html"
) -> "DataFrame":
    """Adds the six metadata columns as one stage-local projection."""
    return df.withColumns(page_meta_cols(html_col))


def drop_stale(
    df: "DataFrame", min_published: str, html_col: str = "html"
) -> "DataFrame":
    """Recency filter: drop pages whose declared publication date is
    provably before ``min_published`` ('yyyy-MM-dd'). Undated pages
    survive — the standard crawl-recency rule only acts on evidence.
    String comparison is exact here: both sides are 'yyyy-MM-dd'."""
    from pyspark.sql import functions as F

    day = published_date_col(html_col)
    return df.filter(day.isNull() | (day >= F.lit(min_published)))
