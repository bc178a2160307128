"""Scalar functions (SURVEY.md §2.6 F1/F2/F8/F9), each in two forms:
a pure-python fn (used inside the extraction UDF / tests) and a Column
expression built from Spark built-ins (JVM-side for bulk columns).

Reference cites:
- color normalize: packages/core/src/utils/html.utils.ts:39-59
- css length -> px: packages/core/src/utils/parse.ts:6-28
- image type parse: packages/adapters/docx/src/docx.util.ts:74-102
- html escape: packages/core/src/utils/html.serializer.ts:87-99
"""

from __future__ import annotations

import re

# tiny CSS color-name table (colornames subset + gray/grey variants,
# fallback 000000 as in the reference)
_COLOR_NAMES = {
    "black": "000000", "white": "FFFFFF", "red": "FF0000", "green": "008000",
    "blue": "0000FF", "yellow": "FFFF00", "cyan": "00FFFF", "magenta": "FF00FF",
    "gray": "808080", "grey": "808080", "darkgray": "A9A9A9",
    "darkgrey": "A9A9A9", "lightgray": "D3D3D3", "lightgrey": "D3D3D3",
    "orange": "FFA500", "purple": "800080", "silver": "C0C0C0",
    "maroon": "800000", "olive": "808000", "lime": "00FF00", "teal": "008080",
    "navy": "000080", "fuchsia": "FF00FF", "aqua": "00FFFF",
}

_HEX_RE = re.compile(r"^#?([0-9a-fA-F]{6}|[0-9a-fA-F]{3})$")
_LEN_RE = re.compile(r"^\s*(-?\d+(?:\.\d+)?)\s*(px|in|cm|pt)?\s*$")

DPI = 96.0
_PER_INCH = {"in": 1.0, "cm": 2.54}

IMAGE_TYPES = {"png", "jpg", "gif", "bmp", "svg"}


def color_normalize(value: str | None) -> str:
    """hex passthrough (strip '#', upper, 3->6 expand), names via table,
    fallback '000000'."""
    if not value:
        return "000000"
    v = value.strip()
    m = _HEX_RE.match(v)
    if m:
        h = m.group(1).upper()
        if len(h) == 3:
            h = "".join(ch * 2 for ch in h)
        return h
    return _COLOR_NAMES.get(v.lower(), "000000")


def css_len_px(value: str | int | float | None) -> float | None:
    """px/in/cm + bare number -> px at 96 DPI; pt = 1/72 in."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value)
    m = _LEN_RE.match(value)
    if not m:
        return None
    n, unit = float(m.group(1)), m.group(2)
    if unit is None or unit == "px":
        return n
    if unit == "pt":
        return n * DPI / 72.0
    return n * DPI / _PER_INCH[unit]


def image_type_parse(ref: str | None) -> str | None:
    """Media type from a data-URI mime or a path suffix:
    jpeg->jpg, svg+xml->svg, whitelist png/jpg/gif/bmp/svg."""
    if not ref:
        return None
    m = re.match(r"^data:image/([a-zA-Z0-9+.-]+)[;,]", ref)
    ext = None
    if m:
        ext = m.group(1).lower()
    else:
        m2 = re.search(r"\.([a-zA-Z0-9]+)(?:[?#].*)?$", ref)
        if m2:
            ext = m2.group(1).lower()
    if ext == "jpeg":
        ext = "jpg"
    elif ext == "svg+xml":
        ext = "svg"
    return ext if ext in IMAGE_TYPES else None


# ---- Column-expression forms (JVM-side) ---------------------------------

def image_type_col(col):
    """CASE-WHEN expression form of image_type_parse for bulk columns."""
    from pyspark.sql import functions as F

    data_uri = F.regexp_extract(col, r"^data:image/([a-zA-Z0-9+.\-]+)[;,]", 1)
    suffix = F.regexp_extract(col, r"\.([a-zA-Z0-9]+)(?:[?#].*)?$", 1)
    raw = F.lower(F.when(data_uri != "", data_uri).otherwise(suffix))
    mapped = (
        F.when(raw == "jpeg", "jpg")
        .when(raw == "svg+xml", "svg")
        .otherwise(raw)
    )
    return F.when(mapped.isin(*sorted(IMAGE_TYPES)), mapped)


def html_escape_col(col):
    from pyspark.sql import functions as F

    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    return F.regexp_replace(out, ">", "&gt;")
