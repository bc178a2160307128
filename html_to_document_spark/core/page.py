"""``@page`` CSS rule normalization (SURVEY C11).

Reference: ``packages/adapters/docx/src/docx.adapter.ts:396-483``
(``normalizePageRules``), size maps ``docx.adapter.ts:65-107``, length
conversion ``packages/adapters/docx/src/utils/parse.ts:22-69``
(``lengthToTwips``) and ``utils/unit-conversion.ts``.

Semantics mirrored verbatim, including the reference's quirks (each
pinned in ``tests/test_page.py``):

- every ``@page`` rule's descriptors merge IN ORDER (later rules win
  per-property) before normalization;
- the ``margin`` shorthand expands 1/2/3/4 values to sides; a token
  that fails length parsing still OCCUPIES its slot (its side becomes
  None); explicit ``margin-top`` etc. override the shorthand when
  non-empty;
- ``size`` first tries the NAMED page-size table (case-sensitive, as
  the reference's map lookup is: ``letter`` matches, ``Letter`` does
  not); a trailing ``landscape``/``portrait`` token sets orientation
  ONLY in the named branch — the explicit-dimensions branch ignores
  it (the reference's second token would fail length parsing and
  void the size);
- explicit ``WxH`` needs BOTH dimensions truthy: a 0-twips width
  (``size: 0in 4in``) voids the size, mirroring JS ``if (width &&
  height)``;
- lengths round to integer twips (``lengthToTwips``), unitless
  numbers are px, ``%`` resolves against ``base_px``.

The normalized dict is layout config for a downstream page-layout
sink (the reference feeds it to the docx section setup); the named
branch also carries the code's dimensions from the size table so
consumers need no second lookup.
"""

from __future__ import annotations

import re

__all__ = [
    "parse_page_rules",
    "normalize_page_rules",
    "page_setup_from_css",
    "length_to_twips",
]

TWIPS_PER_PIXEL = 15
TWIPS_PER_PT = 20
TWIPS_PER_PC = 240
TWIPS_PER_INCH = 1440
TWIPS_PER_CM = 566.929133858
TWIPS_PER_MM = 56.6929133858

# docx.adapter.ts:65-76 (name -> docx page-size code), case-sensitive
SIZE_CODES = {
    "letter": 1, "ledger": 3, "legal": 5,
    "A3": 8, "A4": 9, "A5": 11,
    "JIS-B4": 12, "JIS-B5": 13, "B4": 34, "B5": 35,
}

# docx.adapter.ts:78-107 (code -> twips dims). The reference rounds
# ONLY the A-series mm products; the B-series values stay unrounded
# floats — mirrored exactly so a parity check against the reference's
# emitted docx sees identical numbers.
CODE_SIZES = {
    1: (8.5 * TWIPS_PER_INCH, 11 * TWIPS_PER_INCH),
    3: (11 * TWIPS_PER_INCH, 17 * TWIPS_PER_INCH),
    5: (8.5 * TWIPS_PER_INCH, 14 * TWIPS_PER_INCH),
    8: (round(297 * TWIPS_PER_MM), round(420 * TWIPS_PER_MM)),
    9: (round(210 * TWIPS_PER_MM), round(297 * TWIPS_PER_MM)),
    11: (round(148 * TWIPS_PER_MM), round(210 * TWIPS_PER_MM)),
    12: (257 * TWIPS_PER_MM, 364 * TWIPS_PER_MM),
    13: (182 * TWIPS_PER_MM, 257 * TWIPS_PER_MM),
    34: (257 * TWIPS_PER_MM, 364 * TWIPS_PER_MM),
    35: (182 * TWIPS_PER_MM, 257 * TWIPS_PER_MM),
}

_LENGTH_RE = re.compile(r"^([+-]?\d*\.?\d+)([a-z%]*)$")


def length_to_twips(
    value, base_px: float = 16.0, unitless: str = "px"
) -> int | None:
    """``lengthToTwips`` (parse.ts:22-69): CSS length -> ROUNDED twips,
    or None. Unitless numbers are px (``unitless="none"`` rejects
    them); ``%`` resolves against ``base_px`` pixels."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        if unitless == "none":
            return None
        return round(float(value) * TWIPS_PER_PIXEL)
    raw = str(value).strip().lower()
    if not raw:
        return None
    m = _LENGTH_RE.match(raw)
    if not m:
        return None
    num = float(m.group(1))
    unit = m.group(2)
    if not unit:
        if unitless == "none":
            return None
        return round(num * TWIPS_PER_PIXEL)
    scale = {
        "px": TWIPS_PER_PIXEL,
        "pt": TWIPS_PER_PT,
        "pc": TWIPS_PER_PC,
        "in": TWIPS_PER_INCH,
        "cm": TWIPS_PER_CM,
        "mm": TWIPS_PER_MM,
    }.get(unit)
    if scale is not None:
        return round(num * scale)
    if unit in ("em", "rem"):
        return round(num * base_px * TWIPS_PER_PIXEL)
    if unit == "%":
        return round((num / 100) * base_px * TWIPS_PER_PIXEL)
    return None


_PAGE_AT_RE = re.compile(r"@page\b[^{]*\{", re.I)
_NESTED_BLOCK_RE = re.compile(r"@[^{}]*\{[^{}]*\}")


def parse_page_rules(css_text: str | None) -> list[dict]:
    """All ``@page`` rule descriptor dicts, document order. Handles
    pseudo-selectors (``@page :first``) and skips nested margin-box
    at-rules (``@top-center { ... }``) inside the body."""
    from html_to_document_spark.core.css import parse_style_attr

    if not css_text:
        return []
    out = []
    for m in _PAGE_AT_RE.finditer(css_text):
        depth, i = 1, m.end()
        while i < len(css_text) and depth:
            ch = css_text[i]
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
            i += 1
        body = css_text[m.end():i - 1]
        body = _NESTED_BLOCK_RE.sub("", body)
        out.append(parse_style_attr(body))
    return out


def normalize_page_rules(rules: list[dict]) -> dict:
    """Merged + normalized page setup (``normalizePageRules``,
    docx.adapter.ts:396-483). Returns a dict with any of:
    ``margin_top/right/bottom/left`` (int twips or None-for-invalid
    slot), ``size`` = ``{"kind": "code", "code": n, "width": tw,
    "height": tw}`` | ``{"kind": "explicit", "width": tw, "height":
    tw}``, and ``orientation`` ('landscape'|'portrait')."""
    merged: dict = {}
    for r in rules:
        merged.update(r)

    normalized: dict = {}
    if merged.get("margin"):
        tokens = str(merged["margin"]).strip().split()
        margins = [length_to_twips(t) for t in tokens]
        n = len(margins)
        if n == 1:
            (normalized["margin_top"], normalized["margin_right"],
             normalized["margin_bottom"], normalized["margin_left"]) = \
                margins * 4
        elif n == 2:
            normalized["margin_top"] = margins[0]
            normalized["margin_bottom"] = margins[0]
            normalized["margin_right"] = margins[1]
            normalized["margin_left"] = margins[1]
        elif n == 3:
            normalized["margin_top"] = margins[0]
            normalized["margin_right"] = margins[1]
            normalized["margin_left"] = margins[1]
            normalized["margin_bottom"] = margins[2]
        elif n >= 4:
            normalized["margin_top"] = margins[0]
            normalized["margin_right"] = margins[1]
            normalized["margin_bottom"] = margins[2]
            normalized["margin_left"] = margins[3]

    for side in ("top", "right", "bottom", "left"):
        v = merged.get(f"margin-{side}")
        if v:  # JS truthiness: empty string skips, "0in" overrides
            normalized[f"margin_{side}"] = length_to_twips(v)

    size = merged.get("size")
    if size:
        tokens = str(size).split()
        name = tokens[0] if tokens else None
        code = SIZE_CODES.get(name) if name else None
        if code:
            w, h = CODE_SIZES[code]
            normalized["size"] = {
                "kind": "code", "code": code, "width": w, "height": h,
            }
            last = tokens[-1].lower() if tokens else ""
            if last in ("landscape", "portrait"):
                normalized["orientation"] = last
        else:
            width = length_to_twips(tokens[0]) if tokens else None
            height = length_to_twips(
                tokens[1] if len(tokens) > 1 else tokens[0]
            ) if tokens else None
            if width and height:  # JS truthiness: 0 twips voids it
                normalized["size"] = {
                    "kind": "explicit", "width": width, "height": height,
                }
    return normalized


def page_setup_from_css(css_text: str | None) -> dict:
    """One-call helper: ``@page`` rules in ``css_text`` -> normalized
    page setup (empty dict when none present)."""
    return normalize_page_rules(parse_page_rules(css_text))
