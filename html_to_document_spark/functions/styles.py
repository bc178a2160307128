"""Style/attribute normalization (SURVEY.md §2.6 F3-F6, north_star
"style/attribute normalization").

Re-derived from the reference's style mapper:
- shorthand expansion (``border`` -> width/style/color, per-side
  ``margin/padding`` 1-4 values, ``border-width`` etc.):
  /root/reference/packages/adapters/docx/src/docx-style-mapper.ts:649-742
- CSS length -> twips table:
  /root/reference/packages/adapters/docx/src/utils/parse.ts:22-69 and
  utils/unit-conversion.ts:1-41 (px*15, pt*20, in*1440, cm*567-ish via
  mm, pc*240, em/rem on basePx)
- width parse (% -> percentage vs DXA):
  adapters/docx/src/utils/parse.ts:71-90
- image size resolution (intrinsic + CSS width/height/max-* lock
  rules): /root/reference/packages/core/src/utils/image.ts:25-84

Pure functions, vectorizable inside pandas UDFs; ``normalize_style``
is the per-element normalization used by the style-normalization
column (styles never enter the span tuple itself).
"""

from __future__ import annotations

import re

from html_to_document_spark.functions.scalars import color_normalize, css_len_px

_SIDES = ("top", "right", "bottom", "left")
_BORDER_STYLES = frozenset(
    "none hidden dotted dashed solid double groove ridge inset outset".split()
)

# twips per unit (reference unit-conversion.ts): 1in = 1440 twips
_TWIPS = {
    "px": 15.0,          # 96dpi: 1440/96
    "pt": 20.0,          # 1440/72
    "pc": 240.0,         # 12pt
    "in": 1440.0,
    "cm": 1440.0 / 2.54,
    "mm": 144.0 / 2.54,
}

_LEN_TOKEN_RE = re.compile(
    r"^\s*(-?\d+(?:\.\d+)?)\s*(px|pt|pc|in|cm|mm|em|rem|%)?\s*$"
)


def css_len_twips(value, base_px: float = 16.0) -> float | None:
    """CSS length -> twips (docx's 1/1440in unit)."""
    if value is None:
        return None
    if isinstance(value, (int, float)):
        return float(value) * _TWIPS["px"]
    m = _LEN_TOKEN_RE.match(str(value))
    if not m:
        return None
    n, unit = float(m.group(1)), m.group(2)
    if unit in ("em", "rem"):
        return n * base_px * _TWIPS["px"]
    if unit == "%":
        return None  # caller context decides (width_parse)
    return n * _TWIPS.get(unit or "px", _TWIPS["px"])


def width_parse(value) -> tuple[str, float] | None:
    """CSS width -> ('percentage', n) | ('dxa', twips)."""
    if value is None:
        return None
    s = str(value).strip()
    if s.endswith("%"):
        try:
            return ("percentage", float(s[:-1]))
        except ValueError:
            return None
    tw = css_len_twips(s)
    return ("dxa", tw) if tw is not None else None


def _split_values(value: str) -> list[str]:
    return [v for v in re.split(r"\s+", value.strip()) if v]


def _four_sides(values: list[str]) -> dict[str, str] | None:
    """CSS 1-4 value box shorthand -> per-side dict."""
    n = len(values)
    if n == 0 or n > 4:
        return None
    if n == 1:
        t = r = b = l = values[0]
    elif n == 2:
        t, r = values
        b, l = t, r
    elif n == 3:
        t, r, b = values
        l = r
    else:
        t, r, b, l = values
    return dict(zip(_SIDES, (t, r, b, l)))


def _split_border(value: str) -> dict[str, str]:
    """``border: 2px solid red`` -> width/style/color parts."""
    out: dict[str, str] = {}
    for part in _split_values(value):
        if part.lower() in _BORDER_STYLES:
            out["style"] = part.lower()
        elif _LEN_TOKEN_RE.match(part):
            out["width"] = part
        else:
            out["color"] = part
    return out


def expand_shorthands(styles: dict[str, str]) -> dict[str, str]:
    """Expand CSS shorthands into longhand properties (F6). Longhand
    keys already present win over expanded shorthand values (CSS
    source-order approximation: explicit longhand is more specific in
    the reference's deep-merge, docx-style-mapper.ts:649-742)."""
    out: dict[str, str] = {}
    for key, value in styles.items():
        key = key.strip().lower()
        if key in ("margin", "padding"):
            sides = _four_sides(_split_values(value))
            if sides:
                for side, v in sides.items():
                    out.setdefault(f"{key}-{side}", v)
            continue
        if key in ("border-width", "border-style", "border-color"):
            prop = key.split("-", 1)[1]
            sides = _four_sides(_split_values(value))
            if sides:
                for side, v in sides.items():
                    out.setdefault(f"border-{side}-{prop}", v)
            continue
        if key == "border" or (
            key.startswith("border-") and key.split("-")[1] in _SIDES
            and key.count("-") == 1
        ):
            parts = _split_border(value)
            sides = _SIDES if key == "border" else (key.split("-")[1],)
            for side in sides:
                for prop, v in parts.items():
                    out.setdefault(f"border-{side}-{prop}", v)
            continue
        out[key] = value
    # explicit longhands win
    for key, value in styles.items():
        key = key.strip().lower()
        if key in out and key not in ("margin", "padding"):
            out[key] = value
    return out


def normalize_style(
    styles: dict[str, str],
    overrides: "dict[str, callable] | None" = None,
) -> dict[str, str]:
    """Full normalization: shorthand expansion + canonical color hex +
    px-normalized lengths; deterministic key order is the caller's
    concern (sort on serialize).

    ``overrides`` (U4 parity with the reference's per-property mapper
    registration, docx-style-mapper.ts:765-769 ``addMapping``): a dict
    of css-property -> ``fn(value) -> value``; an override REPLACES the
    built-in handling for that longhand property (applied after
    shorthand expansion, so ``margin-left`` overrides fire for
    ``margin`` shorthand inputs too)."""
    expanded = expand_shorthands(styles)
    out: dict[str, str] = {}
    for key, value in expanded.items():
        if overrides is not None and key in overrides:
            out[key] = overrides[key](value)
        elif key.endswith("color") or key == "background":
            out[key] = color_normalize(value)
        elif key.endswith(("width", "height")) and not key.startswith("border-"):
            px = css_len_px(value)
            out[key] = f"{px:g}px" if px is not None else value
        elif key.startswith("margin-") or key.startswith("padding-"):
            px = css_len_px(value)
            out[key] = f"{px:g}px" if px is not None else value
        else:
            out[key] = value
    return out


def resolve_image_size(
    intrinsic_w: float,
    intrinsic_h: float,
    css: dict[str, str] | None = None,
    container_px: float = 620.0,
) -> tuple[float, float]:
    """Browser-like image sizing (reference image.ts:25-84): explicit
    width/height win; a single explicit dimension locks aspect ratio;
    max-width/max-height clamp preserving ratio."""
    css = css or {}
    w = css_len_px(css.get("width"))
    h = css_len_px(css.get("height"))
    ratio = (intrinsic_w / intrinsic_h) if intrinsic_h else 1.0

    if w is not None and h is None:
        h = w / ratio
    elif h is not None and w is None:
        w = h * ratio
    elif w is None and h is None:
        w, h = float(intrinsic_w), float(intrinsic_h)

    max_w = css_len_px(css.get("max-width")) or container_px
    max_h = css_len_px(css.get("max-height"))
    if w > max_w:
        h *= max_w / w
        w = max_w
    if max_h is not None and h > max_h:
        w *= max_h / h
        h = max_h
    return (w, h)
