"""Built-in UA default styles + inheritance metadata (SURVEY.md §2.7
C5-C9).

Data re-derived from the reference's seeding and inheritance registry:
- seeded rules: /root/reference/packages/core/src/styles/stylesheet-seeding.ts:12-186
- per-property {inherits, scopes} meta:
  /root/reference/packages/core/src/styles/style-inheritance.ts:4-189
- cascade down / scope filter / cascade-through:
  style-inheritance.ts:240-318

These matter for style-aware consumers (the style-normalization column
and the serializer's default-style filtering); the span tuple itself is
style-free. The seeded tag list doubles as the authoritative
"semantic tags" whitelist for boilerplate stripping.
"""

from __future__ import annotations

# tag -> default declarations (subset of the reference seeding that has
# observable effect on normalization/serialization)
SEEDED_DEFAULTS: dict[str, dict[str, str]] = {
    "h1": {"font-size": "32px", "font-weight": "bold"},
    "h2": {"font-size": "24px", "font-weight": "bold"},
    "h3": {"font-size": "19px", "font-weight": "bold"},
    "h4": {"font-size": "16px", "font-weight": "bold"},
    "h5": {"font-size": "13px", "font-weight": "bold"},
    "h6": {"font-size": "11px", "font-weight": "bold"},
    "th": {"text-align": "center", "font-weight": "bold"},
    "strong": {"font-weight": "bold"},
    "b": {"font-weight": "bold"},
    "em": {"font-style": "italic"},
    "i": {"font-style": "italic"},
    "cite": {"font-style": "italic"},
    "dfn": {"font-style": "italic"},
    "var": {"font-style": "italic"},
    "address": {"font-style": "italic"},
    "figcaption": {"font-style": "italic"},
    "caption": {"font-style": "italic"},
    "u": {"text-decoration": "underline"},
    "ins": {"text-decoration": "underline"},
    "s": {"text-decoration": "line-through"},
    "del": {"text-decoration": "line-through"},
    "sup": {"vertical-align": "super"},
    "sub": {"vertical-align": "sub"},
    "pre": {"font-family": "monospace"},
    "code": {"font-family": "monospace"},
    "kbd": {"font-family": "monospace"},
    "samp": {"font-family": "monospace"},
    "blockquote": {
        "border-left": "4px solid C0C0C0",
        "margin-left": "24px",
    },
    "mark": {"background-color": "FFFF00"},
    "dt": {"font-weight": "bold"},
    "dd": {"margin-left": "40px"},
    "small": {"font-size": "8px"},
}

# typography inherits; box-model does not (style-inheritance.ts registry)
_INHERITED_PREFIXES = (
    "font", "color", "text-align", "text-indent", "text-transform",
    "letter-spacing", "word-spacing", "line-height", "white-space",
    "list-style", "caption-side", "direction", "visibility",
)
_NON_INHERITED_EXACT = frozenset({"text-decoration", "vertical-align"})


def inherits(prop: str) -> bool:
    prop = prop.lower()
    if prop in _NON_INHERITED_EXACT:
        return False
    return any(prop == p or prop.startswith(p + "-") or prop.startswith(p)
               for p in _INHERITED_PREFIXES)


def seeded_style(tag: str, exclude: frozenset | bool = False) -> dict[str, str]:
    """UA defaults for a tag; ``exclude`` = True disables all, or a set
    of tag names to exclude (excludeDefaultStyles parity,
    converter.ts:346-353)."""
    if exclude is True:
        return {}
    if exclude and tag in exclude:
        return {}
    return dict(SEEDED_DEFAULTS.get(tag, {}))


# StyleScope property validity (style-inheritance.ts scopes registry,
# types.ts:10-15): which properties a consumer scope may apply
_SCOPE_PREFIXES: dict[str, tuple] = {
    "inline": ("font", "color", "text-decoration", "vertical-align",
               "letter-spacing", "background"),
    "block": ("font", "color", "text-", "line-height", "margin",
              "padding", "border", "background", "white-space"),
    "table": ("border", "background", "width", "margin", "caption-side"),
    "tableRow": ("background", "height"),
    "tableCell": ("border", "background", "padding", "vertical-align",
                  "text-align", "width", "font", "color"),
}


def filter_for_scope(styles: dict[str, str], scope: str) -> dict[str, str]:
    """Keep only properties valid at the consumer scope
    (filterForScope, style-inheritance.ts:271-286)."""
    prefixes = _SCOPE_PREFIXES.get(scope)
    if prefixes is None:
        return dict(styles)
    return {
        k: v for k, v in styles.items()
        if any(k.startswith(p) for p in prefixes)
    }


def cascade_down(parent_styles: dict[str, str],
                 child_styles: dict[str, str]) -> dict[str, str]:
    """Inheritable parent properties flow to the child unless the child
    sets them (computeInheritedStyles, style-inheritance.ts:240-262)."""
    out = {k: v for k, v in parent_styles.items() if inherits(k)}
    out.update(child_styles)
    return out
