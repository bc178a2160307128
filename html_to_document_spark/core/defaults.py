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

# ---------------------------------------------------------------------------
# Per-property style meta registry (explicit re-derivation of the
# reference's DEFAULT_STYLE_META, style-inheritance.ts:4-189; camelCase
# keys re-expressed as CSS kebab-case). Each entry:
#   (inherits, scopes, cascade_to)  — cascade_to None => falls back to
#   scopes for inheritance targeting (getStyleMeta semantics).
# ---------------------------------------------------------------------------

_TYPO = (True, ("block", "inline", "tableCell"), ("block", "inline"))
_BORDER = (False, ("tableCell", "block", "table"), None)
_MARGIN = (False, ("block",), None)
_PADDING = (False, ("tableCell", "block", "table"), None)

STYLE_META: dict[str, tuple] = {
    # typography (inherited, cascades to block/inline)
    "font-family": _TYPO,
    "font-size": _TYPO,
    "color": _TYPO,
    "font-style": _TYPO,
    "font-weight": _TYPO,
    "font": _TYPO,
    "white-space": _TYPO,
    "text-align": (True, ("block", "tableCell"), ("block",)),
    # layout / box model (not inherited)
    **{p: _BORDER for p in (
        "border", "border-top", "border-right", "border-bottom",
        "border-left", "border-width", "border-top-width",
        "border-right-width", "border-bottom-width", "border-left-width",
        "border-color", "border-top-color", "border-right-color",
        "border-bottom-color", "border-left-color", "border-style",
        "border-top-style", "border-right-style", "border-bottom-style",
        "border-left-style",
    )},
    **{p: _MARGIN for p in (
        "margin", "margin-top", "margin-right", "margin-bottom",
        "margin-left",
    )},
    **{p: _PADDING for p in (
        "padding", "padding-top", "padding-right", "padding-bottom",
        "padding-left",
    )},
    "background-color": (False, ("block", "tableCell", "table"), None),
    "width": (False, ("table", "tableCell", "block"), None),
    "height": (False, ("table", "tableCell", "block"), None),
    "vertical-align": (False, ("tableCell", "inline"), None),
    # engine extension (not in the reference registry, used by T6/TB5):
    # caption-side is table-consumed and never flows to children
    "caption-side": (True, ("table",), ()),
}

_ALL_SCOPES = ("block", "inline", "table", "tableRow", "tableCell")
# unknown property: not inherited, valid everywhere
# (getStyleMeta fallback, style-inheritance.ts:191-203)
_DEFAULT_META = (False, _ALL_SCOPES, None)


def get_style_meta(prop: str) -> tuple:
    """(inherits, scopes, cascade_to) for a property."""
    return STYLE_META.get(prop.lower(), _DEFAULT_META)


def inherits(prop: str) -> bool:
    return get_style_meta(prop)[0]


def seeded_style(tag: str, exclude: frozenset | bool = False) -> dict[str, str]:
    """UA defaults for a tag; ``exclude`` = True disables all, or a set
    of tag names to exclude (excludeDefaultStyles parity,
    converter.ts:346-353)."""
    if exclude is True:
        return {}
    if exclude and tag in exclude:
        return {}
    return dict(SEEDED_DEFAULTS.get(tag, {}))


def filter_for_scope(styles: dict[str, str], scope: str) -> dict[str, str]:
    """Keep only properties valid at the consumer scope
    (filterForScope, style-inheritance.ts:293-309). Unknown scopes pass
    everything through (engine extension for custom consumers)."""
    if scope not in _ALL_SCOPES:
        return dict(styles)
    return {
        k: v for k, v in styles.items() if scope in get_style_meta(k)[1]
    }


def compute_inherited_styles(
    parent_styles: dict[str, str], parent_scope: str, child_scope: str
) -> dict[str, str]:
    """The parent->child waterfall (computeInheritedStyles,
    style-inheritance.ts:240-268): a property flows iff it inherits,
    the parent scope may hold it, and the child scope is a cascade
    target (cascade_to, falling back to scopes)."""
    out: dict[str, str] = {}
    for prop, value in parent_styles.items():
        inh, scopes, cascade_to = get_style_meta(prop)
        if not inh or parent_scope not in scopes:
            continue
        targets = scopes if cascade_to is None else cascade_to
        if child_scope in targets:
            out[prop] = value
    return out


def cascade_styles(styles: dict[str, str], scope: str = "block") -> dict[str, str]:
    """Styles that continue PAST the current scope (cascadeStyles,
    style-inheritance.ts:311-335): inherited properties always cascade;
    non-inherited ones cascade only if NOT consumed at this scope."""
    out: dict[str, str] = {}
    for prop, value in styles.items():
        inh, scopes, _ = get_style_meta(prop)
        if inh or scope not in scopes:
            out[prop] = value
    return out


def cascade_down(parent_styles: dict[str, str],
                 child_styles: dict[str, str]) -> dict[str, str]:
    """Inheritable parent properties flow to the child unless the child
    sets them (block->block convenience form of computeInheritedStyles)."""
    out = compute_inherited_styles(parent_styles, "block", "block")
    out.update(child_styles)
    return out
