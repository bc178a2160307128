"""Style normalization (F3-F6), UA defaults/inheritance (C5-C9), and
plugin hooks (U1)."""

import pytest

from html_to_document_spark.core.defaults import (
    cascade_down,
    inherits,
    seeded_style,
)
from html_to_document_spark.core.extract import ExtractOptions, extract_document
from html_to_document_spark.functions.styles import (
    css_len_twips,
    expand_shorthands,
    normalize_style,
    resolve_image_size,
    width_parse,
)


def test_css_len_twips():
    assert css_len_twips("1in") == 1440.0
    assert css_len_twips("72pt") == 1440.0
    assert css_len_twips("96px") == 1440.0
    assert css_len_twips("1pc") == 240.0
    assert css_len_twips("2em", base_px=16) == 2 * 16 * 15
    assert css_len_twips("50%") is None
    assert css_len_twips("bogus") is None


def test_width_parse():
    assert width_parse("50%") == ("percentage", 50.0)
    assert width_parse("96px") == ("dxa", 1440.0)
    assert width_parse(None) is None


def test_expand_shorthands_border():
    out = expand_shorthands({"border": "2px solid red"})
    assert out["border-top-width"] == "2px"
    assert out["border-left-style"] == "solid"
    assert out["border-bottom-color"] == "red"
    # per-side shorthand
    out = expand_shorthands({"border-left": "1px dotted blue"})
    assert out["border-left-style"] == "dotted"
    assert "border-top-style" not in out


def test_expand_shorthands_margin_box():
    out = expand_shorthands({"margin": "1px 2px 3px 4px"})
    assert (out["margin-top"], out["margin-right"],
            out["margin-bottom"], out["margin-left"]) == (
        "1px", "2px", "3px", "4px")
    out = expand_shorthands({"padding": "5px 10px"})
    assert out["padding-top"] == "5px" and out["padding-left"] == "10px"
    # explicit longhand wins over the shorthand expansion
    out = expand_shorthands({"margin": "1px", "margin-left": "9px"})
    assert out["margin-left"] == "9px" and out["margin-top"] == "1px"


def test_normalize_style():
    out = normalize_style({"color": "red", "border": "2px solid grey",
                           "width": "1in", "margin": "1px"})
    assert out["color"] == "FF0000"
    assert out["border-top-color"] == "808080"
    assert out["width"] == "96px"
    assert out["margin-left"] == "1px"


def test_resolve_image_size():
    # intrinsic passthrough
    assert resolve_image_size(100, 50) == (100.0, 50.0)
    # width locks ratio
    w, h = resolve_image_size(100, 50, {"width": "200px"})
    assert (w, h) == (200.0, 100.0)
    # max-width clamps preserving ratio
    w, h = resolve_image_size(1000, 500, {}, container_px=620)
    assert w == 620.0 and h == pytest.approx(310.0)
    # max-height secondary clamp
    w, h = resolve_image_size(100, 400, {"max-height": "200px"})
    assert h == 200.0 and w == pytest.approx(50.0)


def test_seeded_defaults_and_inheritance():
    assert seeded_style("h1")["font-weight"] == "bold"
    assert seeded_style("th")["text-align"] == "center"
    assert seeded_style("h1", exclude=True) == {}
    assert seeded_style("h1", exclude=frozenset({"h1"})) == {}
    assert inherits("font-size") and inherits("color")
    assert not inherits("margin-left") and not inherits("text-decoration")
    out = cascade_down({"color": "red", "margin-left": "4px"},
                       {"font-size": "10px"})
    assert out == {"color": "red", "font-size": "10px"}


def test_plugin_hooks():
    opts = ExtractOptions(
        before_parse=(lambda h: h.replace("SECRET", ""),),
        after_parse=(
            lambda spans: [s for s in spans if s[0] != "pagebreak"],
        ),
    )
    html = ('<p>aSECRETb</p><section class="page-break"></section><p>c</p>')
    got = extract_document(html, opts)
    assert got == [("text", "ab", None, 0), ("text", "c", None, 1)]


def test_custom_callable_tag_handler():
    """U5: a python-callable handler emits custom spans for its tag."""
    def figure_handler(walker, node):
        walker.emit_text("[figure]")
        walker.emit("image", None, "media://fig")

    opts = ExtractOptions(tag_overrides={"figure": figure_handler})
    got = extract_document("<p>a</p><figure><p>cap</p></figure><p>b</p>", opts)
    assert got == [
        ("text", "a", None, 0),
        ("text", "[figure]", None, 1),
        ("image", None, "media://fig", 2),
        ("text", "b", None, 3),
    ]


def test_filter_for_scope():
    from html_to_document_spark.core.defaults import filter_for_scope

    styles = {"font-size": "10px", "margin-left": "4px",
              "border-top-width": "1px", "caption-side": "bottom"}
    assert "margin-left" not in filter_for_scope(styles, "inline")
    assert "font-size" in filter_for_scope(styles, "inline")
    assert filter_for_scope(styles, "tableRow") == {}
    assert "caption-side" in filter_for_scope(styles, "table")
    assert filter_for_scope(styles, "unknown-scope") == styles


def test_on_document_hook():
    """U1 middle phase: node-tree rewriters (css-parser plugin shape)."""
    def drop_first_paragraph(nodes):
        out = []
        dropped = False
        for n in nodes:
            if not dropped and n[0] == "p":
                dropped = True
                continue
            out.append(n)
        return out

    opts = ExtractOptions(on_document=(drop_first_paragraph,))
    got = extract_document("<p>a</p><p>b</p>", opts)
    assert got == [("text", "b", None, 0)]


# ---------------------------------------------------------------------------
# C6-C9 parity: the explicit per-property registry must agree with the
# reference's DEFAULT_STYLE_META (style-inheritance.ts:4-189) on every
# property it enumerates. Expectation table transcribed from the
# reference (camelCase -> kebab-case).
# ---------------------------------------------------------------------------

_TYPO_EXP = (True, {"block", "inline", "tableCell"}, {"block", "inline"})
_BORDER_EXP = (False, {"tableCell", "block", "table"}, None)
_MARGIN_EXP = (False, {"block"}, None)
_PADDING_EXP = (False, {"tableCell", "block", "table"}, None)

REFERENCE_STYLE_META = {
    **{p: _TYPO_EXP for p in (
        "font-family", "font-size", "color", "font-style", "font-weight",
        "font", "white-space")},
    "text-align": (True, {"block", "tableCell"}, {"block"}),
    **{p: _BORDER_EXP for p in (
        "border", "border-top", "border-right", "border-bottom",
        "border-left", "border-width", "border-top-width",
        "border-right-width", "border-bottom-width", "border-left-width",
        "border-color", "border-top-color", "border-right-color",
        "border-bottom-color", "border-left-color", "border-style",
        "border-top-style", "border-right-style", "border-bottom-style",
        "border-left-style")},
    **{p: _MARGIN_EXP for p in (
        "margin", "margin-top", "margin-right", "margin-bottom",
        "margin-left")},
    **{p: _PADDING_EXP for p in (
        "padding", "padding-top", "padding-right", "padding-bottom",
        "padding-left")},
    "background-color": (False, {"block", "tableCell", "table"}, None),
    "width": (False, {"table", "tableCell", "block"}, None),
    "height": (False, {"table", "tableCell", "block"}, None),
    "vertical-align": (False, {"tableCell", "inline"}, None),
}


@pytest.mark.parametrize("prop", sorted(REFERENCE_STYLE_META), ids=str)
def test_style_meta_matches_reference_registry(prop):
    from html_to_document_spark.core.defaults import get_style_meta

    exp_inh, exp_scopes, exp_cascade = REFERENCE_STYLE_META[prop]
    inh, scopes, cascade_to = get_style_meta(prop)
    assert inh == exp_inh
    assert set(scopes) == exp_scopes
    if exp_cascade is None:
        assert cascade_to is None
    else:
        assert set(cascade_to) == exp_cascade


def test_unknown_property_defaults():
    """getStyleMeta fallback: not inherited, valid everywhere."""
    from html_to_document_spark.core.defaults import get_style_meta

    inh, scopes, cascade_to = get_style_meta("text-decoration")
    assert not inh
    assert set(scopes) == {"block", "inline", "table", "tableRow", "tableCell"}
    assert cascade_to is None


def test_compute_inherited_and_cascade():
    from html_to_document_spark.core.defaults import (
        cascade_styles,
        compute_inherited_styles,
    )

    parent = {"font-family": "serif", "border-top": "1px solid 000000",
              "text-align": "center", "vertical-align": "middle"}
    # tableCell -> block: typography flows; border (not inherited) and
    # vertical-align (not inherited) do not; text-align's parent scope
    # includes tableCell and cascadeTo includes block -> flows
    got = compute_inherited_styles(parent, "tableCell", "block")
    assert got == {"font-family": "serif", "text-align": "center"}
    # block -> inline: text-align cascadeTo is block-only -> filtered
    got = compute_inherited_styles(parent, "block", "inline")
    assert got == {"font-family": "serif"}
    # cascade-through: width consumed at table scope stops; unknown
    # custom prop is consumed everywhere (scopes=all) so also stops;
    # inherited typography always continues
    styles = {"width": "50%", "font-size": "10px", "x-custom": "1"}
    assert cascade_styles(styles, "table") == {"font-size": "10px"}
    # width is NOT consumed at inline scope -> cascades on
    assert cascade_styles(styles, "inline") == {"width": "50%",
                                                "font-size": "10px"}


def test_subtract_by_selector():
    """C12 parity (subtractStylesBySelector, sheet.ts:139-206)."""
    from html_to_document_spark.core.css import Stylesheet, subtract_styles

    sheet = Stylesheet()
    sheet.add_css(
        ".hot { color: red; font-size: 10px } "
        "p { margin: 0 } "
        "#main { width: 50% }"
    )
    # full removal of matching rules
    derived = sheet.subtract_by_selector(".hot")
    assert derived.resolve("div", {"class": "hot"}) == {}
    assert derived.resolve("p", None) == {"margin": "0"}
    # base unchanged (derived, not mutated)
    assert sheet.resolve("div", {"class": "hot"}) == {
        "color": "red", "font-size": "10px"}
    # per-key subtraction keeps the rest of the rule
    derived2 = sheet.subtract_by_selector(".hot", keys={"color"})
    assert derived2.resolve("div", {"class": "hot"}) == {"font-size": "10px"}
    # selector list + id targets
    derived3 = sheet.subtract_by_selector("#main, p")
    assert derived3.resolve("div", {"id": "main"}) == {}
    assert derived3.resolve("p", None) == {}
    assert derived3.resolve("span", {"class": "hot"}) == {
        "color": "red", "font-size": "10px"}
    # unparsable (combinator) selector -> unchanged copy
    derived4 = sheet.subtract_by_selector("div > p")
    assert derived4.resolve("p", None) == {"margin": "0"}
    # free-function residual subtract (stylesheet-seeding.ts:262-272)
    assert subtract_styles(
        {"color": "red", "font-weight": "bold"}, {"font-weight": "bold"}
    ) == {"color": "red"}


def test_normalize_style_overrides_u4():
    """U4 parity (docx-style-mapper.ts:765-769 addMapping): a
    per-property override REPLACES the built-in normalization for that
    longhand, including when it arrives via shorthand expansion."""
    styles = {"color": "red", "margin": "10pt 20pt"}
    base = normalize_style(styles)
    assert base["color"] == "FF0000"

    out = normalize_style(
        styles,
        overrides={
            "color": lambda v: f"custom({v})",
            "margin-left": lambda v: "OVERRIDDEN",
        },
    )
    assert out["color"] == "custom(red)"
    assert out["margin-left"] == "OVERRIDDEN"       # via shorthand
    assert out["margin-top"] == base["margin-top"]  # others untouched
    # no overrides arg -> unchanged behavior
    assert normalize_style(styles) == base
