"""Mini CSS engine (SURVEY.md §2.7 C1-C10, §2.3 T8).

The reference compiles stylesheets to specificity-ordered simple-selector
rules and resolves matches per node
(/root/reference/packages/core/src/styles/sheet.ts:214-230,563-625);
``<style>`` elements are lifted into the stylesheet and removed from
content (/root/reference/packages/plugins/css-parser/src/index.ts:15-43).

Scope here is exactly what affects the extracted span sequence:
- inline ``style="a: b"`` attribute parsing (html.utils.ts:5-24)
- ``<style>`` rule parsing: flat ``selector { decls }`` rules; at-rules
  skipped wholesale
- simple-selector matching only — tag, ``#id``, ``.class``, ``[attr]``
  (with ``= ~= |= ^= $= *=`` and optional ``i`` flag), ``*``, and
  compounds thereof; selectors containing combinators never match,
  matching the reference (sheet.ts:466-499)
- specificity (id, class/attr, tag) + insertion order resolution

Consumed properties: ``caption-side`` (table caption placement,
adapters/docx table.ts:67-95) and ``display:none`` (content drop).
Style values otherwise do not appear in the output span tuple.
"""

from __future__ import annotations

import re

_DECL_SPLIT_RE = re.compile(r"\s*;\s*")
_CSS_COMMENT_RE = re.compile(r"/\*.*?\*/", re.S)
_RULE_RE = re.compile(r"([^{}]+)\{([^{}]*)\}")
_ATTR_SEL_RE = re.compile(
    r"\[\s*([-\w]+)\s*(?:([~|^$*]?=)\s*(\"[^\"]*\"|'[^']*'|[^\s\]]+)\s*(i)?\s*)?\]"
)
_COMBINATOR_RE = re.compile(r"[\s>+~]")


def parse_style_attr(style: str | None) -> dict[str, str]:
    """``"color: red; caption-side:bottom"`` -> kebab-key dict."""
    out: dict[str, str] = {}
    if not style:
        return out
    for decl in _DECL_SPLIT_RE.split(style):
        if ":" not in decl:
            continue
        key, _, val = decl.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key:
            out[key] = val
    return out


class Rule:
    __slots__ = (
        "tag", "ident", "classes", "attrs", "specificity", "order",
        "decls", "_unmatchable",
    )

    def __init__(self, selector: str, decls: dict[str, str], order: int):
        self.tag: str | None = None
        self.ident: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None, str | None, bool]] = []
        self.decls = decls
        self.order = order

        sel = selector.strip()
        self._unmatchable = bool(_COMBINATOR_RE.search(sel)) or not sel
        if not self._unmatchable:
            rest = _ATTR_SEL_RE.sub(lambda m: self._take_attr(m), sel)
            for part in re.findall(r"[#.]?[^#.\[\]]+", rest):
                if part.startswith("#"):
                    self.ident = part[1:]
                elif part.startswith("."):
                    self.classes.append(part[1:])
                elif part == "*":
                    pass
                else:
                    self.tag = part.lower()
        self.specificity = (
            1 if self.ident else 0,
            len(self.classes) + len(self.attrs),
            1 if self.tag else 0,
        )

    def _take_attr(self, m: re.Match) -> str:
        name, op, val, flag = m.group(1), m.group(2), m.group(3), m.group(4)
        if val is not None and val[:1] in "\"'" and val[-1:] == val[:1]:
            val = val[1:-1]
        self.attrs.append((name.lower(), op, val, flag == "i"))
        return ""

    def matches(self, tag: str, attrs: dict | None) -> bool:
        if self._unmatchable:
            return False
        if self.tag is not None and self.tag != tag:
            return False
        attrs = attrs or {}
        if self.ident is not None and attrs.get("id") != self.ident:
            return False
        if self.classes:
            classes = (attrs.get("class") or "").split()
            if any(c not in classes for c in self.classes):
                return False
        for name, op, val, ci in self.attrs:
            if name not in attrs:
                return False
            actual = attrs[name]
            if op is None:
                continue
            expect = val or ""
            if ci:
                actual, expect = actual.lower(), expect.lower()
            if op == "=" and actual != expect:
                return False
            if op == "~=" and expect not in actual.split():
                return False
            if op == "|=" and not (actual == expect or actual.startswith(expect + "-")):
                return False
            if op == "^=" and not (expect and actual.startswith(expect)):
                return False
            if op == "$=" and not (expect and actual.endswith(expect)):
                return False
            if op == "*=" and not (expect and expect in actual):
                return False
        return True


class Stylesheet:
    """Specificity+order-resolved flat rule list."""

    def __init__(self) -> None:
        self.rules: list[Rule] = []

    def add_css(self, css_text: str) -> None:
        css_text = _CSS_COMMENT_RE.sub("", css_text)
        # drop at-rules with blocks by removing balanced @...{...} chunks
        css_text = re.sub(r"@[^{};]*;", "", css_text)
        css_text = _strip_at_blocks(css_text)
        for m in _RULE_RE.finditer(css_text):
            selectors, body = m.group(1), m.group(2)
            decls = parse_style_attr(body)
            if not decls:
                continue
            for sel in selectors.split(","):
                self.rules.append(Rule(sel, decls, len(self.rules)))

    def resolve(self, tag: str, attrs: dict | None) -> dict[str, str]:
        """Matched declarations, later/higher-specificity wins per property."""
        if not self.rules:
            return {}
        matched = [r for r in self.rules if r.matches(tag, attrs)]
        if not matched:
            return {}
        matched.sort(key=lambda r: (r.specificity, r.order))
        out: dict[str, str] = {}
        for r in matched:
            out.update(r.decls)
        return out

    def subtract_by_selector(
        self, selector: str, keys: set[str] | frozenset | None = None
    ) -> "Stylesheet":
        """C12 (subtractStylesBySelector, sheet.ts:139-206): a DERIVED
        stylesheet with rules matching ``selector`` removed — or, with
        ``keys``, only those declaration keys removed from matching
        rules (rules keeping other declarations survive). The base
        stylesheet is never mutated; unparsable selectors derive an
        unchanged copy (reference behavior for empty target lists)."""
        targets = []
        for part in selector.split(","):
            t = _selector_to_target(part)
            if t is not None:
                targets.append(t)
        derived = Stylesheet()
        if not targets:
            derived.rules = list(self.rules)
            return derived
        for r in self.rules:
            hit = any(r.matches(tag, attrs) for tag, attrs in targets)
            if not hit:
                derived.rules.append(r)
                continue
            if keys is not None:
                remaining = {k: v for k, v in r.decls.items() if k not in keys}
                if remaining:
                    derived.rules.append(_clone_rule(r, remaining))
        return derived


def _selector_to_target(sel: str) -> tuple[str, dict] | None:
    """Parse a simple selector into a synthetic element (tag, attrs)
    that rules can be matched AGAINST (toTargetFromSelector,
    sheet.ts:380-430). Combinator selectors are not targetable."""
    probe = Rule(sel, {}, 0)
    if probe._unmatchable:
        return None
    attrs: dict[str, str] = {}
    if probe.ident:
        attrs["id"] = probe.ident
    if probe.classes:
        attrs["class"] = " ".join(probe.classes)
    for name, op, val, _ci in probe.attrs:
        if op in (None, "=", "~=", "|=", "^=", "$=", "*="):
            attrs[name] = val or ""
    return (probe.tag or "", attrs)


def _clone_rule(rule: Rule, decls: dict[str, str]) -> Rule:
    clone = Rule.__new__(Rule)
    clone.tag = rule.tag
    clone.ident = rule.ident
    clone.classes = list(rule.classes)
    clone.attrs = list(rule.attrs)
    clone.specificity = rule.specificity
    clone.order = rule.order
    clone.decls = decls
    clone._unmatchable = rule._unmatchable
    return clone


def subtract_styles(styles: dict[str, str],
                    base: dict[str, str]) -> dict[str, str]:
    """Residual declarations differing from the base
    (subtractStyles, stylesheet-seeding.ts:262-272)."""
    return {k: v for k, v in styles.items() if base.get(k) != v}


def _strip_at_blocks(css: str) -> str:
    """Remove ``@media{...}``-style blocks (balanced braces)."""
    out = []
    i, n = 0, len(css)
    while i < n:
        ch = css[i]
        if ch == "@":
            depth = 0
            j = i
            while j < n:
                if css[j] == "{":
                    depth += 1
                elif css[j] == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def computed_style(
    tag: str, attrs: dict | None, sheet: Stylesheet | None
) -> dict[str, str]:
    """cascaded(sheet) < inline precedence (sheet.ts getComputedStyles)."""
    out = sheet.resolve(tag, attrs) if sheet is not None else {}
    inline = parse_style_attr((attrs or {}).get("style"))
    out.update(inline)
    return out
