"""Spans -> HTML serializer (SURVEY.md §2.10 Z1).

Deterministic HTML reconstruction mirroring the reference's
``toHtml`` (/root/reference/packages/core/src/utils/html.serializer.ts:22-351)
re-targeted at the span IR: the design goal is the round-trip property
``extract(serialize(spans)) == spans``, checked in
tests/test_roundtrip.py (the reference tests the analogous
serialize∘parse fixpoint in html.serializer.test.ts:14-60).

Text spans serialize as ``<pre>`` blocks so exact whitespace (leading /
trailing runs, newline runs) survives the minify pass on re-parse —
``<pre>`` is the reference's own whitespace carve-out
(minify.middleware.ts:81-107).
"""

from __future__ import annotations

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def escape_html(text: str) -> str:
    for raw, ent in _ESCAPES:
        text = text.replace(raw, ent)
    return text


def escape_attr(text: str) -> str:
    return escape_html(text).replace('"', "&quot;")


def serialize_spans(spans: list) -> str:
    """``[(kind, text, media_ref, offset)]`` -> HTML string."""
    parts: list[str] = []
    for span in spans:
        kind, text, ref = span[0], span[1], span[2]
        if kind == "text":
            parts.append(f"<pre>{escape_html(text or '')}</pre>")
        elif kind == "image":
            if ref is None:
                parts.append("<img>")
            else:
                parts.append(f'<img src="{escape_attr(ref)}">')
        elif kind == "table":
            rows = (text or "").split("\n")
            cells_html = "".join(
                "<tr>"
                + "".join(
                    f"<td><pre>{escape_html(c)}</pre></td>"
                    for c in row.split("\t")
                )
                + "</tr>"
                for row in rows
            )
            parts.append(f"<table>{cells_html}</table>")
        elif kind == "pagebreak":
            parts.append('<section class="page-break"></section>')
    return "".join(parts)
