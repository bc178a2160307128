"""Spans -> Markdown serializer.

Markdown is the de-facto text format for LLM training data exported
from web crawls (most published pipelines convert HTML to Markdown so
headings/lists/tables survive as plain text the model can learn).
This serializer is the Markdown sibling of
:mod:`~html_to_document_spark.core.serializer` (spans -> HTML):
same span IR in, a deterministic GitHub-flavored-Markdown string out.

Mapping (span kind + meta, mirroring the HTML serializer's
dispatch):

- headings ``h1..h6`` -> ``#``·level prefix
- ``li`` runs -> ``- `` (ul) / ``1. `` (ol) items, nested by two
  spaces per list level
- tables -> GFM pipe tables; the first row is the header row and the
  ``|---|`` delimiter follows it (GFM requires a header — when the
  extractor recorded no thead the first body row is promoted, a
  documented lossy approximation); captions emit as an emphasised
  line before (default) or after (``side: bottom``) the table
- images -> ``![alt](ref)``; ``hr`` -> ``---``; pagebreaks -> ``---``
- link meta (first-href, L10) -> ``[text](href)``
- everything else -> a paragraph block, text verbatim (chunk-interior
  newlines survive as Markdown soft breaks)

Blocks join with blank lines.  The output is intentionally NOT
escape-hardened: this is a training-text export, and injecting
backslashes into crawl text would alter the tokens a model trains on.
Deterministic: same spans -> same bytes, any engine, any partitioning.
"""

from __future__ import annotations


def _meta_of(span) -> dict | None:
    if len(span) > 4 and isinstance(span[4], dict):
        return span[4]
    return None


_HEADING_LEVELS = {f"h{i}": i for i in range(1, 7)}


def _link_wrap(text: str, meta: dict | None) -> str:
    href = meta.get("href") if meta else None
    if href:
        return f"[{text}]({href})"
    return text


def _table_md(text: str | None, meta: dict | None,
              caption: "tuple[str, str] | None") -> str:
    rows = [r.split("\t") for r in (text or "").split("\n")]
    width = max(len(r) for r in rows)
    lines = []
    for i, r in enumerate(rows):
        cells = r + [""] * (width - len(r))
        lines.append("| " + " | ".join(cells) + " |")
        if i == 0:
            lines.append("|" + " --- |" * width)
    table = "\n".join(lines)
    if caption is not None:
        ctext, side = caption
        cap = f"*{ctext}*"
        return f"{table}\n\n{cap}" if side == "bottom" else f"{cap}\n\n{table}"
    return table


def serialize_markdown(spans: list) -> str:
    """``[(kind, text, media_ref, offset[, meta])]`` -> Markdown."""
    blocks: list[str] = []
    i, n = 0, len(spans)
    while i < n:
        s = spans[i]
        kind, text, ref = s[0], s[1], s[2]
        meta = _meta_of(s)
        tag = meta.get("tag") if meta else None

        if kind == "image":
            alt = (meta.get("alt") if meta else None) or ""
            blocks.append(f"![{alt}]({ref or ''})")
            i += 1
        elif kind == "pagebreak":
            blocks.append("---")
            i += 1
        elif kind == "table":
            nxt = spans[i + 1] if i + 1 < n else None
            nmeta = _meta_of(nxt) if nxt is not None else None
            if (
                nxt is not None and nxt[0] == "text" and nmeta
                and nmeta.get("tag") == "caption"
                and nmeta.get("side") == "bottom"
            ):
                blocks.append(_table_md(text, meta, (nxt[1], "bottom")))
                i += 2
            else:
                blocks.append(_table_md(text, meta, None))
                i += 1
        elif (
            kind == "text" and tag == "caption"
            and (meta.get("side") != "bottom" if meta else True)
            and i + 1 < n and spans[i + 1][0] == "table"
        ):
            blocks.append(
                _table_md(spans[i + 1][1], _meta_of(spans[i + 1]),
                          (text or "", "top"))
            )
            i += 2
        elif kind == "text" and tag == "li":
            items: list[str] = []
            base_level: int | None = None
            base_type: str | None = None
            while i < n:
                s2 = spans[i]
                m2 = _meta_of(s2)
                if s2[0] != "text" or m2 is None or m2.get("tag") != "li":
                    break
                try:
                    lv = max(int(m2.get("level", "0") or 0), 0)
                except ValueError:
                    lv = 0
                ltype = m2.get("list") or "ul"
                if base_level is None:
                    base_level, base_type = lv, ltype
                elif lv <= base_level and (lv < base_level
                                           or ltype != base_type):
                    # an adjacent sibling list (shallower, or the other
                    # type at the same level) is a NEW Markdown list —
                    # CommonMark needs the blank line to switch
                    break
                marker = "1." if ltype == "ol" else "-"
                items.append(
                    "  " * lv + f"{marker} "
                    + _link_wrap(s2[1] or "", m2)
                )
                i += 1
            blocks.append("\n".join(items))
        elif kind == "text":
            body = _link_wrap(text or "", meta)
            if tag in _HEADING_LEVELS:
                blocks.append("#" * _HEADING_LEVELS[tag] + " " + body)
            elif tag == "hr" or (meta is None and (text or "") == ""):
                blocks.append("---")
            else:
                blocks.append(body)
            i += 1
        else:  # unknown kind: keep its text so nothing is silently lost
            blocks.append(text or "")
            i += 1
    return "\n\n".join(b for b in blocks if b != "")
