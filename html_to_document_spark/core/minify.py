"""Pre-parse HTML normalization (SURVEY.md §2.2 P1-P3).

Behavioral parity with the reference minify middleware
(/root/reference/packages/core/src/middleware/minify.middleware.ts:29-156),
re-derived from its observable semantics:

1. strip comments ``<!--...-->``
2. tokenize ``(<[^>]+>|[^<]+)`` and build a naive tag tree
   (pop on ANY close tag, push on any non-self-closing open tag;
   void set: br img hr input link meta col)
3. outside ``<pre>``: newlines -> space, whitespace runs -> one space;
   text nodes directly adjacent (same tree level) to a BLOCK tag
   (div p ol ul li) are trimmed: leading run removed when the previous
   sibling is a block tag, trailing run replaced by a SINGLE SPACE when
   the next sibling is a block tag; first/last children of a block (or
   root) container are edge-trimmed fully; whitespace-only text nodes
   are dropped
4. inside ``<pre>``: raw text preserved verbatim
5. finally ``>\\s+<`` -> ``><`` and overall trim

Runs per-document inside the extraction UDF, before DOM build.
"""

from __future__ import annotations

import re

_BLOCK_TAGS = frozenset({"div", "p", "ol", "ul", "li"})
# the reference minifier's own void set (narrower than HTML5's; kept
# identical so whitespace decisions match)
_VOID = frozenset({"br", "img", "hr", "input", "link", "meta", "col"})

_TOKEN_RE = re.compile(r"<[^>]+>|[^<]+")
_COMMENT_RE = re.compile(r"<!--[\s\S]*?-->")
_CLOSE_RE = re.compile(r"^<\/\s*([a-zA-Z0-9]+)")
_OPEN_RE = re.compile(r"^<\s*([a-zA-Z0-9]+)")
_NL_RE = re.compile(r"\r?\n")
_WS_RE = re.compile(r"\s+")
_LEAD_WS_RE = re.compile(r"^\s+")
_TRAIL_WS_RE = re.compile(r"\s+$")
_INTERTAG_WS_RE = re.compile(r">\s+<")


def _parse_tree(html: str) -> list:
    """Token tree: tag node = [tag, raw, self_closing, children]; text = str."""
    root = ["root", "", False, []]
    stack = [root]
    for token in _TOKEN_RE.findall(html):
        if token[0] == "<":
            c1 = token[1] if len(token) > 1 else ""
            if c1 == "/" or (c1 == " " and _CLOSE_RE.match(token)):
                if len(stack) > 1:
                    stack.pop()
            else:
                m = _OPEN_RE.match(token)
                tag = m.group(1).lower() if m else ""
                self_closing = token.rstrip().endswith("/>") or tag in _VOID
                node = [tag, token, self_closing, []]
                stack[-1][3].append(node)
                if not self_closing:
                    stack.append(node)
        else:
            stack[-1][3].append(token)
    return root[3]


def _collapse(text: str) -> str:
    """newlines -> space, whitespace runs -> single space (fast path
    when the text is already collapsed)."""
    if "\n" in text or "\r" in text or "\t" in text or "  " in text:
        return _WS_RE.sub(" ", text)
    return text


def _process(nodes: list, parent_tag: str | None) -> str:
    is_pre = parent_tag == "pre"
    # (is_text, text, tag) triples, mutated in the trim pass
    out: list[list] = []
    for node in nodes:
        if isinstance(node, str):
            out.append([True, node if is_pre else _collapse(node), ""])
        else:
            tag, raw, self_closing, children = node
            inner = _process(children, tag)
            closing = "" if self_closing else f"</{tag}>"
            out.append([False, f"{raw}{inner}{closing}", tag])

    if is_pre:
        return "".join(t for _, t, _ in out)

    trim_edges = parent_tag is None or parent_tag in _BLOCK_TAGS
    n = len(out)
    for i, item in enumerate(out):
        if not item[0]:
            continue
        t = item[1]
        prev = out[i - 1] if i > 0 else None
        nxt = out[i + 1] if i + 1 < n else None
        if prev is not None and not prev[0] and prev[2] in _BLOCK_TAGS:
            t = t.lstrip()
        if nxt is not None and not nxt[0] and nxt[2] in _BLOCK_TAGS:
            if t and t[-1].isspace():
                t = t.rstrip() + " "
        if i == 0 and trim_edges:
            t = t.lstrip()
        if i == n - 1 and trim_edges:
            t = t.rstrip()
        item[1] = t
    return "".join(item[1] for item in out if item[1].strip() != "")


def minify_html(html: str) -> str:
    """Full minify pass; whitespace decisions match the golden fixtures."""
    html = _COMMENT_RE.sub("", html)
    nodes = _parse_tree(html)
    result = _process(nodes, None)
    result = _INTERTAG_WS_RE.sub("><", result)
    return result.strip()
