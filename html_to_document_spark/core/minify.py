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

Fused fast path: ``minify_tokens`` returns the minified document as a
CLASSIFIED TOKEN STREAM (text str | ("o", tag, raw) | ("c", tag)) that
``dom.parse_tokens`` consumes directly — one tokenization for the whole
minify+parse pipeline instead of minify -> string -> re-tokenize.
``minify_html`` (the string form) is the join of that stream and is what
the parity tests pin.
"""

from __future__ import annotations

import re

_BLOCK_TAGS = frozenset({"div", "p", "ol", "ul", "li"})
# the reference minifier's own void set (narrower than HTML5's; kept
# identical so whitespace decisions match)
_VOID = frozenset({"br", "img", "hr", "input", "link", "meta", "col"})

# quote-aware (a '>' inside a quoted attribute value does not end the
# tag), with a naive fallback for unterminated quotes — kept in lockstep
# with dom._TOKEN_RE so the fused minify+parse path tokenizes identically
_TOKEN_RE = re.compile(
    r"""<[^>"']*(?:(?:"[^"]*"|'[^']*')[^>"']*)*>|<[^>]+>|[^<]+"""
)
_COMMENT_RE = re.compile(r"<!--[\s\S]*?-->")
_CLOSE_RE = re.compile(r"^<\/\s*([a-zA-Z0-9]+)")
_OPEN_RE = re.compile(r"^<\s*([a-zA-Z0-9]+)")
_WS_RE = re.compile(r"\s+")
_PRE_SCAN_RE = re.compile(r"<\s*pre", re.IGNORECASE)


def _parse_tree(html: str) -> list:
    """Token tree: tag node = [tag, raw, self_closing, children]; text = str."""
    root = ["root", "", False, []]
    stack = [root]
    children = root[3]  # stack[-1][3], maintained incrementally (hot loop)
    close_match = _CLOSE_RE.match
    open_match = _OPEN_RE.match
    for token in _TOKEN_RE.findall(html):
        if token[0] == "<":
            c1 = token[1] if len(token) > 1 else ""
            if c1 == "/" or (c1 == " " and close_match(token)):
                if len(stack) > 1:
                    stack.pop()
                    children = stack[-1][3]
            else:
                m = open_match(token)
                tag = m.group(1).lower() if m else ""
                # tokens always end in '>', so '/>' reduces to token[-2]
                self_closing = tag in _VOID or token[-2] == "/"
                node = [tag, token, self_closing, []]
                children.append(node)
                if not self_closing:
                    stack.append(node)
                    children = node[3]
        else:
            children.append(token)
    return root[3]


# any whitespace char other than a plain space (\f, \v, NBSP, unicode
# spaces — JS /\s/ semantics), or a double space: text needs collapsing
_NEEDS_COLLAPSE_RE = re.compile(r"[^\S ]|  ")


def _collapse(text: str) -> str:
    """newlines -> space, whitespace runs -> single space (fast path
    when the text is already collapsed). For ASCII text (the
    overwhelming case) the needs-collapse probe is C-speed substring
    checks — the regex search was ~5% of whole-document extraction;
    the explicit list covers every ASCII char Python's \\s matches
    (\\t \\n \\r \\f \\v AND \\x1c-\\x1f, which JS \\s lacks but the
    repo's _WS_RE collapses) plus the double space — exactly
    _NEEDS_COLLAPSE_RE's ASCII subset (parity fuzzed in
    test_minify)."""
    if text.isascii():
        if ("  " in text or "\n" in text or "\t" in text
                or "\r" in text or "\x0c" in text or "\x0b" in text
                or "\x1c" in text or "\x1d" in text
                or "\x1e" in text or "\x1f" in text):
            return _WS_RE.sub(" ", text)
        return text
    if _NEEDS_COLLAPSE_RE.search(text):
        return _WS_RE.sub(" ", text)
    return text


def _emit(nodes: list, parent_tag: str | None, out: list) -> None:
    """The reference _process pass, emitting tokens instead of a string."""
    is_pre = parent_tag == "pre"
    if is_pre:
        for node in nodes:
            if isinstance(node, str):
                out.append(node)  # raw, whitespace preserved
            else:
                tag, raw, self_closing, children = node
                out.append(("o", tag, raw))
                _emit(children, tag, out)
                if not self_closing:
                    out.append(("c", tag))
        return

    # single fused pass: the trim decisions only depend on NEIGHBOR
    # TYPES (tag-vs-text and block-tag membership), never on neighbor
    # text values, so collapse+trim+emit need no intermediate item list
    trim_edges = parent_tag is None or parent_tag in _BLOCK_TAGS
    n = len(nodes)
    last = n - 1
    for i, node in enumerate(nodes):
        if node.__class__ is str:
            t = _collapse(node)
            if i > 0:
                prev = nodes[i - 1]
                if prev.__class__ is not str and prev[0] in _BLOCK_TAGS:
                    t = t.lstrip()
            if i < last:
                nxt = nodes[i + 1]
                if nxt.__class__ is not str and nxt[0] in _BLOCK_TAGS:
                    # post-collapse whitespace is single spaces only
                    if t and t[-1].isspace():
                        t = t.rstrip() + " "
            if trim_edges:
                if i == 0:
                    t = t.lstrip()
                if i == last:
                    t = t.rstrip()
            if t and not t.isspace():  # drop whitespace-only text nodes
                out.append(t)
        else:
            tag, raw, self_closing, children = node
            out.append(("o", tag, raw))
            _emit(children, tag, out)
            if not self_closing:
                out.append(("c", tag))


def _stream_minify(html: str) -> list:
    """SINGLE-PASS fusion of ``_parse_tree`` + ``_emit``: classified
    tokens with whitespace resolved, straight from the regex, no
    intermediate tree. Semantics are pinned identical to the two-pass
    form by the minify goldens (``_parse_tree``/``_emit`` are retained
    as the executable specification and for tree-shaped callers).

    The only future-dependent decision on a text node is its TRAILING
    treatment (single-space before a block sibling; rstrip when last
    child of a trimming parent), so one pending text slot per open
    element suffices — texts are never adjacent in the token stream.
    Frame: [tag, is_pre, trim_edges, is_first_child, last_was_block,
    pending_text]."""
    out: list = []
    # root frame: trims its edges, not pre
    frames: list[list] = [[None, False, True, True, False, None]]
    f = frames[-1]
    close_match = _CLOSE_RE.match
    open_match = _OPEN_RE.match

    def _resolve(frame: list, next_is_block: bool, closing: bool) -> None:
        t = frame[5]
        frame[5] = None
        if next_is_block:
            if t and t[-1].isspace():
                t = t.rstrip() + " "
        elif closing and frame[2]:
            t = t.rstrip()
        if t and not t.isspace():
            out.append(t)

    for token in _TOKEN_RE.findall(html):
        if token[0] != "<":
            if f[1]:  # pre interior: raw, whitespace preserved
                out.append(token)
                continue
            tp = f[5]
            if tp is not None:
                # Adjacent text siblings only happen when a stray close
                # tag was dropped between them (the regex is maximal).
                # _emit treats a text node with a TEXT next-sibling as
                # "no trailing treatment": emit the earlier one as-is.
                f[5] = None
                if tp and not tp.isspace():
                    out.append(tp)
            t = _collapse(token)
            if f[4]:  # previous sibling was a block tag
                t = t.lstrip()
            if f[3] and f[2]:  # first child of a trimming parent
                t = t.lstrip()
            f[3] = False
            f[4] = False
            f[5] = t
            continue
        c1 = token[1] if len(token) > 1 else ""
        if c1 == "/" or (c1 == " " and close_match(token)):
            if len(frames) > 1:
                t = f[5]
                if t is not None:  # inline _resolve(closing=True)
                    f[5] = None
                    if f[2]:
                        t = t.rstrip()
                    if t and not t.isspace():
                        out.append(t)
                out.append(("c", f[0]))
                frames.pop()
                f = frames[-1]
            continue
        m = open_match(token)
        tag = m.group(1).lower() if m else ""
        self_closing = tag in _VOID or token[-2] == "/"
        t = f[5]
        if t is not None:  # inline _resolve(next_is_block=...)
            f[5] = None
            if tag in _BLOCK_TAGS and t and t[-1].isspace():
                t = t.rstrip() + " "
            if t and not t.isspace():
                out.append(t)
        out.append(("o", tag, token))
        f[3] = False
        f[4] = tag in _BLOCK_TAGS
        if not self_closing:
            f = [tag, tag == "pre", tag in _BLOCK_TAGS, True, False, None]
            frames.append(f)

    # EOF: unclosed elements close here (fixture parser.test.ts:159-169)
    while len(frames) > 1:
        f = frames[-1]
        if f[5] is not None:
            _resolve(f, False, True)
        out.append(("c", f[0]))
        frames.pop()
    root = frames[0]
    if root[5] is not None:
        _resolve(root, False, True)
    return out


def minify_tokens(html: str) -> list:
    """Minified document as a classified token stream (fused path)."""
    if "<!--" in html:
        html = _COMMENT_RE.sub("", html)
    out = _stream_minify(html)

    # the ">\s+<" pass in token space: remove runs of whitespace-only
    # text tokens flanked by tags on both sides. Only <pre> interiors
    # can still contain such tokens (non-pre _emit drops them and edge-
    # trims the root), so the scan is gated on pre presence (one
    # C-speed regex scan; real pages rarely contain <pre>).
    if _PRE_SCAN_RE.search(html) is None:
        return out
    res: list = []
    i, n = 0, len(out)
    while i < n:
        t = out[i]
        if isinstance(t, str) and t.strip() == "":
            j = i
            while j < n and isinstance(out[j], str) and out[j].strip() == "":
                j += 1
            prev_is_tag = bool(res) and not isinstance(res[-1], str)
            next_is_tag = j < n and not isinstance(out[j], str)
            if not (prev_is_tag and next_is_tag):
                res.extend(out[i:j])
            i = j
        else:
            res.append(t)
            i += 1

    # overall trim (string .strip() equivalent on the edges)
    while res and isinstance(res[0], str):
        res[0] = res[0].lstrip()
        if res[0]:
            break
        res.pop(0)
    while res and isinstance(res[-1], str):
        res[-1] = res[-1].rstrip()
        if res[-1]:
            break
        res.pop()
    return res


def minify_html(html: str) -> str:
    """String form (parity-tested against the reference minify tests)."""
    parts = []
    for t in minify_tokens(html):
        if isinstance(t, str):
            parts.append(t)
        elif t[0] == "o":
            parts.append(t[2])
        else:
            parts.append(f"</{t[1]}>")
    return "".join(parts)
