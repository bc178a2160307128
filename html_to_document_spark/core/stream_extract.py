"""Single-pass streaming span extraction (SURVEY.md §2.3 T1, the
"array-encoded walker" promise, delivered as a fused token machine).

``extract.extract_document`` originally ran three passes per document:
minify (token machine) -> ``dom.parse_tokens`` (builds a node tree of
Python lists) -> ``extract._Walker`` (recursive tree walk emitting
spans). The tree exists only to be walked once; the intermediate token
list exists only to be re-classified. Both are pure allocation traffic
— and at 100 TB allocation traffic is what saturates per-executor
memory bandwidth (BENCH r2: the extraction leg is DRAM-bound at 8+
threads on one box).

Architecture: ``_make_walker`` builds the walker state machine as a set
of closures (deliver text / open / close, finish); two drivers feed it:

- ``stream_document`` (the fused fast path): ONE loop over the raw
  regex token stream runs the minify whitespace machine inline and
  delivers resolved tokens straight into the walker — no token list, no
  tree, no per-element tuples. Tag tokens are classified once globally
  (``_TAG_MEMO``): real corpora repeat a tiny set of tag strings, so
  classification + attribute parsing amortize to one dict hit.
- ``stream_spans`` (token-list driver): consumes ``minify_tokens``
  output; used when a ``<style>`` element forces a style pre-pass over
  the whole document before walking can start.

The tree-based walker in ``extract.py`` is retained as the executable
specification; ``tests/test_stream_extract.py`` pins all strategies
span-for-span equal on hostile corpora (the same lockstep discipline as
``minify._stream_minify`` vs its two-pass spec).

Semantics re-derived from the reference (citations in extract.py):
- implied closes / rawtext capture: dom.parse_tokens (parser.ts:17-22)
- whitespace minification: minify.middleware.ts:29-156 (via minify.py)
- block/inline chunking: converter.ts:361-398
- list-item paragraph inlining with synthesized breaks:
  converter.ts:324-359 (the one LOOKAHEAD in the tree walker — "\\n"
  after an inlined <p> only when more siblings follow — becomes a
  DEFERRED action resolved by the next sibling token or discarded at
  the list-item close)
- page sections: trailing pagebreak unless last child
  (docx.adapter.ts:506-563) — same deferral trick
- table grid: table.ts:97-159; sections parser.ts:262-278

Lookahead-free by construction: every future-dependent decision in the
tree walker depends only on WHETHER another sibling token arrives, so a
one-slot pending action per open frame suffices.
"""

from __future__ import annotations

from html import unescape as _unescape

from html_to_document_spark.core import css as _css
from html_to_document_spark.core.dom import (
    RAWTEXT_ELEMENTS,
    VOID_ELEMENTS,
    _decode,
    _parse_attrs,
    _P_CLOSERS,
)
from html_to_document_spark.core.extract import (
    IMAGE,
    PAGEBREAK,
    TABLE,
    TEXT,
    HEADING_TAGS,
    LIST_TAGS,
    ExtractOptions,
    DEFAULT_OPTIONS,
    _build_kind_map,
    _compiled_drop_re,
    _DEFAULT_KIND_MAP,
    _linearize_grid,
    _span_int,
    resolve_img_src,
)
from html_to_document_spark.core.minify import (
    _BLOCK_TAGS,
    _CLOSE_RE,
    _COMMENT_RE,
    _OPEN_RE,
    _PRE_SCAN_RE,
    _TOKEN_RE,
    _VOID,
    _collapse,
)


class StreamFallback(Exception):
    """Raised mid-stream for constructs only the tree walker handles
    (rawtext element resolved to an exotic kind via overrides); the
    caller re-runs the document through the tree path."""


# frame modes ------------------------------------------------------------
M_FRAG = 0        # walk_fragment context (root, div, page, ...)
M_INLINE = 1      # walk_inline context
M_PARA = 2        # _paragraph context
M_LIST = 3        # _list container
M_LI = 4          # _list_item context
M_INLINED_P = 5   # <p> inlined inside an <li> (break synthesis)
M_TABLE = 6       # _table collector
M_TSECTION = 7    # thead/tbody/tfoot
M_TR = 8          # table row
M_CELL = 9        # td/th — flatten-text collector
M_FLAT = 10       # inline/block continuation inside a cell/caption
M_CAPTION = 11    # <caption> — flatten-text targeted at the table frame
M_SUPPRESS = 12   # dropped/hidden/ignored subtree

# popping one of these back into an M_LI restores the li chunk-meta
# (the tree walker resets meta after every block child of an <li>)
_BLOCK_MODES = frozenset({M_FRAG, M_PARA, M_LIST, M_TABLE})

# rawtext dispositions (decided at the rawtext element's open)
RT_DISCARD = 0    # dropped/hidden/ignored context
RT_CHUNK = 1      # un-dropped script/style in a chunking context
RT_FLAT = 2       # un-dropped script/style inside a cell/caption

# memoized unknown-tag kinds are deterministic ('inline'), so the
# default-options kind map can be shared and mutated across documents
# (each UDF worker is its own process; batches are single-threaded)
_SHARED_DEFAULT_MAP = dict(_DEFAULT_KIND_MAP)
# hard cap on learned unknown-tag entries (shared across documents in a
# worker process): once full, unknown tags still classify as 'inline',
# they just stop being inserted — an adversarial corpus of junk tags
# ("<3 w>" tokenizes to tag "3") must not grow the dict without bound
_KIND_MAP_MAX_SIZE = len(_SHARED_DEFAULT_MAP) + 4096

# global tag-token classification memo: raw token string ->
#   None                                  (close token)
#   (tag, sc_minify, sc_dom, rawtext, attrs)   (open token)
# Real corpora repeat a tiny vocabulary of SHORT tag tokens ("<p>",
# "</p>", "<td colspan=2>", ...), so regex classification + attr
# parsing amortize to one dict hit. Attr dicts are shared — all
# consumers are read-only.
#
# Policy (learned the hard way): cache ONLY short tokens, with a hard
# size cap and NO clear/refill cycle. Attr-bearing tokens with unique
# urls (every <img src=...> / <a href=...> on a web corpus) never
# repeat — caching them grows the dict with dead strings, and that
# allocation traffic lands exactly on the executor DRAM-bandwidth
# ceiling this memo exists to relieve (measured: an unbounded memo
# REGRESSED local[32] extraction ~2x while local[2] was unaffected).
_TAG_MEMO: dict = {}
_MEMO_MAX_TOKEN = 48
_MEMO_MAX_SIZE = 4096


def _classify_tag(token: str):
    """Classify one minify-grammar tag token (semantics identical to
    ``minify._stream_minify``'s inline open/close discrimination +
    ``dom.parse_tokens``'s attr/void/rawtext derivation)."""
    c1 = token[1] if len(token) > 1 else ""
    if c1 == "/" or (c1 == " " and _CLOSE_RE.match(token)):
        return None
    m = _OPEN_RE.match(token)
    tag = m.group(1).lower() if m else ""
    sc_min = tag in _VOID or token[-2] == "/"
    sc_dom = tag in VOID_ELEMENTS or token[-2] == "/"
    rawtext = tag in RAWTEXT_ELEMENTS and not sc_dom
    # attr parse must NOT be gated on a non-empty tag: parse_tokens
    # parses attrs for degenerate tokens like "<<ol style=...>"
    # (tag ''), and the walker's hidden() check reads the style from
    # them — gating on `tag` made the stream keep a subtree the tree
    # drops (found by the r4 extended fuzz)
    attrs = (
        _parse_attrs(token, tag)
        if (" " in token or "=" in token or "\t" in token or "\n" in token)
        else None
    )
    return (tag, sc_min, sc_dom, rawtext, attrs)


def _classify_memo(token: str):
    info = _TAG_MEMO.get(token, False)
    if info is False:
        info = _classify_tag(token)
        if len(token) <= _MEMO_MAX_TOKEN and len(_TAG_MEMO) < _MEMO_MAX_SIZE:
            _TAG_MEMO[token] = info
    return info


def collect_styles_from_tokens(tokens: list, sheet: "_css.Stylesheet") -> None:
    """Flat-scan equivalent of ``parse_tokens`` rawtext capture +
    ``_collect_styles``: lift every <style> element's raw content into
    the per-doc stylesheet, respecting that a <style> token inside a
    <script> rawtext region is script CONTENT, not an element."""
    i, n = 0, len(tokens)
    while i < n:
        t = tokens[i]
        i += 1
        if t.__class__ is str or t[0] != "o":
            continue
        tag = t[1]
        if tag not in RAWTEXT_ELEMENTS:
            continue
        raw = t[2]
        if tag in VOID_ELEMENTS or raw[-2] == "/":
            continue
        parts = []
        depth = 0
        while i < n:
            tk = tokens[i]
            if tk.__class__ is str:
                parts.append(tk)
            elif tk[0] == "o" and tk[1] == tag:
                depth += 1
                parts.append(tk[2])
            elif tk[0] == "c" and tk[1] == tag:
                if depth == 0:
                    i += 1
                    break
                depth -= 1
                parts.append(f"</{tag}>")
            else:
                parts.append(tk[2] if tk[0] == "o" else f"</{tk[1]}>")
            i += 1
        if tag == "style" and parts:
            sheet.add_css("".join(parts))


def _make_walker(opts: ExtractOptions, sheet: "_css.Stylesheet | None"):
    """Build the walker state machine. Returns
    ``(wtext, wopen, wclose, wfinish)`` closures:

    - ``wtext(text)``: a resolved (minified, undecoded) text node
    - ``wopen(tag, raw, attrs, sc_dom, rawtext)``: an element open
    - ``wclose(tag)``: an element close (tag from the minify machine)
    - ``wfinish() -> spans``: EOF unwind + final flush
    """
    meta_mode = opts.with_meta
    img_crawl = opts.img_src_crawl
    # figure-instance ids (meta mode) — tree-walker parity: ordinal
    # assigned at each span-level <figure> open (in-table figures
    # flatten into the table text in BOTH strategies and never count)
    fig_stack: list[int] = []
    fig_n = [0]
    kind_map = (
        _SHARED_DEFAULT_MAP if opts is DEFAULT_OPTIONS
        else _build_kind_map(opts)
    )
    sheet_has_rules = sheet is not None and bool(sheet.rules)
    drop_class_re = (
        _compiled_drop_re(opts.drop_class_re)
        if opts.drop_class_re else None
    )

    spans: list = []
    chunk: list[str] = []
    a_depth = 0
    link_chars = 0
    chunk_meta: dict | None = None
    chunk_href: str | None = None
    chunk_tag_n = 0

    # root frame: [mode, tag, is_page, pending_pb]
    frames: list[list] = [[M_FRAG, "#root", False, False]]
    open_tags: list[str] = ["#root"]

    # rawtext collection state (script/style interiors)
    rt_tag: str | None = None
    rt_parts: list = []
    rt_depth = 0
    rt_action = RT_DISCARD
    rt_sink: list | None = None

    def add_text(text: str) -> None:
        nonlocal link_chars
        if not text:
            return
        chunk.append(text)
        if a_depth > 0:
            link_chars += len(text)

    def flush(emit_empty: bool = False) -> None:
        nonlocal link_chars, chunk_href, chunk_tag_n
        text = "".join(chunk)
        if text or emit_empty:
            meta = None
            if meta_mode:
                meta = dict(chunk_meta) if chunk_meta else {}
                if chunk_href is not None:
                    meta["href"] = chunk_href
            spans.append([TEXT, text, None, link_chars, meta, chunk_tag_n])
        chunk.clear()
        link_chars = 0
        chunk_href = None
        chunk_tag_n = 0

    def emit(kind: str, text, ref, meta=None) -> None:
        spans.append([kind, text, ref, 0, meta if meta_mode else None, 0])

    def kind_of(tag: str, attrs) -> str:
        kind = kind_map.get(tag)
        if kind is None:
            # Same policy as _TAG_MEMO: memoize only what plausibly
            # repeats. Malformed web text tokenizes to junk tags ("3",
            # arbitrary alnum) and the shared map is process-global —
            # unbounded inserts grow a long-lived worker without limit.
            if len(kind_map) < _KIND_MAP_MAX_SIZE:
                kind_map[tag] = "inline"
            return "inline"
        if kind == "@section":
            classes = ((attrs or {}).get("class") or "").split()
            if "page-break" in classes:
                return "page-break"
            if "page" in classes:
                return "page"
            return "fragment"
        return kind

    def hidden(tag: str, attrs) -> bool:
        if attrs is not None and drop_class_re is not None:
            # readability-style pruning (ExtractOptions.drop_class_re):
            # same subtree-suppression path as display:none, lockstep
            # with _Walker._hidden
            blob = (attrs.get("class") or "")
            aid = attrs.get("id")
            if aid:
                blob = f"{blob} {aid}"
            if blob and drop_class_re.search(blob):
                return True
        if attrs is None and not sheet_has_rules:
            return False
        style = _css.computed_style(tag, attrs, sheet)
        disp = style.get("display")
        return disp is not None and disp.strip().lower() == "none"

    def img_meta(attrs):
        if not meta_mode:
            return None
        out = {"tag": "img"}
        if attrs and attrs.get("alt"):
            out["alt"] = attrs["alt"]
        if fig_stack:
            out["fig"] = str(fig_stack[-1])
        return out

    def li_meta_of(fr: list) -> dict:
        m = {"tag": "li", "level": str(fr[2]), "list": fr[3]}
        if fr[4]:
            m["id"] = fr[4]
        return m

    def pop_close() -> None:
        """Pop the top frame and run its close action (explicit closes,
        implied closes, the EOF unwind, degenerate self-closed
        elements). One merged function — this runs once per element."""
        nonlocal a_depth, chunk_meta
        open_tags.pop()
        popped = frames.pop()
        t = frames[-1]
        pm = popped[0]
        if pm == M_FRAG:
            flush()
            if meta_mode and popped[1] == "figure" and fig_stack:
                fig_stack.pop()
            if popped[2]:  # page: pagebreak unless last child
                if t[0] == M_FRAG:
                    t[3] = True  # defer to the next sibling token
                else:
                    emit(PAGEBREAK, None, None)
        elif pm == M_INLINE:
            if popped[2]:
                a_depth -= 1
        elif pm == M_PARA:
            if chunk:
                flush()
            elif len(spans) == popped[2]:
                flush(emit_empty=True)
            if meta_mode:
                chunk_meta = None
        elif pm == M_LI:
            popped[9] = False  # trailing '\n': no next sibling arrived
            if chunk:
                flush()
            elif len(spans) == popped[5] and not popped[6]:
                flush(emit_empty=True)
        elif pm == M_INLINED_P:
            t[9] = True   # '\n' only if another sibling arrives
            # t[8] (prev-is-p) was already set positionally at open
        elif pm == M_TABLE:
            _close_table(popped, emit, meta_mode)
        elif pm == M_TR:
            popped[4].append((popped[2], popped[3]))
        elif pm == M_CELL:
            popped[5].append(("".join(popped[2]), popped[3], popped[4]))
        elif pm == M_CAPTION:
            popped[3][3] = "".join(popped[2])
            popped[3][4] = popped[4]
        # M_LIST / M_TSECTION / M_FLAT / M_SUPPRESS: nothing
        if t[0] == M_LI and pm in _BLOCK_MODES and meta_mode:
            chunk_meta = li_meta_of(t)

    def open_block(kind: str, tag: str, attrs, self_closing: bool) -> None:
        """_Walker._block for string kinds, stream form. The caller
        already flushed per its context's rules."""
        nonlocal chunk_meta
        if kind == "paragraph":
            if meta_mode:
                chunk_meta = {"tag": tag}
                if tag in HEADING_TAGS:
                    chunk_meta["level"] = tag[1]
                if attrs and attrs.get("id"):
                    chunk_meta["id"] = attrs["id"]
                if tag == "figcaption" and fig_stack:
                    chunk_meta["fig"] = str(fig_stack[-1])
            fr = [M_PARA, tag, len(spans)]
        elif kind == "list":
            fr = [M_LIST, tag, 0, tag]
        elif kind == "table":
            fr = [M_TABLE, tag, [], None, "top", None]
        elif kind == "hr" or kind == "page-break":
            # the tree walker emits and never walks the children: a
            # non-void hr/page-break element discards its subtree
            if kind == "hr":
                emit(TEXT, "", None, {"tag": "hr"} if meta_mode else None)
            else:
                emit(PAGEBREAK, None, None)
            t = frames[-1]
            if t[0] == M_LI and meta_mode:  # li meta reset after blocks
                chunk_meta = li_meta_of(t)
            if not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return
        elif kind == "page":
            fr = [M_FRAG, tag, True, False]
        else:  # fragment
            fr = [M_FRAG, tag, False, False]
            if meta_mode and tag == "figure":
                fig_n[0] += 1
                fig_stack.append(fig_n[0])

        frames.append(fr)
        open_tags.append(tag)
        if self_closing:  # void block: open+close immediately
            pop_close()

    def start_rawtext(action: int, sink=None) -> None:
        nonlocal rt_tag, rt_depth, rt_action, rt_sink
        # rt_tag is set by wopen (the element's tag)
        rt_depth = 0
        rt_action = action
        rt_sink = sink
        rt_parts.clear()

    def finish_rawtext() -> None:
        nonlocal rt_tag
        content = "".join(rt_parts)
        rt_parts.clear()
        rt_tag = None
        if rt_action == RT_CHUNK:
            add_text(content)  # raw, undecoded (parse_tokens parity)
        elif rt_action == RT_FLAT and content:
            # tree parity: an EMPTY rawtext element has no text child at
            # all — appending '' here would make the flatten parts list
            # truthy and trip the block-separator newline downstream
            rt_sink.append(content)
        # RT_DISCARD: nothing

    # ------------------------------------------------------------------
    def wtext(token: str) -> None:
        nonlocal link_chars
        if rt_tag is not None:
            rt_parts.append(token)
            return
        top = frames[-1]
        mode = top[0]
        if mode == M_FRAG:
            if top[3]:  # deferred pagebreak from a page sibling
                top[3] = False
                emit(PAGEBREAK, None, None)
            # add_text(_decode(token)) inlined (hot path): minify
            # delivery guarantees token is non-empty here, but the
            # unescape can't produce '' from non-empty input either,
            # so the emptiness guard reduces to truthiness of token
            text = _unescape(token) if "&" in token else token
            if text:
                chunk.append(text)
                if a_depth > 0:
                    link_chars += len(text)
        elif mode == M_PARA or mode == M_INLINE:
            text = _unescape(token) if "&" in token else token
            if text:
                chunk.append(text)
                if a_depth > 0:
                    link_chars += len(text)
        elif mode == M_LI:
            if top[9]:  # pending trailing '\n' of an inlined <p>
                top[9] = False
                add_text("\n")
            top[7] += 1
            top[8] = False
            text = _unescape(token) if "&" in token else token
            if text:
                chunk.append(text)
                if a_depth > 0:
                    link_chars += len(text)
        elif mode == M_INLINED_P:
            if top[2]:  # break-before fires on first child of any kind
                top[2] = False
                add_text("\n")
            add_text(_decode(token))  # cold branch: keep the call form
        elif mode == M_CELL or mode == M_FLAT or mode == M_CAPTION:
            top[2].append(_unescape(token) if "&" in token else token)
        # M_LIST / M_TABLE / M_TSECTION / M_TR / M_SUPPRESS: ignored

    def wclose(tag: str) -> None:
        nonlocal rt_depth
        if rt_tag is not None:
            if tag == rt_tag:
                if rt_depth == 0:
                    finish_rawtext()
                else:
                    rt_depth -= 1
                    rt_parts.append(f"</{tag}>")
            else:
                rt_parts.append(f"</{tag}>")
            return
        if open_tags[-1] == tag:
            # well-formed fast path: the close matches the top of the
            # stack (the overwhelmingly common case) — equivalent to
            # the general loop below running exactly one iteration,
            # without the bottom-up `in` scan that traverses the whole
            # stack precisely when the match is innermost
            pop_close()
            return
        if tag in open_tags:
            while True:
                match = open_tags[-1] == tag
                pop_close()
                if match:
                    break
        # unmatched close: ignored (browser behavior)

    def wopen(tag: str, raw: str, attrs, self_closing: bool,
              rawtext: bool) -> None:
        nonlocal rt_tag, rt_depth, a_depth, chunk_meta
        nonlocal chunk_href, chunk_tag_n
        if rt_tag is not None:
            if tag == rt_tag:
                rt_depth += 1
            rt_parts.append(raw)
            return

        # implied closes (dom.parse_tokens semantics, frame-aware)
        if tag in _P_CLOSERS and "p" in open_tags:
            while open_tags[-1] != "p":
                if open_tags[-1] in ("#root", "td", "th", "table", "li"):
                    break
                pop_close()
            if open_tags[-1] == "p":
                pop_close()
        t_top = open_tags[-1]
        if tag == "li" and t_top == "li":
            pop_close()
        elif tag in ("td", "th") and t_top in ("td", "th"):
            pop_close()
        elif tag == "tr":
            while open_tags[-1] in ("td", "th", "tr"):
                pop_close()
        elif tag == "option" and t_top == "option":
            pop_close()
        top = frames[-1]
        mode = top[0]

        # ---- suppress / structural containers first -------------------
        if mode == M_SUPPRESS:
            if rawtext:
                rt_tag = tag
                start_rawtext(RT_DISCARD)
            elif not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return

        if mode == M_LIST:
            if rawtext:
                rt_tag = tag
                start_rawtext(RT_DISCARD)  # non-li child: ignored
            elif tag == "li":
                li_id = attrs.get("id") if attrs else None
                fr = [M_LI, tag, top[2], top[3], li_id, len(spans),
                      False, 0, False, False]
                if meta_mode:
                    chunk_meta = li_meta_of(fr)
                frames.append(fr)
                open_tags.append(tag)
                if self_closing:  # degenerate <li/>
                    pop_close()
            elif tag in LIST_TAGS and not self_closing:
                frames.append([M_LIST, tag, top[2], tag])
                open_tags.append(tag)
            elif not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return

        if mode == M_TABLE:
            if rawtext:
                rt_tag = tag
                start_rawtext(RT_DISCARD)
            elif tag == "tr":
                if self_closing:
                    # tree parity: a childless <tr/> node still lands an
                    # empty grid row in _table (open+close, like <li/>)
                    top[2].append(("tbody", []))
                else:
                    frames.append([M_TR, tag, "tbody", [], top[2]])
                    open_tags.append(tag)
            elif tag in ("thead", "tbody", "tfoot") and not self_closing:
                frames.append([M_TSECTION, tag, tag, top[2]])
                open_tags.append(tag)
            elif tag == "caption":
                style = _css.computed_style(tag, attrs, sheet)
                side = style.get("caption-side", "top").strip().lower()
                if self_closing:
                    # tree parity: an empty caption still overwrites
                    # the collected caption text ('') and side
                    top[3] = ""
                    top[4] = side
                else:
                    frames.append([M_CAPTION, tag, [], top, side])
                    open_tags.append(tag)
            elif not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return

        if mode == M_TSECTION:
            if rawtext:
                rt_tag = tag
                start_rawtext(RT_DISCARD)
            elif tag == "tr":
                if self_closing:
                    top[3].append((top[2], []))  # childless <tr/> row
                else:
                    frames.append([M_TR, tag, top[2], [], top[3]])
                    open_tags.append(tag)
            elif not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return

        if mode == M_TR:
            if rawtext:
                rt_tag = tag
                start_rawtext(RT_DISCARD)
            elif tag in ("td", "th"):
                cs = _span_int(attrs.get("colspan")) if attrs else 1
                rs = _span_int(attrs.get("rowspan")) if attrs else 1
                frames.append([M_CELL, tag, [], cs, rs, top[3]])
                open_tags.append(tag)
                if self_closing:  # degenerate <td/>
                    pop_close()
            elif not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return

        if mode == M_CELL or mode == M_FLAT or mode == M_CAPTION:
            parts = top[2]
            kind = kind_of(tag, attrs)
            if kind == "drop" or hidden(tag, attrs):
                if rawtext:
                    rt_tag = tag
                    start_rawtext(RT_DISCARD)
                elif not self_closing:
                    frames.append([M_SUPPRESS, tag])
                    open_tags.append(tag)
                return
            if kind == "br":
                parts.append("\n")
                return
            if kind == "img":
                return
            if rawtext:
                if kind == "inline":
                    rt_tag = tag
                    start_rawtext(RT_FLAT, parts)
                    return
                raise StreamFallback(tag)
            if kind == "table":
                if not self_closing:
                    frames.append([M_TABLE, tag, [], None, "top", parts])
                    open_tags.append(tag)
                return
            if kind == "inline":
                if not self_closing:
                    frames.append([M_FLAT, tag, parts])
                    open_tags.append(tag)
                return
            # block inside a cell: newline separation, keep collecting
            if parts and not parts[-1].endswith("\n"):
                parts.append("\n")
            if not self_closing:
                frames.append([M_FLAT, tag, parts])
                open_tags.append(tag)
            return

        if mode == M_INLINED_P:
            if top[2]:  # break-before fires on ANY first child token
                top[2] = False
                add_text("\n")
            kind = kind_of(tag, attrs)
            if kind == "inline":
                if rawtext:
                    # tree parity: non-'br' non-inline-walked grandkids
                    # are ignored, but an un-dropped script IS inline
                    chunk_tag_n += 1
                    rt_tag = tag
                    start_rawtext(RT_CHUNK)
                    return
                chunk_tag_n += 1
                is_anchor = tag == "a"
                if is_anchor:
                    if meta_mode and chunk_href is None:
                        chunk_href = (attrs or {}).get("href")
                    if not self_closing:
                        a_depth += 1
                if not self_closing:
                    frames.append([M_INLINE, tag, is_anchor])
                    open_tags.append(tag)
            elif tag == "br":
                add_text("\n")
            elif rawtext:
                rt_tag = tag
                start_rawtext(RT_DISCARD)
            elif not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return

        # ---- chunking contexts: M_FRAG / M_PARA / M_INLINE / M_LI -----
        kind = kind_of(tag, attrs)

        if mode == M_LI:
            if top[9]:
                top[9] = False
                add_text("\n")
            child_i = top[7]
            prev_is_p = top[8]
            top[7] = child_i + 1
            # tree parity: _list_item reads prev[0] == "p" POSITIONALLY
            # off the raw sibling list — a hidden or dropped <p> still
            # counts as "prev is a p" for the next sibling, and a
            # dropped <script> counts as "not a p"; set it from the raw
            # tag here, before the drop check.
            top[8] = tag == "p"
            if kind == "drop" or hidden(tag, attrs):
                if rawtext:
                    rt_tag = tag
                    start_rawtext(RT_DISCARD)
                elif not self_closing:
                    frames.append([M_SUPPRESS, tag])
                    open_tags.append(tag)
                return
            if kind == "inline":
                chunk_tag_n += 1
                if rawtext:
                    rt_tag = tag
                    start_rawtext(RT_CHUNK)
                    return
                is_anchor = tag == "a"
                if is_anchor and meta_mode and chunk_href is None:
                    chunk_href = (attrs or {}).get("href")
                if self_closing:
                    return
                if is_anchor:
                    a_depth += 1
                frames.append([M_INLINE, tag, is_anchor])
                open_tags.append(tag)
                return
            if kind == "br":
                add_text("\n")
                return
            if kind == "img":
                flush()
                emit(IMAGE, None, resolve_img_src(attrs, img_crawl),
                 img_meta(attrs))
                return
            if rawtext:
                raise StreamFallback(tag)
            if kind == "paragraph" and tag == "p":
                if self_closing:
                    # <p/>: has_content False -> no break-before;
                    # trailing '\n' still pends on a next sibling
                    # (top[8] already records the p positionally above)
                    top[9] = True
                    return
                need_break = child_i > 0 and not prev_is_p
                frames.append([M_INLINED_P, tag, need_break])
                open_tags.append(tag)
                return
            # block child of the li
            top[6] = True
            if chunk:
                flush()
            if kind == "list":
                if not self_closing:
                    frames.append([M_LIST, tag, top[2] + 1, tag])
                    open_tags.append(tag)
                elif meta_mode:
                    chunk_meta = li_meta_of(top)
                return
            open_block(kind, tag, attrs, self_closing)
            return

        # M_FRAG / M_PARA / M_INLINE share one dispatch
        if mode == M_FRAG and top[3]:
            top[3] = False
            emit(PAGEBREAK, None, None)

        if kind == "drop" or hidden(tag, attrs):
            if rawtext:
                rt_tag = tag
                start_rawtext(RT_DISCARD)
            elif not self_closing:
                frames.append([M_SUPPRESS, tag])
                open_tags.append(tag)
            return
        if kind == "inline":
            chunk_tag_n += 1
            if rawtext:
                rt_tag = tag
                start_rawtext(RT_CHUNK)
                return
            is_anchor = tag == "a"
            if is_anchor and meta_mode and chunk_href is None:
                chunk_href = (attrs or {}).get("href")
            if self_closing:
                return
            if is_anchor:
                a_depth += 1
            frames.append([M_INLINE, tag, is_anchor])
            open_tags.append(tag)
            return
        if kind == "br":
            add_text("\n")
            return
        if kind == "img":
            flush()
            emit(IMAGE, None, resolve_img_src(attrs, img_crawl),
                 img_meta(attrs))
            return
        if rawtext:
            raise StreamFallback(tag)
        flush()
        open_block(kind, tag, attrs, self_closing)

    def wfinish() -> list:
        if rt_tag is not None:
            finish_rawtext()  # unterminated script/style at EOF
        while len(frames) > 1:
            pop_close()
        flush()  # the final walker._flush()
        return spans

    return wtext, wopen, wclose, wfinish


def stream_spans(
    tokens: list,
    opts: ExtractOptions = DEFAULT_OPTIONS,
    sheet: "_css.Stylesheet | None" = None,
) -> list:
    """Token-list driver: classified ``minify_tokens`` output -> spans.
    Used when a <style> element requires the style pre-pass
    (``collect_styles_from_tokens``) before walking can start."""
    wtext, wopen, wclose, wfinish = _make_walker(opts, sheet)
    for token in tokens:
        if token.__class__ is str:
            wtext(token)
        elif token[0] == "o":
            raw = token[2]
            info = _classify_memo(raw)
            if info is None:
                # minify classified it open; trust the stream's tag
                tag = token[1]
                sc_dom = tag in VOID_ELEMENTS or raw[-2] == "/"
                wopen(tag, raw, None, sc_dom,
                      tag in RAWTEXT_ELEMENTS and not sc_dom)
            else:
                wopen(token[1], raw, info[4], info[2], info[3])
        else:
            wclose(token[1])
    return wfinish()


def stream_document(
    html: str,
    opts: ExtractOptions = DEFAULT_OPTIONS,
    sheet: "_css.Stylesheet | None" = None,
) -> list:
    """Fused fast path: raw HTML -> spans in ONE token loop (minify
    whitespace machine inlined, deliveries straight into the walker).
    The caller guarantees the document has no <style> element (those
    need the two-stage ``stream_spans`` path for the style pre-pass).

    The minify machine is a verbatim transplant of
    ``minify._stream_minify`` (frames ``[tag, is_pre, trim_edges,
    is_first_child, last_was_block, pending_text]``) with ``out.append``
    replaced by walker delivery; the <pre> post-pass (whitespace-run
    removal between tags + edge trim) runs as a streaming filter only
    when the document contains <pre>, exactly like ``minify_tokens``.
    """
    if "<!--" in html:
        html = _COMMENT_RE.sub("", html)

    wtext, wopen, wclose, wfinish = _make_walker(opts, sheet)

    pm = _PRE_SCAN_RE.search(html) is not None
    if not pm:
        out_text = out_ptext = wtext
        finish_filter = None
        buf = state = _flush_buf = None
    else:
        # streaming replica of minify_tokens' pre post-pass: buffer
        # PRE-INTERIOR raw text tokens; on the next tag (or EOF) drop
        # the buffered run iff it is all-whitespace AND tag-flanked on
        # both sides; apply the leading/trailing edge trim at the ends.
        # Scoped to pre interiors (r5-cont): only raw pre deliveries
        # can be whitespace-only — every machine-processed delivery
        # below is guarded by `t and not t.isspace()` — so buffering
        # processed text was pure overhead (the post-pass is a no-op
        # on it, same argument as minify_tokens' pre gate). Processed
        # text goes direct via out_ptext, which still maintains the
        # flank state and flushes any straddling buffered run (a run
        # with text on its right flank is never dropped).
        # state: [last_was_tag, delivered_anything, buf_all_ws]
        buf: list[str] = []
        state = [False, False, True]

        def _flush_buf(next_is_tag: bool) -> None:
            if next_is_tag and state[0] and state[2]:
                buf.clear()
                return
            if not state[1]:
                # leading edge trim: lstrip, drop now-empty from front
                while buf:
                    buf[0] = buf[0].lstrip()
                    if buf[0]:
                        break
                    buf.pop(0)
            for t in buf:
                state[1] = True
                state[0] = False
                wtext(t)
            buf.clear()
            state[2] = True

        def out_text(t: str) -> None:
            if t and not t.isspace():
                state[2] = False
            buf.append(t)

        # one-slot deferral for processed text: the overall trailing
        # edge trim (minify_tokens' rstrip) must reach the LAST text
        # token of the document even when it was machine-processed
        # (fuzz-caught: a mid-doc pending resolved by a text sibling
        # keeps its trailing space, and root-ignored closes after it
        # deliver nothing), so a processed delivery is held until the
        # next delivery of any kind. pend and buf are mutually
        # exclusive: buf fills only inside pre frames (entering one
        # flushes pend at the <pre> open) and out_ptext flushes buf.
        pend: list = [None]

        def _deliver_pend() -> None:
            t = pend[0]
            pend[0] = None
            if not state[1]:
                # document-leading edge trim (minify_tokens' overall
                # lstrip): fires when NOTHING was delivered yet — the
                # machine's root first-child lstrip misses text whose
                # first-child flag was consumed by a dropped unmatched
                # close (fuzz-caught), exactly like the buffered run's
                # leading trim in _flush_buf
                t = t.lstrip()
                if not t:
                    return
            state[0] = False
            state[1] = True
            wtext(t)

        def out_ptext(t: str) -> None:
            if pend[0] is not None:
                _deliver_pend()
            if buf:
                _flush_buf(False)
            pend[0] = t

        def finish_filter() -> None:
            if pend[0] is not None:
                # overall trailing trim on a deferred processed token;
                # processed text is never whitespace-only (guarded at
                # every call site), so the rstrip always leaves residue
                # and no cascade into earlier tokens is possible
                pend[0] = pend[0].rstrip()
                _deliver_pend()
            # trailing edge trim: rstrip, drop now-empty from the end
            while buf:
                buf[-1] = buf[-1].rstrip()
                if buf[-1]:
                    break
                buf.pop()
            if buf:
                _flush_buf(False)

    # ---- the minify machine (transplanted _stream_minify loop) --------
    # frame: [tag, is_pre, trim_edges, is_first_child, last_was_block,
    #         pending_text]
    frames: list[list] = [[None, False, True, True, False, None]]
    f = frames[0]
    memo_get = _TAG_MEMO.get

    for token in _TOKEN_RE.findall(html):
        if token[0] != "<":
            if f[1]:  # pre interior: raw, whitespace preserved
                out_text(token)
                continue
            tp = f[5]
            if tp is not None:
                # adjacent text siblings (stray close tag dropped
                # between them): emit the earlier one as-is
                f[5] = None
                if tp and not tp.isspace():
                    out_ptext(tp)
            t = _collapse(token)
            if f[4]:  # previous sibling was a block tag
                t = t.lstrip()
            if f[3] and f[2]:  # first child of a trimming parent
                t = t.lstrip()
            f[3] = False
            f[4] = False
            f[5] = t
            continue

        info = memo_get(token, False)
        if info is False:
            info = _classify_memo(token)
        if info is None:  # close tag (pops ONE frame, renamed to opener)
            if len(frames) > 1:
                t = f[5]
                if t is not None:  # resolve pending (closing=True)
                    f[5] = None
                    if f[2]:
                        t = t.rstrip()
                    if t and not t.isspace():
                        out_ptext(t)
                if pm:
                    if pend[0] is not None:
                        _deliver_pend()
                    if buf:
                        _flush_buf(True)
                    state[0] = True
                    state[1] = True
                wclose(f[0])
                frames.pop()
                f = frames[-1]
            continue

        tag, sc_min, sc_dom, rawtext, attrs = info
        t = f[5]
        if t is not None:  # resolve pending (next_is_block=...)
            f[5] = None
            if tag in _BLOCK_TAGS and t and t[-1].isspace():
                t = t.rstrip() + " "
            if t and not t.isspace():
                out_ptext(t)
        if pm:
            if pend[0] is not None:
                _deliver_pend()
            if buf:
                _flush_buf(True)
            state[0] = True
            state[1] = True
        wopen(tag, token, attrs, sc_dom, rawtext)
        f[3] = False
        f[4] = tag in _BLOCK_TAGS
        if not sc_min:
            f = [tag, tag == "pre", tag in _BLOCK_TAGS, True, False, None]
            frames.append(f)

    # EOF: unclosed elements close here (fixture parser.test.ts:159-169)
    while len(frames) > 1:
        f = frames[-1]
        t = f[5]
        if t is not None:
            f[5] = None
            if f[2]:
                t = t.rstrip()
            if t and not t.isspace():
                out_ptext(t)
        if pm:
            if pend[0] is not None:
                _deliver_pend()
            if buf:
                _flush_buf(True)
            state[0] = True
            state[1] = True
        wclose(f[0])
        frames.pop()
    root = frames[0]
    t = root[5]
    if t is not None:
        root[5] = None
        if root[2]:
            t = t.rstrip()
        if t and not t.isspace():
            out_ptext(t)

    if finish_filter is not None:
        finish_filter()
    return wfinish()


def _close_table(fr: list, emit, meta_mode: bool) -> None:
    """Emit a collected table: grid linearization + caption placement;
    nested tables (sink is a cell's parts list) append their flattened
    text instead (extract._flatten_text parity)."""
    rows = fr[2]
    caption_text = fr[3]
    caption_side = fr[4]
    sink = fr[5]
    ordered = (
        [c for s, c in rows if s == "thead"]
        + [c for s, c in rows if s == "tbody"]
        + [c for s, c in rows if s == "tfoot"]
    )
    text = _linearize_grid(ordered)

    if sink is not None:
        pieces = []
        if caption_text and caption_side != "bottom":
            pieces.append(caption_text)
        pieces.append(text)
        if caption_text and caption_side == "bottom":
            pieces.append(caption_text)
        sink.append("\n".join(pieces))
        return

    cap_meta = {"tag": "caption"} if meta_mode else None
    tbl_meta = None
    if meta_mode:
        tbl_meta = {"tag": "table"}
        n_thead = sum(1 for s, _ in rows if s == "thead")
        n_tfoot = sum(1 for s, _ in rows if s == "tfoot")
        if n_thead:
            tbl_meta["thead_rows"] = str(n_thead)
        if n_tfoot:
            tbl_meta["tfoot_rows"] = str(n_tfoot)
    if caption_text and caption_side != "bottom":
        emit(TEXT, caption_text, None, cap_meta)
    emit(TABLE, text, None, tbl_meta)
    if caption_text and caption_side == "bottom":
        if cap_meta is not None:
            cap_meta = dict(cap_meta, side="bottom")
        emit(TEXT, caption_text, None, cap_meta)
