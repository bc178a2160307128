"""Deterministic PDF writer for tests and oracle-gated queries.

Generating PDFs beats shipping binary fixtures: the corpus stays a
pure function of its inputs (the same property ``synthetic.py`` gives
HTML docs), the expected text is known by construction, and the writer
can be parameterized to hit every parser branch — classic xref,
Flate/LZW/AHx/A85 filters, literal vs hex strings, TJ kerning arrays,
Td/T*/Tm line movement, multi-page trees, object streams, and Type0
fonts with ToUnicode CMaps. No external PDF library is involved in
either direction, so a writer bug cannot cancel a reader bug: goldens
pin exact extracted text, and ``tests/test_pdf.py`` additionally pins
several hand-assembled byte-level documents.
"""

from __future__ import annotations

import zlib

__all__ = ["make_pdf"]


def _esc_literal(raw: bytes) -> bytes:
    return (
        raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


# Writer-side char -> glyph name for the /Differences variant. Written
# by hand, independently of the reader's AGL table in ``core/pdf.py``,
# so a table bug on either side shows up as a round-trip mismatch
# instead of cancelling out.
_GLYPH_NAMES = {
    " ": "space", "!": "exclam", '"': "quotedbl", "#": "numbersign",
    "$": "dollar", "%": "percent", "&": "ampersand", "'": "quotesingle",
    "(": "parenleft", ")": "parenright", "*": "asterisk", "+": "plus",
    ",": "comma", "-": "hyphen", ".": "period", "/": "slash",
    ":": "colon", ";": "semicolon", "<": "less", "=": "equal",
    ">": "greater", "?": "question", "@": "at", "[": "bracketleft",
    "\\": "backslash", "]": "bracketright", "_": "underscore",
    "0": "zero", "1": "one", "2": "two", "3": "three", "4": "four",
    "5": "five", "6": "six", "7": "seven", "8": "eight", "9": "nine",
    "é": "eacute", "è": "egrave", "ê": "ecircumflex", "à": "agrave",
    "ä": "adieresis", "ö": "odieresis", "ü": "udieresis",
    "ñ": "ntilde", "ç": "ccedilla", "ß": "germandbls",
    "€": "Euro", "–": "endash", "—": "emdash",
    "“": "quotedblleft", "”": "quotedblright", "•": "bullet",
}
for _ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _GLYPH_NAMES[_ch] = _ch


def _differences_charmap(pages: list[list[str]]) -> dict[str, int]:
    """Deterministic char -> byte-code remap for every char that has a
    writer glyph name; chars without a name keep their cp1252 byte and
    stay out of /Differences (WinAnsi base covers them). Codes come
    from bytes no identity char occupies, high range first, so the raw
    content bytes are deliberately NOT cp1252 of the text."""
    chars = sorted({ch for page in pages for ln in page for ch in ln})
    namable = [ch for ch in chars if ch in _GLYPH_NAMES]
    identity = {
        ch.encode("cp1252", errors="replace")[0]
        for ch in chars
        if ch not in _GLYPH_NAMES
    }
    pool = [
        c
        for c in list(range(0x80, 0x100)) + list(range(0x21, 0x7F))
        if c not in identity
    ]
    assert len(namable) <= len(pool), "alphabet too large for remap"
    return {ch: pool[i] for i, ch in enumerate(namable)}


def _differences_array(charmap: dict[str, int]) -> bytes:
    """[ code /name /name ... ] with run-length code grouping."""
    by_code = sorted((code, _GLYPH_NAMES[ch]) for ch, code in charmap.items())
    parts: list[bytes] = []
    prev = None
    for code, name in by_code:
        if prev is None or code != prev + 1:
            parts.append(b"%d" % code)
        parts.append(b"/" + name.encode("ascii"))
        prev = code
    return b"[ " + b" ".join(parts) + b" ]"


def _a85(data: bytes) -> bytes:
    import base64

    return base64.a85encode(data) + b"~>"


def _content_stream(
    lines: list[str],
    *,
    string_mode: str,
    line_op: str,
    two_byte: bool,
    charmap: dict[str, int] | None,
    byte_enc=None,
    layout: str | None = None,
) -> bytes:
    """Build one page's BT..ET text block. ``byte_enc`` overrides the
    default cp1252 text->bytes encoding for simple-font variants
    (MacRoman base encoding, /Differences remaps). ``layout="twocol"``
    splits the page's lines into two columns (first half left, second
    half right) and draws the RIGHT text box before the left one —
    the DTP-generator draw order that garbles stream-order extraction
    and requires the reader's ``reading_order`` pass to restore."""
    ops: list[bytes] = [b"BT", b"/F1 12 Tf"]
    if byte_enc is None:
        def byte_enc(s: str) -> bytes:
            return s.encode("cp1252", errors="replace")

    def encode_string(s: str) -> bytes:
        if two_byte:
            assert charmap is not None
            hx = b"".join(b"%04X" % charmap[ch] for ch in s)
            return b"<" + hx + b">"
        if string_mode == "hex":
            return b"<" + byte_enc(s).hex().upper().encode() + b">"
        return b"(" + _esc_literal(byte_enc(s)) + b")"

    if layout == "twocol" and len(lines) >= 4:
        half = (len(lines) + 1) // 2
        columns = ((340, lines[half:]), (72, lines[:half]))
        for x, col in columns:
            for r, line in enumerate(col):
                ops.append(b"1 0 0 1 %d %d Tm" % (x, 720 - 14 * r))
                ops.append(encode_string(line) + b" Tj")
        ops.append(b"ET")
        return b"\n".join(ops)

    for i, line in enumerate(lines):
        if line_op == "Tm":
            y = 720 - 14 * i
            ops.append(b"1 0 0 1 72 %d Tm" % y)
        elif i == 0:
            ops.append(b"72 720 Td")
        elif line_op == "T*":
            if i == 1:
                ops.append(b"14 TL")
            ops.append(b"T*")
        else:  # Td moves
            ops.append(b"0 -14 Td")
        if string_mode == "tj" and not two_byte:
            # split the line into two TJ elements with a kerning gap
            # below the word-gap threshold (renders as a space)
            mid = max(1, len(line) // 2)
            a, b = line[:mid].rstrip(" "), line[mid:].lstrip(" ")
            had_space = len(a) + len(b) < len(line) or " " in (
                line[mid - 1 : mid + 1]
            )
            if had_space and a and b:
                ops.append(
                    b"[" + encode_string(a) + b" -250 " + encode_string(b)
                    + b"] TJ"
                )
            else:
                ops.append(b"[" + encode_string(line) + b"] TJ")
        else:
            ops.append(encode_string(line) + b" Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def _tounicode_cmap(charmap: dict[str, int]) -> bytes:
    entries = b"\n".join(
        b"<%04X> <%04X>" % (code, ord(ch)) for ch, code in charmap.items()
    )
    return (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"%d beginbfchar\n" % len(charmap)
        + entries
        + b"\nendbfchar\nendcmap\nend\n"
    )


def make_pdf(
    pages: list[list[str]],
    *,
    filter: str = "flate",
    string_mode: str = "literal",
    line_op: str = "Td",
    tounicode: bool = False,
    objstm: bool = False,
    encoding: str | None = None,
    layout: str | None = None,
) -> bytes:
    """Assemble a complete PDF whose extracted text is exactly
    ``pages`` (one list of lines per page; pages joined downstream
    with a blank line by the extractor).

    filter: "flate" | "ahx" | "a85" | "none" for the content streams.
    string_mode: "literal" | "hex" | "tj".
    line_op: "Td" | "T*" | "Tm".
    tounicode: use a Type0 font + 2-byte codes + ToUnicode CMap.
    objstm: pack catalog/pages/page/font dicts into a compressed
    object stream (xref-stream-era layout).
    encoding: None (WinAnsi-implicit cp1252) | "macroman" (named
    /MacRomanEncoding base, mac_roman content bytes) | "differences"
    (indirect /Encoding dict with a /Differences remap — content
    bytes deliberately differ from cp1252 so a reader that ignores
    the table extracts garbage).
    layout: None | "twocol" (pages with >= 4 lines draw as two
    columns, RIGHT text box first, so stream-order extraction yields
    the columns swapped and only a reading-order-aware reader
    recovers ``pages`` verbatim; shorter pages fall back to the
    normal single-column path).
    """
    assert not (tounicode and encoding), "tounicode excludes encoding"
    charmap: dict[str, int] | None = None
    byte_enc = None
    diff_map: dict[str, int] | None = None
    if tounicode:
        alphabet = sorted({ch for page in pages for ln in page for ch in ln})
        charmap = {ch: i + 1 for i, ch in enumerate(alphabet)}
    elif encoding == "macroman":
        def byte_enc(s: str) -> bytes:
            # Annex D MacRomanEncoding has no euro (0xDB is
            # /currency); the Python codec would encode one, so the
            # writer treats it as unrepresentable like the reader does
            return s.replace("€", "?").encode(
                "mac_roman", errors="replace"
            )
    elif encoding == "differences":
        diff_map = _differences_charmap(pages)

        def byte_enc(s: str) -> bytes:
            return bytes(
                diff_map[ch]
                if ch in diff_map
                else ch.encode("cp1252", errors="replace")[0]
                for ch in s
            )
    elif encoding is not None:
        raise ValueError(f"unknown encoding variant: {encoding!r}")

    objects: dict[int, bytes] = {}  # num -> full body (dict [+ stream])
    n_pages = len(pages)
    # numbering: 1 catalog, 2 pages, 3..2+n page dicts, then contents,
    # then font (+ cmap)
    content_base = 3 + n_pages
    font_num = content_base + n_pages
    cmap_num = font_num + 1

    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pages))
    objects[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    for i in range(n_pages):
        objects[3 + i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_num, content_base + i)
        )

    def stream_obj(sdict_extra: bytes, payload: bytes, fname: str) -> bytes:
        if fname == "flate":
            enc, fdecl = zlib.compress(payload), b"/Filter /FlateDecode "
        elif fname == "ahx":
            enc = payload.hex().upper().encode() + b">"
            fdecl = b"/Filter /ASCIIHexDecode "
        elif fname == "a85":
            enc, fdecl = _a85(payload), b"/Filter /ASCII85Decode "
        else:
            enc, fdecl = payload, b""
        return (
            b"<< "
            + sdict_extra
            + fdecl
            + b"/Length %d >>\nstream\n" % len(enc)
            + enc
            + b"\nendstream"
        )

    for i, page_lines in enumerate(pages):
        payload = _content_stream(
            page_lines,
            string_mode=string_mode,
            line_op=line_op,
            two_byte=tounicode,
            charmap=charmap,
            byte_enc=byte_enc,
            layout=layout,
        )
        objects[content_base + i] = stream_obj(b"", payload, filter)

    if tounicode:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % cmap_num
        )
        assert charmap is not None
        objects[cmap_num] = stream_obj(b"", _tounicode_cmap(charmap), "flate")
    elif encoding == "macroman":
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /MacRomanEncoding >>"
        )
    elif encoding == "differences":
        # indirect /Encoding dict (reuses the cmap slot) so the
        # reader's resolve() path is exercised, matching real files
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding %d 0 R >>" % cmap_num
        )
        assert diff_map is not None
        objects[cmap_num] = (
            b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            b"/Differences " + _differences_array(diff_map) + b" >>"
        )
    else:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )

    if objstm:
        # pack the dict-only objects (catalog, pages, page dicts, font)
        # into one compressed ObjStm; streams stay top-level per spec
        member_nums = [
            n for n in sorted(objects)
            if b"\nstream\n" not in objects[n]
        ]
        offsets, bodies = [], []
        pos = 0
        for n in member_nums:
            bodies.append(objects[n])
            offsets.append((n, pos))
            pos += len(objects[n]) + 1
        header = b" ".join(b"%d %d" % (n, off) for n, off in offsets) + b" "
        payload = header + b" ".join(bodies) + b" "
        first = len(header)
        stm_num = max(objects) + 1
        for n in member_nums:
            del objects[n]
        objects[stm_num] = stream_obj(
            b"/Type /ObjStm /N %d /First %d " % (len(member_nums), first),
            payload,
            "flate",
        )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets_by_num: dict[int, int] = {}
    for num in sorted(objects):
        offsets_by_num[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    max_num = max(objects)
    out += b"xref\n0 %d\n" % (max_num + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max_num + 1):
        off = offsets_by_num.get(num, 0)
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (max_num + 1, xref_at)
    )
    return bytes(out)
