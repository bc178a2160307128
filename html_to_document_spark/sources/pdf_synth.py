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


def _esc_literal(s: str) -> bytes:
    raw = s.encode("cp1252", errors="replace")
    return (
        raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


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
) -> bytes:
    """Build one page's BT..ET text block."""
    ops: list[bytes] = [b"BT", b"/F1 12 Tf"]

    def encode_string(s: str) -> bytes:
        if two_byte:
            assert charmap is not None
            hx = b"".join(b"%04X" % charmap[ch] for ch in s)
            return b"<" + hx + b">"
        if string_mode == "hex":
            return (
                b"<"
                + s.encode("cp1252", errors="replace").hex().upper().encode()
                + b">"
            )
        return b"(" + _esc_literal(s) + b")"

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
    """
    charmap: dict[str, int] | None = None
    if tounicode:
        alphabet = sorted({ch for page in pages for ln in page for ch in ln})
        charmap = {ch: i + 1 for i, ch in enumerate(alphabet)}

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
        )
        objects[content_base + i] = stream_obj(b"", payload, filter)

    if tounicode:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /ToUnicode %d 0 R >>" % cmap_num
        )
        assert charmap is not None
        objects[cmap_num] = stream_obj(b"", _tounicode_cmap(charmap), "flate")
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
