"""WARC source: read web-archive files (the Common Crawl container
format) into a (doc_id, url, content_type, html) DataFrame ready for
the extraction pipeline.

Public format: ISO 28500. A WARC file is a sequence of records, each a
``WARC/1.0\\r\\n`` header block (``Name: value`` lines, terminated by a
blank line) followed by exactly ``Content-Length`` payload bytes and a
``\\r\\n\\r\\n`` separator. ``response`` records wrap an HTTP response,
so the HTTP header block is stripped before the body is returned.
``.warc.gz`` files are per-record gzip members concatenated; Python's
``gzip.decompress`` handles multi-member streams, so one decompress
yields the plain byte stream.

Scale shape (100 TB lens): crawl archives ship as ~1 GB files —
``binaryFile`` gives one task per file, which is the right granularity
for the sequential Content-Length walk (records cannot be split on a
delimiter: payloads may contain ``WARC/1.0``). Parsing runs in an
Arrow-batched ``mapInPandas`` (one file per input row, many records
out), and the downstream extraction stage re-partitions by salted
doc-hash anyway, so per-file size skew does not survive past the scan.
Malformed records are skipped, not fatal — a crawl archive always
contains some.
"""

from __future__ import annotations

import gzip
from typing import TYPE_CHECKING, Iterator

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "doc_id string, url string, content_type string, html string"
)

_WANTED_TYPES = ("response", "conversion", "resource")


def _walk_warc_records(data: bytes) -> list[tuple[str, str, str, bytes]]:
    """Sequential record walk over a plain (decompressed) WARC byte
    stream. Returns (record_id, target_uri, content_type, body_BYTES)
    for response/conversion/resource records; skips request/metadata/
    warcinfo records and anything malformed. Bodies stay bytes here so
    binary payloads (PDF, media) survive; text decode is the caller's
    choice."""
    out: list[tuple[str, str, str, bytes]] = []
    i, n = 0, len(data)
    while i < n:
        # locate the next record head (tolerates leading junk/padding)
        head = data.find(b"WARC/", i)
        if head < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", head)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            i = hdr_end + 4
            continue
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        i = hdr_end + 4 + length
        rtype = headers.get("warc-type", "")
        if rtype not in _WANTED_TYPES:
            continue
        http_ctype = None
        if rtype == "response" and (
            body[:5] == b"HTTP/" or body[:5] == b"http/"
        ):
            # strip the wrapped HTTP header block, keeping its
            # Content-Type — wget/heritrix archives carry the payload
            # type ONLY here (no WARC-Identified-Payload-Type)
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                for hline in body[:http_end].split(b"\r\n")[1:]:
                    k, sep, v = hline.partition(b":")
                    if sep and k.strip().lower() == b"content-type":
                        http_ctype = (
                            v.strip().decode("latin-1").split(";")[0].strip()
                        )
                body = body[http_end + 4 :]
        out.append(
            (
                headers.get("warc-record-id", "").strip("<>"),
                headers.get("warc-target-uri", ""),
                # payload-type priority: the crawler's sniffed type,
                # then the HTTP header's, then the WARC-level one
                # (which for response records is just application/http)
                headers.get("warc-identified-payload-type")
                or http_ctype
                or headers.get("content-type", ""),
                body,
            )
        )
    return out


def parse_warc_bytes(data: bytes) -> list[tuple[str, str, str, str]]:
    """Text view of the record walk (the HTML-pipeline surface)."""
    return [
        (rid, url, ctype, body.decode("utf-8", errors="replace"))
        for rid, url, ctype, body in _walk_warc_records(data)
    ]


def read_warc(
    spark: "SparkSession",
    path: str,
    binary_types: tuple[str, ...] = (),
) -> "DataFrame":
    """WARC files under ``path`` -> (doc_id, url, content_type, html).

    ``doc_id`` is the WARC-Record-ID (unique per record per the spec);
    pipe the result straight into ``extract_spans_from_html``.
    Handles ``.warc`` and ``.warc.gz`` (multi-member gzip) alike.

    ``binary_types``: content-type prefixes (e.g.
    ``("application/pdf",)``) whose payloads must survive as raw bytes
    — those records get ``html = NULL`` and a populated ``content``
    binary column (appended to the schema only when the option is
    set); everything else decodes to text as before. This is how the
    interleaved crawl keeps PDFs byte-exact for the PDF extractor
    while HTML stays a string column.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.warc*"
    ).load(path).select("path", "content")
    schema = WARC_SCHEMA + (", content binary" if binary_types else "")

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "url": [], "content_type": [], "html": []
            }
            if binary_types:
                rows["content"] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    try:
                        data = gzip.decompress(data)
                    except OSError:
                        continue  # truncated/corrupt archive member
                for rid, url, ctype, body in _walk_warc_records(data):
                    rows["doc_id"].append(rid)
                    rows["url"].append(url)
                    rows["content_type"].append(ctype)
                    is_bin = any(ctype.startswith(p) for p in binary_types)
                    rows["html"].append(
                        None if is_bin
                        else body.decode("utf-8", errors="replace")
                    )
                    if binary_types:
                        rows["content"].append(body if is_bin else None)
            yield pd.DataFrame(rows)

    return files.mapInPandas(fn, schema)
