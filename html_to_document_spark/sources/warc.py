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


def parse_warc_bytes(data: bytes) -> list[tuple[str, str, str, str]]:
    """Sequential record walk over a plain (decompressed) WARC byte
    stream. Returns (record_id, target_uri, content_type, body_text)
    for response/conversion/resource records; skips request/metadata/
    warcinfo records and anything malformed."""
    out: list[tuple[str, str, str, str]] = []
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
        if rtype == "response" and (
            body[:5] == b"HTTP/" or body[:5] == b"http/"
        ):
            # strip the wrapped HTTP header block
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                body = body[http_end + 4 :]
        out.append(
            (
                headers.get("warc-record-id", "").strip("<>"),
                headers.get("warc-target-uri", ""),
                headers.get("content-type", ""),
                body.decode("utf-8", errors="replace"),
            )
        )
    return out


def read_warc(spark: "SparkSession", path: str) -> "DataFrame":
    """WARC files under ``path`` -> (doc_id, url, content_type, html).

    ``doc_id`` is the WARC-Record-ID (unique per record per the spec);
    pipe the result straight into ``extract_spans_from_html``.
    Handles ``.warc`` and ``.warc.gz`` (multi-member gzip) alike.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").option(
        "pathGlobFilter", "*.warc*"
    ).load(path).select("path", "content")

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {"doc_id": [], "url": [], "content_type": [], "html": []}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz") or data[:2] == b"\x1f\x8b":
                    try:
                        data = gzip.decompress(data)
                    except OSError:
                        continue  # truncated/corrupt archive member
                for rid, url, ctype, body in parse_warc_bytes(data):
                    rows["doc_id"].append(rid)
                    rows["url"].append(url)
                    rows["content_type"].append(ctype)
                    rows["html"].append(body)
            yield pd.DataFrame(rows)

    return files.mapInPandas(fn, WARC_SCHEMA)
