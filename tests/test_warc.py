"""WARC source: synthetic .warc/.warc.gz fixtures -> DataFrame ->
end-to-end extraction."""

import gzip

from html_to_document_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
)


def _record(rtype, rid, uri, payload: bytes, http=False) -> bytes:
    if http:
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                   + payload)
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _fixture() -> bytes:
    return b"".join([
        _record("warcinfo", "w0", "", b"software: test\r\n"),
        _record("request", "r0", "http://a.example/", b"GET / HTTP/1.1\r\n"),
        _record("response", "r1", "http://a.example/",
                b"<h1>Title</h1><p>body one</p>", http=True),
        _record("response", "r2", "http://b.example/x",
                # payload CONTAINS the record-head magic: the walker
                # must not split on it
                b"<p>literal WARC/1.0 inside</p>", http=True),
        _record("conversion", "r3", "http://c.example/",
                b"plain converted text"),
    ])


def test_parse_warc_bytes_walks_by_content_length():
    recs = parse_warc_bytes(_fixture())
    assert [r[0] for r in recs] == ["urn:uuid:r1", "urn:uuid:r2",
                                    "urn:uuid:r3"]
    assert recs[0][3] == "<h1>Title</h1><p>body one</p>"  # HTTP stripped
    assert recs[1][3] == "<p>literal WARC/1.0 inside</p>"
    assert recs[2][3] == "plain converted text"
    assert recs[0][1] == "http://a.example/"


def test_parse_warc_skips_malformed():
    junk = b"garbage\r\n" + _fixture() + b"WARC/1.0\r\nbroken"
    assert len(parse_warc_bytes(junk)) == 3


def test_read_warc_plain_and_gz_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.extract_spans import (
        exploded,
        extract_spans_from_html,
    )

    raw = _fixture()
    (tmp_path / "a.warc").write_bytes(raw)
    # .warc.gz: per-record gzip members concatenated (the spec's form)
    members = [gzip.compress(_record("response", "g1", "http://g.example/",
                                     b"<ul><li>gz one</li></ul>",
                                     http=True)),
               gzip.compress(_record("response", "g2", "http://g.example/2",
                                     b"<p>gz two</p>", http=True))]
    (tmp_path / "b.warc.gz").write_bytes(b"".join(members))

    df = read_warc(spark, str(tmp_path))
    rows = {r.doc_id: r for r in df.collect()}
    assert set(rows) == {"urn:uuid:r1", "urn:uuid:r2", "urn:uuid:r3",
                         "urn:uuid:g1", "urn:uuid:g2"}
    assert rows["urn:uuid:g1"].html == "<ul><li>gz one</li></ul>"

    # straight into the extraction pipeline
    spans = exploded(extract_spans_from_html(
        df.filter(F.col("doc_id") == "urn:uuid:r1")))
    texts = [r.text for r in spans.orderBy("offset").collect()]
    assert texts == ["Title", "body one"]


def _pdf_record(rid, uri, pdf_bytes: bytes) -> bytes:
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
               + pdf_bytes)
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"WARC-Identified-Payload-Type: application/pdf\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def test_read_warc_binary_types_keeps_pdf_bytes(spark, tmp_path):
    from html_to_document_spark.core.pdf import pdf_text_lines
    from html_to_document_spark.sources.pdf_synth import make_pdf

    pdf = make_pdf([["pdf alpha", "pdf beta"]])
    (tmp_path / "mixed.warc").write_bytes(
        _fixture() + _pdf_record("p1", "http://a.example/doc.pdf", pdf)
    )
    df = read_warc(spark, str(tmp_path), binary_types=("application/pdf",))
    assert df.columns == ["doc_id", "url", "content_type", "html", "content"]
    rows = {r.doc_id: r for r in df.collect()}
    prow = rows["urn:uuid:p1"]
    assert prow.content_type == "application/pdf"
    assert prow.html is None
    # byte-exact round trip through the gzip-less path
    assert pdf_text_lines(bytes(prow.content)) == ["pdf alpha", "pdf beta"]
    # text records are untouched and carry no payload bytes
    assert rows["urn:uuid:r1"].content is None
    assert rows["urn:uuid:r1"].html == "<h1>Title</h1><p>body one</p>"


def test_http_content_type_used_when_no_identified_payload(spark, tmp_path):
    """wget/heritrix archives carry the payload type only in the HTTP
    header; the walker must surface it (review finding)."""
    from html_to_document_spark.core.pdf import pdf_text_lines
    from html_to_document_spark.sources.pdf_synth import make_pdf

    pdf = make_pdf([["wget style pdf"]])
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
               + pdf)
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:wg1>\r\n"
        f"WARC-Target-URI: http://w.example/a.pdf\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    (tmp_path / "w.warc").write_bytes(head + payload + b"\r\n\r\n")
    df = read_warc(spark, str(tmp_path), binary_types=("application/pdf",))
    row = df.collect()[0]
    assert row.content_type == "application/pdf"
    assert row.html is None
    assert pdf_text_lines(bytes(row.content)) == ["wget style pdf"]
    # and the charset-parameter form still resolves to the bare type
    recs = parse_warc_bytes(
        head.replace(b"Content-Type: application/http; msgtype=response",
                     b"Content-Type: application/http")
        + payload.replace(b"application/pdf",
                          b"text/html; charset=UTF-8 ") + b"\r\n\r\n")
    assert recs[0][2] == "text/html"
