"""End-to-end crawl-to-training-set composition."""

import gzip

from pyspark.sql import functions as F

from html_to_document_spark.plans.crawl import build_crawl_pipeline


def _record(rid, host, body_html):
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
               + body_html.encode())
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: http://{host}/p/{rid}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _archive(tmp_path):
    words = ("the and for with this that from have good text page "
             "world data clear words about more here only when "
             "other some very just into over").split()
    recs = []
    for i in range(40):
        host = "spamfarm.biz" if i % 10 == 0 else f"site{i % 4}.example.com"
        body = " ".join(words[(i + j) % len(words)] for j in range(60))
        html = f"<h1>Doc {i}</h1><p>{body}</p>"
        if i % 7 == 0:
            html += "<p>contact admin@site.org now</p>"
        recs.append(_record(f"r{i:03d}", host, html))
    # one exact duplicate pair (same body as r1)
    recs.append(_record("rdup", "site9.example.com",
                        "<h1>Doc 1</h1><p>" + " ".join(
                            words[(1 + j) % len(words)] for j in range(60))
                        + "</p>"))
    (tmp_path / "crawl.warc").write_bytes(b"".join(recs))
    return str(tmp_path)


def test_crawl_pipeline_end_to_end(spark, tmp_path):
    path = _archive(tmp_path)
    bl = spark.createDataFrame([("spamfarm.biz",)], "domain string")
    out = build_crawl_pipeline(
        spark, path,
        blocklist=bl,
        num_partitions=4,
        min_quality=0.0,
        pii_scrub=True,
        pack_budget=256,
    )
    rows = out.collect()
    ids = {r.doc_id for r in rows}
    # blocklisted hosts dropped (i % 10 == 0 -> r000, r010, r020, r030)
    assert not any(i in ids for i in ("urn:uuid:r000", "urn:uuid:r010",
                                     "urn:uuid:r020", "urn:uuid:r030"))
    # exact dup removed: rdup's body equals r001's -> one survivor
    assert not ("urn:uuid:r001" in ids and "urn:uuid:rdup" in ids)
    assert ("urn:uuid:r001" in ids) or ("urn:uuid:rdup" in ids)
    # PII scrubbed from assembled text
    assert not any("admin@site.org" in r.text for r in rows)
    assert any("<EMAIL>" in r.text for r in rows)
    # packed: every row carries a bin, no regular bin over budget
    fills = {}
    for r in rows:
        assert r.bin_id is not None
        if not r.oversize:
            fills[r.bin_id] = fills.get(r.bin_id, 0) + len(r.text.split())
    assert fills and all(v <= 256 for v in fills.values())
    # extraction really ran: spans survive with the heading split out
    any_doc = rows[0]
    kinds = [s.kind for s in any_doc.spans]
    assert kinds.count("text") >= 2


def test_crawl_pipeline_mixture(spark, tmp_path):
    path = _archive(tmp_path)
    out = build_crawl_pipeline(
        spark, path,
        num_partitions=4,
        min_quality=0.0,
        mixture_targets={"site0.example.com": 1.0,
                         "site1.example.com": 1.0},
    )
    rows = out.collect()
    assert rows
    # only targeted hosts survive resampling (others get fraction 0)
    assert all(r.doc_id.startswith("urn:uuid:r") for r in rows)
    assert "source" not in out.columns


def _pdf_crawl_record(rid, host, pdf_bytes: bytes) -> bytes:
    payload = (b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n"
               + pdf_bytes)
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: http://{host}/f/{rid}.pdf\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"WARC-Identified-Payload-Type: application/pdf\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def test_crawl_pipeline_interleaved_pdf(spark, tmp_path):
    """PDF records flow through the same curation as HTML records."""
    from html_to_document_spark.sources.pdf_synth import make_pdf

    path = _archive(tmp_path)
    lines = [
        "the quick pdf document speaks about data and words here",
        "another line with more good text for quality scoring now",
    ]
    pdf_rec = _pdf_crawl_record("pdf1", "site1.example.com",
                                make_pdf([lines]))
    bad_pdf = _pdf_crawl_record("pdf2", "site2.example.com",
                                b"%PDF-1.4 but actually corrupt junk")
    (tmp_path / "pdfs.warc").write_bytes(pdf_rec + bad_pdf)

    out = build_crawl_pipeline(
        spark, path, num_partitions=4, min_quality=0.0, pii_scrub=True,
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert "urn:uuid:pdf1" in rows
    prow = rows["urn:uuid:pdf1"]
    # one span per PDF line, same contract as an HTML <p> sequence
    texts = [s.text for s in sorted(prow.spans, key=lambda s: s.offset)]
    assert texts == lines
    # corrupt PDF yields an empty doc -> filtered by the pipeline's
    # min-length/quality stages, never an error
    assert "urn:uuid:pdf2" not in rows
    # HTML docs unaffected by the pdf branch
    assert any(k.startswith("urn:uuid:r0") for k in rows)


def test_crawl_pipeline_pdf_disabled(spark, tmp_path):
    path = _archive(tmp_path)
    out = build_crawl_pipeline(
        spark, path, num_partitions=4, min_quality=0.0, pdf_types=(),
    )
    assert out.count() > 0


def test_crawl_pipeline_domain_cap(spark, tmp_path):
    """max_docs_per_domain caps over-represented hosts BEFORE parsing
    (hash selector: deterministic per seed, ~max_docs survivors per
    over-cap host, under-cap hosts untouched)."""
    path = _archive(tmp_path)

    def run(**kw):
        out = build_crawl_pipeline(
            spark, path, num_partitions=4, min_quality=0.0,
            pii_scrub=False, **kw,
        )
        return sorted(r.doc_id for r in out.select("doc_id").collect())

    full = run()
    capped = run(max_docs_per_domain=4)
    # NOT a subset of the uncapped run: capping away a doc's near-dup
    # partner can promote the doc to dedup keeper (r006 does exactly
    # this) — the guarantees are shrinkage and per-seed determinism
    assert len(capped) < len(full)          # the 9-10-doc hosts shrank
    assert capped == run(max_docs_per_domain=4)  # deterministic


def test_crawl_pipeline_host_rank_filter(spark, tmp_path):
    """Link-graph prioritization: low-rank hosts drop BEFORE parsing;
    unranked hosts survive."""
    path = _archive(tmp_path)
    ranks = spark.createDataFrame(
        [("site0.example.com", 0.01), ("site1.example.com", 1.7)],
        "node string, rank double",
    )
    out = build_crawl_pipeline(
        spark, path,
        host_ranks=ranks,
        min_host_rank=0.5,
        num_partitions=4,
        pii_scrub=False,
    )
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    # site0 hosts doc ids i%4==0 and i%10!=0: ALL dropped pre-parse
    site0 = {f"urn:uuid:r{i:03d}" for i in range(40)
             if i % 4 == 0 and i % 10 != 0}
    assert not (ids & site0)
    # ranked-above-threshold (site1) and unranked (site2) hosts both
    # survive the rank filter (downstream near-dup collapses rotated
    # bodies, so assert per host family, not per doc)
    site1 = {f"urn:uuid:r{i:03d}" for i in range(40)
             if i % 4 == 1 and i % 10 != 0}
    site2 = {f"urn:uuid:r{i:03d}" for i in range(40)
             if i % 4 == 2 and i % 10 != 0}
    assert ids & site1 and ids & site2


def test_crawl_pipeline_robots_filter(spark, tmp_path):
    """robots= drops disallowed URLs BEFORE parsing (RFC 9309
    longest-match with an Allow carve-out), keyed by the crawl's
    (host, robots_txt) frame; hosts without robots rows are kept."""
    path = _archive(tmp_path)
    # archive URLs are /p/r{i}; block site0's whole /p/ tree except
    # the carved-out /p/r02* prefix, and everything on site1
    robots = spark.createDataFrame(
        [
            ("site0.example.com",
             "User-agent: *\nDisallow: /p/\nAllow: /p/r02"),
            ("site1.example.com", "User-agent: *\nDisallow: /"),
        ],
        "host string, robots_txt string",
    )
    out = build_crawl_pipeline(
        spark, path, robots=robots,
        num_partitions=4, min_quality=0.0,
    )
    ids = {r.doc_id for r in out.collect()}
    # site1 (i % 4 == 1, not i % 10 == 0): ALL dropped pre-parse
    site1 = {f"urn:uuid:r{i:03d}" for i in range(40)
             if i % 4 == 1 and i % 10 != 0}
    assert not (ids & site1)
    # site0 blocked by /p/ ... except the Allow carve-out /p/r02
    carved = {"urn:uuid:r024", "urn:uuid:r028"}
    site0_blocked = {f"urn:uuid:r{i:03d}" for i in range(40)
                     if i % 4 == 0 and i % 10 != 0} - carved
    assert not (ids & site0_blocked)
    # carve-out and no-robots-row hosts survive the robots stage
    # (downstream near-dup collapses rotated bodies, so assert per
    # host family, not per doc)
    site2 = {f"urn:uuid:r{i:03d}" for i in range(40)
             if i % 4 == 2 and i % 10 != 0}
    assert ids & carved and ids & site2


def test_crawl_pipeline_recency_filter(spark, tmp_path):
    """min_published= drops pages whose declared
    article:published_time is provably before the cutoff, BEFORE
    parsing; undated pages and binary PDF records survive."""
    from html_to_document_spark.sources.pdf_synth import make_pdf

    words = ("the and for with this that from have good text page "
             "world data clear words about more here only when").split()

    def page(i, day):
        meta = (f'<meta property="article:published_time" '
                f'content="{day}T12:00:00Z">') if day else ""
        body = " ".join(words[(i + j) % len(words)] for j in range(60))
        return f"<html><head>{meta}</head><h1>Doc {i}</h1><p>{body}</p>"

    recs = [
        _record("old1", "site0.example.com", page(0, "2019-06-01")),
        _record("new1", "site1.example.com", page(1, "2021-02-03")),
        _record("edge", "site2.example.com", page(2, "2020-01-01")),
        _record("nodt", "site3.example.com", page(3, None)),
    ]
    recs.append(_pdf_crawl_record(
        "pdfk", "site1.example.com",
        make_pdf([["pdf records have no html head so they must "
                   "survive the recency stage untouched"]])))
    (tmp_path / "dated.warc").write_bytes(b"".join(recs))

    out = build_crawl_pipeline(
        spark, str(tmp_path), min_published="2020-01-01",
        num_partitions=4, min_quality=0.0, pii_scrub=False,
    )
    ids = {r.doc_id for r in out.collect()}
    assert "urn:uuid:old1" not in ids          # provably stale
    assert {"urn:uuid:new1", "urn:uuid:edge",  # on/after cutoff
            "urn:uuid:nodt",                   # undated: kept
            "urn:uuid:pdfk"} <= ids            # NULL html: kept


def test_crawl_pipeline_pdf_reading_order(spark, tmp_path):
    """A two-column PDF drawn right-box-first extracts garbled by
    default and in reading order with pdf_reading_order=True."""
    from html_to_document_spark.sources.pdf_synth import make_pdf

    path = _archive(tmp_path)
    lines = [
        "left column first line of words", "left column second line",
        "right column first line here", "right column second line",
    ]
    (tmp_path / "two.warc").write_bytes(
        _pdf_crawl_record(
            "pdf3", "site3.example.com",
            make_pdf([lines], layout="twocol"),
        )
    )

    def texts(out):
        row = {r.doc_id: r for r in out.collect()}["urn:uuid:pdf3"]
        return [
            s.text for s in sorted(row.spans, key=lambda s: s.offset)
        ]

    ordered = build_crawl_pipeline(
        spark, path, num_partitions=4, min_quality=0.0,
        pii_scrub=False, pdf_reading_order=True,
    )
    assert texts(ordered) == lines
    garbled = build_crawl_pipeline(
        spark, path, num_partitions=4, min_quality=0.0, pii_scrub=False,
    )
    assert texts(garbled) == lines[2:] + lines[:2]
