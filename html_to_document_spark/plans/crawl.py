"""Crawl-to-training-set composition: the full front-to-back path a
web-scale corpus actually takes, as one plan —

    WARC archives -> URL/domain filter -> span extraction ->
    (PII scrub, lang/quality filter, exact dedup, decontamination,
    near-dup removal)  [= build_training_pipeline, html_col route] ->
    optional mixture resampling by host -> optional sequence packing

Each stage is an already-gated operator; this module only composes
them, so the plan inherits every stage's scale shape: the domain
filter and decontamination are broadcast map-side joins, extraction is
the salted mapInArrow stage (raw WARC HTML routed via ``html_col``),
dedup shuffles digests not text, packing is per-partition. The only
join this module adds is the host attach for mixture resampling
(doc_id-keyed, only when ``mixture_targets`` is set).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

from html_to_document_spark.core.extract import (
    DEFAULT_OPTIONS,
    ExtractOptions,
)


def build_crawl_pipeline(
    spark: "SparkSession",
    warc_path: str,
    *,
    blocklist: "DataFrame | None" = None,
    robots: "DataFrame | None" = None,
    robots_agent: str = "*",
    host_ranks: "DataFrame | None" = None,
    min_host_rank: float = 0.0,
    respect_noindex: bool = False,
    dedup_canonical: bool = False,
    min_published: str | None = None,
    max_docs_per_domain: int | None = None,
    options: ExtractOptions = DEFAULT_OPTIONS,
    num_partitions: int = 64,
    keep_langs: tuple = ("en", "es", "fr", "de"),
    min_quality: float = 0.0,
    pii_scrub: bool = True,
    benchmark: "DataFrame | None" = None,
    decontaminate_mode: str = "ngram",
    mixture_targets: dict | None = None,
    pack_budget: int | None = None,
    cache_registry: list | None = None,
    pdf_types: tuple = ("application/pdf",),
    gopher_filter: bool = False,
    repetition_filter: bool = False,
    c4_clean: bool = False,
    text_join: str = "space",
    host_template_min_docs: int | None = None,
    line_dedup: bool = False,
    sniff_charset: bool = False,
    pdf_reading_order: bool = False,
    pdf_dehyphenate: bool = False,
) -> "DataFrame":
    """WARC files -> curated training corpus.

    Returns (doc_id, text, lang_pred, quality, spans) — plus
    (bin_id, oversize) when ``pack_budget`` is set. WARC record ids
    are the doc ids. ``mixture_targets`` maps HOST -> target weight
    (the crawl's notion of "source") and resamples before packing.

    PDF records (``pdf_types`` content-type prefixes; ``()`` disables)
    are converted to the reference's ``<p>``-per-line HTML form before
    the pipeline, so every curation stage treats crawl HTML and crawl
    PDFs identically and extraction still runs exactly once per doc.
    """
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.url_filter import (
        filter_blocked_domains,
        host_col,
    )
    from html_to_document_spark.plans.pipeline import (
        build_training_pipeline,
    )
    from html_to_document_spark.sources.warc import read_warc

    # sniff_charset: decode legacy-encoded pages via the WHATWG
    # encoding sniff at INGEST — a page replace-mangled here is
    # unrepairable downstream (fix_mojibake only handles utf-8-bytes-
    # misdecoded text, not bytes destroyed by a wrong decode)
    docs = read_warc(
        spark, warc_path, binary_types=pdf_types,
        sniff_charset=sniff_charset,
    )
    if sniff_charset:
        docs = docs.drop("encoding")
    if blocklist is not None:
        docs = filter_blocked_domains(docs, blocklist)
    if robots is not None:
        # robots.txt compliance (operators/robots.py, RFC 9309):
        # ``robots`` is a (host, robots_txt) frame — one row per host,
        # e.g. the crawl's own robots fetches. Disallowed URLs drop
        # FIRST, before any parsing or ranking, via the broadcast
        # rules join (the corpus never shuffles for it).
        from html_to_document_spark.operators.robots import (
            filter_robots_disallowed,
        )

        docs = filter_robots_disallowed(docs, robots, agent=robots_agent)
    if host_ranks is not None:
        # link-graph crawl prioritization (operators/link_graph.py):
        # spam-farm hosts starve in a previous crawl round's PageRank
        # (personalized teleport = TrustRank) and are dropped BEFORE
        # parsing — same placement rationale as the domain cap below.
        # unranked hosts are kept (no link evidence != spam evidence).
        from html_to_document_spark.operators.link_graph import (
            filter_low_rank_hosts,
        )

        docs = filter_low_rank_hosts(docs, host_ranks, min_host_rank)
    if respect_noindex or dedup_canonical:
        # head directives (operators/html_head.py): honor the
        # publisher's noindex, and collapse print/mobile/session
        # mirror families on their declared canonical URL — both run
        # BEFORE parsing (a dropped mirror never pays for extraction);
        # binary PDF records (NULL html) pass through untouched.
        from html_to_document_spark.operators import html_head

        if respect_noindex:
            docs = html_head.drop_noindex(docs)
        if dedup_canonical:
            docs = html_head.canonical_dedup(docs)
    if min_published is not None:
        # recency filter (operators/page_meta.py): drop pages whose
        # declared article:published_time is provably before the
        # 'yyyy-MM-dd' cutoff — BEFORE parsing, same rationale as the
        # head directives. Undated pages and binary PDF records (NULL
        # html) survive: no date is absence of evidence, not a drop.
        from html_to_document_spark.operators.page_meta import drop_stale

        docs = drop_stale(docs, min_published)
    if max_docs_per_domain is not None:
        # RefinedWeb/Dolma corpus-balance rule, applied BEFORE parsing
        # so an over-represented host's excess pages never pay for
        # extraction. hash selector: zero corpus shuffle (the host
        # counts are the only exchange; over-cap rates broadcast back).
        from html_to_document_spark.operators.url_filter import (
            cap_domain_share,
        )

        docs = cap_domain_share(docs, max_docs=max_docs_per_domain)
    if pdf_types:
        from html_to_document_spark.operators.pdf_extract import (
            pdfs_to_html,
        )

        is_pdf = F.col("content").isNotNull()
        text_docs = docs.filter(~is_pdf).drop("content")
        # pdf_reading_order: multi-column pages emit columns
        # left-to-right instead of draw order (core/pdf.py); identity
        # on single-column documents, so safe corpus-wide
        pdf_docs = pdfs_to_html(
            docs.filter(is_pdf).drop("html"),
            reading_order=pdf_reading_order,
            dehyphenate=pdf_dehyphenate,
        ).select(*text_docs.columns)
        docs = text_docs.unionByName(pdf_docs)

    host_template = None
    if host_template_min_docs is not None:
        if host_template_min_docs < 1:
            raise ValueError(
                f"host_template_min_docs must be >= 1, "
                f"got {host_template_min_docs}"
            )
        # per-SITE boilerplate removal (corpus_hygiene.
        # remove_host_template_lines): the crawl knows each doc's
        # host from its URL; the (doc_id, host) frame is a pure
        # projection of the already-filtered docs, and the pipeline
        # applies the template pass to newline-joined text before
        # scoring. Requires text_join="newline" (enforced below).
        host_template = docs.select(
            "doc_id", host_col("url").alias("host")
        )

    corpus = build_training_pipeline(
        docs.select("doc_id", "url", "html"),
        options,
        num_partitions=num_partitions,
        keep_langs=keep_langs,
        min_quality=min_quality,
        pii_scrub=pii_scrub,
        benchmark=benchmark,
        decontaminate_mode=decontaminate_mode,
        cache_registry=cache_registry,
        html_col="html",
        gopher_filter=gopher_filter,
        repetition_filter=repetition_filter,
        c4_clean=c4_clean,
        text_join=text_join,
        host_template=host_template,
        host_template_min_docs=(
            host_template_min_docs
            if host_template_min_docs is not None else 3
        ),
        line_dedup=line_dedup,
    )

    if mixture_targets is not None:
        from html_to_document_spark.operators.mixture import (
            resample_mixture,
        )

        hosts = docs.select(
            F.col("doc_id"),
            F.coalesce(host_col("url"), F.lit("unknown")).alias("source"),
        )
        corpus = corpus.join(hosts, "doc_id", "left").withColumn(
            "source", F.coalesce("source", F.lit("unknown"))
        )
        corpus = resample_mixture(corpus, mixture_targets).drop("source")

    if pack_budget is not None:
        from html_to_document_spark.operators.packing import pack_sequences

        assignment = pack_sequences(
            corpus, pack_budget, num_partitions=num_partitions
        )
        corpus = corpus.join(
            assignment.select("doc_id", "bin_id", "oversize"), "doc_id"
        )

    return corpus
