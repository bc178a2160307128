"""Custom stateful streaming operator (task brief:
``applyInPandasWithState`` for operators Structured Streaming lacks).

``streaming_exact_dedup``: exact-duplicate suppression over an
unbounded document stream — the streaming counterpart of
``operators.dedup.exact_dedup``. Semantics are ARRIVAL-ORDER (first
occurrence wins; within one micro-batch the min doc_id wins), the
natural contract for a continuously-ingesting crawl pipeline where
"the" keeper cannot be a global min over an unbounded stream.

Scale shape:
- groups are keyed by the 64-bit ``xxhash64(text)`` digest, so state
  per distinct document is ONE tiny row (the shuffle and the state
  store never carry document text);
- state never expires (``NoTimeout``): dedup state is append-only by
  design — at 10^12 docs, bound the state store by sharding the stream
  on digest ranges or aging out via a TTL variant;
- batch==stream equivalence for single-batch input and cross-batch
  suppression are pytest-gated (tests/test_streaming.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

OUT_SCHEMA = "doc_id string, text string"
STATE_SCHEMA = "seen byte"


def streaming_exact_dedup(
    stream_df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """(id, text) stream -> first-seen rows only, exactly once per
    distinct text across all micro-batches."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream_df.select(
        F.xxhash64(F.col(text_col)).alias("digest"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def dedup_fn(key, pdf_iter, state):
        if state.exists:
            for _ in pdf_iter:  # drain: this digest was already emitted
                pass
            return
        best = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[pdf["doc_id"].idxmin()]
            if best is None or cand["doc_id"] < best["doc_id"]:
                best = cand
        if best is not None:
            # mark seen ONLY once a representative row actually emitted —
            # an all-empty batch must not suppress later occurrences
            state.update((1,))
            yield pd.DataFrame(
                {"doc_id": [best["doc_id"]], "text": [best["text"]]}
            )

    return keyed.groupBy("digest").applyInPandasWithState(
        dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
):
    """File-source wiring: drain available input through the stateful
    dedup into parquet (append sink; state lives in the checkpoint)."""
    reader = spark.readStream.schema("doc_id string, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(in_path)
    out = streaming_exact_dedup(stream, text_col=text_col)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_stream_pipeline(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    keep_langs: tuple = ("en", "es", "fr", "de"),
    min_quality: float = 0.0,
    max_files_per_trigger: int | None = None,
    pii_scrub: bool = False,
    benchmark=None,
    decontaminate_mode: str = "paragraph",
    gopher_filter: bool = False,
    blocklist: tuple | None = None,
    blocklist_max_fraction: float = 0.0,
    entropy_band: "tuple[float, float] | None" = None,
    lm_model: dict | None = None,
    lm_max_ppl: float | None = None,
    fix_encoding: bool = False,
    unicode_form: str | None = None,
    clean_controls: bool = False,
    text_join: str = "space",
    line_dedup: bool = False,
):
    """Streaming counterpart of plans.build_training_pipeline: continuous
    ingest -> span extraction -> (optional PII scrub, same projection as
    the batch pipeline) -> lang/quality projections -> filter ->
    (optional test-set decontamination: stream-STATIC broadcast
    anti-join against the benchmark's paragraph/13-gram set, or the
    asymmetric MinHash band join in "fuzzy" mode — batch parity via
    ``decontaminate_mode``) -> STATEFUL exact dedup (first
    occurrence wins across micro-batches) -> parquet sink. Near-dup
    LSH stays a periodic batch job over the accumulated output (its
    self-joins don't stream); this covers the always-on part of the
    ingestion path."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.extract_spans import extract_spans
    from html_to_document_spark.operators.text_analysis import (
        lang_pred_col,
        quality_col,
    )
    from html_to_document_spark.sources.synthetic import DOC_SCHEMA

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = extract_spans(reader.parquet(in_path))

    if text_join not in ("space", "newline"):
        raise ValueError(f"unknown text_join {text_join!r}")
    text = F.concat_ws(
        " " if text_join == "space" else "\n",
        F.filter(
            F.transform("spans", lambda s: F.when(s["kind"] == "text", s["text"])),
            lambda x: x.isNotNull() & (x != ""),
        ),
    )
    if fix_encoding:
        # batch parity: plans.build_training_pipeline(fix_encoding=True)
        from html_to_document_spark.operators.corpus_hygiene import (
            fix_mojibake_col,
        )

        text = fix_mojibake_col(text)
    if unicode_form is not None:
        # batch parity: build_training_pipeline(unicode_form=...) —
        # a stateless Arrow-batched projection, streams as-is; same
        # fix-then-normalize ordering as the batch pipeline
        from html_to_document_spark.operators.corpus_hygiene import (
            unicode_normalize_udf,
        )

        text = unicode_normalize_udf(unicode_form)(text)
    if clean_controls:
        # batch parity: build_training_pipeline(clean_controls=True);
        # stateless projection, same repair-before-normalize ordering
        from html_to_document_spark.operators.corpus_hygiene import (
            clean_control_chars_col,
        )

        text = clean_control_chars_col(text)
    if pii_scrub:
        from html_to_document_spark.operators.corpus_hygiene import (
            pii_scrub_col,
        )

        text = pii_scrub_col(text)
    corpus = stream.select("doc_id", text.alias("text")).filter(
        F.length("text") > 0
    )
    if line_dedup:
        # batch parity: build_training_pipeline(line_dedup=True) —
        # within-doc duplicate-line removal is a stateless per-row
        # projection (no cross-row state), so it streams as-is; same
        # ordering (BEFORE scoring, so lang/quality judge the deduped
        # text) and same newline requirement as the batch pipeline
        if text_join != "newline":
            raise ValueError(
                "line_dedup requires text_join='newline' "
                "(space-joined text has no line boundaries)"
            )
        from html_to_document_spark.operators.corpus_hygiene import (
            dedup_lines_in_doc,
        )

        corpus = (
            dedup_lines_in_doc(corpus, sep="\n")
            .drop("n_lines_removed")
            .filter(F.length("text") > 0)
        )
    corpus = corpus.select(
        "doc_id",
        "text",
        lang_pred_col(F.col("text")).alias("lang_pred"),
        quality_col(F.col("text")).alias("quality"),
    ).filter(
        F.col("lang_pred").isin(*keep_langs)
        & (F.col("quality") >= min_quality)
    )
    if gopher_filter:
        # batch parity: the same codegen'd rule predicate as
        # plans.build_training_pipeline(gopher_filter=True) — a
        # stateless projection, so it streams without a watermark
        from html_to_document_spark.operators.quality_rules import (
            gopher_keep_col,
        )

        corpus = corpus.filter(gopher_keep_col("text"))
    if blocklist is not None:
        # batch parity: build_training_pipeline(blocklist=...) — the
        # C4 bad-words rule is a stateless InSet projection
        from html_to_document_spark.operators.quality_rules import (
            blocklist_keep_col,
        )

        corpus = corpus.filter(
            blocklist_keep_col(
                blocklist, "text", max_fraction=blocklist_max_fraction
            )
        )
    if entropy_band is not None:
        # batch parity: build_training_pipeline(entropy_band=...) —
        # the char-entropy band-pass is also a stateless projection
        from html_to_document_spark.operators.text_analysis import (
            char_entropy_col,
        )

        lo, hi = entropy_band
        ent = char_entropy_col(F.col("text"))
        corpus = corpus.filter((ent >= lo) & (ent <= hi))
    if lm_model is not None:
        # batch parity with build_training_pipeline(lm_model=...): the
        # CCNet perplexity cut is a stateless broadcast-model
        # mapInPandas projection, so it streams without a watermark;
        # ordering parity too (before exact dedup)
        if lm_max_ppl is None:
            raise ValueError("lm_model given without lm_max_ppl")
        from html_to_document_spark.operators.lm_filter import lm_filter

        corpus = lm_filter(corpus, lm_model, lm_max_ppl).drop("ppl")
    deduped = streaming_exact_dedup(corpus.select("doc_id", "text"))
    if benchmark is not None:
        # test-set decontamination with exact BATCH parity: foreachBatch
        # hands each micro-batch over as a plain DataFrame, so the very
        # same operators run (benchmark gram/paragraph set broadcast,
        # zero stream-side shuffle). Ordering parity too: the batch
        # pipeline decontaminates after exact dedup. Parquet append in
        # foreachBatch is at-least-once on trigger retries (vs the
        # file-sink's exactly-once) — acceptable for an idempotent
        # downstream exact-dedup, and the price of arbitrary logic.
        from html_to_document_spark.operators.corpus_hygiene import (
            decontaminate,
            decontaminate_fuzzy,
            decontaminate_ngrams,
        )

        if decontaminate_mode not in ("paragraph", "ngram", "fuzzy"):
            raise ValueError(
                f"unknown decontaminate_mode {decontaminate_mode!r}"
            )

        def _sink(batch_df, _batch_id):
            fn = {
                "ngram": decontaminate_ngrams,
                "paragraph": decontaminate,
                # fuzzy streams because the band join is ASYMMETRIC:
                # each micro-batch matches the static benchmark side
                # only — the stream never self-joins
                "fuzzy": decontaminate_fuzzy,
            }[decontaminate_mode]
            contaminated = fn(batch_df, benchmark).select("doc_id")
            (
                batch_df.join(contaminated, "doc_id", "left_anti")
                .write.mode("append")
                .parquet(out_path)
            )

        q = (
            deduped.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return q


CAP_OUT_SCHEMA = "doc_id string, url string"
CAP_STATE_SCHEMA = "n_emitted long"


def streaming_domain_cap(
    stream_df: "DataFrame",
    url_col: str = "url",
    id_col: str = "doc_id",
    max_docs: int = 10_000,
) -> "DataFrame":
    """Per-domain share capping over an unbounded crawl stream — the
    streaming counterpart of ``url_filter.cap_domain_share``: each
    host emits its first ``max_docs`` documents and suppresses the
    rest forever. Semantics are ARRIVAL-ORDER (the batch operator's
    min_id selector has no meaning over an unbounded stream; within
    one micro-batch ties break by smallest doc_id for determinism),
    matching ``streaming_exact_dedup``'s contract.

    Scale shape: groups key on the HOST (state = one long per
    distinct host — the state store never carries URLs or payloads);
    rows with a NULL/unparsable host are never capped and bypass the
    stateful operator entirely via a union (they would otherwise pool
    into one spurious state group). A single ultra-hot host's
    micro-batch slice concentrates in one state task — cap the
    micro-batch size (maxFilesPerTrigger / maxOffsetsPerTrigger) to
    bound that task, the standard knob for hot-key streaming state."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from html_to_document_spark.operators.url_filter import host_col

    base = stream_df.select(
        host_col(url_col).alias("host"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(url_col).alias("url"),
    )
    no_host = (F.col("host").isNull()) | (F.col("host") == "")
    passthrough = base.filter(no_host).select("doc_id", "url")
    keyed = base.filter(~no_host)

    def cap_fn(key, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        budget = max_docs - n
        if budget <= 0:
            for _ in pdf_iter:  # drain: host already at cap
                pass
            return
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if not chunks:
            return
        batch = pd.concat(chunks).sort_values("doc_id", kind="mergesort")
        take = batch.head(budget)
        state.update((n + len(take),))
        yield take[["doc_id", "url"]]

    return keyed.groupBy("host").applyInPandasWithState(
        cap_fn,
        outputStructType=CAP_OUT_SCHEMA,
        stateStructType=CAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ).unionByName(passthrough)


def run_streaming_domain_cap(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    max_docs: int = 10_000,
    max_files_per_trigger: int | None = None,
):
    """File-source wiring for :func:`streaming_domain_cap` (append
    parquet sink; host counters live in the checkpoint's state store)."""
    reader = spark.readStream.schema("doc_id string, url string")
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.parquet(in_path)
    out = streaming_domain_cap(stream, max_docs=max_docs)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_streaming_near_dedup(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    sig_path: str,
    *,
    schema: str = "doc_id long, text string",
    threshold: float = 0.85,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_words: "int | None" = 20_000,
    bucket_cap: int = 128,
    roll_forward: bool = True,
    max_files_per_trigger: "int | None" = None,
):
    """Streaming counterpart of ``incremental.incremental_near_dedup``
    — possible precisely BECAUSE that operator is asymmetric: each
    micro-batch band-joins the STANDING signature table at
    ``sig_path`` (bootstrap it with
    ``minhash_signature(history).write.parquet(sig_path)``), never
    itself, so the self-join that keeps batch LSH out of streams
    (run_stream_pipeline's docstring) never appears. Survivors append
    to ``out_path``; with ``roll_forward`` their signatures append to
    ``sig_path`` so later micro-batches near-dedup against earlier
    ones — the rolling-snapshot pattern with the (id, minhash) table
    (~520 B/doc) as the standing artifact, history text never read.

    Contracts inherited from the batch operator: within ONE
    micro-batch, near-dups with no history match ALL survive (run
    batch LSH periodically over the accumulated output for those);
    matching is signature-estimate only (no exact_verify — history
    text is deliberately not available). foreachBatch parquet appends
    are at-least-once on trigger retries: a re-appended signature row
    is harmless (matching a duplicated history row is still one
    match), and the out_path duplicate is the same idempotent-
    downstream-dedup contract as run_stream_pipeline's sink."""
    from html_to_document_spark.operators.incremental import (
        incremental_near_dedup,
    )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.parquet(in_path)

    def _sink(batch_df, _batch_id):
        from pyspark.sql import functions as F

        s = batch_df.sparkSession
        hist_sigs = s.read.parquet(sig_path)
        cache: list = []
        survivors = incremental_near_dedup(
            batch_df,
            None,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            max_words=max_words,
            bucket_cap=bucket_cap,
            history_sigs=hist_sigs,
            persist_sigs=True,
            sig_cache=cache,
        )
        if roll_forward:
            # survivors feeds TWO actions (output write + signature
            # append) — persist it so the dedup lineage runs once per
            # micro-batch, and append roll-forward signatures by
            # semi-joining the already-persisted batch signature
            # frame instead of re-tokenizing survivor text
            # (review r5-cont4)
            survivors = survivors.persist()
            cache.append(survivors)
        survivors.write.mode("append").parquet(out_path)
        if roll_forward:
            sigs_new = cache[0]  # (_id, minhash) of the whole batch
            surv_ids = survivors.select(
                F.col("doc_id").alias("_id")
            ).distinct()
            (
                sigs_new.join(surv_ids, "_id")
                .select(F.col("_id").alias("doc_id"), "minhash")
                .write.mode("append").parquet(sig_path)
            )
        for frame in cache:
            frame.unpersist()

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


CANON_OUT_SCHEMA = "doc_id string, url string"
CANON_STATE_SCHEMA = "seen byte"


def streaming_canonical_dedup(
    stream_df: "DataFrame",
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    respect_noindex: bool = True,
) -> "DataFrame":
    """Canonical-URL mirror collapse over an unbounded crawl stream —
    the streaming counterpart of ``html_head.canonical_dedup``: each
    canonical key (the page's declared ``rel=canonical``, normalized,
    else its own normalized URL) emits its first document and
    suppresses every later mirror forever. Arrival-order semantics
    (within one micro-batch the min doc_id wins), the
    ``streaming_exact_dedup`` contract. ``respect_noindex`` also
    drops robots-noindex pages — a stateless projection folded into
    the same pass.

    Scale shape: groups key on the 64-bit digest of the canonical
    key, so state per distinct page is ONE tiny row (the state store
    never carries URLs or HTML); rows with no derivable key
    (unparsable URL, no canonical) are never deduped and bypass the
    stateful operator via a union — pooling them into the NULL-digest
    group would both dedup them against each other and concentrate
    them in one state task."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from html_to_document_spark.operators.html_head import (
        canonical_url_col,
        robots_noindex_col,
    )
    from html_to_document_spark.operators.url_filter import (
        normalize_url_col,
    )

    s = stream_df
    if respect_noindex:
        s = s.filter(~robots_noindex_col(html_col))
    # key NULLness must be tested BEFORE hashing: xxhash64(NULL) is
    # the seed constant, not NULL, and would pool every keyless row
    # into one dedup group
    base = s.select(
        F.coalesce(
            normalize_url_col(canonical_url_col(html_col)),
            normalize_url_col(url_col),
        ).alias("_key"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(url_col).alias("url"),
    )
    passthrough = base.filter(F.col("_key").isNull()).select(
        "doc_id", "url"
    )
    keyed = base.filter(F.col("_key").isNotNull()).select(
        F.xxhash64(F.col("_key")).alias("digest"), "doc_id", "url"
    )

    def canon_fn(key, pdf_iter, state):
        if state.exists:
            for _ in pdf_iter:  # drain: this key already emitted
                pass
            return
        best = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[pdf["doc_id"].idxmin()]
            if best is None or cand["doc_id"] < best["doc_id"]:
                best = cand
        if best is not None:
            state.update((1,))
            yield pd.DataFrame(
                {"doc_id": [best["doc_id"]], "url": [best["url"]]}
            )

    return keyed.groupBy("digest").applyInPandasWithState(
        canon_fn,
        outputStructType=CANON_OUT_SCHEMA,
        stateStructType=CANON_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ).unionByName(passthrough)


def run_streaming_canonical_dedup(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    respect_noindex: bool = True,
    max_files_per_trigger: int | None = None,
):
    """File-source wiring for ``streaming_canonical_dedup`` (append
    sink; key state lives in the checkpoint)."""
    reader = spark.readStream.schema(
        "doc_id string, url string, html string"
    )
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    stream = reader.parquet(in_path)
    out = streaming_canonical_dedup(
        stream, respect_noindex=respect_noindex
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
