"""Interleaved text+media document curation.

The north-rule input is an Iceberg table of *interleaved* documents —
``spans: array<struct<kind,text,media_ref,offset>>`` mixing text spans
with image/media spans.  Multimodal web-corpus pipelines (OBELICS,
Laurencon et al. 2023; MMC4, Zhu et al. 2023 — both public recipes)
curate such documents with two families of rules this module provides:

1. **Doc-level interleave stats + filters** — image count bounds, text
   volume, image density, consecutive-image runs, leading-image
   banners.  ``interleaved_stats`` computes every stat as ONE Column
   projection over the spans array (higher-order ``aggregate`` /
   ``filter`` — JVM codegen, no explode, no shuffle, array order
   preserved); ``interleaved_keep_col`` folds the published-style
   bounds into a single boolean Column so callers can merge it into an
   existing filter without adding a scan.

2. **Hot-media (logo/banner) removal** — MMC4 drops images whose URL
   appears in many documents (site furniture, tracking pixels).
   ``hot_media_refs`` counts per-ref document frequency with the refs
   deduplicated *inside each document map-side first* (``array_distinct``
   before the explode), so the shuffle carries one short (ref) row per
   doc×ref, never span payloads.  ``drop_hot_media`` then strips those
   image spans from every document via an in-literal set filter — the
   hot set is provably tiny (≤ corpus_docs / min_docs), the corpus is
   NEVER re-shuffled, and span order/offsets are preserved by
   renumbering inside the same projection.

Scale shape (100 TB lens): stats + keep are shuffle-free projections;
the only exchange in the module is the hot-ref count, keyed by the
media_ref string itself (short URLs — the natural key; per-doc
pre-distinct bounds the row count at docs × distinct-refs-per-doc).

Reference parity: the reference engine converts interleaved documents
(``packages/core/src`` element middleware keeps ``<img>`` spans inline
with text); it has no corpus-level curation — this module is part of
the beyond-reference training-data surface the task brief mandates.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame

__all__ = [
    "interleaved_stats",
    "interleaved_keep_col",
    "span_lang_stats",
    "hot_media_refs",
    "drop_hot_media",
    "transform_span_text",
    "pii_scrub_spans",
    "fix_mojibake_spans",
    "curate_interleaved",
    "render_interleaved",
    "pack_interleaved",
    "image_caption_pairs",
    "resolve_media_refs",
    "build_caption_dataset",
]

# A hot set larger than this is a sizing error (min_docs too low for the
# corpus), not a logo set; refuse rather than ship a megabyte IN-list.
MAX_HOT_REFS = 100_000


def _is_image(s) -> "Column":
    return s["kind"] == "image"


def interleaved_stats(
    df: "DataFrame", spans_col: str = "spans"
) -> "DataFrame":
    """Append per-document interleave statistics.

    Adds (all computed in one shuffle-free Column projection):

    - ``n_spans`` / ``n_text`` / ``n_images`` — span counts by kind
      (anything that is not an image counts as text-like for ``n_text``
      only when ``kind = 'text'``; tables/pagebreaks are in ``n_spans``
      but neither bucket).
    - ``text_chars`` — total characters across text spans.
    - ``max_image_run`` — longest run of consecutive image spans
      (galleries / scraped carousels).
    - ``leading_images`` — images before the first non-image span
      (banner/logo headers).
    - ``image_ratio`` — n_images / n_spans (0.0 for empty docs).
    - ``chars_per_image`` — text_chars / n_images (NULL when no images).

    A NULL spans array (failed extraction upstream) counts as an EMPTY
    document — without the coalesce, ``size(NULL)`` is -1 under
    Spark's legacy sizeOfNull and every aggregate() stat goes NULL,
    silently poisoning keep rules and downstream arithmetic.
    """
    spans = F.coalesce(
        F.col(spans_col),
        F.array().cast(df.schema[spans_col].dataType.simpleString()),
    )
    n_spans = F.size(spans)
    n_images = F.size(F.filter(spans, _is_image))
    n_text = F.size(F.filter(spans, lambda s: s["kind"] == "text"))
    text_chars = F.aggregate(
        spans,
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(
            s["kind"] == "text", F.length(F.coalesce(s["text"], F.lit("")))
        ).otherwise(F.lit(0)).cast("long"),
    )
    # (cur_run, best_run) accumulator: classic max-run-in-one-pass.
    run = F.aggregate(
        spans,
        F.struct(
            F.lit(0).cast("int").alias("cur"), F.lit(0).cast("int").alias("best")
        ),
        lambda acc, s: F.struct(
            F.when(_is_image(s), acc["cur"] + 1).otherwise(F.lit(0)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(_is_image(s), acc["cur"] + 1).otherwise(F.lit(0)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    # (count, stopped) accumulator: images seen before the first
    # non-image span.
    lead = F.aggregate(
        spans,
        F.struct(
            F.lit(0).cast("int").alias("cnt"),
            F.lit(False).alias("stopped"),
        ),
        lambda acc, s: F.struct(
            F.when(acc["stopped"] | ~_is_image(s), acc["cnt"])
            .otherwise(acc["cnt"] + 1)
            .alias("cnt"),
            (acc["stopped"] | ~_is_image(s)).alias("stopped"),
        ),
        lambda acc: acc["cnt"],
    )
    return df.withColumns(
        {
            "n_spans": n_spans.cast("int"),
            "n_text": n_text.cast("int"),
            "n_images": n_images.cast("int"),
            "text_chars": text_chars,
            "max_image_run": run,
            "leading_images": lead,
            "image_ratio": F.when(n_spans > 0, n_images / n_spans)
            .otherwise(F.lit(0.0))
            .cast("double"),
            "chars_per_image": F.when(
                n_images > 0, text_chars.cast("double") / n_images
            ).cast("double"),
        }
    )


def interleaved_keep_col(
    *,
    min_text_chars: int = 100,
    max_images: int = 32,
    min_images: int = 0,
    max_image_ratio: float = 0.5,
    max_image_run: int = 4,
    max_leading_images: int = 4,
) -> "Column":
    """Doc-level keep predicate over :func:`interleaved_stats` columns.

    Defaults follow the OBELICS/MMC4 shape: drop image-dump pages
    (too many images, long galleries, image-heavy ratio), banner-led
    pages, and text-starved pages.  ``min_images=1`` selects the
    strictly-multimodal subset.  Returns a boolean Column; fold it
    into an existing filter to add zero scans.
    """
    return (
        (F.col("text_chars") >= min_text_chars)
        & (F.col("n_images") <= max_images)
        & (F.col("n_images") >= min_images)
        & (F.col("image_ratio") <= max_image_ratio)
        & (F.col("max_image_run") <= max_image_run)
        & (F.col("leading_images") <= max_leading_images)
    )


def hot_media_refs(
    df: "DataFrame",
    *,
    min_docs: int = 10,
    spans_col: str = "spans",
    doc_id_col: str = "doc_id",
) -> "DataFrame":
    """(media_ref, n_docs) for refs appearing in ``>= min_docs`` docs.

    The MMC4 logo heuristic: an image embedded by many distinct
    documents is site furniture, not content.  Refs are deduplicated
    per document map-side (``array_distinct`` on the doc's own image
    refs) BEFORE the explode, so the exchange carries one (ref) row
    per doc×distinct-ref and the count is a plain ``count(*)`` — no
    count-distinct rewrite, full map-side partial aggregation.
    """
    refs = F.array_distinct(
        F.transform(
            F.filter(F.col(spans_col), _is_image), lambda s: s["media_ref"]
        )
    )
    per_doc = df.select(
        F.col(doc_id_col), F.explode(refs).alias("media_ref")
    ).where(F.col("media_ref").isNotNull())
    return (
        per_doc.groupBy("media_ref")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= int(min_docs))
    )


def drop_hot_media(
    df: "DataFrame",
    hot: "DataFrame | Iterable[str]",
    *,
    spans_col: str = "spans",
    renumber_offsets: bool = True,
) -> "DataFrame":
    """Strip logo-like image spans (those whose ref is in ``hot``).

    ``hot`` is the output of :func:`hot_media_refs` (or any iterable of
    refs).  The set is bounded by corpus_docs / min_docs and is pulled
    to the driver as literals — the same provably-tiny-side pattern as
    the IVF centroids — so the corpus is filtered in place with NO
    join and NO shuffle.  A set larger than ``MAX_HOT_REFS`` raises:
    that is a ``min_docs`` sizing error, not a logo set.

    Span order is preserved; offsets are renumbered to stay dense when
    ``renumber_offsets`` (fields beyond kind/text/media_ref/offset are
    not carried — the spans contract is exactly those four).
    """
    if hasattr(hot, "collect"):
        rows = hot.limit(MAX_HOT_REFS + 1).collect()
        if len(rows) > MAX_HOT_REFS:
            raise ValueError(
                f"hot-media set exceeds {MAX_HOT_REFS} refs; raise min_docs"
            )
        refs = [r["media_ref"] for r in rows]
    else:
        refs = list(hot)
        if len(refs) > MAX_HOT_REFS:
            raise ValueError(
                f"hot-media set exceeds {MAX_HOT_REFS} refs; raise min_docs"
            )
    spans = F.col(spans_col)
    if refs:
        lit_set = F.array(*[F.lit(r) for r in refs])
        kept = F.filter(
            spans,
            # coalesce: an image span with a NULL ref is content with a
            # missing pointer, not a logo — keep it (array_contains
            # yields NULL on NULL probe, which filter() would drop).
            lambda s: ~(
                _is_image(s)
                & F.coalesce(
                    F.array_contains(lit_set, s["media_ref"]), F.lit(False)
                )
            ),
        )
    else:
        kept = spans
    if renumber_offsets:
        kept = F.transform(
            kept,
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        )
    return df.withColumn(spans_col, kept)


def transform_span_text(
    df: "DataFrame",
    text_fn,
    spans_col: str = "spans",
    flag_col: "str | None" = None,
) -> "DataFrame":
    """Apply a Column->Column text function to every TEXT span's text,
    leaving media spans (and every kind/media_ref/offset) untouched —
    the hygiene-parity bridge for the interleaved shape: any scrub
    that works on a text column works inside the spans array without
    exploding 10^12 docs' spans through a shuffle.

    One codegen projection (transform + withField); ``text_fn`` runs
    once per text span. ``flag_col`` adds a doc-level changed marker
    via array equality against the original (computed on the
    materialized new column, not by re-running ``text_fn``)."""
    from pyspark.sql import functions as F

    new_spans = F.transform(
        F.col(spans_col),
        lambda s: F.when(
            s["kind"] == F.lit("text"),
            s.withField("text", text_fn(s["text"])),
        ).otherwise(s),
    )
    out = df.withColumn("_new_spans", new_spans)
    cols = []
    for c in df.columns:
        if c == spans_col:
            cols.append(F.col("_new_spans").alias(spans_col))
        else:
            cols.append(F.col(c))
    if flag_col is not None:
        # NULL spans (failed extraction) -> unchanged, flag FALSE —
        # a NULL flag would silently drop the row from any boolean
        # filter, the exact poisoning interleaved_stats' coalesce
        # guards against (review r5-cont4)
        cols.append(
            F.coalesce(
                F.col("_new_spans") != F.col(spans_col), F.lit(False)
            ).alias(flag_col)
        )
    return out.select(*cols)


def pii_scrub_spans(
    df: "DataFrame",
    spans_col: str = "spans",
    flag_col: "str | None" = "was_redacted",
) -> "DataFrame":
    """PII redaction over interleaved documents: corpus_hygiene's
    oracle-gated scrub projection applied inside the spans array."""
    from .corpus_hygiene import pii_scrub_col

    return transform_span_text(
        df, pii_scrub_col, spans_col=spans_col, flag_col=flag_col
    )


def fix_mojibake_spans(
    df: "DataFrame",
    spans_col: str = "spans",
    flag_col: "str | None" = "was_mojibake",
) -> "DataFrame":
    """Encoding repair over interleaved documents — same bridge."""
    from .corpus_hygiene import fix_mojibake_col

    return transform_span_text(
        df, fix_mojibake_col, spans_col=spans_col, flag_col=flag_col
    )


def curate_interleaved(
    df: "DataFrame",
    spans_col: str = "spans",
    *,
    fix_encoding: bool = False,
    scrub_pii: bool = False,
    hot_media_min_docs: "int | None" = None,
    keep: "dict | None" = None,
    min_span_lang_frac: "float | None" = None,
    renumber_offsets: bool = True,
    with_stats: bool = True,
) -> "DataFrame":
    """The composed interleaved-document curation pipeline — the
    span-shape counterpart of plans.build_training_pipeline, in the
    same stage order the text pipeline uses: repair encoding FIRST
    (scores and filters must see repaired text), then PII scrub, then
    corpus-level logo/banner stripping (changes image counts, so it
    precedes the stats), then stats + the keep rule.

    Everything except hot-media detection is a per-doc projection;
    the logo pass adds exactly one exchange (the per-ref doc-frequency
    count) and a broadcast back. ``keep`` is the
    ``interleaved_keep_col`` kwargs (None = keep everything);
    ``hot_media_min_docs`` None skips the logo pass;
    ``min_span_lang_frac`` additionally requires block-level language
    agreement (``span_lang_stats``) at or above the bar."""
    # hot-media detection reads ONLY media_ref, which no text scrub
    # touches — detect on the RAW input so the hot-set collect (a
    # driver action) never evaluates the scrub regexes; otherwise the
    # whole corpus would pay the mojibake+PII transforms twice
    # (review r5-cont4)
    hot = (
        hot_media_refs(df, spans_col=spans_col, min_docs=hot_media_min_docs)
        if hot_media_min_docs is not None
        else None
    )
    out = df
    if fix_encoding:
        out = fix_mojibake_spans(out, spans_col, flag_col=None)
    if scrub_pii:
        out = pii_scrub_spans(out, spans_col, flag_col=None)
    if hot is not None:
        out = drop_hot_media(
            out, hot, spans_col=spans_col,
            renumber_offsets=renumber_offsets,
        )
    out = interleaved_stats(out, spans_col)
    if min_span_lang_frac is not None:
        # block-level language consistency (span_lang_stats): a page
        # whose spans disagree on language below the bar is chrome /
        # scraped embeds; runs on the scrubbed spans like the stats
        from pyspark.sql import functions as F

        out = span_lang_stats(out, spans_col).filter(
            F.col("span_lang_frac") >= min_span_lang_frac
        )
    if keep is not None:
        out = out.filter(interleaved_keep_col(**keep))
    if not with_stats:
        out = out.select(*df.columns)
    return out


def span_lang_stats(
    df: "DataFrame", spans_col: str = "spans"
) -> "DataFrame":
    """Per-document SPAN-LEVEL language profile — the mixed-language
    detection multimodal pipelines run per block (a page whose text
    spans disagree on language is usually navigation chrome, scraped
    embeds, or template filler around a small foreign core; MMC4/
    OBELICS filter on block-level consistency, not just a doc-level
    vote). Appends:

    - ``main_span_lang`` — the plurality language across text spans
      (``text_analysis.lang_pred_col`` per span; ties break in profile
      order en/es/fr/de then 'und', the doc-level operator's rule);
      'und' when the doc has no text spans.
    - ``main_span_lang_n`` / ``n_span_langs`` — the plurality count
      and how many distinct languages the text spans voted for.
    - ``span_lang_frac`` — plurality count / text-span count, r4
      (1.0 = every block agrees; 0.0 only for empty docs).

    One shuffle-free Column projection: the per-span vote is the same
    when-chain the doc-level lang-ID compiles, applied inside a
    ``transform`` over the (filtered) spans array; per-language counts
    are fixed-universe array filters, and the plurality pick is a
    struct ``array_max`` — zero Python, zero shuffle, no explode."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.text_analysis import (
        LANG_PROFILES,
        lang_pred_col,
        r4,
    )

    spans = F.coalesce(
        F.col(spans_col),
        F.array().cast(df.schema[spans_col].dataType.simpleString()),
    )
    votes = F.transform(
        F.filter(spans, lambda s: s["kind"] == "text"),
        lambda s: lang_pred_col(F.coalesce(s["text"], F.lit(""))),
    )
    langs = list(LANG_PROFILES) + ["und"]

    def count_of(lang):
        # NB: a `lambda x, lang=lang:` default-capture reads as a
        # 2-arg (element, index) lambda to F.filter — hence the factory
        return F.size(F.filter(votes, lambda x: x == lang))

    counts = {lang: count_of(lang) for lang in langs}
    scored = F.array(
        *[
            F.struct(
                counts[lang].alias("n"),
                F.lit(-i).alias("negi"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(scored)
    n_votes = F.size(votes)
    n_langs = sum(
        (counts[lang] > 0).cast("int") for lang in langs
    )
    return df.withColumns(
        {
            "main_span_lang": F.when(n_votes > 0, best["lang"])
            .otherwise(F.lit("und")),
            "main_span_lang_n": F.when(n_votes > 0, best["n"])
            .otherwise(F.lit(0)).cast("int"),
            "n_span_langs": n_langs.cast("int"),
            "span_lang_frac": F.when(
                n_votes > 0, r4(best["n"] / n_votes)
            ).otherwise(F.lit(0.0)),
        }
    )


def render_interleaved(
    df: "DataFrame",
    spans_col: str = "spans",
    image_token: str = "<image>",
    image_token_cost: int = 64,
    sep: str = " ",
    prefix: str = "mm",
) -> "DataFrame":
    """Interleaved spans -> the multimodal TRAINING render (the
    MMC4/OBELICS sequence shape): text spans keep their text, every
    image span becomes the ``image_token`` sentinel at its interleave
    position, and the whole document linearizes in array order (the
    extractor emits spans offset-ordered) into one string plus the
    token accounting a context-window packer needs —

    - ``{prefix}_text``: sentinel-interleaved document string,
    - ``{prefix}_media_refs``: the image refs IN SEQUENCE ORDER (the
      sentinel at position i binds to ref i — the contract multimodal
      collators rely on),
    - ``{prefix}_text_tokens``: whitespace tokens across text spans
      (empty/NULL-text spans count 0),
    - ``{prefix}_tokens``: text tokens + n_images x
      ``image_token_cost`` (the fixed per-image patch-token budget,
      e.g. 64 for a 448px ViT at patch 14 pooled 2x2).

    One shuffle-free array-HOF projection (transform / filter /
    aggregate — JVM codegen, no explode); NULL spans render NULL with
    0 tokens, never a crash."""
    spans = F.col(spans_col)
    is_txt = lambda s: s["kind"] != "image"  # noqa: E731

    def tok_n(s) -> "Column":
        t = F.trim(F.coalesce(s["text"], F.lit("")))
        return F.when(t == "", F.lit(0)).otherwise(
            F.size(F.split(t, r"\s+"))
        ).cast("long")

    rendered = F.array_join(
        F.transform(
            spans,
            lambda s: F.when(
                _is_image(s), F.lit(image_token)
            ).otherwise(F.coalesce(s["text"], F.lit(""))),
        ),
        sep,
    )
    refs = F.transform(
        F.filter(spans, _is_image), lambda s: s["media_ref"]
    )
    text_tokens = F.aggregate(
        F.filter(spans, is_txt),
        F.lit(0).cast("long"),
        lambda acc, s: acc + tok_n(s),
    )
    n_images = F.size(F.filter(spans, _is_image)).cast("long")
    return df.withColumns(
        {
            f"{prefix}_text": rendered,
            f"{prefix}_media_refs": refs,
            f"{prefix}_text_tokens": F.coalesce(text_tokens, F.lit(0)),
            f"{prefix}_tokens": F.coalesce(
                text_tokens + n_images * F.lit(image_token_cost),
                F.lit(0),
            ),
        }
    )


def pack_interleaved(
    df: "DataFrame",
    budget: int,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    image_token_cost: int = 64,
    num_partitions: "int | None" = None,
    **render_kw,
) -> "DataFrame":
    """Render + bin-pack interleaved documents into ``budget``-sized
    multimodal context windows: :func:`render_interleaved` charges
    each image its fixed patch-token cost, then
    :func:`packing.pack_sequences` first-fit-decreasing packs on the
    combined count — so a 10-image page and a text wall compete for
    the same window budget, the way the collator will actually spend
    it. Returns the packer's (doc_id, bin_id, n_tokens, oversize)."""
    from .packing import pack_sequences

    rendered = render_interleaved(
        df, spans_col=spans_col, image_token_cost=image_token_cost,
        **render_kw,
    )
    return pack_sequences(
        rendered,
        budget,
        id_col=id_col,
        tokens_col=f"{render_kw.get('prefix', 'mm')}_tokens",
        num_partitions=num_partitions,
    )


def image_caption_pairs(
    df: "DataFrame", spans_col: str = "spans"
) -> "DataFrame":
    """(doc_id, meta-spans) -> one row per IMAGE span with its best
    caption — the LAION-style (image, text) pairing a multimodal
    training set needs, derived from document structure alone:

    - ``alt``: the image's own alt attribute (span meta) wins;
    - ``figcaption_after`` / ``figcaption_before``: else the adjacent
      ``<figcaption>`` text span FROM THE SAME FIGURE (both spans
      carry the walker's figure-instance id in ``meta["fig"]``;
      requiring equality stops a caption from leaking onto an
      adjacent image outside its figure — review find — and "after"
      beats "before" because HTML puts the caption below the image
      far more often than above);
    - ``none``: no structural caption (caption NULL; images outside
      any figure can only be captioned by their alt).

    Output: (doc_id, offset, media_ref, caption, caption_source).
    One shuffle-free JVM array-HOF projection + explode — neighbor
    lookups are O(1) ``F.get`` calls on the already-materialized
    spans column (NOT a recomputed expression — the r4
    transform-lambda lesson), and out-of-range neighbors read NULL,
    never raise. Requires meta-mode spans
    (``ExtractOptions(with_meta=True)``)."""
    from pyspark.sql import functions as F

    spans = F.col(spans_col)

    def pair(s, i):
        alt = F.nullif(s["meta"].getItem("alt"), F.lit(""))
        nxt = F.get(spans, i + 1)
        prv = F.get(spans, i - 1)
        fig = s["meta"].getItem("fig")

        def fig_text(n):
            return F.when(
                (n["kind"] == "text")
                & (n["meta"].getItem("tag") == "figcaption")
                & fig.isNotNull()
                & (n["meta"].getItem("fig") == fig),
                n["text"],
            )

        nxt_cap, prv_cap = fig_text(nxt), fig_text(prv)
        return F.struct(
            s["offset"].alias("offset"),
            s["kind"].alias("kind"),
            s["media_ref"].alias("media_ref"),
            F.coalesce(alt, nxt_cap, prv_cap).alias("caption"),
            F.when(alt.isNotNull(), F.lit("alt"))
            .when(nxt_cap.isNotNull(), F.lit("figcaption_after"))
            .when(prv_cap.isNotNull(), F.lit("figcaption_before"))
            .otherwise(F.lit("none"))
            .alias("caption_source"),
        )

    pairs = F.filter(
        F.transform(spans, pair), lambda s: s["kind"] == "image"
    )
    return df.select(
        "doc_id", F.explode(pairs).alias("_p")
    ).select(
        "doc_id", "_p.offset", "_p.media_ref", "_p.caption",
        "_p.caption_source",
    )


def resolve_media_refs(
    df: "DataFrame",
    urls: "DataFrame",
    spans_col: str = "spans",
    url_col: str = "url",
) -> "DataFrame":
    """Rewrite every image span's ``media_ref`` to an ABSOLUTE URL by
    resolving it against the document's page URL
    (``url_filter.resolve_href_col`` — crawl pages overwhelmingly use
    relative image srcs, so raw media_refs are unfetchable outside
    their page context). ``urls`` is a (doc_id, url) frame; docs
    without a URL row keep their refs verbatim. Text spans and NULL
    refs pass through untouched. One doc_id equi-join plus a
    shuffle-free array projection."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.url_filter import (
        resolve_href_col,
    )

    joined = df.join(
        urls.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col(url_col).alias("_page_url"),
        ),
        "doc_id",
        "left",
    )
    url = F.col("_page_url")

    def fix(s):
        resolved = F.coalesce(
            resolve_href_col(url, s["media_ref"]), s["media_ref"]
        )
        new_ref = F.when(
            _is_image(s) & url.isNotNull(), resolved
        ).otherwise(s["media_ref"])
        fields = [
            (new_ref if f == "media_ref" else s[f]).alias(f)
            for f in ("kind", "text", "media_ref", "offset")
        ]
        # meta-mode spans carry a 5th field; preserve it when present
        if dict(df.dtypes)[spans_col].count("meta") > 0:
            fields.append(s["meta"].alias("meta"))
        return F.struct(*fields)

    return joined.withColumn(
        spans_col, F.transform(F.col(spans_col), fix)
    ).drop("_page_url")


def build_caption_dataset(
    df: "DataFrame",
    urls: "DataFrame | None" = None,
    spans_col: str = "spans",
    min_caption_chars: int = 3,
) -> "DataFrame":
    """Meta-spans -> a LAION-shaped (image, text) dataset: one row per
    CAPTIONED image, ``(doc_id, media_ref, caption, caption_source)``
    — :func:`image_caption_pairs` filtered to structural captions of
    at least ``min_caption_chars``, with refs made absolute first
    when a (doc_id, url) frame is supplied. Feed the result to the
    JSONL sink (``sources.tables.export_jsonl``) for delivery."""
    from pyspark.sql import functions as F

    src = df if urls is None else resolve_media_refs(
        df, urls, spans_col=spans_col
    )
    pairs = image_caption_pairs(src, spans_col=spans_col)
    return pairs.filter(
        (F.col("caption_source") != "none")
        & F.col("media_ref").isNotNull()
        & (F.length(F.trim(F.col("caption"))) >= min_caption_chars)
    ).select("doc_id", "media_ref", "caption", "caption_source")
