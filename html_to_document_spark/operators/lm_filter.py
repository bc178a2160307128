"""Statistical language-model quality filtering (the CCNet recipe of
Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score every document's perplexity
under a small n-gram LM fitted on a trusted reference slice, and keep
the low-perplexity (reference-like) documents.

CCNet uses a KenLM 5-gram model; no LM library exists in this sandbox
and none is needed for the pipeline shape — the model here is an
interpolated add-k word bigram LM, which keeps every quantity exact
integer counts (deterministic under any partitioning) and the whole
scoring rule expressible in ANSI SQL for the DuckDB oracle:

    p1(w)      = (c1(w) + k) / (N + k*(V+1))
    p(w2|w1)   = lam * (c2(w1,w2) + k) / (h(w1) + k*(V+1))
                 + (1-lam) * p1(w2)
    log P(doc) = ln p1(w_1) + sum_i ln p(w_i | w_{i-1})
    ppl(doc)   = exp(-log P(doc) / n_tokens)

where words below ``min_count`` in the reference map to ``<unk>``,
``V`` is the number of distinct mapped types observed, and ``h(w1)``
is w1's count as a bigram history.

Scale shape (100 TB lens):
- FIT runs on the small trusted reference slice (CCNet: Wikipedia),
  never the corpus: two explode+groupBy passes (map-side combinable
  integer counts), optionally on a seeded sample (``fit_fraction`` —
  the same pattern as the IVF coarse quantizer) with ``vocab_cap``
  bounding the collected model.
- SCORING is shuffle-free: the model is an ``sc.broadcast`` python
  dict and perplexity is an Arrow-batched ``mapInPandas`` projection
  over the text column — the corpus is never joined or re-shuffled.
  (Contrast the join formulation: exploding the corpus to bigrams and
  joining the model would shuffle O(corpus tokens) rows.)

Reference behavioural parity: the reference engine has no quality
filter (this operator is part of the beyond-reference training-data
surface the task brief mandates); the published recipe is the spec.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import Column, DataFrame

__all__ = [
    "fit_ngram_lm",
    "perplexity",
    "lm_filter",
    "fit_ppl_thresholds",
    "ppl_bucket_col",
]

UNK = "<unk>"


def fit_ngram_lm(
    ref_df: "DataFrame",
    text_col: str = "text",
    *,
    min_count: int = 2,
    k: float = 0.5,
    lam: float = 0.9,
    vocab_cap: int | None = 65536,
    fit_fraction: float | None = None,
    seed: int = 42,
) -> dict:
    """Fit the interpolated bigram LM on a reference corpus.

    Returns a plain-dict model (broadcastable):
    ``{"k", "lam", "N", "V", "c1", "c2", "h", "vocab"}`` where ``c1``
    maps mapped word -> count, ``c2`` maps (w1, w2) -> count, ``h``
    maps w1 -> history count. All counts are exact integers, so the
    fitted model is identical under any partitioning of ``ref_df``.

    ``vocab_cap`` keeps only the top-``cap`` words by (count desc,
    word asc) — deterministic — before the ``min_count`` cut. The
    default (65536) bounds the driver collect regardless of the
    reference slice's open vocabulary — the 100 TB-safe shape is what
    you get without reading this docstring; pass ``vocab_cap=None``
    to explicitly opt into an unbounded full-vocabulary collect.
    ``fit_fraction`` fits on a seeded Bernoulli sample of the
    reference (for when even the reference slice is large).
    """
    from pyspark.sql import functions as F

    if fit_fraction is not None:
        ref_df = ref_df.sample(False, fit_fraction, seed=seed)

    # filter empty tokens after the split: F.trim strips ASCII spaces
    # only, so a leading/trailing tab or newline would otherwise emit
    # a '' token into the fitted counts that the scorer's .strip()
    # tokenization (_score_text) never produces — a silent fit/score
    # inconsistency on real web text (same filter as tokenizer.fit_bpe
    # and dsir._gram_counts; mirrored in the DuckDB oracle)
    from .parallelism import widen_small_scan

    words = widen_small_scan(ref_df.select(text_col)).select(
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: t != ""
        ).alias("_w")
    )
    # unigram counts: one explode + map-side-combinable groupBy.
    # Persisted (tiny: one row per distinct word, bounded further by
    # the cap) because the capped path derives the vocab frame for the
    # bigram mapping join from the same aggregate (r6).
    uni = (
        words.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .count()
    )
    if vocab_cap is not None:
        uni = uni.persist()
        uni_rows = uni.orderBy(
            F.col("count").desc(), F.col("w").asc()
        ).limit(vocab_cap).collect()
    else:
        uni_rows = uni.collect()
    c1_raw = {r["w"]: r["count"] for r in uni_rows}
    vocab = {w for w, c in c1_raw.items() if c >= min_count}

    # bigram counts built array-side (no positional self-join): each
    # doc contributes its adjacent word pairs
    w = F.col("_w")
    big_rows = (
        words.select(
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.struct(
                            F.element_at(w, i).alias("w1"),
                            F.element_at(w, i + 1).alias("w2"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<w1:string,w2:string>>")
                )
            ).alias("b")
        )
    )
    if vocab_cap is not None:
        # map through the capped vocab JVM-side BEFORE collecting:
        # the collected bigram rows are then bounded by the mapped
        # pair space, not the reference's open bigram vocabulary —
        # without this, vocab_cap capped the model but NOT the
        # driver collect (the dsir.fit_dsir pattern).
        # r6 (guide §3.1): the mapping is a broadcast JOIN against the
        # vocab frame derived from the SAME persisted unigram
        # aggregate (identical top-cap + min_count cut the driver
        # applied), not a |vocab|-literal isin — the InSet form
        # rebuilt a 65k-entry hash set once per task (~19 CPU-s at 64
        # tasks, measured) and bloated every plan that analyzed it.
        vdf = (
            uni.orderBy(F.col("count").desc(), F.col("w").asc())
            .limit(vocab_cap)
            .where(F.col("count") >= int(min_count))
            .select(F.col("w").alias("_vw"))
            .withColumn("_inv", F.lit(True))
        )

        def _mapped(c, inv):
            return F.when(inv.isNotNull(), c).otherwise(F.lit(UNK))

        big_rows = (
            big_rows.join(
                F.broadcast(vdf.withColumnRenamed("_inv", "_inv1")),
                F.col("b.w1") == F.col("_vw"), "left",
            ).drop("_vw")
            .join(
                F.broadcast(vdf.withColumnRenamed("_inv", "_inv2")),
                F.col("b.w2") == F.col("_vw"), "left",
            ).drop("_vw")
            .groupBy(
                _mapped(F.col("b.w1"), F.col("_inv1")).alias("w1"),
                _mapped(F.col("b.w2"), F.col("_inv2")).alias("w2"),
            )
            .count()
            .collect()
        )
        uni.unpersist()
    else:
        big_rows = big_rows.groupBy("b.w1", "b.w2").count().collect()

    # driver-side <unk> mapping of the collected counts (exact)
    map_w = lambda t: t if t in vocab else UNK  # noqa: E731
    c1: dict[str, int] = {}
    for t, c in c1_raw.items():
        mw = map_w(t)
        c1[mw] = c1.get(mw, 0) + c
    c2: dict[tuple[str, str], int] = {}
    h: dict[str, int] = {}
    for r in big_rows:
        key = (map_w(r["w1"]), map_w(r["w2"]))
        c2[key] = c2.get(key, 0) + r["count"]
        h[key[0]] = h.get(key[0], 0) + r["count"]

    return {
        "k": float(k),
        "lam": float(lam),
        "N": sum(c1.values()),
        "V": len(c1),
        "c1": c1,
        "c2": c2,
        "h": h,
        "vocab": vocab,
    }


def _score_text(text: str, m: dict) -> tuple[int, float]:
    """(n_tokens, perplexity) of one document under the model."""
    # non-str guards the NULL row (None via Arrow) and any stray
    # pandas NaN — both mean "no tokens", never a crash
    if not isinstance(text, str):
        return 0, float("nan")
    # ASCII \s to match the JVM fit side (Java \s) and the DuckDB
    # oracle (RE2 \s): Unicode \s would split interior NBSPs into
    # tokens the fitted counts never saw (see dsir._WS). No .strip()
    # either — it is Unicode-aware and would eat an edge NBSP the fit
    # side keeps glued to its word (review r5); drop '' edge tokens
    # from the raw split instead, as the fit's filter does.
    words = [w for w in re.split(r"\s+", text, flags=re.ASCII) if w]
    if not words:
        return 0, float("nan")
    k, lam, n_tot, v = m["k"], m["lam"], m["N"], m["V"]
    c1, c2, h, vocab = m["c1"], m["c2"], m["h"], m["vocab"]
    uden = n_tot + k * (v + 1)
    bden_k = k * (v + 1)

    def p1(mw: str) -> float:
        return (c1.get(mw, 0) + k) / uden

    prev = words[0] if words[0] in vocab else UNK
    logp = math.log(p1(prev))
    for t in words[1:]:
        mw = t if t in vocab else UNK
        pb = (c2.get((prev, mw), 0) + k) / (h.get(prev, 0) + bden_k)
        logp += math.log(lam * pb + (1.0 - lam) * p1(mw))
        prev = mw
    return len(words), math.exp(-logp / len(words))


def _r4(x: float) -> float:
    # engine-portable HALF_UP at 4 decimals (matches text_analysis.r4).
    # NaN passes through: _score_text emits NaN for token-less docs and
    # math.floor(nan) raises — a single empty/whitespace/image-only doc
    # must not fail the whole Spark stage. The pandas->Arrow bridge
    # surfaces the NaN as SQL NULL, and NULL <= max_ppl is NULL, so
    # lm_filter deterministically drops such docs.
    if x != x:
        return x
    return math.floor(x * 10000 + 0.5) / 10000


def perplexity(
    df: "DataFrame",
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """(id, n_tokens, ppl) — shuffle-free Arrow-batched projection;
    the model crosses once per executor as an ``sc.broadcast``."""
    import pandas as pd  # noqa: F811

    from .parallelism import widen_small_scan

    bc = df.sparkSession.sparkContext.broadcast(model)
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, n_tokens bigint, ppl double"
    # widen tiny scans so the Python scorer uses every core (r6,
    # guide §2.2); no-op on wide inputs
    df = widen_small_scan(df.select(id_col, text_col))

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        m = bc.value
        for pdf in batches:
            scored = [_score_text(t, m) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [n for n, _ in scored],
                    "ppl": [_r4(p) for _, p in scored],
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, schema)


def lm_filter(
    df: "DataFrame",
    model: dict,
    max_ppl: float,
    text_col: str = "text",
) -> "DataFrame":
    """Input rows whose text scores ``ppl <= max_ppl`` (CCNet "head"
    selection), all columns passed through plus ``ppl``. Shuffle-free:
    one mapInPandas stage, no joins."""
    import pandas as pd  # noqa: F811
    from pyspark.sql import functions as F

    bc = df.sparkSession.sparkContext.broadcast(model)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", ppl double"

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        m = bc.value
        for pdf in batches:
            out = pdf.copy()
            out["ppl"] = [_r4(_score_text(t, m)[1]) for t in pdf[text_col]]
            yield out

    return df.mapInPandas(fn, schema).filter(F.col("ppl") <= max_ppl)


def fit_ppl_thresholds(
    scored: "DataFrame",
    n_buckets: int = 3,
    ppl_col: str = "ppl",
    id_col: str = "doc_id",
) -> list[float]:
    """CCNet bucket thresholds (Wenzek et al. 2020 §4.4: the corpus is
    cut into head/middle/tail by LM perplexity): the i-th threshold is
    the ppl value at rank ceil(i*n/n_buckets) under (ppl asc, id asc)
    ordering — a DISCRETE rank statistic, not an interpolated
    percentile, so DuckDB reproduces it exactly via row_number and no
    engine's quantile interpolation arithmetic is in the contract.

    ``scored`` is the bounded FIT SLICE (CCNet fits thresholds on a
    sample, then ships them as constants): the rank select runs a
    single-partition window over the slice, so pass a sample — at
    100 TB the slice is the thing that is small, the scoring
    projection is the thing that is big. NULL ppl rows (token-less
    docs) are excluded from the fit."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    s = scored.select(ppl_col, id_col).filter(F.col(ppl_col).isNotNull())
    n = s.count()
    if n < n_buckets:
        raise ValueError(f"fit slice has {n} rows < {n_buckets} buckets")
    # integer ceil(i*n/k) — exact on both engines, no float ranks
    ranks = [
        -(-(i * n) // n_buckets) for i in range(1, n_buckets)
    ]
    w = Window.orderBy(F.col(ppl_col).asc(), F.col(id_col).asc())
    rows = (
        s.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn").isin(ranks))
        .select("_rn", ppl_col)
        .collect()
    )
    by_rank = {r["_rn"]: r[ppl_col] for r in rows}
    return [by_rank[r] for r in ranks]


def ppl_bucket_col(
    ppl_col,
    thresholds: list[float],
    labels: tuple = ("head", "middle", "tail"),
):
    """Bucket label Column: ppl <= thresholds[i] -> labels[i], else the
    last label; NULL ppl -> NULL. Pure projection — the thresholds are
    driver constants, the corpus never shuffles. ppl values from
    ``perplexity`` are 4-decimal-rounded, so the <= comparisons are
    engine-portable."""
    from pyspark.sql import functions as F

    if len(labels) != len(thresholds) + 1:
        raise ValueError("need len(labels) == len(thresholds) + 1")
    c = F.col(ppl_col) if isinstance(ppl_col, str) else ppl_col
    expr = F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.lit(labels[-1])
    )
    for label, t in reversed(list(zip(labels[:-1], thresholds))):
        expr = F.when(c <= F.lit(t), F.lit(label)).otherwise(expr)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(expr)
