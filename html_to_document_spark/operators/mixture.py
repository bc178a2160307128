"""Data-mixture resampling: downsample sources to hit target mixture
proportions (the step that turns a raw crawl+curated pool into the
source mix a training run actually wants).

Spark-first shape: one narrow count aggregation over the source column
(map-side combined, one row per source to the driver — sources number
in the dozens), then a stateless seeded Bernoulli ``sampleBy`` pass —
no shuffle of the corpus at all. The largest achievable total that
satisfies the exact proportions is computed from the binding source
(the one whose supply/target ratio is smallest); every other source is
downsampled toward it. Bernoulli sampling is approximate per partition
but unbiased and deterministic for a fixed seed — at training-corpus
scale the relative error is negligible, and exact-count sampling would
need a global sort or per-source windows (a shuffle the pipeline does
not want).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def mixture_fractions(
    counts: dict[str, int], targets: dict[str, float]
) -> dict[str, float]:
    """Per-source keep-fractions achieving ``targets`` proportions at
    the maximum total the supply allows. Pure function (unit-testable
    without Spark). Sources absent from ``targets`` are dropped
    (fraction 0). Target weights are normalized; zero-supply targets
    raise."""
    total_w = sum(targets.values())
    if total_w <= 0:
        raise ValueError("targets must have positive total weight")
    norm = {k: w / total_w for k, w in targets.items()}
    for k, w in norm.items():
        if w > 0 and counts.get(k, 0) == 0:
            raise ValueError(f"target source {k!r} has no supply")
    # binding source: smallest supply/target ratio caps the total
    scale = min(
        counts[k] / w for k, w in norm.items() if w > 0
    )
    out = {k: 0.0 for k in counts}
    for k, w in norm.items():
        if w > 0:
            out[k] = min(1.0, (w * scale) / counts[k])
    return out


def resample_mixture(
    df: "DataFrame",
    targets: dict[str, float],
    source_col: str = "source",
    seed: int = 42,
) -> "DataFrame":
    """Downsample ``df`` so its ``source_col`` composition matches
    ``targets`` (weights, any positive scale) at the maximum total the
    binding source allows. Keeps the input schema."""
    from pyspark.sql import functions as F

    counts = {
        r["k"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    fractions = mixture_fractions(counts, targets)
    return df.sampleBy(source_col, fractions, seed=seed)


def temperature_fractions(
    counts: dict[str, int], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature-scaled mixture keep-fractions (the multilingual /
    multi-domain balancing rule published with XLM-R (Conneau 2020,
    alpha=0.3) and GPT-3's domain weighting): target share of group
    ``k`` is proportional to ``n_k**alpha``, so ``alpha=1`` keeps the
    natural distribution and ``alpha->0`` approaches uniform —
    low-resource groups are upsampled RELATIVE to the head without
    ever repeating documents.

    Algebraic form: with targets ``w_k = n_k**alpha`` the generic
    binding-source construction (``mixture_fractions``) collapses to

        frac(k) = min_j(n_j**(1-alpha)) / n_k**(1-alpha)

    — the normalizing sum cancels, which besides being fewer ops
    makes the doubles reproducible from any engine's ``pow`` without
    an order-sensitive summation. The binding group (the smallest
    ``n**(1-alpha)``, i.e. the rarest group for ``alpha < 1``) keeps
    fraction 1.0; every other group downsamples toward it. Pure
    function (unit-testable without Spark)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha!r}")
    ratios = {
        k: float(n) ** (1.0 - alpha)
        for k, n in counts.items()
        if n > 0
    }
    if not ratios:
        return {}
    m = min(ratios.values())
    return {k: m / r for k, r in ratios.items()}


def temperature_fraction_col(
    df: "DataFrame",
    group_col: str = "lang",
    alpha: float = 0.3,
    out_col: str = "temp_keep_frac",
) -> "DataFrame":
    """Annotate each row with its group's temperature keep-fraction.
    One narrow count agg (one short row per group to the driver —
    groups are languages/domains, dozens at most); fractions come
    back as plain literals in a broadcast map, so the corpus itself
    never shuffles."""
    from pyspark.sql import functions as F

    counts = {
        r["k"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    fractions = temperature_fractions(counts, alpha)
    expr = F.lit(None).cast("double")
    for k, v in sorted(fractions.items()):
        expr = F.when(F.col(group_col) == k, F.lit(v)).otherwise(expr)
    return df.withColumn(out_col, expr)


def resample_temperature(
    df: "DataFrame",
    group_col: str = "lang",
    alpha: float = 0.3,
    seed: int = 42,
) -> "DataFrame":
    """Downsample ``df`` to the temperature-``alpha`` mixture over
    ``group_col`` (seeded Bernoulli, same 100 TB shape as
    ``resample_mixture``: one count agg + a stateless sampleBy pass,
    zero corpus shuffle)."""
    from pyspark.sql import functions as F

    counts = {
        r["k"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    fractions = temperature_fractions(counts, alpha)
    return df.sampleBy(group_col, fractions, seed=seed)


MAX_QUALITY_BUCKETS = 100_000  # refuse an unbounded histogram collect


def select_token_budget(
    df: "DataFrame",
    budget: int,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Token-budget corpus selection (the curation "data budget" rule:
    keep the best documents until the training run's token budget is
    spent): adds ``keep_budget`` — true exactly for the greedy prefix
    of the (``quality_col`` desc, ``id_col`` asc) order whose running
    ``tokens_col`` total stays within ``budget``. Equivalent to SQL's
    ``sum(tokens) over (order by quality desc, id) <= budget``, i.e. a
    strict prefix: once the running total crosses the budget nothing
    later is kept (a smaller later doc does NOT slip in — the rule is
    rank-ordered, not bin-packing; see ``packing.pack_sequences`` for
    the FFD shape). NULL quality never selects; NULL token counts
    count as 0.

    100 TB shape: NO global sort. Quality scores are quantized by
    construction (``text_analysis.quality_score`` rounds to 4
    decimals), so the per-value histogram — one map-side-combinable
    aggregation, one short row per distinct value, guarded by
    ``MAX_QUALITY_BUCKETS`` — is a bounded driver collect. The driver
    walks the histogram to classify every value as keep-all /
    drop-all and finds the single BOUNDARY value where the budget
    crosses; only that one value's rows (typically a sliver of the
    corpus) pay a cumulative window ordered by id, and their keep
    flags join back id-keyed. An adversarially fat boundary bucket
    funnels into one window task — quantize finer upstream if a
    corpus profile shows one."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    q = F.col(quality_col)
    toks = F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    hist = (
        df.filter(q.isNotNull())
        .groupBy(q.alias("_q"))
        .agg(F.sum(toks).alias("_t"))
    )
    # one bounded collect serves both the guard and the walk (r6: the
    # separate limit-count action recomputed the upstream projection)
    hist_rows = hist.limit(MAX_QUALITY_BUCKETS + 1).collect()
    if len(hist_rows) > MAX_QUALITY_BUCKETS:
        raise ValueError(
            f"quality histogram exceeds MAX_QUALITY_BUCKETS "
            f"({MAX_QUALITY_BUCKETS}); quantize {quality_col!r} before "
            f"selection — an unbounded value set cannot drive the "
            f"driver-side budget walk"
        )
    buckets = sorted(
        ((r["_q"], r["_t"]) for r in hist_rows), key=lambda x: -x[0]
    )
    cum = 0
    boundary = None
    boundary_prefix = 0
    for val, tsum in buckets:
        if cum + tsum <= budget:
            cum += tsum
        else:
            boundary, boundary_prefix = val, cum
            break

    if boundary is None:  # every scored doc fits
        return df.withColumn("keep_budget", q.isNotNull())

    remaining = budget - boundary_prefix
    w = Window.orderBy("_bid")  # boundary rows only — see docstring
    bkeep = (
        df.filter(q == F.lit(boundary))
        .select(F.col(id_col).alias("_bid"), toks.alias("_bt"))
        .withColumn("_cum", F.sum("_bt").over(w))
        .filter(F.col("_cum") <= remaining)
        .select("_bid", F.lit(True).alias("_bkeep"))
    )
    out = df.join(bkeep, df[id_col] == bkeep["_bid"], "left")
    return out.select(
        *df.columns,
        F.when(q.isNull(), F.lit(False))
        .when(q > F.lit(boundary), F.lit(True))
        .when(q == F.lit(boundary), F.coalesce("_bkeep", F.lit(False)))
        .otherwise(F.lit(False))
        .alias("keep_budget"),
    )


def split_boundaries(fractions: "list[tuple[str, float]]") -> list[str]:
    """Cumulative md5-prefix boundaries (8 lowercase hex digits) for
    ``hash_split_col``. Pure function so the DuckDB oracle can be
    generated from the SAME literals the Spark plan compiles in —
    lexical comparison of fixed-width lowercase hex equals numeric
    comparison, no engine-specific hex-to-int conversion needed."""
    if not fractions or any(f < 0 for _, f in fractions):
        raise ValueError("fractions must be non-negative and non-empty")
    total = sum(f for _, f in fractions)
    if total <= 0:
        raise ValueError("fractions must have positive total")
    bounds, cum = [], 0.0
    for _, f in fractions[:-1]:
        cum += f / total
        v = int(cum * (1 << 32))
        if v >= (1 << 32):
            # a saturated boundary must compare GREATER than every
            # 8-hex prefix — 'g' > 'f' lexically, so every md5 prefix
            # falls below it. format(2**32,'08x') would emit 9 chars
            # ('100000000'), which compares SMALLER than almost every
            # prefix and silently flipped ~94% of assignments to the
            # zero-fraction label (review r5-cont4, verified).
            bounds.append("g")
        else:
            bounds.append(format(v, "08x"))
    return bounds


def hash_split_col(
    id_col,
    fractions: "list[tuple[str, float]]",
    salt: str = "",
):
    """Deterministic train/val/test assignment: the first 8 hex chars
    of ``md5(salt || id)`` thresholded at the cumulative fractions.

    The split is a pure JVM Column projection — zero shuffle, zero
    Python, stable across runs/partitionings/engines (md5 of the same
    UTF-8 bytes is identical everywhere, unlike xxhash64 which DuckDB
    cannot reproduce), so a doc keeps its split when the corpus is
    re-partitioned, appended to, or re-read — the property that makes
    held-out sets trustworthy across pipeline re-runs at 100 TB.
    """
    from pyspark.sql import functions as F

    labels = [k for k, _ in fractions]
    bounds = split_boundaries(fractions)
    prefix = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )
    expr = F.lit(labels[-1])
    for label, bound in reversed(list(zip(labels[:-1], bounds))):
        expr = F.when(prefix < F.lit(bound), F.lit(label)).otherwise(expr)
    return expr


def hash_split_sql(
    id_expr: str, fractions: "list[tuple[str, float]]", salt: str = ""
) -> str:
    """The DuckDB expression computing exactly ``hash_split_col`` —
    generated from the same ``split_boundaries`` literals."""
    labels = [k for k, _ in fractions]
    bounds = split_boundaries(fractions)
    prefix = (
        f"substr(md5('{salt}' || cast({id_expr} as varchar)), 1, 8)"
    )
    expr = f"'{labels[-1]}'"
    for label, bound in reversed(list(zip(labels[:-1], bounds))):
        expr = (
            f"case when {prefix} < '{bound}' then '{label}' "
            f"else {expr} end"
        )
    return expr


def shuffle_shard(
    df: "DataFrame",
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "",
    sub_hex: int = 4,
    out_shard: str = "shard",
    out_pos: str = "shard_pos",
) -> "DataFrame":
    """Deterministic one-time corpus shuffle + sharding — the step
    that turns a curated pool into the SHUFFLED, SHARDED training
    corpus a run actually reads (every pretraining recipe shuffles
    document order once at corpus-build time; at 100 TB you cannot
    re-shuffle per epoch, so the shuffle must be reproducible and
    auditable from the ids alone). Each row gets:

    - ``out_shard`` — which of ``n_shards`` near-equal shards it
      lands in (md5-prefix lexical thresholds from the SAME
      :func:`split_boundaries` literals as :func:`hash_split_col`,
      so assignment is engine-reproducible and append/repartition
      stable), and
    - ``out_pos`` — its 0-based position within the shard under the
      global md5 order (ties broken by ``id_col``): the training
      read order, derivable from any engine.

    100 TB shape: NO global sort. Positions come from the two-level
    histogram trick: the first ``sub_hex`` hex chars of the digest
    define sub-buckets whose (shard, sub) counts aggregate map-side
    (≤ ``16**sub_hex + n_shards`` rows to the driver), cumulative
    offsets broadcast back, and a row_number window partitioned by
    (shard, sub) — 16**sub_hex parallel windows instead of
    ``n_shards`` single-reducer ones — adds the within-bucket rank.
    Because the sub-bucket is a PREFIX of the digest, (sub, digest)
    order equals digest order, so offset + rank reproduces the naive
    ``row_number() over (partition by shard order by digest, id)``
    exactly (the oracle formulation). Raise ``sub_hex`` so the
    largest bucket (~N/16**sub_hex rows) fits an executor."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if not 1 <= sub_hex <= 8:
        raise ValueError("sub_hex must be in 1..8")
    fractions = [(str(i), 1.0) for i in range(n_shards)]
    digest = F.md5(
        F.concat(F.lit(salt), F.col(id_col).cast("string"))
    )
    with_key = df.withColumn("_digest", digest).withColumn(
        out_shard,
        hash_split_col(id_col, fractions, salt).cast("int"),
    ).withColumn("_sub", F.substring("_digest", 1, sub_hex))
    counts = (
        with_key.groupBy(out_shard, "_sub").count().collect()
    )
    counts.sort(key=lambda r: (r[out_shard], r["_sub"]))
    offsets, cum, cur_shard = [], 0, None
    for r in counts:
        if r[out_shard] != cur_shard:
            cur_shard, cum = r[out_shard], 0
        offsets.append((r[out_shard], r["_sub"], cum))
        cum += r["count"]
    from .parallelism import literal_frame

    off_df = literal_frame(
        with_key.sparkSession, offsets,
        f"{out_shard} int, _sub string, _off long",
    )
    w = Window.partitionBy(out_shard, "_sub").orderBy("_digest", id_col)
    return (
        with_key.join(F.broadcast(off_df), [out_shard, "_sub"])
        .withColumn(
            out_pos, (F.col("_off") + F.row_number().over(w) - 1)
        )
        .drop("_digest", "_sub", "_off")
    )


def stratified_sample(
    df: "DataFrame",
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
    sub_hex: int = 4,
) -> "DataFrame":
    """EXACTLY ``min(k, |stratum|)`` rows per ``strata_col`` value —
    the eval-holdout construction ("k docs per language / per host
    for human review") where :func:`hash_split_col` gives fractions
    and :func:`cap_domain_share <html_to_document_spark.operators.\
url_filter.cap_domain_share>`'s hash mode gives ≈caps, but audits
    need an exact, reproducible k. Selection order is the md5 digest
    (ties by id): deterministic, append/repartition-stable, and
    derivable from ANY engine — the naive formulation is
    ``row_number() over (partition by stratum order by digest, id)
    <= k``, which is exactly what the gate pins.

    100 TB shape: NO per-stratum global window. The digest's first
    ``sub_hex`` hex chars split each stratum into sub-buckets whose
    counts aggregate map-side (≤ strata × 16^sub_hex short rows to
    the driver); a driver walk classifies each sub-bucket keep-all /
    drop-all, and ONLY the single boundary bucket per stratum pays a
    rank window (~stratum_size/16^sub_hex rows). The corpus's only
    other touch is the broadcast spec join."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if k < 0:
        raise ValueError("k must be >= 0")
    if not 1 <= sub_hex <= 8:
        raise ValueError("sub_hex must be in 1..8")
    if k == 0:
        return df.limit(0)

    # NULL-safe digest: concat(NULL) would NULL the digest and _sub,
    # silently ejecting NULL-id rows from the sample (review r5c8 #1)
    digest = F.md5(F.concat(
        F.lit(salt), F.coalesce(F.col(id_col).cast("string"), F.lit(""))
    ))
    keyed = df.withColumn("_digest", digest).withColumn(
        "_sub", F.substring("_digest", 1, sub_hex)
    )
    counts = keyed.groupBy(strata_col, "_sub").count().collect()
    counts.sort(key=lambda r: (
        (r[strata_col] is None, r[strata_col]), r["_sub"]
    ))
    spec, cum, cur = [], 0, object()
    for r in counts:
        if r[strata_col] != cur:
            cur, cum = r[strata_col], 0
        quota = min(r["count"], max(0, k - cum))
        cum += r["count"]
        if quota > 0:
            spec.append((cur, r["_sub"], int(quota), quota == r["count"]))
    # spec as a LITERAL struct array exploded JVM-side (r6, guide §4):
    # a createDataFrame of a driver list becomes a pickled Python RDD
    # whose first evaluation spawns a full Python worker pool for a
    # few-hundred-row broadcast side. Types mirror the old explicit
    # schema (the source column's own type, so non-string strata work).
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    from .parallelism import literal_frame

    spec_df = literal_frame(
        keyed.sparkSession,
        spec,
        StructType([
            StructField("_sk", df.schema[strata_col].dataType, True),
            StructField("_ss", StringType(), False),
            StructField("_quota", LongType(), False),
            StructField("_full", BooleanType(), False),
        ]),
    )
    # null-SAFE stratum equality: a plain equi-join can never match a
    # NULL stratum, which would silently drop that whole population
    # from the audit sample (review r5c8 #1 — confirmed by repro)
    joined = keyed.join(
        F.broadcast(spec_df),
        keyed[strata_col].eqNullSafe(F.col("_sk"))
        & (F.col("_sub") == F.col("_ss")),
    )
    full = joined.filter(F.col("_full"))
    w = Window.partitionBy(strata_col, "_sub").orderBy("_digest", id_col)
    partial = (
        joined.filter(~F.col("_full"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn")
    )
    return full.unionByName(partial).select(*df.columns)
