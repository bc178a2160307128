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
