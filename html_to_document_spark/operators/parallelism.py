"""Scale-adaptive parallelism guard for per-row-heavy stages.

Problem (guide §2.2 / §6.1): a small input — one parquet file, or one
row group — plans 1-2 scan tasks. Spark's partial aggregation and
Python projections run AT THE SCAN'S PARALLELISM, so an
explode + 64-hash MinHash aggregate, an n-gram count fit, or a
broadcast-model mapInPandas scorer executes nearly serially on a
32-core session while 31 cores idle, and every downstream broadcast
that waits on it stalls the critical path (measured: the sf0.1
MinHash signature build ran 2 tasks x 2.2 s and put ~3 s of collect
wait into each of three dependent broadcasts).

Fix: hash-repartition to the session's shuffle width — but ONLY when
the input's planned parallelism is below half that width. At scale
the scan side already exceeds the shuffle width, the guard is a
no-op, and no shuffle is added; the repartition is therefore never a
constant tuned to this box (the width follows
``spark.sql.shuffle.partitions``, which the session derives from its
core count locally and from cluster sizing in production).

Correctness: every caller feeds partitioning-insensitive consumers
(hash aggregates over all rows, per-row projections), so results are
bit-identical; keyed repartition additionally lets a downstream
``groupBy`` on the same key reuse the exchange.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["widen_small_scan"]


def widen_small_scan(df: "DataFrame", *key_cols: str) -> "DataFrame":
    """Repartition ``df`` to the shuffle width when its planned
    parallelism is under half of it; identity otherwise (and identity
    on any error — the guard must never break a plan).

    ``key_cols``: hash-partition on these (lets a following
    ``groupBy(key)`` reuse the exchange); round-robin when empty.
    """
    try:
        n_in = df.rdd.getNumPartitions()
        width = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except Exception:
        return df
    if n_in * 2 >= width:
        return df
    if key_cols:
        return df.repartition(width, *key_cols)
    return df.repartition(width)
