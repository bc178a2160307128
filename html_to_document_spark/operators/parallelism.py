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

__all__ = ["widen_small_scan", "literal_frame"]


def literal_frame(spark, rows, schema=None) -> "DataFrame":
    """Tiny driver-side row list as a pure-JVM literal frame.

    ``spark.createDataFrame(list)`` builds a pickled Python RDD whose
    first evaluation spawns a full set of Python workers — measured
    ~45 executor-seconds of pure wait at 32 cores for a
    few-hundred-row broadcast side (r6, guide §4). Literals live in
    the plan itself: explode(array(struct(...))) — no Python, no RDD,
    no worker pool. Use for small specs/seeds only (every row becomes
    plan literals); real data still belongs in createDataFrame.

    ``schema``: DDL string ("a int, b string") or StructType — every
    value is cast to its field type (createDataFrame parity) — or a
    plain list of column names, where types follow ``F.lit``
    inference (str/int/float/bool, same as createDataFrame's sampler
    for flat rows; None values need a typed schema).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    st = names = None
    if isinstance(schema, StructType):
        st = schema
    elif isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        st = _parse_datatype_string(schema)
    elif schema is not None:
        names = list(schema)
    if not rows:
        if st is None:
            raise ValueError("literal_frame needs a typed schema for 0 rows")
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
        )
    if st is not None:
        structs = [
            F.struct(*[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ])
            for row in rows
        ]
    else:
        if names is None:
            names = [f"_c{i}" for i in range(len(rows[0]))]
        structs = [
            F.struct(*[
                F.lit(v).alias(n) for v, n in zip(row, names)
            ])
            for row in rows
        ]
    return spark.range(1).select(
        F.explode(F.array(*structs)).alias("_r")
    ).select("_r.*")


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
