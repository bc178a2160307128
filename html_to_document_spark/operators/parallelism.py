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
    """Tiny driver-side row list as a JVM-evaluable frame.

    ``spark.createDataFrame(list)`` builds a pickled Python RDD whose
    first evaluation spawns a full set of Python workers — measured
    ~45 executor-seconds of pure wait at 32 cores for a
    few-hundred-row broadcast side (r6, guide §4). A plan-literal
    ``explode(array(struct(...)))`` form was tried and REVERTED: it
    costs one py4j roundtrip per CELL (~3 s to merely BUILD a 200-row
    spec, measured). This path goes through pandas + the Arrow
    ``createDataFrame`` bridge instead — two roundtrips total, and
    the JVM evaluates the frame as a local Arrow relation with no
    Python worker pool at runtime.

    ``schema``: DDL string ("a int, b string"), StructType, or a
    plain list of column names (types then follow the usual
    createDataFrame inference; None values need a typed schema).
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    st = names = None
    if isinstance(schema, StructType):
        st = schema
    elif isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        st = _parse_datatype_string(schema)
    elif schema is not None:
        names = list(schema)
    if st is not None:
        names = [f.name for f in st.fields]
    if not rows and st is None:
        raise ValueError("literal_frame needs a typed schema for 0 rows")
    if names is None:
        names = [f"_c{i}" for i in range(len(rows[0]))]
    if st is not None:
        # object dtype keeps ints exact beside Nones (no float
        # coercion); the explicit schema drives the Arrow conversion
        pdf = pd.DataFrame(list(rows), columns=names, dtype=object)
        return spark.createDataFrame(pdf, schema=st)
    pdf = pd.DataFrame(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=names)


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
