"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables; compare row count, column names, and the full
(order-insensitive) value multiset EXACTLY."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("H2D_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"create view {name} as select * from '{SF_DIR}/{name}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rowset(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES), ids=str)
def test_query_vs_oracle(spark, ddb, name):
    spark_df = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_df = ddb.execute(ORACLES[name]).fetchdf()
    s_cols, s_rows = _rowset(spark_df)
    o_cols, o_rows = _rowset(oracle_df)
    assert s_cols == o_cols
    # the driver hashes raw values, so float64-vs-int64 (e.g. DuckDB
    # HUGEINT sums) is a real mismatch even when == holds (VERDICT r1 #3)
    s_kinds = [spark_df[c].dtype.kind for c in s_cols]
    o_kinds = [oracle_df[c].dtype.kind for c in o_cols]
    assert s_kinds == o_kinds, (
        f"{name}: dtype kinds differ spark={list(zip(s_cols, s_kinds))} "
        f"oracle={list(zip(o_cols, o_kinds))}"
    )
    assert len(s_rows) == len(o_rows)
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first mismatches {mismatches}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES)), ids=str
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "spans"]
