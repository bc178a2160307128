"""Semantic document ordering (operators/ordering.py — the In-Context
Pretraining cluster-then-order recipe)."""

from __future__ import annotations

import pytest

from html_to_document_spark.operators.ordering import semantic_order

# two orthogonal 4-dim block centroids
CENTS = [[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]]


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_semantic_order_rank_and_ties(spark):
    rows = [
        # cluster 0, decreasing similarity to [1,1,0,0]
        (1, [1.0, 1.0, 0.0, 0.0]),     # sim 1.0
        (2, [1.0, 0.5, 0.0, 0.0]),     # high
        (3, [1.0, 0.0, 0.5, 0.0]),     # lower
        # an exact tie with id 1 -> id breaks it
        (9, [2.0, 2.0, 0.0, 0.0]),     # sim 1.0 (scale-invariant)
        # cluster 1
        (4, [0.0, 0.0, 1.0, 1.0]),
        (5, [0.0, 0.3, 1.0, 1.0]),
    ]
    out = {
        r.vec_id: (r.cluster, r.pos)
        for r in semantic_order(_emb(spark, rows), CENTS).collect()
    }
    assert out[1] == (0, 1)   # sim 1.0, lower id
    assert out[9] == (0, 2)   # sim 1.0, higher id
    assert out[2] == (0, 3)
    assert out[3] == (0, 4)
    assert out[4] == (1, 1)
    assert out[5] == (1, 2)


def test_semantic_order_sub_cells_bound_partitions(spark):
    rows = [(i, [1.0, float(i % 7) / 10.0, 0.0, 0.0]) for i in range(40)]
    base = {
        r.vec_id: r.cluster
        for r in semantic_order(_emb(spark, rows), CENTS).collect()
    }
    split = semantic_order(_emb(spark, rows), CENTS, sub_cells=4).collect()
    # membership unchanged by sub-splitting
    assert {r.vec_id: r.cluster for r in split} == base
    # each (cluster, sub_cell) carries dense 1..n ranks and its order
    # follows (sim desc, id asc)
    from collections import defaultdict

    groups = defaultdict(list)
    for r in split:
        groups[(r.cluster, r.sub_cell)].append(r)
    assert len(groups) > 1
    for g in groups.values():
        g.sort(key=lambda r: r.pos)
        assert [r.pos for r in g] == list(range(1, len(g) + 1))
        keys = [(-r.centroid_sim, r.vec_id) for r in g]
        assert keys == sorted(keys)


def test_semantic_order_repartition_stable(spark):
    rows = [(i, [float(i % 3), 1.0, float(i % 5), 0.0]) for i in range(30)]
    a = semantic_order(_emb(spark, rows), CENTS, sub_cells=3)
    b = semantic_order(
        _emb(spark, rows).repartition(7), CENTS, sub_cells=3
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_semantic_order_arg_validation(spark):
    with pytest.raises(ValueError):
        semantic_order(_emb(spark, [(1, [1.0, 0.0, 0.0, 0.0])]), CENTS,
                       sub_cells=0)


def test_semantic_order_single_exchange(spark):
    # assignment adds no shuffle; the rank's window is the plan's only
    # exchange (on cluster+sub_cell), and nothing runs in Python
    rows = [(i, [1.0, 0.0, float(i), 0.0]) for i in range(10)]
    plan = (
        semantic_order(_emb(spark, rows), CENTS, sub_cells=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "ArrowEval" not in plan
