"""SemDeDup semantic dedup (operators/semdedup.py)."""

import math

import pytest

from html_to_document_spark.operators.semdedup import (
    assign_clusters,
    semantic_dedup,
)

# two block-one-hot centroids over dim 4
C2 = [[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0]]


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_assignment_and_tiebreak(spark):
    df = _mk(spark, [
        (1, [1.0, 0.0, 0.0, 0.0]),   # cluster 0
        (2, [0.0, 0.0, 1.0, 0.0]),   # cluster 1
        (3, [1.0, 0.0, 1.0, 0.0]),   # equal sim to both -> cluster 0
    ])
    out = {r["vec_id"]: r for r in assign_clusters(df, C2).collect()}
    assert out[1]["cluster"] == 0
    assert out[2]["cluster"] == 1
    assert out[3]["cluster"] == 0  # tie -> lowest centroid index
    # centroid_sim = cos([1,0,0,0],[1,1,0,0]) = 1/sqrt(2), r4-rounded
    assert out[1]["centroid_sim"] == pytest.approx(0.7071, abs=1e-9)


def test_assignment_no_shuffle(spark):
    df = _mk(spark, [(1, [1.0, 0.0, 0.0, 0.0])])
    plan = assign_clusters(df, C2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_near_dup_keeps_least_centroid_similar(spark):
    df = _mk(spark, [
        (1, [1.0, 0.0, 0.0, 0.0]),      # centroid_sim 0.7071
        (2, [1.0, 0.01, 0.0, 0.0]),     # near-dup of 1, sim 0.7142
        (3, [0.0, 1.0, 0.0, 0.0]),      # cluster 0, not a dup (cos 0)
        (4, [0.0, 0.0, 1.0, 0.0]),      # cluster 1, unique
    ])
    kept = {r["vec_id"] for r in
            semantic_dedup(df, C2, eps=0.99).collect()}
    # 2 is closer to the centroid than 1 -> 2 removed, 1 kept
    assert kept == {1, 3, 4}


def test_exact_dup_tie_keeps_lower_id(spark):
    df = _mk(spark, [
        (7, [1.0, 0.0, 0.0, 0.0]),
        (9, [1.0, 0.0, 0.0, 0.0]),
    ])
    kept = {r["vec_id"] for r in
            semantic_dedup(df, C2, eps=0.99).collect()}
    assert kept == {7}


def test_chain_keeps_single_least_similar(spark):
    # a~b and b~c within eps, a!~c: the eps-neighborhood collapses to
    # its least-centroid-similar member (c), matching the paper's
    # grouped keep-outlier rule on the chain
    a10, a20 = math.radians(10), math.radians(20)
    df = _mk(spark, [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [math.cos(a10), math.sin(a10), 0.0, 0.0]),
        (3, [math.cos(a20), math.sin(a20), 0.0, 0.0]),
    ])
    cents = [[1.0, 0.0, 0.0, 0.0]]
    kept = {r["vec_id"] for r in
            semantic_dedup(df, cents, eps=0.98).collect()}
    assert kept == {3}


def _planted(spark):
    rows = []
    for i in range(40):
        base = [0.0] * 4
        base[(i % 2) * 2] = 1.0
        # 0.05-step directions: adjacent rounded cosines <= 0.9997
        # < eps, every row gets a distinct centroid_sim, and the max
        # tangent 0.95 stays clear of the clique direction (tan 1.0,
        # nearest base cos 0.9997)
        base[(i % 2) * 2 + 1] = 0.05 * (i // 2)
        rows.append((i, base))
    # hot clique: 30 identical vectors in cluster 0
    for i in range(100, 130):
        rows.append((i, [1.0, 1.0, 0.0, 0.0]))
    return _mk(spark, rows)


def test_cap_below_equals_uncapped(spark):
    df = _planted(spark)
    k_unc = sorted(r["vec_id"] for r in
                   semantic_dedup(df, C2, eps=0.9999,
                                  cluster_cap=None).collect())
    k_big = sorted(r["vec_id"] for r in
                   semantic_dedup(df, C2, eps=0.9999,
                                  cluster_cap=1000).collect())
    assert k_unc == k_big


def test_hot_cluster_cap_star_routing(spark):
    df = _planted(spark)
    # cap 5 << cluster sizes: both clusters route through the LSH
    # generator; the 30-identical clique lands in one LSH bucket per
    # table, trips ITS star guard, and must still collapse to one
    # keeper, while the well-separated base rows survive untouched
    kept_capped = {r["vec_id"] for r in
                   semantic_dedup(df, C2, eps=0.9999,
                                  cluster_cap=5).collect()}
    kept_unc = {r["vec_id"] for r in
                semantic_dedup(df, C2, eps=0.9999,
                               cluster_cap=None).collect()}
    # the planted clique collapses to exactly one survivor either way
    assert len([i for i in kept_capped if i >= 100]) == 1
    assert len([i for i in kept_unc if i >= 100]) == 1


def test_deterministic_under_partitioning(spark):
    df = _planted(spark)
    a = sorted(r["vec_id"] for r in
               semantic_dedup(df, C2, eps=0.9999).collect())
    b = sorted(r["vec_id"] for r in
               semantic_dedup(df.repartition(7), C2,
                              eps=0.9999).collect())
    assert a == b


def test_output_carries_cluster_columns(spark):
    df = _mk(spark, [(1, [1.0, 0.0, 0.0, 0.0])])
    out = semantic_dedup(df, C2, eps=0.99)
    assert set(out.columns) == {
        "vec_id", "embedding", "cluster", "centroid_sim"
    }


def test_hot_clique_collapses_when_min_id_is_most_central(spark):
    # Regression (r4-cont review): the LSH star guard pairs a hot
    # bucket's members with the bucket-MIN representative. If that
    # representative were chosen by raw id, a clique whose lowest-id
    # member is the MOST centroid-similar one would remove only that
    # member and every other duplicate would survive. The priority
    # encoding must make the clique collapse to its least-similar
    # member regardless of id order.
    u = [2 ** -0.5, 2 ** -0.5, 0.0, 0.0]     # centroid direction
    v = [2 ** -0.5, -(2 ** -0.5), 0.0, 0.0]  # orthogonal, same plane
    rows = []
    for i in range(8):
        # angle from centroid 45deg + 0.02deg*i: pairwise cosines all
        # round to 1.0 (>= eps) while centroid sims are DISTINCT at 4
        # decimals and DECREASE with id -> id 100 (lowest) is the most
        # central, id 107 (highest) is the keep rule's keeper
        ang = math.radians(45 + 0.02 * i)
        rows.append((100 + i, [
            math.cos(ang) * u[d] + math.sin(ang) * v[d] for d in range(4)
        ]))
    rows.append((1, [0.0, 0.0, 1.0, 0.0]))   # cluster 1, untouched
    df = _mk(spark, rows)
    kept_unc = {r["vec_id"] for r in
                semantic_dedup(df, C2, eps=0.999,
                               cluster_cap=None).collect()}
    kept_hot = {r["vec_id"] for r in
                semantic_dedup(df, C2, eps=0.999,
                               cluster_cap=4).collect()}
    assert kept_unc == {107, 1}
    assert kept_hot == {107, 1}


def test_hot_routing_rejects_out_of_range_ids(spark):
    # regression (r4 ADVICE): only the id column's TYPE was checked; a
    # negative (or >= 2^46) id silently wrapped the pid encode and
    # corrupted priority order + decode. The assert_true guard riding
    # the pid projection must raise instead.
    rows = [(-5 if i == 100 else i, [1.0, 1.0, 0.0, 0.0])
            for i in range(100, 130)]
    df = _mk(spark, rows)
    with pytest.raises(Exception, match=r"2\^46"):
        semantic_dedup(df, C2, eps=0.9999, cluster_cap=5).collect()
