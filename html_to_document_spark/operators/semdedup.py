"""SemDeDup — semantic deduplication (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication").

Where MinHash/SimHash surface *lexical* near-duplicates, SemDeDup
removes *semantic* duplicates: documents whose embeddings are nearly
parallel even when their text differs (translations, paraphrases,
templated rewrites).  The published recipe:

1. k-means-cluster the embedding space (k large, so clusters are
   small) — here the centroids are caller-supplied, either from
   ``similarity.ivf_ann_topk``'s sampled KMeans fit or any external
   quantizer, which keeps this operator deterministic and the gate
   row SQL-expressible;
2. within each cluster, find pairs with cosine above ``eps``;
3. from each group of semantic duplicates keep the member LEAST
   similar to its cluster centroid (the paper's "keep outliers"
   rule — redundant near-centroid copies carry the least marginal
   information), ties broken by id.

The keep rule here is the pairwise-greedy form: a row is removed iff
some same-cluster row within ``eps`` has strictly lower
(centroid_sim, id) priority.  On a duplicate *chain* a~b~c this
removes everything except the lowest-priority member of each
eps-neighborhood, which matches the paper's grouped semantics on
cliques (the common case — semantic duplicates of one source are
mutually similar) and is strictly deterministic without an iterative
connected-components pass.

Scale shape (100 TB lens):
- ASSIGNMENT is a shuffle-free codegen projection: centroids are
  inlined literals (k floats*dim — a few KB), cluster = argmax cosine
  via one array_max over a struct array; the corpus is never joined.
- The candidate generator is a *cluster-keyed* self-join — the
  paper's reason for clustering is exactly that it bounds the m² to
  within-cluster pairs.  Rows carry (id, cluster, centroid_sim,
  vector); the join key is the int cluster id.
- Hot clusters (k chosen too small, or a degenerate embedding mass)
  are detected with a per-cluster count partial-agg + tiny broadcast
  hot set, then routed through the hyperplane-LSH candidate
  generator (``similarity.embedding_near_dup_pairs``), which carries
  its own sound hot-bucket star guard — so no shuffle partition ever
  receives an unbounded cluster.  The id handed to the generator is
  priority-encoded ((rounded centroid_sim, id) packed into a long)
  so the star representative IS the keep rule's keeper, which makes
  dup cliques inside hot clusters collapse to exactly one keeper.
  Below the cap, capped == uncapped (pytest-pinned).

Cosines are rounded HALF_UP at 4 decimals (``text_analysis.r4``)
before every comparison, pinning assignment, eps tests and the keep
rule across engines/fold orders — the convention the ann_cosine_topk
oracle established.

Reference behavioural parity: the reference engine has no semantic
dedup — this operator belongs to the beyond-reference training-data
surface the task brief mandates.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["assign_clusters", "semantic_dedup"]


def _centroid_lit(c):
    from pyspark.sql import functions as F

    return F.array(*[F.lit(float(x)) for x in c])


def assign_clusters(
    df: "DataFrame",
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "DataFrame":
    """Append (cluster, centroid_sim): nearest centroid by rounded
    cosine, ties to the lowest centroid index.  Pure Column
    expression — no shuffle, no Python, centroids inlined as literals
    (broadcast-free: they live in the plan itself)."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.similarity import (
        cosine_similarity,
    )
    from html_to_document_spark.operators.text_analysis import r4

    # r6 note: an unrolled fixed-dim cosine was tried here and
    # REVERTED — the 8 x ~200-node literal chains drop the downstream
    # pair join out of whole-stage codegen, and the interpreted join
    # predicate then re-evaluates the COLLAPSED assignment expression
    # per pair (measured 12s -> 56s for the semantic_dedup row at
    # sf0.1). The higher-order aggregate keeps the tree small; its
    # per-ROW cost is negligible beside the per-PAIR stage.
    v = F.col(vec_col)
    scored = F.array(
        *[
            F.struct(
                r4(cosine_similarity(v, _centroid_lit(c))).alias("sim"),
                F.lit(-i).alias("negi"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    # struct max compares (sim, negi) lexicographically: highest sim,
    # then highest negi == lowest centroid index
    best = F.array_max(scored)
    return df.select(
        "*",
        (-best["negi"]).cast("int").alias("cluster"),
        best["sim"].alias("centroid_sim"),
    )


def semantic_dedup(
    df: "DataFrame",
    centroids: list[list[float]],
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_cap: int | None = 256,
) -> "DataFrame":
    """Rows that SURVIVE semantic dedup, with their (cluster,
    centroid_sim) appended.

    A row x is removed iff some row y in the same cluster has
    rounded cosine(x, y) >= eps and (y.centroid_sim, y.id) <
    (x.centroid_sim, x.id) — i.e. each eps-neighborhood keeps its
    least-centroid-similar member.

    ``cluster_cap``: clusters whose size exceeds the cap skip the
    exact within-cluster all-pairs and route through the LSH
    candidate generator (with the same value as its bucket cap).
    Below the cap the output is identical to the uncapped all-pairs
    rule."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.parallelism import (
        widen_small_scan,
    )

    # r6 perf: widen tiny scans so the per-pair cosine stage uses
    # every core (no-op on wide inputs), then localCheckpoint the
    # assignment — it feeds BOTH join sides and the final anti-join,
    # and each instantiation re-analyzed (and re-evaluated) the
    # k x dim centroid-literal expression tree (~5 s of driver-side
    # plan work per run at k=8, dim=64, measured). Same in-query
    # materialize pattern as the training pipeline; values unchanged.
    assigned = assign_clusters(
        widen_small_scan(df), centroids, id_col, vec_col
    ).localCheckpoint(eager=False)

    from html_to_document_spark.operators.similarity import _dot, _norm
    from html_to_document_spark.operators.text_analysis import r4

    # hoist the per-row norm ABOVE the join: the pair predicate then
    # folds one dot product instead of dot + two norms (the norms
    # would otherwise be re-folded for every pair a row appears in —
    # measured 3x per-pair cost at sf0.1). Same double math, so the
    # rounded cosine is bit-identical to cosine_similarity's.
    # r6 note: the unrolled fixed-dim kernel was tried here and
    # REVERTED — as a join condition the 192-node Add chain falls out
    # of codegen and interprets ~7x slower per pair than the HOF fold
    # (measured 23s -> 60s on the sf0.1 pair stage); the HOF form
    # stays the right per-pair kernel inside joins.
    lhs = assigned.select(
        F.col(id_col).alias("_ia"),
        F.col(vec_col).alias("_va"),
        _norm(F.col(vec_col)).alias("_na"),
        F.col("cluster").alias("_c"),
        F.col("centroid_sim").alias("_sa"),
    )
    rhs_all = assigned.select(
        F.col(id_col).alias("_ib"),
        F.col(vec_col).alias("_vb"),
        _norm(F.col(vec_col)).alias("_nb"),
        F.col("cluster").alias("_c"),
        F.col("centroid_sim").alias("_sb"),
    )

    # y strictly higher priority than x: (sim, id) lexicographic
    prio = (F.col("_sb") < F.col("_sa")) | (
        (F.col("_sb") == F.col("_sa")) & (F.col("_ib") < F.col("_ia"))
    )
    close = r4(
        _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    ) >= float(eps)

    if cluster_cap is None:
        removed = (
            lhs.join(rhs_all, "_c")
            .where(prio & close)
            .select(F.col("_ia").alias(id_col))
            .distinct()
        )
    else:
        # hot-cluster routing: the cluster-keyed self-join is exact
        # for clusters under the cap; clusters over it route through
        # the hyperplane-LSH candidate generator. The id handed to
        # the generator is PRIORITY-ENCODED — pid = (rounded sim,
        # id) packed into one long — so the generator's star
        # representative (bucket-MIN pid) is exactly the member the
        # keep rule keeps: every star pair (keeper, x) removes x and
        # a dup clique collapses to its one keeper. With the raw id
        # instead, a clique whose min-ID member is NOT the priority
        # min would lose only that member and every other duplicate
        # would survive. A "compare against the cluster's priority
        # heads" cap was considered and REJECTED: a dup clique at the
        # TAIL of the cluster's priority order would never meet a
        # head and escape dedup entirely; LSH sub-bucketing has no
        # such blind spot (recall is probabilistic, pytest-gated in
        # test_similarity).
        from html_to_document_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )

        id_type = dict(assigned.dtypes)[id_col]
        if id_type not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                "cluster_cap hot-routing requires an integral id "
                f"column (got {id_col}: {id_type}); pass "
                "cluster_cap=None or add a surrogate long id"
            )

        hot = F.broadcast(
            assigned.groupBy(F.col("cluster").alias("_c"))
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > int(cluster_cap))
            .select("_c")
        )
        is_hot = F.col("_hc").isNotNull()
        lhs_m = lhs.join(
            hot.withColumn("_hc", F.lit(1)), "_c", "left"
        )
        cold_removed = (
            lhs_m.filter(~is_hot)
            .drop("_hc")
            .join(rhs_all, "_c")
            .where(prio & close)
            .select(F.col("_ia").alias(id_col))
        )
        hot_rows = (
            assigned.join(
                hot.withColumnRenamed("_c", "cluster"), "cluster"
            )
            .select(id_col, vec_col, "cluster", "centroid_sim")
        )
        # pid packs (rounded sim, id) so that pid order == the keep
        # rule's (centroid_sim, id) lexicographic priority order:
        # sim is r4-rounded (4 decimals in [-1,1]) => an exact
        # integer key in [0, 20000] after round(sim*10000)+10000,
        # shifted above _ID_BITS bits of id. Requires 0 <= id <
        # 2^46 (~7e13 — generous for doc ids; the encode would wrap
        # silently above it, hence the shift leaves 15 sim bits +
        # sign headroom inside a long).
        _ID_BITS = 46
        _ID_SPAN = F.lit(1 << _ID_BITS).cast("long")
        # runtime range guard: the type check above validates only
        # the column's TYPE; a negative or >= 2^46 id would wrap the
        # encode silently and corrupt both the pid priority order and
        # the pmod decode (wrong removals). assert_true rides the pid
        # projection itself (returns NULL when the predicate holds,
        # raises with the message otherwise), so the guard costs no
        # extra Spark job — coalesce folds the NULL to a 0 addend.
        _id_long = F.col(id_col).cast("long")
        _guard = F.assert_true(
            (_id_long >= 0) & (_id_long < _ID_SPAN),
            F.lit(
                "cluster_cap hot-routing requires 0 <= id < 2^46 "
                f"(id column {id_col} has out-of-range values); pass "
                "cluster_cap=None or add a surrogate long id"
            ),
        )
        pid = (
            (F.round(F.col("centroid_sim") * 10000).cast("long")
             + F.lit(10000)) * _ID_SPAN
            + _id_long
            + F.coalesce(_guard.cast("long"), F.lit(0))
        )
        dim = len(centroids[0])
        pairs = embedding_near_dup_pairs(
            hot_rows.select(pid.alias("_pid"), vec_col),
            threshold=float(eps), dim=dim,
            id_col="_pid", vec_col=vec_col,
            bucket_cap=int(cluster_cap),
        )
        # pairs come back id_a < id_b IN PID SPACE, so id_b is
        # always the lower-priority member — the pair's loser. Decode
        # the original ids arithmetically (no join), then keep only
        # same-cluster pairs (the rule is within-cluster; hyperplane
        # buckets do not respect cluster boundaries) via two id-keyed
        # equi-joins on the small surfaced pair set.
        meta = hot_rows.select(
            F.col(id_col).alias("_mid"),
            F.col("cluster").alias("_mc"),
        )
        decoded = pairs.select(
            F.pmod(F.col("id_a"), _ID_SPAN).alias("_da"),
            F.pmod(F.col("id_b"), _ID_SPAN).alias("_db"),
        )
        pa = decoded.join(
            meta.select(
                F.col("_mid").alias("_da"), F.col("_mc").alias("_ca")
            ),
            "_da",
        ).join(
            meta.select(
                F.col("_mid").alias("_db"), F.col("_mc").alias("_cb")
            ),
            "_db",
        ).where(F.col("_ca") == F.col("_cb"))
        hot_removed = pa.select(F.col("_db").cast(id_type).alias(id_col))
        removed = cold_removed.unionByName(hot_removed).distinct()

    return assigned.join(removed, id_col, "left_anti")
