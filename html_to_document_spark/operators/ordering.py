"""Semantic document ordering for training-data packing.

In-Context Pretraining (Shi et al. 2023, arXiv:2310.10638) shows LMs
learn better when related documents are CONCATENATED ADJACENTLY in the
training stream instead of shuffled independently — the model gets
cross-document context that is actually about the same thing.  The
paper's exact method is a greedy nearest-neighbor traveling path over
document embeddings; a graph walk over 10^12 docs is not a Spark
shape.  The scalable equivalent implemented here is
cluster-then-order:

1. assign each document to its nearest centroid
   (:func:`~html_to_document_spark.operators.semdedup.assign_clusters`
   — a pure Column projection over literal/broadcast centroids, zero
   shuffle, zero Python);
2. rank within each cluster by (centroid similarity desc, id asc), so
   a cluster reads from its semantic core outward and ties are
   deterministic;
3. the training stream then consumes (cluster, sub_cell, pos) order —
   adjacent rows are same-cluster neighbors, which is the property the
   paper's path construction exists to create.

100 TB shape: the only shuffle is the rank's hash exchange on
(cluster, sub_cell).  A window partition cannot be AQE-skew-split, so
an ultra-hot cluster would serialize on one task; ``sub_cells`` splits
every cluster into that many deterministic hash sub-cells
(pmod(xxhash64(id))), bounding each window partition at
~corpus/(K * sub_cells) rows while keeping sub-cell members
semantically co-clustered.  Adjacency quality degrades only at the
sub-cell boundaries.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def semantic_order(
    df: "DataFrame",
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sub_cells: int = 1,
) -> "DataFrame":
    """Order documents for packing so semantic neighbors are adjacent
    (the In-Context Pretraining recipe, module docstring).  Returns
    (``id_col``, cluster, sub_cell, centroid_sim, pos): reading rows
    in (cluster, sub_cell, pos) order yields the training-stream
    document order.  ``pos`` is the 1-based rank within its
    (cluster, sub_cell) by (centroid_sim desc, id asc) — fully
    deterministic, engine-reproducible (r4-rounded sims, integer ids).

    ``sub_cells > 1`` bounds the per-window partition size for hot
    clusters (see module docstring); membership and within-sub-cell
    order are unchanged by repartitioning.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from html_to_document_spark.operators.semdedup import assign_clusters

    if sub_cells < 1:
        raise ValueError(f"sub_cells must be >= 1, got {sub_cells}")

    from html_to_document_spark.operators.parallelism import (
        widen_small_scan,
    )

    # widen tiny scans ahead of the k x dim assignment projection
    # (r6, guide §2.2); no-op on wide inputs
    assigned = assign_clusters(
        widen_small_scan(df), centroids, id_col=id_col, vec_col=vec_col
    )
    sub = (
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(sub_cells)).cast("int")
        if sub_cells > 1
        else F.lit(0).cast("int")
    )
    w = Window.partitionBy("cluster", "sub_cell").orderBy(
        F.desc("centroid_sim"), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("sub_cell", sub)
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "cluster", "sub_cell", "centroid_sim", "pos")
    )
