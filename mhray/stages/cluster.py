"""Stage 7: distributed connected components (union-find by rounds).

Not in the reference — MHAP emits pairs and Canu consumes them
(SURVEY.md D4). We cluster with iterative min-label propagation
expressed as groupby/join rounds (the log-rounds CC scheme of
"Finding connected components in map-reduce in logarithmic rounds",
ICDE 2013, per PAPERS.md): labels start as node ids; every round each
node adopts the minimum label in its neighborhood; a driver-side
fixpoint loop materializes only the (node, label) table — which holds
one row per node that appears in ANY pair (tiny relative to the
corpus), never the corpus itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def cluster_edges(pairs_ds, max_rounds: int = 50,
                  num_partitions: int = 16) -> "ray.data.Dataset":
    """pairs(lo, hi) -> (iid, cluster_id) for every node in a pair.

    Label propagation with path-halving via a label->label join each
    round; converges in O(log n) rounds for the small dense clusters
    near-dup detection produces (diameter-bound in general).
    """
    edges = pairs_ds.select_columns(["lo", "hi"]).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "iid": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
        }))

    # undirected: both directions, so min-label flows both ways
    def both_dirs(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch.column("lo"), dtype=np.int64)
        hi = np.asarray(batch.column("hi"), dtype=np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([lo, hi]), pa.int64()),
            "dst": pa.array(np.concatenate([hi, lo]), pa.int64()),
        })

    directed = edges.map_batches(both_dirs, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    # labels: node -> its own id (plus itself as neighbor, so labels
    # never regress when a node has no smaller neighbor)
    labels = directed.groupby("src").min("dst").rename_columns(
        {"src": "node", "min(dst)": "nbr_min"}
    ).map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "label": pa.compute.min_element_wise(b.column("node"), b.column("nbr_min")),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    for _ in range(max_rounds):
        # propagate: each node's candidate = min over neighbors' labels
        msgs = directed.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        )  # (src, dst, label): label of src flows to dst
        cand = msgs.groupby("dst").min("label").rename_columns(
            {"dst": "node", "min(label)": "cand"}
        )
        merged = labels.join(
            cand, join_type="left_outer", num_partitions=num_partitions,
            on=("node",), right_on=("node",),
        )

        def take_min(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lab = batch.column("label")
            cand = pc.coalesce(batch.column("cand"), lab)
            new = pc.min_element_wise(lab, cand)
            return pa.table({
                "node": batch.column("node"),
                "label": new,
                "changed": pc.cast(pc.not_equal(new, lab), pa.int64()),
            })

        new_labels = merged.map_batches(
            take_min, batch_format="pyarrow").materialize()
        changed = new_labels.sum("changed") or 0
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not changed:
            break

        # pointer-halving: label <- label's label (accelerates chains)
        lab_of = labels.rename_columns({"node": "l_node", "label": "l_label"})
        labels = labels.join(
            lab_of, join_type="left_outer", num_partitions=num_partitions,
            on=("label",), right_on=("l_node",),
        ).map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "label": pa.compute.coalesce(b.column("l_label"), b.column("label")),
            }),
            batch_format="pyarrow",
        ).materialize()

    return labels.rename_columns({"node": "iid", "label": "cluster_id"})


def assign_clusters(sketches_ds, pair_clusters, num_partitions: int = 16):
    """Full assignment (image_id, iid, cluster_id): nodes not in any
    accepted pair are singleton clusters of themselves."""
    base = sketches_ds.select_columns(["image_id", "iid"])
    joined = base.join(
        pair_clusters, join_type="left_outer", num_partitions=num_partitions,
        on=("iid",), right_on=("iid",),
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": batch.column("image_id"),
            "iid": batch.column("iid"),
            "cluster_id": pa.compute.coalesce(
                batch.column("cluster_id"), batch.column("iid")
            ),
        })

    return joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
