"""Sequence-packing plan: distributed prefix sums over an id-ordered stream.

Pretraining pipelines concatenate documents in a fixed order and split
the token stream every ``budget`` tokens; the *packing plan* assigns
each document to the training sequence in which it starts
(``seq_id = floor(tokens_before_doc / budget)``).  Computing
``tokens_before_doc`` is a global exclusive prefix sum — inherently
order-dependent, so it cannot be a plain per-batch map.

Distributed design (two passes, one small shuffle each — no global
sort, no driver data beyond O(#buckets)):

1. range-bucket rows by ``id // bucket_width`` (ids are the stream
   order, buckets are contiguous id ranges);
2. per-bucket weight totals via a tiny grouped aggregate; the driver
   turns the sorted totals into exclusive bucket offsets (O(#buckets)
   scalars — at 10^12 docs with width 10^6 that is 10^6 rows, still a
   driver-small table, and the step is itself reducible hierarchically
   if ever needed);
3. a per-bucket kernel re-sorts its rows by id and emits
   ``offset[bucket] + local exclusive cumsum`` — the exact global
   prefix sum — then partially aggregates per seq_id;
4. a final small ``groupby(seq_id)`` merges sequences that span bucket
   boundaries.

The same pattern serves any order-dependent scan (file offsets for
concatenated exports, global row numbering).  No reference analogue;
builder-brief operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_plan(
    ds,
    id_col: str,
    weight_col: str,
    budget: int,
    bucket_width: int = 4096,
):
    """Packing plan for ``ds`` ordered by ``id_col``.

    Returns a Dataset of ``(seq_id, n_docs, total_weight)``: for each
    training sequence, how many documents start in it and their total
    weight.  Documents longer than ``budget`` stay assigned to the
    sequence where they start (their overflow spills into subsequent
    sequences by construction of the cumulative split — the plan's
    per-sequence totals reflect that).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    if budget <= 0 or bucket_width <= 0:
        raise ValueError("budget and bucket_width must be positive")

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__bucket", pa.array(ids // bucket_width, pa.int64())
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    # pass 1: per-bucket totals (tiny: O(#buckets) rows)
    totals = (
        bucketed.groupby("__bucket")
        .aggregate(Sum(weight_col, alias_name="w"))
        .to_pandas()
        .sort_values("__bucket")
    )
    cum = totals["w"].cumsum()
    offsets = dict(
        zip(totals["__bucket"].tolist(), (cum - totals["w"]).astype("int64"))
    )
    offsets_ref = ray.put(offsets)

    # pass 2: per-bucket exact global cumsum + per-seq partial aggregate
    def bucket_kernel(group: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        group = group.sort_by([(id_col, "ascending")])
        w = group[weight_col].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bucket = group["__bucket"][0].as_py()
        cum_before = int(offs[bucket]) + (np.cumsum(w) - w)
        seq = cum_before // budget
        uniq, counts = np.unique(seq, return_counts=True)
        sums = np.add.reduceat(w, np.cumsum(counts) - counts)
        return pa.table(
            {
                "seq_id": pa.array(uniq, pa.int64()),
                "n_docs": pa.array(counts.astype(np.int64), pa.int64()),
                "total_weight": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    partials = bucketed.groupby("__bucket").map_groups(
        bucket_kernel, batch_format="pyarrow"
    )
    # final merge: sequences spanning bucket boundaries (O(output) rows)
    return (
        partials.groupby("seq_id")
        .aggregate(
            Sum("n_docs", alias_name="n_docs_s"),
            Sum("total_weight", alias_name="total_weight_s"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "seq_id": t["seq_id"],
                    "n_docs": t["n_docs_s"],
                    "total_weight": t["total_weight_s"],
                }
            ),
            batch_format="pyarrow",
        )
    )
