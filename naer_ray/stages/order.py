"""Distributed global sort via sampled range partitioning (the
classic TeraSort / Spark `sortByKey` shape — O'Malley 2008 "TeraByte
Sort on Apache Hadoop" describes the public construction).

Ray Data's built-in ``Dataset.sort`` exists, but a 100-TB pipeline
usually wants the RANKED artifact (every row tagged with its exact
global position) rather than an ordered stream whose block order
downstream stages must then preserve; this operator produces that
artifact with ONE all-to-all exchange:

1. **Sample pass** — a deterministic id-keyed sample (``id % mod ==
   0``; no RNG, so re-runs and resumes see identical bounds) is pulled
   to the driver and quantiled into at most ``n_parts - 1`` split
   points on the FIRST sort key.  The sample is corpus/mod rows —
   raise ``mod`` with corpus size (bounds only steer balance, never
   correctness).
2. **Assign + count** — each batch tags rows with
   ``part = searchsorted(bounds, key, side='right')``.  All rows with
   an equal first key land in the SAME part (deterministic), so ties
   never straddle a boundary and per-part ranking is globally exact.
   Per-part counts are a tiny driver pull (n_parts rows), turned into
   rank offsets.
3. **One groupby(part) shuffle** — each part sorts locally
   (``np.lexsort`` over the full key tuple) and emits
   ``global_rank = offset[part] + arange + 1`` — exactly SQL's
   ``ROW_NUMBER() OVER (ORDER BY keys)``.

Skew note: a single dominant first-key value cannot be split (ties
must share a part for exact ranking); such a part runs big but stays
correct.  For skewed keys extend the bound tuple with more key
columns upstream (sort keys are already the tie-break).

(No reference analogue; builder-brief wide-op — the reference is a
sequential extractor with no ordering beyond per-document line order.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def range_partition_sort(
    ds,
    value_col: str,
    id_col: str,
    n_parts: int = 64,
    sample_mod: int = 101,
    descending: bool = False,
):
    """Globally sort ``ds`` by ``(value_col, id_col)`` (``id_col``
    unique — the deterministic tie-break) and attach ``global_rank``
    (int64, 1-based).  Returns a Dataset with columns
    ``(id_col, value_col, global_rank)``."""

    # ---- 1. deterministic sample -> split bounds on the first key
    def sample_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids % sample_mod) == 0
        return pa.table({"v": batch[value_col].filter(pa.array(keep))})

    sample = (
        ds.map_batches(sample_batch, batch_format="pyarrow")
        .to_pandas()["v"]
        .to_numpy()
    )
    if len(sample):
        qs = np.linspace(0.0, 1.0, n_parts + 1)[1:-1]
        bounds = np.unique(np.quantile(np.sort(sample), qs))
    else:
        bounds = np.empty(0, np.float64)
    if descending:
        # descending order == ascending on the negated key; negate once
        # here and once in the kernels so bounds/searchsorted stay the
        # plain ascending machinery
        bounds = np.sort(-bounds)

    sign = -1.0 if descending else 1.0

    def assign(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False) * sign
        part = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return pa.table(
            {
                id_col: batch[id_col],
                value_col: batch[value_col],
                "part": pa.array(part, pa.int32()),
            }
        )

    assigned = ds.map_batches(assign, batch_format="pyarrow").materialize()

    # ---- 2. exact per-part counts (n_parts-row driver pull) -> offsets
    def part_counts(batch: pa.Table) -> pa.Table:
        c = np.bincount(
            batch["part"].to_numpy(zero_copy_only=False),
            minlength=len(bounds) + 1,
        )
        nz = np.flatnonzero(c)
        return pa.table(
            {
                "part": pa.array(nz.astype(np.int32), pa.int32()),
                "c": pa.array(c[nz].astype(np.int64), pa.int64()),
            }
        )

    counts = (
        assigned.map_batches(part_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby("part")["c"]
        .sum()
    )
    offsets = np.zeros(len(bounds) + 2, np.int64)
    for p, c in counts.items():
        offsets[int(p) + 1] = int(c)
    np.cumsum(offsets, out=offsets)

    # ---- 3. one shuffle; per-part lexsort + exact global ranks
    def rank_part(group: pa.Table) -> pa.Table:
        part = int(group["part"][0].as_py())
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, v * sign))
        rank = offsets[part] + np.arange(len(ids), dtype=np.int64) + 1
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                value_col: pa.array(v[order]),
                "global_rank": pa.array(rank, pa.int64()),
            }
        )

    return assigned.groupby("part").map_groups(
        rank_part, batch_format="pyarrow"
    )
