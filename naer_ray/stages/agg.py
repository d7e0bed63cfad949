"""Bucketed high-cardinality aggregation (the scale-safe groupby pattern).

Ray Data's ``groupby(key).aggregate(...)`` dispatches per group; with
hundreds of thousands of distinct keys the per-group overhead dominates
(observed: 140 s for a 150k-group sum that takes <2 s bucketed).  The
pattern here: per-batch partial aggregation (pandas groupby inside
``map_batches``) -> deterministic hash bucket of the key -> one
``groupby("bucket").map_groups`` whose kernel does a single vectorized
pandas groupby over the whole bucket.  Shuffle volume is O(partials),
group dispatch is O(n_buckets), kernel work is vectorized.

Skew note: buckets are hash-distributed over the full key domain; a
single hot KEY still lands in one bucket, but the kernel cost is
per-row vectorized, so a hot key costs its row count, not a Python
loop.  For pathological single-key skew, raise ``n_buckets`` and salt
the key upstream (append ``hash(row)%S`` and re-merge after).
"""

from __future__ import annotations

import pandas as pd

from ..testdata import hash_u32


def bucketed_sum(
    ds,
    keys: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
    count_col: str | None = None,
):
    """Distributed SUM (and optional COUNT) grouped by ``keys``.

    Returns a Dataset with columns ``keys + sum_cols (+ count_col)``.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if count_col:
            batch = batch.assign(**{count_col: 1})
        cols = sum_cols + ([count_col] if count_col else [])
        g = batch.groupby(keys, as_index=False, sort=False)[cols].sum()
        key0 = g[keys[0]]
        if len(keys) == 1:
            hashed = key0.map(lambda v: hash_u32(str(v)))
        else:
            joined = g[keys].astype(str).agg("\x1f".join, axis=1)
            hashed = joined.map(hash_u32)
        g["bucket"] = (hashed % n_buckets).astype("int32")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        cols = sum_cols + ([count_col] if count_col else [])
        out = group.groupby(keys, as_index=False, sort=False)[cols].sum()
        return out

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return parts.groupby("bucket").map_groups(final, batch_format="pandas")
