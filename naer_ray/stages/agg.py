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

import numpy as np
import pandas as pd

from ..testdata import hash_u32


def _key_hash(g: pd.DataFrame, keys: list[str]) -> pd.Series:
    if len(keys) == 1:
        return g[keys[0]].map(lambda v: hash_u32(str(v)))
    comb = g[keys[0]].astype(str)
    for k in keys[1:]:
        comb = comb + "\x1f" + g[k].astype(str)
    return comb.map(hash_u32)


def bucketed_sum(
    ds,
    keys: list[str],
    sum_cols: list[str],
    n_buckets: int = 64,
    count_col: str | None = None,
    salt: int | None = None,
):
    """Distributed SUM (and optional COUNT) grouped by ``keys``.

    Returns a Dataset with columns ``keys + sum_cols (+ count_col)``.

    ``salt=S`` enables the hot-key two-round reduce: each partial row's
    bucket is derived from ``hash(key) * S + batch-local salt`` so one
    pathologically hot key spreads over S buckets in round one; the
    salted partials are then re-grouped by the unsalted key in a second
    (tiny) bucketed pass.  Sums are associative, so the result is
    identical — only the shuffle distribution changes.  Use when one
    key holds >~1/n_buckets of all rows (the "WebUI in every
    conversation" scenario from SURVEY §4).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if count_col:
            batch = batch.assign(**{count_col: 1})
        cols = sum_cols + ([count_col] if count_col else [])
        g = batch.groupby(keys, as_index=False, sort=False)[cols].sum()
        hashed = _key_hash(g, keys)
        if salt:
            # deterministic batch-local salt: spread a hot key's partials
            # from different batches across `salt` sub-buckets
            sub = pd.Series(np.arange(len(g)) % salt, index=g.index)
            g["bucket"] = (((hashed * salt + sub)) % n_buckets).astype("int32")
        else:
            g["bucket"] = (hashed % n_buckets).astype("int32")
        return g

    def final(group: pd.DataFrame) -> pd.DataFrame:
        cols = sum_cols + ([count_col] if count_col else [])
        return group.groupby(keys, as_index=False, sort=False)[cols].sum()

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    round1 = parts.groupby("bucket").map_groups(final, batch_format="pandas")
    if not salt:
        return round1

    # round 2: merge the <= salt partial rows per key (tiny shuffle)
    def rebucket(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            batch["bucket"] = pd.Series([], dtype="int32")
            return batch
        batch = batch.copy()
        batch["bucket"] = (_key_hash(batch, keys) % n_buckets).astype("int32")
        return batch

    return (
        round1.map_batches(rebucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )
