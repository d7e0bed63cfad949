"""Distributed join operators Ray Data lacks natively.

``asof_join``: each left row matches the latest right row (by the
``on`` time columns) with the same ``by`` key at or before the left
time.  The reference has no as-of operator; this is one of the
training-pipeline additions (SURVEY.md §2 extension surface).

Execution shape — bucketed co-partition, NO broadcast of the fact
table and NO per-key dispatch:

1. both sides get a deterministic key-hash ``__bucket`` column and a
   ``__side`` tag, padded to a common column set;
2. ``union`` + one ``groupby("__bucket")`` shuffle co-locates every
   key's left AND right rows (O(n_buckets) Ray groups, the repo's
   bucket-run rule);
3. the per-bucket kernel runs a vectorized ``pd.merge_asof``.

The partitioning assumption: a single bucket's rows fit in one
worker's heap — n_buckets scales with data volume, and key-hash
bucketing keeps skew bounded unless one single key dominates (salt
that key upstream if so).

For a SMALL right side prefer a broadcast build (``ray.put`` + lookup
inside ``map_batches``); this operator exists for the case where both
sides are large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..testdata import hash_u32


def _bucket_of(series: pd.Series, n_buckets: int) -> np.ndarray:
    if pd.api.types.is_integer_dtype(series):
        return (series.to_numpy().astype(np.int64) % n_buckets).astype(np.int32)
    return series.astype(str).map(lambda s: hash_u32(s) % n_buckets).to_numpy(np.int32)


def asof_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    n_buckets: int = 64,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    right_prepare=None,
):
    """Bucketed distributed as-of join; returns a Dataset of left rows
    plus the matched right columns (NaN/NaT where unmatched).

    Column names of the two sides must be disjoint.  ``right_prepare``
    (optional) runs per bucket on the right-side frame BEFORE the
    merge — because ALL rows of a key share a bucket, per-key global
    reductions (e.g. dedup order-date ties to the max price) are exact
    when computed there.
    """
    left_schema: pa.Schema = left_ds.schema().base_schema
    right_schema: pa.Schema = right_ds.schema().base_schema
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    clash = set(left_cols) & set(right_cols)
    if clash:
        raise ValueError(f"asof_join requires disjoint column names, got {clash}")
    # integer columns picked out of the padded union come back float64
    # (nulls); the kernel casts them back after selecting its side's rows
    int_cols = {
        f.name
        for schema in (left_schema, right_schema)
        for f in schema
        if pa.types.is_integer(f.type)
    }

    # one explicit union schema (left cols + right cols + tags) padded
    # with typed nulls — ad-hoc None padding yields Arrow null-typed
    # columns whose promotion across blocks is not guaranteed
    union_fields = (
        [left_schema.field(c) for c in left_cols]
        + [right_schema.field(c) for c in right_cols]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )
    union_schema = pa.schema(union_fields)

    def tag(side: int, by_col: str, own_schema: pa.Schema):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            by_pd = batch[by_col].to_pandas()
            bucket = pa.array(_bucket_of(by_pd, n_buckets), pa.int32())
            cols = []
            for field in union_fields:
                if field.name == "__bucket":
                    cols.append(bucket)
                elif field.name == "__side":
                    cols.append(pa.array(np.full(n, side, np.int8()), pa.int8()))
                elif field.name in own_schema.names:
                    cols.append(batch[field.name].cast(field.type))
                else:
                    cols.append(pa.nulls(n, field.type))
            return pa.Table.from_arrays(cols, schema=union_schema)

        return f

    tagged = left_ds.map_batches(
        tag(0, left_by, left_schema), batch_format="pyarrow"
    ).union(
        right_ds.map_batches(tag(1, right_by, right_schema), batch_format="pyarrow")
    )

    def _restore(df: pd.DataFrame) -> pd.DataFrame:
        casts = {c: np.int64 for c in df.columns if c in int_cols}
        return df.astype(casts) if casts else df

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        ev = _restore(group.loc[group["__side"] == 0, left_cols])
        od = _restore(group.loc[group["__side"] == 1, right_cols])
        if right_prepare is not None:
            od = right_prepare(od)
        ev = ev.sort_values([left_on, left_by], kind="mergesort")
        od = od.sort_values([right_on, right_by], kind="mergesort")
        return pd.merge_asof(
            ev,
            od,
            left_on=left_on,
            right_on=right_on,
            left_by=left_by,
            right_by=right_by,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")
