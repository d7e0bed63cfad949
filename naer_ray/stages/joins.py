"""Distributed join operators Ray Data lacks natively.

* :func:`asof_join` — each left row matches the LATEST right row (by
  the ``on`` time columns) with the same ``by`` key at or before the
  left time.
* :func:`range_join` — each left row matches EVERY right row with the
  same ``by`` key whose time lies within ``[left_on - upper,
  left_on - lower]`` (an interval/band join).

The reference has neither; both are training-pipeline additions
(SURVEY.md §2 extension surface).

Shared execution shape — bucketed co-partition, NO broadcast of the
fact table and NO per-key dispatch:

1. both sides get a deterministic key-hash ``__bucket`` column and a
   ``__side`` tag, padded to one explicit union schema (typed nulls —
   ad-hoc None padding yields Arrow null-typed columns whose promotion
   across blocks is not guaranteed);
2. ``union`` + one ``groupby("__bucket")`` shuffle co-locates every
   key's left AND right rows (O(n_buckets) Ray groups, the repo's
   bucket-run rule);
3. a per-bucket vectorized pandas kernel (``merge_asof`` / ``merge`` +
   band filter).

The partitioning assumption: a single bucket's rows fit in one
worker's heap — n_buckets scales with data volume, and key-hash
bucketing keeps skew bounded unless one single key dominates (salt
that key upstream if so).  For a SMALL right side prefer a broadcast
build (``ray.put`` + lookup inside ``map_batches``); these operators
exist for the case where both sides are large.
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


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset; pandas-block datasets expose a
    PandasBlockSchema (name/dtype lists), which is converted."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, s.types):
        if isinstance(typ, pa.DataType):
            fields.append((name, typ))
        else:
            try:
                fields.append((name, pa.from_numpy_dtype(typ)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((name, pa.string()))
    return pa.schema(fields)


def _co_partitioned(left_ds, right_ds, left_by: str, right_by: str, n_buckets: int):
    """Tag + pad + union + schemas for a bucketed co-partition (see
    module docstring).  Returns (tagged_ds, left_cols, right_cols,
    restore) where ``restore`` re-casts integer columns that the padded
    union surfaced as float64."""
    left_schema: pa.Schema = _arrow_schema(left_ds)
    right_schema: pa.Schema = _arrow_schema(right_ds)
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    clash = set(left_cols) & set(right_cols)
    if clash:
        raise ValueError(f"co-partitioned join requires disjoint column names, got {clash}")
    int_cols = {
        f.name
        for schema in (left_schema, right_schema)
        for f in schema
        if pa.types.is_integer(f.type)
    }
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

    def restore(df: pd.DataFrame) -> pd.DataFrame:
        # originally-integer columns surface as float64 from the padded
        # union; restore int64 where clean, nullable Int64 where the
        # input itself had nulls (astype(int64) on NaN raises and fails
        # the whole bucket kernel — ADVICE r2)
        casts = {}
        for c in df.columns:
            if c in int_cols and not pd.api.types.is_integer_dtype(df[c]):
                casts[c] = "Int64" if df[c].isna().any() else np.int64
        return df.astype(casts) if casts else df

    return tagged, left_cols, right_cols, restore


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
    tagged, left_cols, right_cols, restore = _co_partitioned(
        left_ds, right_ds, left_by, right_by, n_buckets
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        ev = restore(group.loc[group["__side"] == 0, left_cols])
        od = restore(group.loc[group["__side"] == 1, right_cols])
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


def range_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    lower,
    upper,
    n_buckets: int = 64,
    right_prepare=None,
):
    """Bucketed distributed range (band) join: INNER-join rows with equal
    ``by`` keys where ``lower <= left[left_on] - right[right_on] <=
    upper`` (pass pd.Timedelta bounds for timestamp columns).  Returns
    left+right columns per matching combination.

    Per-bucket cost is the per-key equi-join volume filtered by the
    band, so a key's cost is (its left rows) x (its right rows) — keep
    per-key cardinalities bounded or pre-reduce with right_prepare.
    """
    tagged, left_cols, right_cols, restore = _co_partitioned(
        left_ds, right_ds, left_by, right_by, n_buckets
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        ev = restore(group.loc[group["__side"] == 0, left_cols])
        od = restore(group.loc[group["__side"] == 1, right_cols])
        if right_prepare is not None:
            od = right_prepare(od)
        out = ev.merge(od, left_on=left_by, right_on=right_by)
        if not len(out):
            return out
        delta = out[left_on] - out[right_on]
        return out[(delta >= lower) & (delta <= upper)]

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pandas")
