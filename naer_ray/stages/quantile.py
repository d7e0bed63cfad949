"""Exact grouped quantiles over discrete-valued columns.

Length/token-count distributions drive corpus curation decisions
(truncation budgets, length-bucketed batching, outlier filters).  For
a DISCRETE value domain (token counts, char lengths, scores on a
grid), exact quantiles reduce to a distributed value histogram:

1. per-batch partial counts of (group, value) — the combiner, so the
   shuffle carries histogram rows, not data rows;
2. one small grouped aggregate merges the partials;
3. the (group, value, count) histogram is O(groups x distinct values)
   — driver-small by construction — and quantiles read off the sorted
   cumulative counts.

The quantile rule is the explicit order statistic ``smallest v with
cum_count >= ceil(q * n)`` so the SQL oracle (t04) can state the same
rule with window functions — no dependence on any engine's
interpolation flavor.  For continuous domains use a sketch (the
``stages/sketch.py`` HLL pattern; a KLL/t-digest slot would follow the
same partial/merge shape).  No reference analogue; builder-brief
operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_discrete_quantiles(
    ds,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
):
    """Exact per-group quantiles of a discrete-valued column.

    Returns a pandas DataFrame ``(group_col, p<q>...)`` — one row per
    group; quantile columns are named ``p25, p50, ...`` from the
    percentage points.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pandas(),
                "v": batch[value_col].to_pandas(),
            }
        )
        out = df.groupby(["g", "v"], as_index=False, sort=False).size()
        return pa.table(
            {
                group_col: pa.array(out["g"]),
                value_col: pa.array(out["v"]),
                "cnt": pa.array(out["size"].astype("int64")),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for g, part in hist.groupby(group_col, sort=True):
        part = part.sort_values(value_col)
        vals = part[value_col].to_numpy()
        cum = part["n"].cumsum().to_numpy()
        n = int(cum[-1])
        row = {group_col: g}
        for q in qs:
            target = int(np.ceil(q * n))
            row[f"p{int(round(q * 100))}"] = int(
                vals[int(np.searchsorted(cum, max(target, 1)))]
            )
        rows.append(row)
    return pd.DataFrame(rows)
