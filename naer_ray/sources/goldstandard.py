"""Gold-standard CSV source (reference S4).

GoldstandardParser.parse:30-57 reads ``goldstandard_NER.csv``
(header ``componentName,sentence``), skips the header, groups rows by
component name, marks every occurrence DIRECT.  Ray-native version:
``read_csv`` -> per-batch projection -> optional per-name grouping.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def read_gold_csv(path: str, conv_id: str) -> ray.data.Dataset:
    """goldstandard_NER.csv -> annotation rows (conv_id, component_name,
    turn_idx, ref_type=DIRECT)."""
    ds = ray.data.read_csv(path)

    def project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "conv_id": pa.array([conv_id] * n, pa.string()),
                "component_name": pa.compute.utf8_trim_whitespace(
                    batch["componentName"].cast(pa.string())
                ),
                "turn_idx": batch["sentence"].cast(pa.int32()),
                "ref_type": pa.array(["DIRECT"] * n, pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def gold_entities(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Group annotations per (conv_id, component_name) with sorted
    occurrence lists (GoldstandardParser's Map<name, NamedEntity>)."""
    import pandas as pd

    def collect(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.groupby(["conv_id", "component_name"], sort=False)["turn_idx"]
            .agg(lambda s: sorted(set(int(x) for x in s)))
            .reset_index()
            .rename(columns={"turn_idx": "occurrence_turns"})
        )
        return out

    return ds.groupby("conv_id").map_groups(collect, batch_format="pandas")
