"""Deterministic sampling operators for training-data pipelines.

Repeatable subsampling is a core corpus-curation primitive (ablation
subsets, eval holdouts, mixture downsampling).  Random sampling
(``Dataset.random_sample``) is neither repeatable across runs nor
stable under repartitioning; these operators key the decision on a
multiplicative hash of a row id, so the SAME rows are kept on any
cluster size, block layout, or resume — and the rule is expressible in
ANSI SQL for the oracle (s01).

No reference analogue (the reference evaluates full corpora); builder
brief operator.  Scale: a pure ``map_batches`` filter — no shuffle, no
state, no driver data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: Knuth's multiplicative constant (2^32 / phi); the hash is
#: (id * K) mod 2^32 — trivially re-expressed in SQL as
#: (id * 2654435761) % 4294967296 for non-negative ids.
KNUTH_K = 2654435761


def hash_bucket_of(ids: np.ndarray, mod: int, salt: int = 0) -> np.ndarray:
    """((id + salt) * K) mod 2^32 mod `mod` for non-negative int ids."""
    h = (ids.astype(np.uint64) + np.uint64(salt)) * np.uint64(KNUTH_K)
    return ((h & np.uint64(0xFFFFFFFF)) % np.uint64(mod)).astype(np.int64)


def hash_sample(ds, id_col: str, rate_pct: int, salt: int = 0):
    """Keep rows whose id hashes into the first ``rate_pct`` of 100
    buckets — a deterministic ~rate_pct% sample.

    ``salt`` shifts the kept set so independent samples (train vs
    holdout) can be drawn from the same ids without overlap control
    logic downstream.
    """
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be in [0, 100]")

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = hash_bucket_of(ids.astype(np.int64, copy=False), 100, salt)
        return batch.filter(pa.array(b < rate_pct))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_sql_predicate(id_col: str, rate_pct: int, salt: int = 0) -> str:
    """The equivalent ANSI-SQL WHERE predicate (non-negative ids)."""
    return (
        f"((({id_col} + {salt}) * {KNUTH_K}) % 4294967296) % 100 < {rate_pct}"
    )
