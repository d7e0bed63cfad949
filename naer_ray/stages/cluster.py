"""Distributed k-means over an embedding column (Lloyd's algorithm).

Embedding clustering is a core training-data operation (semantic dedup
bucketing, domain discovery, IVF coarse quantizers — the repo's
``ann.ivf_topk`` uses exactly such a partitioning).  This stage is the
general operator: k-means fit + assignment over ``list<float>``
embeddings.

Distributed design (no reference analogue; builder-brief operator):

* **Init** is deterministic: the centroid seeds are the vectors of the
  ``k`` ids with the smallest multiplicative-hash rank
  (:func:`..stages.sample.bottom_k_sample`) — stable under any
  partitioning, no RNG state.
* **Each Lloyd round is one pass**: centroids are broadcast via
  ``ray.put`` (read once per task, never re-shipped per batch); each
  batch assigns its vectors to the nearest centroid (one matmul) and
  emits k partial rows ``(cluster, count, sum_vec)`` — the combiner —
  so the driver merges O(k x n_blocks) scalars, never data rows.
* **Assignment** is a final stateless ``map_batches`` with the fitted
  centroids broadcast the same way.

At 10^12 rows the per-round reduce is still O(k x n_blocks); rounds
are the only sequential dependency (classic mini-batch or sketch-based
variants trade rounds for accuracy — out of scope, documented).

Matrix ingestion is the zero-copy FixedSizeList/ListArray flatten+
reshape from ``stages/ann._as_matrix`` — no per-float Python boxing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _as_matrix


def _assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid per row by squared L2 (one matmul, argmin)."""
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
    d = -2.0 * (mat @ centroids.T) + (centroids * centroids).sum(axis=1)
    return np.argmin(d, axis=1)


def kmeans_fit(
    ds,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int = 5,
):
    """Fit k-means; returns ``(centroids ndarray[k, d], assign_fn)``.

    ``assign_fn(ds)`` maps a dataset with the same ``vec_col`` to
    ``(id_col, cluster)`` rows using the fitted centroids.
    """
    import ray

    from .sample import bottom_k_sample

    if k <= 0 or n_iter <= 0:
        raise ValueError("k and n_iter must be positive")

    seeds = bottom_k_sample(
        ds.select_columns([id_col, vec_col]), id_col, k
    ).to_pandas()
    seeds = seeds.sort_values(id_col)
    centroids = np.array(seeds[vec_col].to_list(), dtype=np.float64)
    if len(centroids) < k:
        raise ValueError(f"need >= {k} rows to seed {k} clusters")

    for _ in range(n_iter):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            import ray as _ray

            cents = _ray.get(cref)
            mat = _as_matrix(batch[vec_col]).astype(np.float64)
            lab = _assign(mat, cents)
            counts = np.bincount(lab, minlength=len(cents))
            sums = np.zeros_like(cents)
            np.add.at(sums, lab, mat)
            return pa.table(
                {
                    "cluster": pa.array(
                        np.arange(len(cents), dtype=np.int64), pa.int64()
                    ),
                    "count": pa.array(counts.astype(np.int64), pa.int64()),
                    "sum_vec": pa.array(
                        [s.tolist() for s in sums], pa.list_(pa.float64())
                    ),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(centroids)
        for c, n, v in zip(parts["cluster"], parts["count"], parts["sum_vec"]):
            counts[c] += n
            sums[c] += np.asarray(v, dtype=np.float64)
        nonzero = counts > 0
        centroids = centroids.copy()
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
        # empty clusters keep their previous centroid (deterministic)

    final = centroids

    def assign_fn(data):
        fref = ray.put(final)

        def label(batch: pa.Table) -> pa.Table:
            import ray as _ray

            cents = _ray.get(fref)
            mat = _as_matrix(batch[vec_col]).astype(np.float64)
            lab = _assign(mat, cents)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "cluster": pa.array(lab.astype(np.int64), pa.int64()),
                }
            )

        return data.map_batches(label, batch_format="pyarrow")

    return final, assign_fn


def kmeans_reference(
    ids: np.ndarray, mat: np.ndarray, k: int, n_iter: int = 5
) -> np.ndarray:
    """Single-process Lloyd's with the SAME deterministic init/update
    rules — the parity oracle for :func:`kmeans_fit` in tests.

    Float caveat: the distributed path merges per-block partial sums,
    so centroid arithmetic differs from this in summation order; tests
    assert assignment equality, which holds unless a point sits within
    float-merge epsilon (~1e-9 relative) of a cluster boundary —
    not a measure-zero-adjacent case the synthetic corpora exercise.
    """
    from .sample import hash_rank_of

    order = np.lexsort((ids, hash_rank_of(ids.astype(np.int64))))
    seed_ids = np.sort(ids[order[:k]])
    pos = {int(i): p for p, i in enumerate(ids)}
    centroids = np.array(
        [mat[pos[int(i)]] for i in seed_ids], dtype=np.float64
    )
    mat = mat.astype(np.float64)
    for _ in range(n_iter):
        lab = _assign(mat, centroids)
        for c in range(k):
            sel = lab == c
            if sel.any():
                centroids[c] = mat[sel].mean(axis=0)
    return _assign(mat, centroids)
