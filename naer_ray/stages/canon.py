"""Distributed entity canonicalization (the north-star wide step).

Generalizes the reference's name-pool matching + rename-unify
(TestProjectEvaluator.matchComponentNames:209-239, NamedEntity.changeName:77-80)
to corpus scale:

1. every observed entity name explodes into its name pool —
   {cleanComponentName(name)} ∪ aliases, all normalized surface forms
   (names.normalize_surface: lowercase, camelCase split);
2. exact pool-key collisions and Jaro-Winkler >= threshold pairs inside
   blocking buckets become similarity edges (blocking: first token +
   length band — the documented partitioning assumption: names that
   share no first token and differ in length by > 40% are never
   compared);
3. connected components via bucketed min-label propagation (the
   distributed union-find from stages/dedup.py — no driver-side state);
4. the component's lexicographically-smallest member becomes the
   canonical label (deterministic under any parallelism), mirroring the
   reference's rename-unify where the matching pool name wins.

Skew: hot surface forms ("WebUI" in a large share of conversations)
are exploded to (name_pool_key, name) DISTINCT pairs before the edge
stage, so a key's cost is its distinct-name count, not its corpus
frequency — the salting analogue for this workload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..names import clean_component_name, normalize_surface
from .dedup import _bucket_series


def jaro(s1: str, s2: str) -> float:
    """Standard Jaro similarity (public algorithm)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - match_dist), min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3


def jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler: Jaro boosted by the common prefix (<=4 chars)."""
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1 - j)


def _block_key(norm_name: str) -> str:
    """Blocking bucket: first 2 chars + length band of the space-collapsed key.

    Collapsing spaces puts spacing variants ("webui" / "web ui") in the
    same block; the length band (//4) bounds block size.  Documented
    partitioning assumption: names differing in their first two
    collapsed characters or by >4 collapsed chars in length are never
    fuzzy-compared (exact pool-key / collapsed-key edges still apply).
    """
    collapsed = norm_name.replace(" ", "")
    return f"{collapsed[:2]}|{len(collapsed) // 4}"


def name_pool_rows(names_ds, name_col: str = "name", aliases_col: str | None = None):
    """Explode (name [, aliases]) rows into DISTINCT (pool_key, name) pairs."""

    def explode(batch: pa.Table) -> pa.Table:
        names = batch[name_col].to_pylist()
        aliases = (
            batch[aliases_col].to_pylist()
            if aliases_col and aliases_col in batch.column_names
            else [None] * len(names)
        )
        seen: set[tuple[str, str]] = set()
        out_key, out_name = [], []
        for name, alts in zip(names, aliases):
            pool = {normalize_surface(clean_component_name(name))}
            for a in alts or []:
                pool.add(normalize_surface(a))
            pool.discard("")
            for key in pool:
                pair = (key, name)
                if pair not in seen:
                    seen.add(pair)
                    out_key.append(key)
                    out_name.append(name)
        return pa.table(
            {
                "pool_key": pa.array(out_key, pa.string()),
                "name": pa.array(out_name, pa.string()),
            }
        )

    rows = names_ds.map_batches(explode, batch_format="pyarrow")
    # global distinct on (pool_key, name): hot keys cost their DISTINCT names
    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates()

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.drop_duplicates()
        batch["bucket"] = _bucket_series(batch["pool_key"], 64)
        return batch

    return (
        rows.map_batches(bucketize, batch_format="pandas", batch_size=65536)
        .groupby("bucket")
        .map_groups(dedup, batch_format="pandas")
    )


def _edge_table(rows: list[tuple[str, str]]) -> pa.Table:
    """(a, b) pairs -> typed Arrow edge table.

    Typed even when empty: a zero-row pandas object column trips Ray's
    block size estimator (np.vectorize on size-0 input) into per-block
    error logs; pa.string() carries the type regardless of length."""
    return pa.table(
        {
            "id_a": pa.array([r[0] for r in rows], pa.string()),
            "id_b": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def similarity_edges(pool_rows, jw_threshold: float = 0.93, max_block: int = 500):
    """(pool_key, name) rows -> undirected edges (id_a, id_b).

    Exact edges: same pool_key.  Fuzzy edges: Jaro-Winkler >= threshold
    between pool keys inside the same blocking bucket.  Oversized
    blocks are capped deterministically (sorted head); rows beyond the
    cap lose fuzzy candidate pairs, reported via a worker-side
    RuntimeWarning with the dropped-row count.
    """

    def exact_edges(group: pd.DataFrame) -> pa.Table:
        rows = []
        # same pool key OR same space-collapsed pool key -> exact edge
        g = group.assign(ckey=group["pool_key"].str.replace(" ", "", regex=False))
        for _key, sub in g.groupby("ckey"):
            names = sorted(sub["name"].unique())
            for other in names[1:]:
                rows.append((names[0], other))
        return _edge_table(rows)

    def collapse_key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["ckey_bucket"] = _bucket_series(
            batch["pool_key"].str.replace(" ", "", regex=False), 64
        )
        return batch

    exact = (
        pool_rows.map_batches(collapse_key, batch_format="pandas", batch_size=65536)
        .groupby("ckey_bucket")
        .map_groups(exact_edges, batch_format="pandas")
    )

    def blocked(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["block"] = batch["pool_key"].map(_block_key)
        return batch[["block", "pool_key", "name"]]

    def fuzzy_edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["pool_key", "name"]).sort_values(
            ["pool_key", "name"]
        )
        if len(g) > max_block:
            import warnings

            warnings.warn(
                f"canonicalization block capped: {len(g) - max_block} rows beyond "
                f"max_block={max_block} lose fuzzy candidate pairs",
                RuntimeWarning,
                stacklevel=2,
            )
            g = g.head(max_block)
        keys = g["pool_key"].to_numpy()
        names = g["name"].to_numpy()
        rows = []
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if keys[i] == keys[j]:
                    continue
                if jaro_winkler(keys[i], keys[j]) >= jw_threshold:
                    a, b = sorted((names[i], names[j]))
                    rows.append((a, b))
        return _edge_table(rows)

    if jw_threshold > 1.0:  # fuzzy disabled: skip the blocked-comparison stage
        return exact

    from .dedup import _grouped_runs

    fuzzy = _grouped_runs(
        pool_rows.map_batches(blocked, batch_format="pandas", batch_size=65536),
        ["block"],
        fuzzy_edges,
    )
    return exact.union(fuzzy)


def canonical_labels(names_ds, name_col: str = "name", aliases_col: str | None = None,
                     jw_threshold: float = 0.93):
    """names -> Dataset (node=name, label=canonical name).

    Composition of the three stages above + min-label propagation;
    min = lexicographic smallest name in the component (deterministic)."""
    from .dedup import connected_components

    pool = name_pool_rows(names_ds, name_col, aliases_col)
    edges = similarity_edges(pool, jw_threshold)
    comp = connected_components(edges)

    # make the mapping TOTAL: names with no edges label themselves
    def self_rows(batch: pa.Table) -> pa.Table:
        names = sorted(set(batch["name"].to_pylist()))
        return pa.table(
            {
                "node": pa.array(names, pa.string()),
                "label": pa.array(names, pa.string()),
            }
        )

    singles = pool.map_batches(self_rows, batch_format="pyarrow")

    def min_label(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("node", as_index=False)["label"].min()

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = _bucket_series(batch["node"], 64)
        return batch

    return (
        comp.union(singles)
        # no batch_size here: the union mixes Arrow and pandas blocks,
        # and Ray's batcher cannot combine the two into one batch
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(min_label, batch_format="pandas")
        .select_columns(["node", "label"])
    )


def apply_canonical_labels(triples_ds, labels_ds, col: str = "subj"):
    """Rewrite a triple column through the (node -> label) mapping.

    The label table is the SMALL side (distinct entity names), so it is
    broadcast — ray.put once, dict lookup per batch."""
    import ray

    labels_df = labels_ds.to_pandas()  # one execution feeds both columns
    map_ref = ray.put(dict(zip(labels_df["node"], labels_df["label"])))

    def relabel(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(map_ref)
        batch[col] = batch[col].map(lambda v: m.get(v, v))
        return batch

    return triples_ds.map_batches(relabel, batch_format="pandas", batch_size=65536)
