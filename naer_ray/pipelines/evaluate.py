"""Distributed evaluation jobs (reference §A3/J3/M14 semantics).

Two gates:

* :func:`eval_vs_expected` — exact (subj, pred, obj, conv_id, turn_idx,
  ref_type) triple-set P/R of a pipeline run against the
  `expected_triples` oracle (sequential reference semantics).  This is
  the north-rule P/R >= 0.95 gate: distributed execution must reproduce
  the reference's emitted triples.
* :func:`eval_vs_annotations` — the reference's own evaluation harness
  (TestProjectEvaluator.matchAndLogResults:187-199): per-conversation
  lowercase + cleanComponentName name-pool matching with rename-unify
  (J3, :209-239), flatten to (name, turn) pairs (M14,
  SimpleComponentOccurrence.java:18-28), global TP/FP/FN -> P/R/F1.

Both are distributed: per-conversation kernels inside
``groupby(conv_id).map_groups`` emit per-conversation counters; the
global reduction is a tiny ``sum``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .. import refsem

_KEY_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx", "ref_type"]


def _keyed(batch: pa.Table, src: str) -> pa.Table:
    def col(name):
        vals = batch[name].to_pylist() if name in batch.column_names else [None] * batch.num_rows
        return ["" if v is None else str(v) for v in vals]

    keys = ["\x1f".join(parts) for parts in zip(*[col(c) for c in _KEY_COLS])]
    n = batch.num_rows
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "n_pred": pa.array([1 if src == "pred" else 0] * n, pa.int32()),
            "n_gold": pa.array([1 if src == "gold" else 0] * n, pa.int32()),
        }
    )


def eval_vs_expected(
    triples: ray.data.Dataset, expected_path: str
) -> dict[str, float]:
    """Exact triple-set P/R/F1 via a distributed indicator join.

    Both sides are reduced to distinct composite keys with side
    indicators, grouped, and the TP/FP/FN counters summed — no driver-
    side row loop, works at any scale.
    """
    pred = triples.map_batches(lambda b: _keyed(b, "pred"), batch_format="pyarrow")
    gold = ray.data.read_parquet(expected_path).map_batches(
        lambda b: _keyed(b, "gold"), batch_format="pyarrow"
    )

    def reduce_group(g: pa.Table) -> pa.Table:
        has_pred = pc.sum(g["n_pred"]).as_py() > 0
        has_gold = pc.sum(g["n_gold"]).as_py() > 0
        return pa.table(
            {
                "tp": pa.array([1 if has_pred and has_gold else 0], pa.int64()),
                "fp": pa.array([1 if has_pred and not has_gold else 0], pa.int64()),
                "fn": pa.array([1 if has_gold and not has_pred else 0], pa.int64()),
            }
        )

    flags = pred.union(gold).groupby("key").map_groups(reduce_group, batch_format="pyarrow")
    agg = flags.sum(["tp", "fp", "fn"])
    tp, fp, fn = agg["sum(tp)"], agg["sum(fp)"], agg["sum(fn)"]
    return _metrics(tp, fp, fn)


def _metrics(tp: int, fp: int, fn: int) -> dict[str, float]:
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": precision, "recall": recall, "f1": f1,
    }


# ----------------------------------------------------- reference evaluation (J3)

_GOLD_PRED = "__gold_occ__"


def _annotations_as_triplerows(annotations_path: str) -> ray.data.Dataset:
    def to_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "subj": batch["component_name"],
                "pred": pa.array([_GOLD_PRED] * n, pa.string()),
                "obj": pa.array([""] * n, pa.string()),
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "ref_type": batch["ref_type"]
                if "ref_type" in batch.column_names
                else pa.array(["DIRECT"] * n, pa.string()),
            }
        )

    return ray.data.read_parquet(annotations_path).map_batches(
        to_rows, batch_format="pyarrow"
    )


def _conv_eval_kernel(group: pa.Table) -> pa.Table:
    """Per-conversation J3 matching + M14 flatten + TP/FP/FN counters."""
    conv_id = group["conv_id"][0].as_py()
    preds = group["pred"].to_pylist()
    subjs = group["subj"].to_pylist()
    objs = group["obj"].to_pylist()
    turns = group["turn_idx"].to_pylist()

    recognized: dict[str, refsem.Entity] = {}
    gold: dict[str, refsem.Entity] = {}
    for pred, subj, obj, turn in zip(preds, subjs, objs, turns):
        if pred == _GOLD_PRED:
            e = gold.setdefault(subj, refsem.Entity(subj, "COMPONENT"))
            e.occurrences.add((int(turn), "DIRECT"))
        elif pred == "occursIn":
            e = recognized.setdefault(subj, refsem.Entity(subj, "COMPONENT"))
            e.occurrences.add((int(turn), "DIRECT"))
        elif pred == "hasAlternativeName":
            recognized.setdefault(subj, refsem.Entity(subj, "COMPONENT")).alternative_names.add(obj)

    gold_list = list(gold.values())
    rec_list = list(recognized.values())
    refsem.match_component_names(gold_list, rec_list)
    pred_pairs = refsem.flatten_occurrences(rec_list)
    gold_pairs = refsem.flatten_occurrences(gold_list)
    m = refsem.classification_metrics(pred_pairs, gold_pairs)
    return pa.table(
        {
            "conv_id": pa.array([conv_id], pa.string()),
            "tp": pa.array([m["tp"]], pa.int64()),
            "fp": pa.array([m["fp"]], pa.int64()),
            "fn": pa.array([m["fn"]], pa.int64()),
        }
    )


def eval_vs_annotations(
    triples: ray.data.Dataset, annotations_path: str
) -> dict[str, float]:
    """Reference evaluation harness, distributed per conversation."""
    both = triples.union(_annotations_as_triplerows(annotations_path))
    per_conv = both.groupby("conv_id").map_groups(
        _conv_eval_kernel, batch_format="pyarrow"
    )
    agg = per_conv.sum(["tp", "fp", "fn"])
    return _metrics(agg["sum(tp)"], agg["sum(fp)"], agg["sum(fn)"])
