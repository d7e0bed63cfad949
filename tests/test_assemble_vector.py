"""Vectorized assembler must be TABLE-IDENTICAL to the Python walk.

The numpy kernel (stages/extract._assemble_vectorized) re-implements
_assemble_one's anaphora resolution, occurrence-set dedup and emission
ordering; these tests compare both kernels byte-for-byte on the real
fixture corpus and on adversarial random mention tables (pronoun-only
turns, pronoun-first conversations, duplicate mentions, entities
missing from the dictionary)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from naer_ray.sources.gazetteer import load_dictionary_rows
from naer_ray.stages.extract import (
    MENTION_SCHEMA,
    MentionDetector,
    make_conversation_assembler,
)


def _assemblers(dict_ref):
    return (
        make_conversation_assembler(dict_ref, impl="python"),
        make_conversation_assembler(dict_ref, impl="vector"),
    )


def _assert_identical(py_out: pa.Table, vec_out: pa.Table):
    assert py_out.schema.equals(vec_out.schema)
    assert py_out.num_rows == vec_out.num_rows
    if not py_out.equals(vec_out):
        import pandas as pd

        a, b = py_out.to_pandas(), vec_out.to_pandas()
        diff = (a != b) & ~(a.isna() & b.isna())
        rows = diff.any(axis=1)
        raise AssertionError(
            f"first diffs:\npy:\n{a[rows].head()}\nvec:\n{b[rows].head()}"
        )


def test_ref_corpus_identical(ray_session, ref_corpus):
    import ray

    rows = load_dictionary_rows(
        os.path.join(ref_corpus, "entity_dictionary.parquet")
    )
    ref = ray.put(rows)
    import pyarrow.parquet as pq

    turns = pq.read_table(os.path.join(ref_corpus, "transcripts"))
    det = MentionDetector(ref, n_buckets=8)
    mentions = det(turns)
    py_fn, vec_fn = _assemblers(ref)
    _assert_identical(py_fn(mentions), vec_fn(mentions))


def _random_mentions(rng, n_convs, dict_rows, max_turns=12, max_rows=6):
    n_eids = len(dict_rows)
    rows = {k: [] for k in ("bucket", "conv_id", "turn_idx", "pos", "eid_code", "is_pronoun")}
    for c in range(n_convs):
        conv = f"conv-{c:04d}"
        for t in range(rng.integers(1, max_turns)):
            for _ in range(rng.integers(0, max_rows)):
                is_pron = bool(rng.random() < 0.3)
                rows["bucket"].append(int(c % 4))
                rows["conv_id"].append(conv)
                rows["turn_idx"].append(int(t))
                rows["pos"].append(int(rng.integers(-1, 30)) if not is_pron else -1)
                # ~10% of codes reference entities absent from the dictionary
                code = (
                    -1
                    if is_pron
                    else (
                        n_eids + int(rng.integers(3))
                        if rng.random() < 0.1
                        else int(rng.integers(n_eids))
                    )
                )
                rows["eid_code"].append(code)
                rows["is_pronoun"].append(is_pron)
    return pa.table(
        {
            "bucket": pa.array(rows["bucket"], pa.int32()),
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "pos": pa.array(rows["pos"], pa.int32()),
            "eid_code": pa.array(rows["eid_code"], pa.int32()),
            "is_pronoun": pa.array(rows["is_pronoun"], pa.bool_()),
        },
        schema=MENTION_SCHEMA,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_random_mention_tables_identical(ray_session, ref_corpus, seed):
    import ray

    rows = load_dictionary_rows(
        os.path.join(ref_corpus, "entity_dictionary.parquet")
    )
    ref = ray.put(rows)
    rng = np.random.default_rng(seed)
    mentions = _random_mentions(rng, n_convs=40, dict_rows=rows)
    py_fn, vec_fn = _assemblers(ref)
    _assert_identical(py_fn(mentions), vec_fn(mentions))


def test_property_random_tables_identical(ray_session, ref_corpus):
    """Hypothesis-style sweep: 30 random seeds with varied shape params —
    catches boundary interactions (single-row convs, all-pronoun heads,
    ghost-heavy tables) that the fixed seeds might miss."""
    import ray

    rows = load_dictionary_rows(
        os.path.join(ref_corpus, "entity_dictionary.parquet")
    )
    ref = ray.put(rows)
    py_fn, vec_fn = _assemblers(ref)
    for seed in range(30):
        rng = np.random.default_rng(1000 + seed)
        mentions = _random_mentions(
            rng,
            n_convs=int(rng.integers(1, 25)),
            dict_rows=rows,
            max_turns=int(rng.integers(2, 20)),
            max_rows=int(rng.integers(1, 8)),
        )
        try:
            _assert_identical(py_fn(mentions), vec_fn(mentions))
        except AssertionError as e:
            raise AssertionError(f"seed {1000 + seed}: {e}") from e


def test_empty_group(ray_session, ref_corpus):
    import ray

    rows = load_dictionary_rows(
        os.path.join(ref_corpus, "entity_dictionary.parquet")
    )
    ref = ray.put(rows)
    empty = pa.table(
        {f.name: pa.array([], f.type) for f in MENTION_SCHEMA}, schema=MENTION_SCHEMA
    )
    py_fn, vec_fn = _assemblers(ref)
    _assert_identical(py_fn(empty), vec_fn(empty))


def test_pronoun_only_conversation(ray_session, ref_corpus):
    """No DIRECT mention anywhere: pronouns must resolve to nothing."""
    import ray

    rows = load_dictionary_rows(
        os.path.join(ref_corpus, "entity_dictionary.parquet")
    )
    ref = ray.put(rows)
    mentions = pa.table(
        {
            "bucket": pa.array([0, 0, 0], pa.int32()),
            "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 1, 0], pa.int32()),
            "pos": pa.array([-1, -1, -1], pa.int32()),
            "eid_code": pa.array([-1, -1, -1], pa.int32()),
            "is_pronoun": pa.array([True, True, True], pa.bool_()),
        },
        schema=MENTION_SCHEMA,
    )
    py_fn, vec_fn = _assemblers(ref)
    out_py, out_vec = py_fn(mentions), vec_fn(mentions)
    _assert_identical(out_py, out_vec)
    assert out_py.num_rows == 0


def test_cross_conversation_leak_blocked(ray_session, ref_corpus):
    """A pronoun in conv B's first turn must NOT inherit conv A's
    last DIRECT entity (the conv-equality check in the runmax trick)."""
    import ray

    rows = load_dictionary_rows(
        os.path.join(ref_corpus, "entity_dictionary.parquet")
    )
    ref = ray.put(rows)
    mentions = pa.table(
        {
            "bucket": pa.array([0, 0], pa.int32()),
            "conv_id": pa.array(["a", "b"], pa.string()),
            "turn_idx": pa.array([0, 5], pa.int32()),
            "pos": pa.array([0, -1], pa.int32()),
            "eid_code": pa.array([0, -1], pa.int32()),
            "is_pronoun": pa.array([False, True], pa.bool_()),
        },
        schema=MENTION_SCHEMA,
    )
    py_fn, vec_fn = _assemblers(ref)
    out_py, out_vec = py_fn(mentions), vec_fn(mentions)
    _assert_identical(out_py, out_vec)
    # conv b emits nothing; conv a emits its DIRECT occurrence only
    assert set(out_vec["conv_id"].to_pylist()) == {"a"}
    refs = [r for r in out_vec["ref_type"].to_pylist() if r]
    assert refs == ["DIRECT"]
