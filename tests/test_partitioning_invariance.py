"""Output must be invariant to the partitioning configuration.

The two-cluster-size rule requires identical triples at any
parallelism; here the analogous knob is the conv-hash bucket count —
the shuffle layout changes completely between 8 and 64 buckets, the
emitted triple set must not.
"""

import os

import pandas as pd


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df.fillna({"turn_idx": -1, "ref_type": ""})
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_triples_invariant_to_bucket_count(ray_session, ref_corpus):
    from naer_ray.pipelines.kg import build_triples

    frames = []
    for n_buckets in (8, 64):
        ds = build_triples(
            os.path.join(ref_corpus, "transcripts"),
            dictionary_path=os.path.join(ref_corpus, "entity_dictionary.parquet"),
            n_buckets=n_buckets,
        )
        frames.append(_sorted(ds.to_pandas()))
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_answers_path_invariant_to_bucket_count(ray_session, ref_corpus):
    from naer_ray.pipelines.kg import build_triples

    frames = []
    for n_buckets in (4, 32):
        ds = build_triples(
            os.path.join(ref_corpus, "transcripts"),
            extractor="answers",
            answers_path=os.path.join(ref_corpus, "llm_answers.parquet"),
            n_buckets=n_buckets,
        )
        frames.append(_sorted(ds.to_pandas()))
    pd.testing.assert_frame_equal(frames[0], frames[1])
