"""match_batch must produce the per-text walk's exact hit layout.

GazetteerMatcher.match_batch is the vectorized (Arrow split + packed
int64 n-gram keys + windowed suppression) twin of match_tokens; these
tests compare them text-by-text on the fixture corpus and on
adversarial synthetic strings (ambiguous equal spans, nested longer
surfaces, camelCase boundary cases, empty/punctuation-only texts).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from naer_ray.sources.gazetteer import (
    GazetteerMatcher,
    load_dictionary_rows,
    tokenize,
)


def _reference_layout(m: GazetteerMatcher, texts: list[str]):
    counts, pos, code = [], [], []
    for t in texts:
        hits = m.match_tokens(tokenize(t))
        counts.append(len(hits))
        for p, eid in hits:
            pos.append(p)
            code.append(m.eid_index[eid])
    return (
        np.array(counts, np.int64),
        np.array(pos, np.int32),
        np.array(code, np.int32),
    )


def _assert_match(m: GazetteerMatcher, texts: list[str]):
    got_counts, got_pos, got_code = m.match_batch(pa.array(texts, pa.string()))
    exp_counts, exp_pos, exp_code = _reference_layout(m, texts)
    np.testing.assert_array_equal(got_counts, exp_counts)
    np.testing.assert_array_equal(got_pos, exp_pos)
    np.testing.assert_array_equal(got_code, exp_code)


def test_corpus_texts_identical(ref_corpus):
    m = GazetteerMatcher(
        load_dictionary_rows(os.path.join(ref_corpus, "entity_dictionary.parquet"))
    )
    col = pq.read_table(
        os.path.join(ref_corpus, "transcripts"), columns=["text"]
    )["text"].combine_chunks()
    texts = [t for t in col.dictionary_encode().dictionary.to_pylist() if t is not None]
    _assert_match(m, texts)


def test_adversarial_surfaces():
    rows = [
        {"entity_id": "e1", "canonical_name": "Auth Service", "type": "COMPONENT",
         "aliases": ["AuthService"], "interface_of": None},
        {"entity_id": "e2", "canonical_name": "Auth Service Core", "type": "COMPONENT",
         "aliases": [], "interface_of": None},
        {"entity_id": "e3", "canonical_name": "Service", "type": "COMPONENT",
         "aliases": [], "interface_of": None},
        # ambiguous equal-span surfaces: two entities share one name
        {"entity_id": "e4", "canonical_name": "Cache", "type": "COMPONENT",
         "aliases": [], "interface_of": None},
        {"entity_id": "e5", "canonical_name": "cache", "type": "INTERFACE",
         "aliases": [], "interface_of": "e4"},
        {"entity_id": "e6", "canonical_name": "Very Long Surface Name", "type": "COMPONENT",
         "aliases": [], "interface_of": None},
    ]
    m = GazetteerMatcher(rows)
    texts = [
        "",
        "...",
        "nothing matches here",
        "the Auth Service restarted",            # 2-gram beats 1-gram Service
        "the Auth Service Core restarted",       # 3-gram suppresses both
        "AuthServiceCore is the camel form",     # camel split -> 3-gram
        "Service talks to the Cache",            # equal-span ambiguity on cache
        "cache Cache CACHE",
        "Auth Service and Auth Service Core and Service",
        "Very Long Surface Name wraps a Very Long Surface",
        "service AUTH service auth SERVICE",
        "Auth",                                  # prefix of a surface, no hit
        "Service Auth",                          # reversed order: only 1-grams
        "a Auth Service Core Auth Service b",    # overlapping long + short
    ]
    _assert_match(m, texts)


def test_random_texts_identical():
    rows = [
        {"entity_id": f"e{i}", "canonical_name": name, "type": "COMPONENT",
         "aliases": [], "interface_of": None}
        for i, name in enumerate(
            ["alpha", "beta gamma", "beta gamma delta", "delta", "alpha beta",
             "gamma", "epsilon zeta eta theta"]
        )
    ]
    m = GazetteerMatcher(rows)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "filler", "x9"]
    rng = np.random.default_rng(42)
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(500)
    ]
    _assert_match(m, texts)


def test_packing_overflow_fallback(monkeypatch):
    """The fallback walk path must produce the identical layout."""
    rows = [
        {"entity_id": "e1", "canonical_name": "Auth Service", "type": "COMPONENT",
         "aliases": [], "interface_of": None},
        {"entity_id": "e2", "canonical_name": "Service", "type": "COMPONENT",
         "aliases": [], "interface_of": None},
    ]
    m = GazetteerMatcher(rows)
    texts = ["the Auth Service talks to a Service", "no match", ""]
    direct = m.match_batch(pa.array(texts, pa.string()))
    fb = m._match_batch_fallback(pa.array(texts, pa.string()))
    for a, b in zip(direct, fb):
        np.testing.assert_array_equal(a, b)
