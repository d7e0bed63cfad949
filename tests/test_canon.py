"""Canonicalization: Jaro-Winkler conformance + distributed union-find labels."""

import pytest


class TestJaroWinkler:
    def test_known_vectors(self):
        from naer_ray.stages.canon import jaro_winkler

        # classic published examples
        assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
        assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
        assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
        assert jaro_winkler("same", "same") == 1.0
        assert jaro_winkler("abc", "xyz") == 0.0


def test_canonical_labels_cluster(ray_session):
    import ray.data

    from naer_ray.stages.canon import canonical_labels

    names = ray.data.from_items(
        [
            {"name": "WebUI"},
            {"name": "Web UI"},
            {"name": "webui component"},
            {"name": "Database"},
            {"name": "DataBase"},
            {"name": "Recommender"},
        ]
    )
    labels = canonical_labels(names).to_pandas()
    lbl = dict(zip(labels["node"], labels["label"]))
    # the three WebUI surface forms share one canonical label
    assert lbl["WebUI"] == lbl["Web UI"] == lbl["webui component"]
    assert lbl["Database"] == lbl["DataBase"]
    assert lbl.get("Recommender", "solo") not in {lbl["WebUI"], lbl["Database"]}


def test_apply_canonical_labels(ray_session):
    import ray.data

    from naer_ray.stages.canon import apply_canonical_labels

    triples = ray.data.from_items(
        [
            {"subj": "Web UI", "pred": "mentionedIn", "obj": "c1"},
            {"subj": "Other", "pred": "mentionedIn", "obj": "c2"},
        ]
    )
    labels = ray.data.from_items(
        [{"node": "Web UI", "label": "WebUI"}, {"node": "WebUI", "label": "WebUI"}]
    )
    out = apply_canonical_labels(triples, labels).to_pandas()
    assert set(out["subj"]) == {"WebUI", "Other"}


def test_alias_pools_join_entities(ray_session):
    """Aliases bridge differently-named entities (J3 generalized)."""
    import ray.data

    from naer_ray.stages.canon import canonical_labels

    names = ray.data.from_items(
        [
            {"name": "GUI", "aliases": ["frontend"]},
            {"name": "Frontend", "aliases": []},
        ]
    )
    labels = canonical_labels(names, aliases_col="aliases").to_pandas()
    lbl = dict(zip(labels["node"], labels["label"]))
    assert lbl["GUI"] == lbl["Frontend"]
