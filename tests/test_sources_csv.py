"""CSV sources (reference S4/S5) against the actual reference files."""

import glob

BASE = "/root/reference/src/test/resources/evaluation_resources"


def test_read_gold_csv(ray_session):
    from naer_ray.sources.goldstandard import gold_entities, read_gold_csv

    path = f"{BASE}/teastore/goldstandards/goldstandard_NER.csv"
    ds = read_gold_csv(path, conv_id="ref:teastore")
    df = ds.to_pandas()
    assert list(df.columns) == ["conv_id", "component_name", "turn_idx", "ref_type"]
    assert (df["ref_type"] == "DIRECT").all()
    assert len(df) == 27  # 28 lines minus header
    assert {"Registry", "WebUI", "Auth"} <= set(df["component_name"])

    grouped = gold_entities(ds).to_pandas()
    reg = grouped[grouped["component_name"] == "Registry"].iloc[0]
    assert reg["occurrence_turns"][0] == 1


def test_read_gazetteer_csv():
    from naer_ray.sources.gazetteer import GazetteerMatcher, read_gazetteer_csv

    path = glob.glob(f"{BASE}/teastore/model_*/uml/modelElementID_to_ComponentName.csv")[0]
    rows = read_gazetteer_csv(path)
    names = [r["canonical_name"] for r in rows]
    assert "WebUI" in names and "Image Provider" in names
    assert names == sorted(names)
    # builds a working matcher
    m = GazetteerMatcher(rows)
    hits = m.match_text("The WebUI service talks to the Image Provider.")
    hit_names = {rows_by_id["canonical_name"] for _pos, eid in hits
                 for rows_by_id in [m.by_id[eid]]}
    assert {"WebUI", "Image Provider"} <= hit_names


def test_transcripts_from_text_files(ray_session):
    """Raw-text ingestion (S1): reference SAD file -> transcript rows with
    per-turn text equality and 1-based line numbering."""
    import glob

    from naer_ray.sources.transcripts import transcripts_from_text_files
    from naer_ray.testdata import load_reference_projects

    path = glob.glob(f"{BASE}/teastore/text_*/*_1SentPerLine.txt")[0]
    ds = transcripts_from_text_files([path])
    df = ds.to_pandas().sort_values("turn_idx").reset_index(drop=True)
    ref = next(p for p in load_reference_projects() if p["name"] == "teastore")
    assert df["text"].tolist() == ref["lines"]
    assert df["turn_idx"].tolist() == list(range(1, len(ref["lines"]) + 1))
