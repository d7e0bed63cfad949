"""Checkpointed KG job: per-bucket manifests, lineage counters, resume."""

import json
import os
import shutil

import pyarrow.parquet as pq


def _corpus_paths(c):
    return (
        os.path.join(c, "transcripts"),
        os.path.join(c, "entity_dictionary.parquet"),
    )


def test_kg_job_writes_partitions_and_manifest(ray_session, ref_corpus, tmp_path):
    from naer_ray.pipelines.kg import run_kg_job

    transcripts, dictionary = _corpus_paths(ref_corpus)
    out = str(tmp_path / "kg")
    counters = run_kg_job(transcripts, dictionary, out, n_buckets=4)
    assert counters["buckets_computed"] == 4
    manifest = json.load(open(os.path.join(out, "MANIFEST.json")))
    buckets = manifest["stages"]["triples"]["buckets"]
    assert len(buckets) == 4 and all(v["complete"] for v in buckets.values())
    total = sum(v["rows"] for v in buckets.values())
    edges = pq.read_table(os.path.join(out, "triples"))
    assert edges.num_rows == total > 0
    # lineage recorded per bucket
    assert all(v["lineage"]["extractor"] == "gazetteer" for v in buckets.values())
    nodes = pq.read_table(os.path.join(out, "nodes"))
    assert nodes.num_rows > 0
    kinds = set(nodes.column("kind").to_pylist())
    assert kinds == {"entity", "conversation"}


def test_kg_job_resume_skips_done_buckets(ray_session, ref_corpus, tmp_path):
    from naer_ray.pipelines.kg import run_kg_job

    transcripts, dictionary = _corpus_paths(ref_corpus)
    out = str(tmp_path / "kg")
    run_kg_job(transcripts, dictionary, out, n_buckets=4)
    before = pq.read_table(os.path.join(out, "triples"))

    # simulate a mid-job crash: drop two buckets from the manifest + disk
    mpath = os.path.join(out, "MANIFEST.json")
    manifest = json.load(open(mpath))
    for b in ("1", "3"):
        del manifest["stages"]["triples"]["buckets"][b]
        shutil.rmtree(os.path.join(out, "triples", f"bucket={b}"))
    manifest["stages"].pop("nodes", None)
    shutil.rmtree(os.path.join(out, "nodes"))
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    counters = run_kg_job(transcripts, dictionary, out, n_buckets=4)
    assert counters["buckets_skipped"] == 2
    assert counters["buckets_computed"] == 2
    after = pq.read_table(os.path.join(out, "triples"))
    # identical output after resume (sort both for comparison)
    cols = ["subj", "pred", "obj", "conv_id"]
    a = sorted(zip(*[before.column(c).to_pylist() for c in cols]))
    b = sorted(zip(*[after.column(c).to_pylist() for c in cols]))
    assert a == b


def test_answers_path_job_and_dead_letter(ray_session, ref_corpus, tmp_path):
    """Recorded-answer job end-to-end, incl. a poisoned answer dead-lettered."""
    import pyarrow as pa

    from naer_ray.pipelines.kg import run_kg_job

    transcripts, dictionary = _corpus_paths(ref_corpus)
    answers = pq.read_table(os.path.join(ref_corpus, "llm_answers.parquet"))
    poisoned = pa.table(
        {
            "conv_id": pa.array(
                answers.column("conv_id").to_pylist() + ["syn:000000"], pa.string()
            ),
            "format": pa.array(
                answers.column("format").to_pylist() + ["structured-text"], pa.string()
            ),
            "answer": pa.array(
                answers.column("answer").to_pylist() + ["GARBAGE entities recognized:"],
                pa.string(),
            ),
        }
    )
    apath = str(tmp_path / "answers.parquet")
    pq.write_table(poisoned, apath)
    out = str(tmp_path / "kg")
    run_kg_job(
        transcripts, None, out, extractor="answers", answers_path=apath, n_buckets=2
    )
    edges = pq.read_table(os.path.join(out, "triples"))
    preds = edges.column("pred").to_pylist()
    assert "__error__" in preds  # dead-lettered, job survived
    assert preds.count("occursIn") > 100
