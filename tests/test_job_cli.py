"""ray-job-submit entrypoint (naer_ray.job) driven in-process."""

import json
import os


def test_job_main_with_canonicalize(ray_session, ref_corpus, tmp_path, capsys):
    from naer_ray.job import main

    out = str(tmp_path / "kg")
    rc = main(
        [
            "--transcripts", os.path.join(ref_corpus, "transcripts"),
            "--dictionary", os.path.join(ref_corpus, "entity_dictionary.parquet"),
            "--out", out,
            "--buckets", "4",
            "--canonicalize",
        ]
    )
    assert rc == 0
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counters["buckets_computed"] == 4
    assert counters["triples_rows"] > 0
    assert os.path.isdir(os.path.join(out, "canonical_labels"))
    assert os.path.isdir(os.path.join(out, "canon"))

    # resume: everything skipped
    rc = main(
        [
            "--transcripts", os.path.join(ref_corpus, "transcripts"),
            "--dictionary", os.path.join(ref_corpus, "entity_dictionary.parquet"),
            "--out", out,
            "--buckets", "4",
            "--canonicalize",
        ]
    )
    assert rc == 0
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counters["buckets_skipped"] == 4 and counters["buckets_computed"] == 0


def test_job_config_file_drives_run(ray_session, ref_corpus, tmp_path, capsys):
    """S6 config surface: a JSON file supplies the job kwargs; CLI overrides."""
    from naer_ray.job import main

    cfg = {
        "transcripts": os.path.join(ref_corpus, "transcripts"),
        "dictionary": os.path.join(ref_corpus, "entity_dictionary.parquet"),
        "out": str(tmp_path / "cfg_kg"),
        "buckets": 2,
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    rc = main(["--config", cfg_path])
    assert rc == 0
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counters["buckets_computed"] == 2
    assert os.path.isdir(os.path.join(cfg["out"], "triples"))

    # CLI flag overrides the config value
    rc = main(["--config", cfg_path, "--out", str(tmp_path / "cfg_kg2"), "--buckets", "3"])
    assert rc == 0
    counters = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counters["buckets_computed"] == 3


def test_job_config_rejects_unknown_keys(tmp_path):
    import pytest

    from naer_ray.job import load_config

    cfg_path = str(tmp_path / "bad.json")
    with open(cfg_path, "w") as f:
        json.dump({"transcripts": "x", "banana": 1}, f)
    with pytest.raises(ValueError, match="banana"):
        load_config(cfg_path)
