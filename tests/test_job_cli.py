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
