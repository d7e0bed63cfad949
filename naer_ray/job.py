"""``ray job submit`` entrypoint for the KG-construction job.

Usage (the command a cluster user submits)::

    ray job submit -- python -m naer_ray.job \\
        --transcripts /data/transcripts --dictionary /data/dict.parquet \\
        --out /data/kg_out --buckets 64 --canonicalize

Standalone/local it owns the Ray session (guarded init, shutdown on
exit); under ``ray job submit`` the same guard attaches to the
cluster.  Prints one JSON line of counters.  Re-submitting with the
same --out resumes from the manifest.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="naer_ray KG-construction job")
    parser.add_argument("--transcripts", required=True, help="transcripts parquet file/dir")
    parser.add_argument("--dictionary", default=None, help="entity_dictionary.parquet")
    parser.add_argument("--out", required=True, help="output root (checkpointed)")
    parser.add_argument("--extractor", default="gazetteer", choices=["gazetteer", "answers"])
    parser.add_argument("--answers", default=None, help="llm_answers.parquet (answers extractor)")
    parser.add_argument("--buckets", type=int, default=16)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--canonicalize", action="store_true")
    parser.add_argument("--annotations", default=None,
                        help="reference_annotations.parquet -> eval stage + metrics.json")
    parser.add_argument("--expected", default=None,
                        help="expected_triples.parquet -> parity stage + metrics.json")
    parser.add_argument("--num-cpus", type=int, default=None,
                        help="local-mode CPU count (ignored on a cluster)")
    args = parser.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        init_kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                           logging_level="ERROR")
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .pipelines.kg import run_kg_job

    counters = run_kg_job(
        args.transcripts,
        args.dictionary,
        args.out,
        extractor=args.extractor,
        answers_path=args.answers,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        canonicalize=args.canonicalize,
        annotations_path=args.annotations,
        expected_path=args.expected,
    )
    print(json.dumps(counters))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
