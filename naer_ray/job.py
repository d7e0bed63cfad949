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


#: config keys accepted by --config (the reference's test-config.json
#: surface, PromptDeserializer.java:30-55, re-expressed as job kwargs)
_CONFIG_KEYS = {
    "transcripts", "dictionary", "out", "extractor", "answers", "buckets",
    "resume", "canonicalize", "annotations", "expected", "input_format",
}


def _resolve_env(obj):
    """Substitute ``${ENV:KEY}`` string values from .env / os.environ.

    S8 surface (Environment.java precedence via naer_ray.env): lets a
    checked-in config reference credentials/hosts without embedding
    them, the way the reference factory pulls OPENAI_API_KEY /
    OLLAMA_HOST at run time (ChatModelFactory.java:126,144-146)."""
    if isinstance(obj, dict):
        return {k: _resolve_env(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve_env(v) for v in obj]
    if isinstance(obj, str) and obj.startswith("${ENV:") and obj.endswith("}"):
        from naer_ray.env import get_env_non_null

        key = obj[len("${ENV:"):-1]
        value = get_env_non_null(key)
        if value is None:
            # fail fast with the variable's NAME — letting None through
            # produced int(None) TypeErrors or a literal "None/run-0"
            # output directory downstream
            raise ValueError(
                f"config references ${{ENV:{key}}} but {key} is not set "
                "(.env or process environment)"
            )
        return value
    return obj


def load_config(path: str, cli_overrides: dict | None = None) -> list[dict]:
    """JSON config -> list of run kwarg dicts (S6 config reader).

    Top-level keys are the base run; an optional ``"runs": [{...}]``
    array yields a matrix of runs, each merged over the base (the
    reference drives prompt/model variants from one config file the
    same way).  ``cli_overrides`` are merged into the BASE before the
    per-run ``/run-{i}`` out dirs are derived — merging them afterwards
    made every matrix run share one out_root, so runs 1..n-1 resumed
    run-0's manifest and emitted its triples (ADVICE r2).  Per-run
    overrides from the ``runs`` array still win (they are the point of
    the matrix)."""
    with open(path) as f:
        cfg = json.load(f)
    cfg = _resolve_env(cfg)
    runs = cfg.pop("runs", None) or [{}]
    bad = set(cfg) - _CONFIG_KEYS
    if bad:
        raise ValueError(f"unknown config keys: {sorted(bad)}")
    cfg = {**cfg, **(cli_overrides or {})}
    out = []
    for i, override in enumerate(runs):
        bad = set(override) - _CONFIG_KEYS
        if bad:
            raise ValueError(f"runs[{i}]: unknown config keys: {sorted(bad)}")
        merged = {**cfg, **override}
        if "out" in merged and len(runs) > 1 and "out" not in override:
            merged["out"] = f"{merged['out']}/run-{i}"
        out.append(_coerce_types(merged))
    return out


_INT_KEYS = {"buckets"}
_BOOL_KEYS = {"resume", "canonicalize"}


def _coerce_types(cfg: dict) -> dict:
    """Coerce string config values (env substitution, hand-written JSON)
    to the kwarg types run_kg_job expects."""
    out = dict(cfg)
    for k in _INT_KEYS & out.keys():
        out[k] = int(out[k])
    for k in _BOOL_KEYS & out.keys():
        v = out[k]
        if isinstance(v, str):
            out[k] = v.strip().lower() in ("1", "true", "yes", "on")
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="naer_ray KG-construction job")
    parser.add_argument("--config", default=None,
                        help="JSON config file (S6); CLI flags override its values")
    parser.add_argument("--transcripts", default=None, help="transcripts file/dir")
    parser.add_argument("--input-format", default=None, choices=["parquet", "jsonl"],
                        help="transcripts format (default parquet; jsonl = landing format)")
    parser.add_argument("--dictionary", default=None, help="entity_dictionary.parquet")
    parser.add_argument("--out", default=None, help="output root (checkpointed)")
    # extractor/buckets/canonicalize default to None so an EXPLICITLY
    # passed built-in-default value (e.g. --buckets 16) still overrides a
    # config file's different value (ADVICE r2); the built-in defaults
    # are applied after the config+CLI merge below.
    parser.add_argument("--extractor", default=None, choices=["gazetteer", "answers"])
    parser.add_argument("--answers", default=None, help="llm_answers.parquet (answers extractor)")
    parser.add_argument("--buckets", type=int, default=None)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--canonicalize", action="store_true", default=None)
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

    cli = {
        "transcripts": args.transcripts,
        "input_format": args.input_format,
        "dictionary": args.dictionary,
        "out": args.out,
        "extractor": args.extractor,
        "answers": args.answers,
        "buckets": args.buckets,
        "resume": False if args.no_resume else None,
        "canonicalize": args.canonicalize,
        "annotations": args.annotations,
        "expected": args.expected,
    }
    cli = {k: v for k, v in cli.items() if v is not None}
    runs = load_config(args.config, cli) if args.config else [cli]

    all_counters = []
    for cfg in runs:
        if not cfg.get("transcripts") or not cfg.get("out"):
            parser.error("transcripts and out are required (via flags or --config)")
        counters = run_kg_job(
            cfg["transcripts"],
            cfg.get("dictionary"),
            cfg["out"],
            extractor=cfg.get("extractor", "gazetteer"),
            answers_path=cfg.get("answers"),
            n_buckets=cfg.get("buckets", 16),
            resume=cfg.get("resume", True),
            canonicalize=cfg.get("canonicalize", False),
            annotations_path=cfg.get("annotations"),
            expected_path=cfg.get("expected"),
            input_format=cfg.get("input_format", "parquet"),
        )
        all_counters.append(counters)
    print(json.dumps(all_counters[0] if len(all_counters) == 1 else all_counters))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
