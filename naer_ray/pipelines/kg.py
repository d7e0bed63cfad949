"""The flagship KG-construction pipeline (SURVEY.md §3.4).

Lazy Dataset composition::

    read_parquet(transcripts, columns=3)            # prune at the read
      -> validate (vectorized regex, quarantine)    # S3
      -> mention detection map_batches              # per-turn, NO shuffle
         (elastic tasks w/ per-process matcher cache; actor pool optional)
      -> groupby(conv-hash bucket).map_groups       # shuffle 1 (mention rows only)
      -> triples Dataset                            # occursIn/mentionedIn/hasType/...

plus the recorded-answer parity path (stages/answers.py) which runs the
reference's parse->resolve->type semantics per conversation.

``run_kg_job`` is the checkpointed job wrapper: bucket by conv hash,
skip completed buckets on resume, write partitioned Parquet atomically
with per-bucket lineage + counters (state/checkpoint.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .. import schema
from ..sources.gazetteer import load_dictionary_rows
from ..sources.transcripts import read_transcripts, validate_transcripts
from ..stages.answers import answers_as_rows, parse_answer_group
from ..stages.extract import (
    MentionDetector,
    make_conversation_assembler,
    make_mention_detector,
)
from ..testdata import hash_u32


def build_triples(
    transcripts_path: str | None,
    dictionary_path: str | None = None,
    *,
    extractor: str = "gazetteer",
    answers_path: str | None = None,
    validate: str | None = "quarantine",
    batch_size: int | None = None,
    concurrency=None,
    dict_ref=None,
    transcripts_ds: "ray.data.Dataset | None" = None,
    dict_rows: list[dict] | None = None,
    n_buckets: int | None = None,
    detector: str = "tasks",
    include_alias_edges: bool = False,
    chat_fn_factory=None,
    prompt_text: str | None = None,
    answer_format: str = "structured-text",
) -> ray.data.Dataset:
    """Lazy triples Dataset for either extractor backend.

    extractor="gazetteer": broadcast-dictionary mention detection (the
    production path; dictionary_path or a pre-``ray.put`` dict_ref
    required).  extractor="answers": recorded structured-text/JSON
    answers parsed with exact reference semantics (parity path;
    answers_path required).

    batch_size=None (default) processes whole read blocks — the read is
    already sized to ~64 MB blocks (sources.transcripts.auto_num_blocks),
    so re-slicing into small batches only adds overhead.

    n_buckets=None sizes the conv-hash shuffle to the cluster
    (auto_n_buckets): with only ~2 buckets/core the largest bucket
    straggles the assemble stage (measured 0-477k rows across 64
    buckets at 12M turns — a 5.9s tail vs 2.6s mean task); ~8/core
    smooths the tail (64->256 buckets: -13% wall at 32 CPUs, -15% at
    8), and on a multi-node cluster buckets keep pace with cores.
    """
    if n_buckets is None:
        n_buckets = auto_n_buckets()
    if extractor == "answers":
        if answers_path is None:
            raise ValueError("answers_path required for extractor='answers'")
        # honor a caller-supplied source Dataset (e.g. run_kg_job with
        # input_format="jsonl") — the parquet reader would crash on a
        # JSONL path with a misleading error (ADVICE r3)
        if transcripts_ds is not None:

            def _with_role(t: pa.Table) -> pa.Table:
                cols = {
                    "conv_id": t["conv_id"],
                    "turn_idx": t["turn_idx"],
                    "role": t["role"]
                    if "role" in t.column_names
                    else pa.nulls(t.num_rows, pa.string()),
                    "text": t["text"],
                }
                return pa.table(cols)

            tds = transcripts_ds.map_batches(_with_role, batch_format="pyarrow")
        else:
            tds = read_transcripts(
                transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
            )
        ds = add_bucket(tds.union(answers_as_rows(answers_path)), n_buckets)
        return ds.groupby("bucket").map_groups(
            parse_answer_group, batch_format="pyarrow"
        )

    if extractor == "llm":
        if chat_fn_factory is None:
            raise ValueError("chat_fn_factory required for extractor='llm'")
        return llm_extract_triples(
            transcripts_path,
            chat_fn_factory,
            prompt_text=prompt_text,
            answer_format=answer_format,
            n_buckets=n_buckets,
            transcripts_ds=transcripts_ds,
            validate=validate,
        )

    if extractor != "gazetteer":
        raise ValueError(f"unknown extractor {extractor!r}")
    if dict_ref is None:
        if dict_rows is not None:
            dict_ref = ray.put(dict_rows)
        elif dictionary_path is not None:
            dict_ref = ray.put(load_dictionary_rows(dictionary_path))
        else:
            raise ValueError("dictionary_path, dict_rows or dict_ref required")
    ds = transcripts_ds if transcripts_ds is not None else read_transcripts(transcripts_path)
    if validate:
        ds = validate_transcripts(ds, mode=validate)
    if detector == "actors":
        if concurrency is None:
            # size the pool to the cluster: min 2 actors (pipeline
            # overlap), cap at cluster CPUs (a fixed (2, 16) cap left
            # half a 32-core node idle)
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
            concurrency = (2, max(2, cpus))
        mentions = ds.map_batches(
            MentionDetector,
            fn_constructor_args=(dict_ref, n_buckets),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    else:  # "tasks": elastic stateless stage, matcher cached per worker process
        mentions = ds.map_batches(
            make_mention_detector(dict_ref, n_buckets),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    triples = mentions.groupby("bucket").map_groups(
        make_conversation_assembler(dict_ref), batch_format="pyarrow"
    )
    if include_alias_edges:
        triples = triples.union(alias_interface_edges(triples, dict_ref))
    return triples


def llm_extract_triples(
    transcripts_path: str | None,
    chat_fn_factory,
    *,
    prompt_text: str | None = None,
    answer_format: str = "structured-text",
    possible_entities: dict[str, list[str]] | None = None,
    n_buckets: int | None = None,
    transcripts_ds: "ray.data.Dataset | None" = None,
    validate: str | None = "quarantine",
    prompt_template=None,
) -> ray.data.Dataset:
    """LLM-recognizer pipeline path (reference main flow: SAD ->
    chat-model recognizer -> entities, NamedEntityRecognizer.java:57-81)
    as a Ray stage.

    Unlike the gazetteer path (which shuffles only mention rows), LLM
    extraction needs every turn's text per conversation, so full rows
    enter the conv-hash bucket shuffle — inherent to the operator, and
    the reason the gazetteer path is the default at scale.  Each bucket
    kernel builds the chat backend ONCE via ``chat_fn_factory()``
    (e.g. ``lambda: ChatModelFactory.with_provider(...).build()``) and
    walks its conversations; parse failures repair-retry once and then
    dead-letter per conversation (stages/llm.LLMExtractor.extract).
    """
    from ..stages.llm import LLMExtractor, Prompt

    if n_buckets is None:
        n_buckets = auto_n_buckets()
    ds = transcripts_ds if transcripts_ds is not None else read_transcripts(
        transcripts_path, columns=["conv_id", "turn_idx", "role", "text"]
    )
    if validate:
        ds = validate_transcripts(ds, mode=validate)
    ds = add_bucket(ds, n_buckets)
    base_prompt = prompt_text or "Identify all COMPONENT entities in the text."

    def extract_bucket(group: pa.Table) -> pa.Table:
        chat_fn = chat_fn_factory()
        # prompt_template: a pre-built Prompt/TwoPartPrompt instance
        # (each Ray task deserializes its own copy, so the one-shot
        # entity-injection state never crosses buckets)
        prompt = prompt_template or Prompt(base_prompt, answer_format)
        if possible_entities:
            prompt.add_possible_entities(possible_entities)
        ex = LLMExtractor(chat_fn, prompt)
        group = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        conv = group["conv_id"].to_pylist()
        texts = group["text"].to_pylist()
        outs = []
        i, n = 0, len(conv)
        while i < n:
            j = i
            while j < n and conv[j] == conv[i]:
                j += 1
            lines = [t for t in texts[i:j] if t is not None]
            outs.append(ex.extract(conv[i], lines))
            i = j
        if not outs:
            from ..stages.extract import _empty_triples

            return _empty_triples()
        return pa.concat_tables(outs)

    return ds.groupby("bucket").map_groups(extract_bucket, batch_format="pyarrow")


def alias_interface_edges(triples: ray.data.Dataset, dict_ref) -> ray.data.Dataset:
    """Entity-scoped (subj, hasAlternativeName, alias) edges for every
    entity observed anywhere in the corpus — distinct subjects (small)
    joined against the broadcast dictionary, emitted once globally
    (conv_id = "")."""
    from .. import schema as _schema
    from ..sources.gazetteer import matcher_from_ref

    def partial_subjects(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["pred"], "hasType"))
        subj = sorted(set(sel["subj"].to_pylist()))
        return pa.table({"subj": pa.array(subj, pa.string())})

    subjects = (
        triples.map_batches(partial_subjects, batch_format="pyarrow")
        .groupby("subj")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )

    def expand(batch: pa.Table) -> pa.Table:
        matcher = matcher_from_ref(dict_ref)
        by_name: dict[str, list[str]] = {}
        for row in matcher.by_id.values():
            if row.get("aliases"):
                by_name.setdefault(row["canonical_name"], []).extend(row["aliases"])
        rows = []
        for subj in batch["subj"].to_pylist():
            for alias in sorted(set(by_name.get(subj, []))):
                rows.append(
                    {
                        "subj": subj,
                        "pred": "hasAlternativeName",
                        "obj": alias,
                        "conv_id": "",
                        "turn_idx": None,
                        "ref_type": None,
                    }
                )
        return pa.Table.from_pylist(rows, schema=_schema.TRIPLES)

    return subjects.map_batches(expand, batch_format="pyarrow")


def split_errors(triples: ray.data.Dataset):
    """(ok, dead_letter) split on the __error__ sentinel predicate."""
    ok = triples.map_batches(
        lambda t: t.filter(pc.not_equal(t["pred"], "__error__")), batch_format="pyarrow"
    )
    bad = triples.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], "__error__")), batch_format="pyarrow"
    )
    return ok, bad


def auto_n_buckets() -> int:
    """Shuffle-bucket count sized to the cluster: ~8 buckets/core
    (tail-smoothing headroom), floor 64, capped at 4096 so the
    groupby's dispatch stays O(thousands) even on a 256-node cluster."""
    cpus = 8.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 8.0)
    return int(min(4096, max(64, 8 * int(cpus))))


def add_bucket(ds: ray.data.Dataset, n_buckets: int, col: str = "conv_id") -> ray.data.Dataset:
    """Deterministic conv-hash bucket column (FNV-1a, stable across
    processes).  Hashed per DISTINCT value via dictionary encoding —
    conv ids repeat ~100x per block, so the python hash runs on the
    dictionary, not the rows."""
    import numpy as np

    def bucketize(batch: pa.Table) -> pa.Table:
        enc = batch[col].combine_chunks().dictionary_encode()
        ub = np.array(
            [hash_u32(v) % n_buckets for v in enc.dictionary.to_pylist()],
            np.int32,
        )
        buckets = pa.array(ub[enc.indices.to_numpy()], pa.int32())
        return batch.append_column("bucket", buckets)

    return ds.map_batches(bucketize, batch_format="pyarrow")


def nodes_from_triples(
    triples: ray.data.Dataset, n_buckets: int = 64
) -> ray.data.Dataset:
    """Distinct entity + conversation nodes from the edge set.

    Bucket-run dedup: per-batch partial dedup emits a node-id-hash
    bucket, the groupby dispatches O(n_buckets) groups, and each kernel
    dedups its bucket vectorized — never one Ray group per node_id
    (unbounded-cardinality dispatch, the repo's banned pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        ent = batch.filter(pc.equal(batch["pred"], "hasType"))
        conv = batch.filter(pc.equal(batch["pred"], "mentionedIn"))
        rows = [
            {"node_id": f"entity:{s}", "kind": "entity", "name": s, "type": t}
            for s, t in set(zip(ent["subj"].to_pylist(), ent["obj"].to_pylist()))
        ] + [
            {"node_id": f"conv:{c}", "kind": "conversation", "name": c, "type": ""}
            for c in set(conv["obj"].to_pylist())
        ]
        tbl = pa.Table.from_pylist(rows, schema=schema.NODES)
        bucket = pa.array(
            [hash_u32(n) % n_buckets for n in tbl["node_id"].to_pylist()], pa.int32()
        )
        return tbl.append_column("bucket", bucket)

    def dedup_bucket(group: pa.Table) -> pa.Table:
        group = group.sort_by([("node_id", "ascending")])
        ids = group["node_id"].to_pylist()
        keep = [i for i, n in enumerate(ids) if i == 0 or n != ids[i - 1]]
        return group.take(keep).drop_columns(["bucket"])

    parts = triples.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("bucket").map_groups(dedup_bucket, batch_format="pyarrow")


def run_kg_job(
    transcripts_path: str,
    dictionary_path: str | None,
    out_root: str,
    *,
    extractor: str = "gazetteer",
    answers_path: str | None = None,
    chat_fn_factory=None,
    prompt_text: str | None = None,
    answer_format: str = "structured-text",
    n_buckets: int = 16,
    resume: bool = True,
    canonicalize: bool = False,
    annotations_path: str | None = None,
    expected_path: str | None = None,
    input_format: str = "parquet",
) -> dict:
    """Checkpointed KG job: triples + nodes + dead-letter, resumable per bucket.

    Stage "triples": each conv-hash bucket is written atomically
    (temp-dir rename) and recorded in MANIFEST.json with row counts and
    lineage; on resume, completed buckets are filtered out BEFORE
    extraction so their compute is skipped entirely.  Stage "nodes"
    derives the node table from the written edge partitions.

    At 100 TB scale the same layout holds: buckets are key ranges of
    conv hash, each an independent re-runnable unit.
    """
    import os

    from ..state.checkpoint import (
        Manifest,
        bucket_dir,
        finalize_bucket,
        make_bucket_writer,
        sweep_orphan_tmpdirs,
        write_bucket_atomic,
        write_stage_dataset_atomic,
    )

    manifest = Manifest(out_root)
    # refuse a resume whose inputs differ from the manifest's recorded
    # lineage (ADVICE r2: a changed extractor/input would otherwise skip
    # every done bucket and re-emit the previous run's triples)
    manifest.record_job_lineage(
        {
            "transcripts": transcripts_path,
            "dictionary": dictionary_path,
            "extractor": extractor,
            "answers": answers_path,
            "answer_format": answer_format,
            "input_format": input_format,
        },
        resume=resume,
    )
    if input_format not in ("parquet", "jsonl"):
        raise ValueError(f"unknown input_format: {input_format!r}")

    def _read_src():
        if input_format == "jsonl":
            from ..sources.transcripts import read_transcripts_jsonl

            return read_transcripts_jsonl(transcripts_path)
        return read_transcripts(transcripts_path)
    sweep_orphan_tmpdirs(out_root)
    done = manifest.done_buckets("triples") if resume else set()
    todo = [b for b in range(n_buckets) if b not in done]
    counters = {"buckets_skipped": len(done), "buckets_computed": len(todo)}

    if todo:
        # dead-letter sink: rows failing the SAD format rule are persisted
        # (not silently dropped) with a manifest counter — stage
        # "quarantine".  Applies to every validating extractor (the llm
        # path also drops invalid rows via validate="quarantine", so it
        # gets the same persisted sink, not a silent drop).
        if extractor in ("gazetteer", "llm") and not manifest.stage_complete(
            "quarantine", 1
        ):
            from ..sources.transcripts import invalid_transcripts

            rows = write_stage_dataset_atomic(
                invalid_transcripts(_read_src()),
                out_root,
                "quarantine",
                0,
            )
            manifest.mark_bucket("quarantine", 0, rows, lineage={"rule": "S3 [.!?]$"})
            counters["quarantined_rows"] = rows

        # Resume pushdown: filter the done buckets out of the TRANSCRIPTS
        # (one hash pass over turns) so extraction compute — mention
        # detection, or every LLM chat call — is skipped for completed
        # buckets, honoring the "filtered out BEFORE extraction" contract.
        # The answers path keeps the post-extraction filter only (its
        # extraction is a cheap parse and it reads its own inputs).
        src_ds = _read_src() if input_format != "parquet" else None
        if done and extractor in ("gazetteer", "llm"):
            done_list = list(done)
            src_ds = (
                add_bucket(_read_src(), n_buckets)
                .map_batches(
                    lambda t: t.filter(
                        pc.invert(
                            pc.is_in(t["bucket"], value_set=pa.array(done_list))
                        )
                    ),
                    batch_format="pyarrow",
                )
                .drop_columns(["bucket"])
            )

        triples = build_triples(
            transcripts_path,
            dictionary_path,
            extractor=extractor,
            answers_path=answers_path,
            chat_fn_factory=chat_fn_factory,
            prompt_text=prompt_text,
            answer_format=answer_format,
            transcripts_ds=src_ds,
        )
        triples = add_bucket(triples, n_buckets)
        if done:
            done_arr = list(done)
            triples = triples.map_batches(
                lambda t: t.filter(
                    pc.invert(pc.is_in(t["bucket"], value_set=pa.array(done_arr)))
                ),
                batch_format="pyarrow",
            )
        # Distributed per-bucket writes: one conv-hash-bucket shuffle, then
        # each bucket group is written to a temp dir by the worker holding
        # it.  The driver only handles (bucket, rows, errors, tmp) summary
        # rows — rename + manifest mark, never triple data (at 100 TB the
        # edge table is TBs; the round-1 ray.get+concat path OOMs).
        writes = triples.groupby("bucket").map_groups(
            make_bucket_writer(out_root, "triples"), batch_format="pyarrow"
        )
        summary = writes.to_pandas().sort_values("bucket")
        for row in summary.itertuples():
            b = int(row.bucket)
            finalize_bucket(out_root, "triples", b, row.tmp, int(row.rows))
            manifest.mark_bucket(
                "triples",
                b,
                int(row.rows),
                lineage={
                    "input": transcripts_path,
                    "extractor": extractor,
                    "errors": int(row.errors),
                },
            )
        # buckets with zero mention rows never reach the writer kernel —
        # mark them with an empty partition so resume doesn't re-plan them
        for b in set(todo) - {int(r.bucket) for r in summary.itertuples()}:
            rows = write_bucket_atomic(
                pa.Table.from_pylist([], schema=schema.TRIPLES), out_root, "triples", b
            )
            manifest.mark_bucket(
                "triples", b, rows,
                lineage={"input": transcripts_path, "extractor": extractor, "errors": 0},
            )
        manifest.set_counter("triples", "rows_written", sum(
            v["rows"] for v in manifest.stage("triples")["buckets"].values()
        ))

    # stage 2: node table from the checkpointed edge partitions
    import glob as _glob

    edge_files = [
        f
        for b in sorted(manifest.done_buckets("triples"))
        if os.path.isdir(bucket_dir(out_root, "triples", b))
        for f in sorted(_glob.glob(os.path.join(bucket_dir(out_root, "triples", b), "*.parquet")))
    ]

    def _ok_edges():
        nb = max(1, sum(os.path.getsize(f) for f in edge_files) // (64 * 1024 * 1024)) \
            if edge_files else 1
        nb = max(nb, min(len(edge_files), 32))
        ok, _bad = split_errors(
            ray.data.read_parquet(edge_files, override_num_blocks=nb)
        )
        return ok

    if edge_files and not manifest.stage_complete("nodes", 1):
        rows = write_stage_dataset_atomic(
            nodes_from_triples(_ok_edges()), out_root, "nodes", 0
        )
        manifest.mark_bucket("nodes", 0, rows, lineage={"input": "triples/*"})
    # stage 3 (optional): cross-corpus canonicalization — union-find over
    # name-pool similarity edges; materialized as a labels table plus
    # (node, sameAs, label) edges for non-identity labels
    if canonicalize and edge_files and not manifest.stage_complete("canon", 1):
        from ..stages.canon import canonical_labels

        ok = _ok_edges()

        def subj_names(batch: pa.Table) -> pa.Table:
            sel = batch.filter(pc.equal(batch["pred"], "hasType"))
            return pa.table(
                {"name": pa.array(sorted(set(sel["subj"].to_pylist())), pa.string())}
            )

        names_ds = ok.map_batches(subj_names, batch_format="pyarrow")
        # one execution feeds both outputs: labels parquet + sameAs edges
        labels = canonical_labels(names_ds).materialize()
        rows = write_stage_dataset_atomic(labels, out_root, "canonical_labels", 0)

        def to_same_as(batch: pa.Table) -> pa.Table:
            sel = batch.filter(pc.not_equal(batch["node"], batch["label"]))
            return pa.Table.from_pylist(
                [
                    {
                        "subj": n,
                        "pred": "sameAs",
                        "obj": l,
                        "conv_id": "",
                        "turn_idx": None,
                        "ref_type": None,
                    }
                    for n, l in zip(sel["node"].to_pylist(), sel["label"].to_pylist())
                ],
                schema=schema.TRIPLES,
            )

        same_as_rows = write_stage_dataset_atomic(
            labels.map_batches(to_same_as, batch_format="pyarrow"),
            out_root,
            "canon",
            0,
        )
        manifest.mark_bucket("canon", 0, same_as_rows, lineage={"labels_rows": rows})
        counters["same_as_edges"] = same_as_rows

    # stage 4 (optional): evaluation job — P/R vs reference annotations
    # (J3 name-pool matching) and/or vs expected triples (parity gate);
    # metrics written beside the outputs and recorded in the manifest
    if (annotations_path or expected_path) and edge_files:
        import json as _json

        from .evaluate import eval_vs_annotations, eval_vs_expected

        metrics: dict = {}
        if expected_path:
            metrics["parity_vs_expected"] = eval_vs_expected(_ok_edges(), expected_path)
        if annotations_path:
            metrics["eval_vs_annotations"] = eval_vs_annotations(
                _ok_edges(), annotations_path
            )
        with open(os.path.join(out_root, "metrics.json"), "w") as f:
            _json.dump(metrics, f, indent=2)
        for group, vals in metrics.items():
            for k, v in vals.items():
                manifest.add_counter("eval", f"{group}.{k}", float(v))
        counters["metrics"] = metrics

    counters["triples_rows"] = sum(
        v["rows"] for v in manifest.stage("triples")["buckets"].values()
    )
    return counters
