"""Mention detection + per-conversation assembly (the extraction core).

Two-stage, shuffle-minimizing design:

* :class:`MentionDetector` — per-turn DIRECT mention detection against
  the broadcast gazetteer.  Order-independent, so it runs as a plain
  ``map_batches`` stage with NO shuffle; only turns that contain a
  mention or an anaphora cue survive, shrinking the subsequent
  conv_id shuffle from "all turns" to "mention rows" (at 10^12-turn
  scale this is the difference between shuffling the corpus and
  shuffling a small fraction of it).
* :func:`assemble_conversation` — per-conversation ``map_groups``
  kernel: resolves anaphora (INDIRECT occurrences, reference doc
  example NamedEntityReferenceType.java:15-19), dedups occurrences
  (NamedEntity's SortedSet semantics, NamedEntity.java:147-149) and
  materializes (subj, pred, obj) triples.

Reference semantics preserved: DIRECT = surface form of name/alias
occurs in the turn (NamedEntityParser.java:195-201, generalized to
camelCase-aware token matching, see sources/gazetteer.py); INDIRECT =
anaphoric reference; occurrences are (turn, ref_type) pairs ordered by
(turn_idx, DIRECT<INDIRECT) (NamedEntity.java:192-198).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .. import schema
from ..sources.gazetteer import matcher_from_ref, tokenize

#: anaphora cue: the turn opens with a pronoun reference ("It is very big.")
_PRONOUN_RE = re.compile(r"^(?:It|This|They)\b")

#: per-process text -> (is_pronoun_cue, hits) memo, shared across batches;
#: valid only for one matcher (dictionary) — owner tracked alongside
_TEXT_MATCH_CACHE: dict[str, tuple[bool, tuple]] = {}
_TEXT_CACHE_OWNER: list = [None]

MENTION_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),  # hash(conv_id) % n_buckets — the shuffle key
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("pos", pa.int32()),  # token position of the match inside the turn
        ("entity_id", pa.string()),  # "" for pronoun-cue marker rows
        ("is_pronoun", pa.bool_()),
    ]
)


class MentionDetector:
    """Actor-pool ``map_batches`` stage: turns -> mention/pronoun-cue rows.

    The gazetteer index is built once per worker process from the
    broadcast ObjectRef (``__init__`` does the ray.get + index build;
    ``__call__`` only scans batches).  Emits a conv-hash ``bucket``
    column so the downstream shuffle groups by a few dozen buckets
    rather than one group per conversation (Ray's per-group dispatch
    overhead dominates with millions of tiny groups; the assembler
    iterates conversations inside each bucket instead).
    """

    def __init__(self, dict_ref, n_buckets: int = 64):
        from ..testdata import hash_u32

        self.matcher = matcher_from_ref(dict_ref)
        self.n_buckets = n_buckets
        self._hash = hash_u32
        self._bucket_cache: dict[str, int] = {}
        # matching is a pure function of (dictionary, turn text), and real
        # corpora repeat turns heavily (bench corpus: 84% duplicates) —
        # memoize (is_pronoun_cue, hits) per distinct text.  Module-level
        # so the cache survives across batches in a worker PROCESS (the
        # task variant constructs a fresh detector per batch); cleared
        # whenever the worker switches dictionaries.
        if _TEXT_CACHE_OWNER[0] is not self.matcher:
            _TEXT_MATCH_CACHE.clear()
            _TEXT_CACHE_OWNER[0] = self.matcher
        self._text_cache = _TEXT_MATCH_CACHE

    def _bucket(self, conv_id: str) -> int:
        b = self._bucket_cache.get(conv_id)
        if b is None:
            b = self._hash(conv_id) % self.n_buckets
            if len(self._bucket_cache) > 100_000:
                self._bucket_cache.clear()
            self._bucket_cache[conv_id] = b
        return b

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch["conv_id"].to_pylist()
        turn_idxs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        out_bucket: list[int] = []
        out_conv: list[str] = []
        out_turn: list[int] = []
        out_pos: list[int] = []
        out_eid: list[str] = []
        out_pron: list[bool] = []
        match_tokens = self.matcher.match_tokens
        cache = self._text_cache
        for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
            if text is None:
                continue
            cached = cache.get(text)
            if cached is None:
                is_pron = _PRONOUN_RE.match(text.lstrip()) is not None
                cached = (is_pron, tuple(match_tokens(tokenize(text))))
                if len(cache) > 500_000:
                    cache.clear()
                cache[text] = cached
            is_pron, hits = cached
            if is_pron:
                out_bucket.append(self._bucket(conv_id))
                out_conv.append(conv_id)
                out_turn.append(turn_idx)
                out_pos.append(-1)
                out_eid.append("")
                out_pron.append(True)
            for pos, eid in hits:
                out_bucket.append(self._bucket(conv_id))
                out_conv.append(conv_id)
                out_turn.append(turn_idx)
                out_pos.append(pos)
                out_eid.append(eid)
                out_pron.append(False)
        return pa.table(
            {
                "bucket": pa.array(out_bucket, pa.int32()),
                "conv_id": pa.array(out_conv, pa.string()),
                "turn_idx": pa.array(out_turn, pa.int32()),
                "pos": pa.array(out_pos, pa.int32()),
                "entity_id": pa.array(out_eid, pa.string()),
                "is_pronoun": pa.array(out_pron, pa.bool_()),
            },
            schema=MENTION_SCHEMA,
        )


def make_mention_detector(dict_ref, n_buckets: int = 64):
    """Plain-task variant of :class:`MentionDetector`.

    The matcher index is cached per worker process (matcher_from_ref),
    so stateless tasks get actor-pool-like amortization with fully
    elastic scheduling — no pool ramp-up, which dominates short jobs
    and hurts scaling efficiency.  Prefer the actor-pool class when the
    dictionary is huge enough that even one rebuild per process
    matters.
    """

    def detect(batch: pa.Table) -> pa.Table:
        return MentionDetector(dict_ref, n_buckets)(batch)

    return detect


def triples_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=schema.TRIPLES)


class TripleColumns:
    """Columnar triple-row builder (avoids millions of per-row dicts)."""

    __slots__ = ("subj", "pred", "obj", "conv_id", "turn_idx", "ref_type")

    def __init__(self):
        self.subj: list[str] = []
        self.pred: list[str] = []
        self.obj: list[str] = []
        self.conv_id: list[str] = []
        self.turn_idx: list[int | None] = []
        self.ref_type: list[str | None] = []

    def add(self, subj, pred, obj, conv_id, turn_idx=None, ref_type=None) -> None:
        self.subj.append(subj)
        self.pred.append(pred)
        self.obj.append(obj)
        self.conv_id.append(conv_id)
        self.turn_idx.append(turn_idx)
        self.ref_type.append(ref_type)

    def table(self) -> pa.Table:
        return pa.table(
            {
                "subj": pa.array(self.subj, pa.string()),
                "pred": pa.array(self.pred, pa.string()),
                "obj": pa.array(self.obj, pa.string()),
                "conv_id": pa.array(self.conv_id, pa.string()),
                "turn_idx": pa.array(self.turn_idx, pa.int32()),
                "ref_type": pa.array(self.ref_type, pa.string()),
            },
            schema=schema.TRIPLES,
        )


def _triple(subj, pred, obj, conv_id, turn_idx=None, ref_type=None) -> dict:
    return {
        "subj": subj,
        "pred": pred,
        "obj": obj,
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "ref_type": ref_type,
    }


_REF_RANK = {"DIRECT": 0, "INDIRECT": 1}


def _assemble_one(
    conv_id: str,
    rows_iter,  # iterable of (turn_idx, entity_id, is_pronoun), sorted
    matcher,
    out: "TripleColumns",
) -> None:
    """Assemble one conversation's mention rows into triples (appends)."""
    by_id = matcher.by_id
    occurrences: dict[str, set[tuple[int, str]]] = {}
    order: list[str] = []
    last_direct: str | None = None
    prev_turn: int | None = None
    pending_direct: str | None = None  # last DIRECT match of the current turn

    for turn_idx, eid, is_pron in rows_iter:
        if prev_turn is not None and turn_idx != prev_turn and pending_direct is not None:
            last_direct = pending_direct
            pending_direct = None
        prev_turn = turn_idx
        if is_pron:
            # anaphora: attribute to the most recent DIRECT entity of EARLIER turns
            if last_direct is not None:
                occurrences.setdefault(last_direct, set()).add((turn_idx, "INDIRECT"))
                if last_direct not in order:
                    order.append(last_direct)
            continue
        if eid not in occurrences:
            occurrences[eid] = set()
            order.append(eid)
        occurrences[eid].add((turn_idx, "DIRECT"))
        pending_direct = eid

    add = out.add
    for eid in order:
        row = by_id.get(eid)
        if row is None:
            continue
        name, etype = row["canonical_name"], row["type"]
        add(name, "hasType", etype, conv_id)
        add(name, "mentionedIn", conv_id, conv_id)
        # dictionary alias edges are ENTITY-scoped, not conversation-scoped:
        # emitted once globally by alias_interface_edges() — repeating them
        # per conversation multiplied triple volume ~40% for zero information
        for turn, ref in sorted(occurrences[eid], key=lambda o: (o[0], _REF_RANK[o[1]])):
            add(name, "occursIn", f"{conv_id}#{turn}", conv_id, turn, ref)
        for _iid, iface_name in sorted(
            matcher.interfaces_of.get(eid, []), key=lambda t: t[1]
        ):
            add(name, "hasInterface", iface_name, conv_id)


def make_conversation_assembler(dict_ref):
    """Bucket-group ``map_groups`` kernel: each group holds MANY
    conversations (one conv-hash bucket); the kernel sorts by
    (conv_id, turn_idx, pos) and walks conversation runs — Ray-level
    group dispatch stays O(buckets), conversation iteration is a tight
    in-process loop."""

    def assemble(group: pa.Table) -> pa.Table:
        matcher = matcher_from_ref(dict_ref)
        group = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending"), ("pos", "ascending")]
        )
        conv_ids = group["conv_id"].to_pylist()
        turn_idxs = group["turn_idx"].to_pylist()
        entity_ids = group["entity_id"].to_pylist()
        pronouns = group["is_pronoun"].to_pylist()

        out = TripleColumns()
        i, n = 0, len(conv_ids)
        while i < n:
            j = i
            conv_id = conv_ids[i]
            while j < n and conv_ids[j] == conv_id:
                j += 1
            _assemble_one(
                conv_id,
                zip(turn_idxs[i:j], entity_ids[i:j], pronouns[i:j]),
                matcher,
                out,
            )
            i = j
        return out.table()

    return assemble
