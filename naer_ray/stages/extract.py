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

MENTION_SCHEMA = pa.schema(
    [
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
    ``__call__`` only scans batches).
    """

    def __init__(self, dict_ref):
        self.matcher = matcher_from_ref(dict_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch["conv_id"].to_pylist()
        turn_idxs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        out_conv: list[str] = []
        out_turn: list[int] = []
        out_pos: list[int] = []
        out_eid: list[str] = []
        out_pron: list[bool] = []
        match_tokens = self.matcher.match_tokens
        for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
            if text is None:
                continue
            if _PRONOUN_RE.match(text.lstrip()):
                out_conv.append(conv_id)
                out_turn.append(turn_idx)
                out_pos.append(-1)
                out_eid.append("")
                out_pron.append(True)
            for pos, eid in match_tokens(tokenize(text)):
                out_conv.append(conv_id)
                out_turn.append(turn_idx)
                out_pos.append(pos)
                out_eid.append(eid)
                out_pron.append(False)
        return pa.table(
            {
                "conv_id": pa.array(out_conv, pa.string()),
                "turn_idx": pa.array(out_turn, pa.int32()),
                "pos": pa.array(out_pos, pa.int32()),
                "entity_id": pa.array(out_eid, pa.string()),
                "is_pronoun": pa.array(out_pron, pa.bool_()),
            },
            schema=MENTION_SCHEMA,
        )


def triples_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=schema.TRIPLES)


def _triple(subj, pred, obj, conv_id, turn_idx=None, ref_type=None) -> dict:
    return {
        "subj": subj,
        "pred": pred,
        "obj": obj,
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "ref_type": ref_type,
    }


def make_conversation_assembler(dict_ref):
    """Build the per-conversation ``map_groups`` kernel (closure over the
    broadcast dictionary ref; the matcher is cached per worker)."""

    def assemble(group: pa.Table) -> pa.Table:
        matcher = matcher_from_ref(dict_ref)
        by_id = matcher.by_id
        group = group.sort_by([("turn_idx", "ascending"), ("pos", "ascending")])
        conv_id = group["conv_id"][0].as_py()
        turn_idxs = group["turn_idx"].to_pylist()
        entity_ids = group["entity_id"].to_pylist()
        pronouns = group["is_pronoun"].to_pylist()

        # entity -> set of (turn, ref_type); insertion order of first sighting
        occurrences: dict[str, set[tuple[int, str]]] = {}
        order: list[str] = []
        last_direct: str | None = None
        prev_turn: int | None = None
        pending_direct: str | None = None  # last DIRECT match of the current turn

        def flush_turn():
            nonlocal last_direct, pending_direct
            if pending_direct is not None:
                last_direct = pending_direct
                pending_direct = None

        for turn_idx, eid, is_pron in zip(turn_idxs, entity_ids, pronouns):
            if prev_turn is not None and turn_idx != prev_turn:
                flush_turn()
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
        flush_turn()

        ref_rank = {"DIRECT": 0, "INDIRECT": 1}
        rows: list[dict] = []
        for eid in order:
            row = by_id.get(eid)
            if row is None:
                continue
            name, etype = row["canonical_name"], row["type"]
            rows.append(_triple(name, "hasType", etype, conv_id))
            rows.append(_triple(name, "mentionedIn", conv_id, conv_id))
            for alias in sorted(row.get("aliases") or []):
                rows.append(_triple(name, "hasAlternativeName", alias, conv_id))
            for turn, ref in sorted(occurrences[eid], key=lambda o: (o[0], ref_rank[o[1]])):
                rows.append(
                    _triple(name, "occursIn", f"{conv_id}#{turn}", conv_id, turn, ref)
                )
            for _iid, iface_name in sorted(
                matcher.interfaces_of.get(eid, []), key=lambda t: t[1]
            ):
                rows.append(_triple(name, "hasInterface", iface_name, conv_id))
        return triples_table(rows)

    return assemble
