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

import numpy as np
import pyarrow as pa
import pyarrow.compute as _pc

from .. import schema
from ..sources.gazetteer import matcher_from_ref, tokenize

#: anaphora cue: the turn opens with a pronoun reference ("It is very big.")
_PRONOUN_RE = re.compile(r"^(?:It|This|They)\b")

#: per-process text -> (pos_array, eid_code_array) memo, shared across
#: batches; valid only for one matcher (dictionary) — owner tracked
#: alongside.  Entry layout: pronoun marker (pos=-1, code=-1) first,
#: then hits in match order.
_TEXT_MATCH_CACHE: dict[str, tuple] = {}
_TEXT_CACHE_OWNER: list = [None]

MENTION_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),  # hash(conv_id) % n_buckets — the shuffle key
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("pos", pa.int32()),  # token position of the match inside the turn
        # dense matcher code (gazetteer.GazetteerMatcher.eid_index —
        # identical across workers); -1 marks pronoun-cue rows.  Codes
        # instead of eid strings cut the shuffled bytes ~45%.
        ("eid_code", pa.int32()),
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

    def _text_entry(self, text: str):
        """(pos_array, eidcode_array) for one text — pronoun marker
        (pos=-1, code=-1) first, then hits in match order (the exact
        emission order of the original row loop)."""
        cache = self._text_cache
        entry = cache.get(text)
        if entry is None:
            eid_index = self.matcher.eid_index
            is_pron = _PRONOUN_RE.match(text.lstrip()) is not None
            hits = self.matcher.match_tokens(tokenize(text))
            pos = [-1] if is_pron else []
            code = [-1] if is_pron else []
            for p, eid in hits:
                pos.append(p)
                code.append(eid_index[eid])
            entry = (np.array(pos, np.int32), np.array(code, np.int32))
            if len(cache) > 500_000:
                cache.clear()
            cache[text] = entry
        return entry

    def __call__(self, batch: pa.Table) -> pa.Table:
        tcol = batch["text"]
        if tcol.null_count:
            batch = batch.filter(_pc.is_valid(batch["text"]))
            tcol = batch["text"]
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {f.name: pa.array([], f.type) for f in MENTION_SCHEMA},
                schema=MENTION_SCHEMA,
            )
        enc = tcol.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy()
        uniq = enc.dictionary

        # vectorized hits over the block's distinct texts (the Python
        # per-text walk at ~15us/text dominated this stage; the batch
        # matcher is its conformance-tested numpy twin)
        hit_counts, hpos, hcode = self.matcher.match_batch(uniq)
        pron_flags = np.fromiter(
            (_PRONOUN_RE.match(t.lstrip()) is not None for t in uniq.to_pylist()),
            bool,
            len(uniq),
        )
        counts = hit_counts + pron_flags
        if counts.sum() == 0:
            return pa.table(
                {f.name: pa.array([], f.type) for f in MENTION_SCHEMA},
                schema=MENTION_SCHEMA,
            )
        # merge the pronoun marker (pos=-1, code=-1) ahead of each text's
        # hits — the exact per-text entry layout of the original walk
        total = int(counts.sum())
        flat_pos = np.empty(total, np.int32)
        flat_code = np.empty(total, np.int32)
        u_start = np.cumsum(counts) - counts
        pron_idx = np.flatnonzero(pron_flags)
        flat_pos[u_start[pron_idx]] = -1
        flat_code[u_start[pron_idx]] = -1
        tgt = np.repeat(u_start + pron_flags, hit_counts) + _ranges(hit_counts)
        flat_pos[tgt] = hpos
        flat_code[tgt] = hcode

        total_per_row = counts[codes]
        row_idx = np.repeat(np.arange(n, dtype=np.int64), total_per_row)
        within = _ranges(total_per_row)
        flat_idx = u_start[codes[row_idx]] + within
        pos_col = flat_pos[flat_idx]
        code_col = flat_code[flat_idx]
        pron_col = code_col < 0

        row_idx_pa = pa.array(row_idx, pa.int64())
        conv_col = batch["conv_id"].combine_chunks()
        cenc = conv_col.dictionary_encode()
        ubuckets = np.array(
            [self._bucket(c) for c in cenc.dictionary.to_pylist()], np.int32
        )
        bucket_col = ubuckets[cenc.indices.to_numpy()][row_idx]

        return pa.table(
            {
                "bucket": pa.array(bucket_col, pa.int32()),
                "conv_id": conv_col.take(row_idx_pa),
                "turn_idx": _pc.cast(
                    batch["turn_idx"].combine_chunks().take(row_idx_pa), pa.int32()
                ),
                "pos": pa.array(pos_col, pa.int32()),
                "eid_code": pa.array(code_col, pa.int32()),
                "is_pronoun": pa.array(pron_col, pa.bool_()),
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


def make_conversation_assembler(dict_ref, impl: str = "vector"):
    """Bucket-group ``map_groups`` kernel: each group holds MANY
    conversations (one conv-hash bucket); the kernel sorts by
    (conv_id, turn_idx, pos) and processes conversation runs — Ray-level
    group dispatch stays O(buckets).

    impl="vector" (default) is the numpy kernel (~4x the row-loop
    throughput; assemble was ~40% of pipeline CPU); impl="python" is
    the original per-conversation walk, kept as the semantics
    reference — tests assert table-identical output on every corpus.
    """

    def assemble_python(group: pa.Table) -> pa.Table:
        matcher = matcher_from_ref(dict_ref)
        group = group.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending"),
             ("pos", "ascending"), ("eid_code", "ascending")]
        )
        conv_ids = group["conv_id"].to_pylist()
        turn_idxs = group["turn_idx"].to_pylist()
        eids = matcher.eids
        entity_ids = [
            eids[c] if 0 <= c < len(eids) else ("" if c < 0 else f"__ghost_{c}__")
            for c in group["eid_code"].to_pylist()
        ]
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

    def assemble_vector(group: pa.Table) -> pa.Table:
        matcher = matcher_from_ref(dict_ref)
        return _assemble_vectorized(group, matcher)

    return assemble_vector if impl == "vector" else assemble_python


_EMPTY_TRIPLES = None


def _empty_triples() -> pa.Table:
    global _EMPTY_TRIPLES
    if _EMPTY_TRIPLES is None:
        _EMPTY_TRIPLES = TripleColumns().table()
    return _EMPTY_TRIPLES


def _matcher_lookup_arrays(matcher):
    """Per-matcher cached code-indexed lookup arrays (built once per
    worker): Arrow name/type pools, flattened sorted interface names
    with per-code offsets."""
    cache = getattr(matcher, "_vec_lookup", None)
    if cache is None:
        by_id = matcher.by_id
        eids = matcher.eids
        names_pa = pa.array(
            [by_id[e]["canonical_name"] for e in eids], pa.string()
        )
        types_pa = pa.array([by_id[e]["type"] for e in eids], pa.string())
        if_lists = [
            [nm for _iid, nm in sorted(matcher.interfaces_of.get(e, []), key=lambda t: t[1])]
            for e in eids
        ]
        if_counts = np.array([len(l) for l in if_lists], dtype=np.int64)
        if_starts = np.cumsum(if_counts) - if_counts
        if_flat_pa = pa.array([nm for l in if_lists for nm in l], pa.string())
        cache = (names_pa, types_pa, if_counts, if_starts, if_flat_pa)
        matcher._vec_lookup = cache
    return cache


def _assemble_vectorized(group: pa.Table, matcher) -> pa.Table:
    """Numpy twin of :func:`_assemble_one` over a whole bucket.

    Anaphora resolution without the row loop: rows sorted by
    (conv, turn, pos); per (conv, turn) group take the LAST direct
    row's index (``np.maximum.reduceat``), running-max it across turn
    groups shifted by one turn (``pending_direct`` promotes only at a
    turn boundary — extract.py:227-230), and validate the candidate
    belongs to the same conversation (row indices grow monotonically,
    so a leaked index from an earlier conversation fails the
    conv-equality check exactly when the reference walk would have had
    ``last_direct is None``).
    """
    import pandas as pd

    # eid_code tiebreak: two entities CAN match at the same (turn, pos)
    # (equal-span ambiguous surfaces); without it their first-appearance
    # order — and hence output row order — would depend on partition
    # layout, breaking byte-identical resume
    group = group.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"),
         ("pos", "ascending"), ("eid_code", "ascending")]
    )
    n = group.num_rows
    if n == 0:
        return _empty_triples()

    conv_codes, conv_uniq = pd.factorize(
        group["conv_id"].to_pandas(), sort=False
    )
    conv_uniq = np.asarray(conv_uniq, dtype=object)
    eid_codes = group["eid_code"].to_numpy().astype(np.int64, copy=False)
    turn = group["turn_idx"].to_numpy().astype(np.int64, copy=False)
    pron = group["is_pronoun"].to_numpy(zero_copy_only=False).astype(bool, copy=False)
    idx = np.arange(n, dtype=np.int64)

    # ---- anaphora: last DIRECT entity of earlier turns, same conv ----
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = (conv_codes[1:] != conv_codes[:-1]) | (turn[1:] != turn[:-1])
    turn_group = np.cumsum(first) - 1
    starts = np.flatnonzero(first)
    per_turn_last = np.maximum.reduceat(np.where(~pron, idx, -1), starts)
    runmax = np.maximum.accumulate(per_turn_last)
    pending = np.empty_like(runmax)
    pending[0] = -1
    pending[1:] = runmax[:-1]
    last_idx = pending[turn_group]

    pron_rows = np.flatnonzero(pron)
    li = last_idx[pron_rows]
    ok = li >= 0
    li, pron_rows = li[ok], pron_rows[ok]
    ok = conv_codes[li] == conv_codes[pron_rows]
    li, pron_rows = li[ok], pron_rows[ok]

    # ---- occurrence set: dedup (conv, eid, turn, ref) ----
    d_rows = np.flatnonzero(~pron)
    oc = np.concatenate([conv_codes[d_rows], conv_codes[pron_rows]])
    oe = np.concatenate([eid_codes[d_rows], eid_codes[li]])
    ot = np.concatenate([turn[d_rows], turn[pron_rows]])
    orf = np.concatenate(
        [np.zeros(len(d_rows), np.int8), np.ones(len(pron_rows), np.int8)]
    )
    order_occ = np.lexsort((orf, ot, oe, oc))
    oc, oe, ot, orf = oc[order_occ], oe[order_occ], ot[order_occ], orf[order_occ]
    keep = np.empty(len(oc), dtype=bool)
    if len(oc):
        keep[0] = True
        keep[1:] = (
            (oc[1:] != oc[:-1])
            | (oe[1:] != oe[:-1])
            | (ot[1:] != ot[:-1])
            | (orf[1:] != orf[:-1])
        )
    oc, oe, ot, orf = oc[keep], oe[keep], ot[keep], orf[keep]

    # ---- first-appearance rank of each (conv, entity) pair ----
    dc, de = conv_codes[d_rows], eid_codes[d_rows]
    M = np.int64(max(len(matcher.eids), int(eid_codes.max()) + 1 if n else 1) + 1)
    pair_key_all = dc.astype(np.int64) * M + de
    first_pair = ~pd.Series(pair_key_all).duplicated().to_numpy()
    fc, fe = dc[first_pair], de[first_pair]
    # rows are conv-sorted and index-ascending, so fc is non-decreasing
    # and within-conv order IS first-appearance order
    n_pairs = len(fc)
    conv_first = np.empty(n_pairs, dtype=bool)
    if n_pairs:
        conv_first[0] = True
        conv_first[1:] = fc[1:] != fc[:-1]
    seg_start = np.maximum.accumulate(
        np.where(conv_first, np.arange(n_pairs, dtype=np.int64), 0)
    )
    rank = np.arange(n_pairs, dtype=np.int64) - seg_start
    pair_key = fc.astype(np.int64) * M + fe
    key_order = np.argsort(pair_key, kind="stable")
    sorted_keys = pair_key[key_order]
    sorted_rank = rank[key_order]

    def rank_of(c, e):
        pos = np.searchsorted(sorted_keys, c.astype(np.int64) * M + e)
        return sorted_rank[pos]

    # ---- dictionary lookups (eid code -> name/type/interfaces) ----
    # Strings stay in Arrow pools; every large column below is built by
    # pa.Array.take over small pools with int code arrays — no Python
    # objects travel through the hot path (the first version used
    # object-dtype np arrays and was no faster than the row loop).
    # Pools are code-indexed and cached per matcher (built once per
    # worker, _matcher_lookup_arrays).
    names_pa, types_pa, if_counts, if_starts, if_flat_pa = _matcher_lookup_arrays(
        matcher
    )
    n_known = len(matcher.eids)
    conv_pa = pa.array(conv_uniq, pa.string())

    # emission-filtered views (codes outside the dictionary — possible
    # only for hand-built mention tables — are skipped like the Python
    # walk skips eids missing from by_id)
    pe_keep = (fe >= 0) & (fe < n_known)
    pc_, pe = fc[pe_keep], fe[pe_keep]
    oc_keep = (oe >= 0) & (oe < n_known)
    oc2, oe2, ot2, orf2 = oc[oc_keep], oe[oc_keep], ot[oc_keep], orf[oc_keep]
    # interface rows: one per (pair, iface)
    pif_counts = if_counts[pe]
    ic = np.repeat(pc_, pif_counts)
    ie = np.repeat(pe, pif_counts)
    ipos = _ranges(pif_counts)
    if_take = np.repeat(if_starts[pe], pif_counts) + ipos

    # ---- build all rows + one global ordering sort ----
    np_ = len(pc_)
    no = len(oc2)
    ni = len(ic)
    k_conv = np.concatenate([pc_, pc_, oc2, ic])
    k_rank = np.concatenate([rank_of(pc_, pe)] * 2 + [rank_of(oc2, oe2), rank_of(ic, ie)])
    k_kind = np.concatenate(
        [
            np.zeros(np_, np.int8),
            np.full(np_, 1, np.int8),
            np.full(no, 2, np.int8),
            np.full(ni, 3, np.int8),
        ]
    )
    zero_p = np.zeros(np_, np.int64)
    k_turn = np.concatenate([zero_p, zero_p, ot2, np.zeros(ni, np.int64)])
    k_ref = np.concatenate(
        [np.zeros(np_, np.int8), np.zeros(np_, np.int8), orf2, np.zeros(ni, np.int8)]
    )
    k_pos = np.concatenate([zero_p, zero_p, np.zeros(no, np.int64), ipos])
    final = np.lexsort((k_pos, k_ref, k_turn, k_kind, k_rank, k_conv))
    final_pa = pa.array(final, pa.int64())

    occ_obj = _pc.binary_join_element_wise(
        conv_pa.take(pa.array(oc2, pa.int64())),
        _pc.cast(pa.array(ot2, pa.int64()), pa.string()),
        "#",
    )

    subj_codes = np.concatenate([pe, pe, oe2, ie])
    subj_col = names_pa.take(pa.array(subj_codes, pa.int64())).take(final_pa)
    pred_col = pa.array(
        ["hasType", "mentionedIn", "occursIn", "hasInterface"], pa.string()
    ).take(pa.array(k_kind[final].astype(np.int64)))
    obj_col = _pa_concat(
        [
            types_pa.take(pa.array(pe, pa.int64())),
            conv_pa.take(pa.array(pc_, pa.int64())),
            occ_obj,
            if_flat_pa.take(pa.array(if_take, pa.int64())),
        ]
    ).take(final_pa)
    conv_col = conv_pa.take(pa.array(k_conv[final], pa.int64()))
    turn_sorted = k_turn[final]
    is_occ = k_kind[final] == 2
    ref_col = pa.array([None, "DIRECT", "INDIRECT"], pa.string()).take(
        pa.array(np.where(is_occ, k_ref[final].astype(np.int64) + 1, 0))
    )
    return pa.table(
        {
            "subj": subj_col,
            "pred": pred_col,
            "obj": obj_col,
            "conv_id": conv_col,
            "turn_idx": pa.array(
                np.where(is_occ, turn_sorted, -1), pa.int32(), mask=~is_occ
            ),
            "ref_type": ref_col,
        },
        schema=schema.TRIPLES,
    )


def _pa_concat(arrays):
    """concat possibly-chunked string arrays into one Array."""
    flat = []
    for a in arrays:
        if isinstance(a, pa.ChunkedArray):
            flat.extend(a.chunks)
        else:
            flat.append(a)
    return pa.concat_arrays(flat)


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3,0,2] -> [0,1,2,0,1] (position within each repeated segment)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts_at = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts_at, counts)
