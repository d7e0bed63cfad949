"""Entity dictionary (gazetteer) source + token-n-gram matcher.

The reference injects a ``Map<type, Set<name>>`` of candidate entity
names into recognition (NamedEntityRecognizer.java:95-98, Prompt.java:56-85,
loaded from CSV in GoldstandardParser.java:65-114).  Here the gazetteer
is a small dimension table broadcast once via ``ray.put`` and expanded
into a token-n-gram index inside each worker (built once per process,
cached by ObjectRef — the actor-pool / broadcast-small-side pattern).

Matching semantics (engine-native, per the north star's
camelCase/abbreviation normalization): a dictionary surface form
(canonical name or alias) matches a turn iff its normalized token
sequence appears as a contiguous token n-gram of the turn's normalized
tokens, where normalization = word tokens, camelCase-split, lowercased.
This generalizes the reference's case-insensitive substring rule
(NamedEntityParser.java:195-201) to word-boundary safety at corpus
scale ("Persistence" still matches "PersistenceProvider" because the
camel split exposes the token).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..names import camel_split

_WORD_RE = re.compile(r"[A-Za-z0-9]+")

# token -> camel-split lowercase parts; corpus vocabularies are small and
# repeat heavily, so memoizing the split removes the regex from the hot loop
_TOKEN_CACHE: dict[str, tuple[str, ...]] = {}


def _split_token(tok: str) -> tuple[str, ...]:
    parts = _TOKEN_CACHE.get(tok)
    if parts is None:
        parts = tuple(p.lower() for p in camel_split(tok))
        if len(_TOKEN_CACHE) > 500_000:
            _TOKEN_CACHE.clear()
        _TOKEN_CACHE[tok] = parts
    return parts


def tokenize(text: str) -> list[str]:
    """Word tokens, camelCase-split, lowercased: 'the PersistenceProvider' -> ['the','persistence','provider']."""
    out: list[str] = []
    for tok in _WORD_RE.findall(text):
        out.extend(_split_token(tok))
    return out


def load_dictionary_rows(path: str) -> list[dict]:
    """Read entity_dictionary.parquet into plain rows (small side, driver-side)."""
    return pq.read_table(path).to_pylist()


def read_gazetteer_csv(
    path: str, entity_type: str = "COMPONENT", id_prefix: str = ""
) -> list[dict]:
    """modelElementID_to_ComponentName.csv -> dictionary rows (reference S5).

    GoldstandardParser.parsePossibleComponents:92-114: skip header,
    column 2 is the component name, blanks dropped; names dedup into a
    sorted set.  Small side — plain csv module, returned as the
    broadcastable dictionary-row list.
    """
    import csv

    rows: list[dict] = []
    seen: set[str] = set()
    with open(path, encoding="utf-8") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        for parts in reader:
            if len(parts) >= 2 and parts[1].strip():
                name = parts[1].strip()
                if name in seen:
                    continue
                seen.add(name)
                rows.append(
                    {
                        "entity_id": f"{id_prefix}{parts[0].strip()}",
                        "canonical_name": name,
                        "type": entity_type,
                        "aliases": [],
                        "interface_of": None,
                    }
                )
    rows.sort(key=lambda r: r["canonical_name"])
    return rows


class GazetteerMatcher:
    """Token-n-gram index over dictionary surface forms; built once per worker."""

    def __init__(self, rows: list[dict]):
        self.by_id: dict[str, dict] = {}
        self.index: dict[tuple[str, ...], list[str]] = {}
        self.interfaces_of: dict[str, list[tuple[str, str]]] = {}
        lengths: set[int] = set()
        for row in sorted(rows, key=lambda r: r["entity_id"]):
            eid = row["entity_id"]
            self.by_id[eid] = row
            if row["type"] == "INTERFACE" and row.get("interface_of"):
                self.interfaces_of.setdefault(row["interface_of"], []).append(
                    (eid, row["canonical_name"])
                )
            surfaces = [row["canonical_name"], *(row.get("aliases") or [])]
            for surface in surfaces:
                key = tuple(tokenize(surface))
                if not key:
                    continue
                lengths.add(len(key))
                ids = self.index.setdefault(key, [])
                if eid not in ids:
                    ids.append(eid)
        self.lengths = sorted(lengths, reverse=True)
        # stable dense entity codes: by_id insertion is sorted by eid,
        # so code i -> eids[i] is IDENTICAL in every worker process —
        # the mention shuffle ships int32 codes instead of eid strings
        self.eids: list[str] = list(self.by_id)
        self.eid_index: dict[str, int] = {e: i for i, e in enumerate(self.eids)}
        # first-token index: one dict probe per turn position instead of
        # one per (position x surface-length); candidates longest-first
        self.by_first: dict[str, list[tuple[int, tuple[str, ...], list[str]]]] = {}
        for key, ids in self.index.items():
            self.by_first.setdefault(key[0], []).append((len(key), key, ids))
        for cands in self.by_first.values():
            cands.sort(key=lambda t: (-t[0], t[1]))

    def match_tokens(self, tokens: list[str]) -> list[tuple[int, str]]:
        """(token_pos, entity_id) n-gram hits with longest-match suppression.

        A hit whose token span is strictly contained in a longer kept
        hit's span is dropped ("AuthService" does not fire inside
        "AuthServiceCore"); equal spans (ambiguous surfaces) all survive.
        """
        raw: list[tuple[int, int, str]] = []  # (start, n, entity_id)
        nt = len(tokens)
        by_first = self.by_first
        for i, tok in enumerate(tokens):
            cands = by_first.get(tok)
            if cands is None:
                continue
            for n, key, ids in cands:
                if n == 1 or (i + n <= nt and tuple(tokens[i : i + n]) == key):
                    raw.extend((i, n, eid) for eid in ids)
        if not raw:
            return []
        kept_spans: list[tuple[int, int, int]] = []  # (start, end, n)
        hits: list[tuple[int, str]] = []
        for start, n, eid in sorted(raw, key=lambda t: (-t[1], t[0], t[2])):
            end = start + n
            if any(ks <= start and end <= ke and kn > n for ks, ke, kn in kept_spans):
                continue
            kept_spans.append((start, end, n))
            hits.append((start, eid))
        hits.sort(key=lambda h: h[0])
        return hits

    def match_text(self, text: str) -> list[tuple[int, str]]:
        return self.match_tokens(tokenize(text))

    # --- vectorized batch matcher -----------------------------------------
    #
    # match_tokens above is the per-text semantics reference; match_batch
    # is its numpy twin over a whole Arrow string array (the detect hot
    # path runs ~35k near-distinct texts per block, and the Python walk's
    # ~15us/text dominated the stage).  Token split runs in Arrow C++,
    # camelCase-split runs once per VOCAB token (not per occurrence),
    # n-gram surfaces become packed int64 keys matched via searchsorted,
    # and longest-match suppression becomes a windowed cumsum check.
    # tests/test_match_batch.py asserts hit-set equality vs match_tokens
    # on the corpus and on adversarial random texts.

    def match_batch(self, texts: "pa.Array"):
        """Vectorized hits for a batch of non-null texts.

        Returns ``(hit_counts, flat_pos, flat_code)``: per-text hit
        counts (int64, len(texts)), and the concatenated (token_pos,
        eid_code) hit arrays ordered by (text, pos, eid_code) — the
        exact (pos, eid) set and order of the per-text walk (same-pos
        kept hits always share a span length, so the walk's
        longest-first ordering reduces to eid order; assemble re-sorts
        by (conv, turn, pos, eid_code) regardless).
        """
        n_texts = len(texts)
        empty = (
            np.zeros(n_texts, np.int64),
            np.empty(0, np.int32),
            np.empty(0, np.int32),
        )
        if n_texts == 0:
            return empty
        norm_counts, stream, vocab = _tokenize_batch(texts)
        total = int(len(stream))
        if total == 0 or not self.lengths:
            return empty
        V = max(len(vocab), 1)
        max_n = self.lengths[0]
        if max_n > 8 or float(V) ** max_n >= float(2**62):
            return self._match_batch_fallback(texts, norm_counts)

        # surface tables per n-gram length, in this batch's code space
        # (a surface with any token absent from the batch vocab cannot
        # match); keys are unique per length by construction of index
        tabs: dict[int, list[tuple[int, list[int]]]] = {}
        eid_index = self.eid_index
        for key, ids in self.index.items():
            packed = 0
            for t in key:
                c = vocab.get(t)
                if c is None:
                    packed = -1
                    break
                packed = packed * V + c
            if packed < 0:
                continue
            tabs.setdefault(len(key), []).append(
                (packed, [eid_index[e] for e in ids])
            )
        if not tabs:
            return empty

        within = _ranges(norm_counts)
        tlen_rep = np.repeat(norm_counts, norm_counts)
        text_of = np.repeat(np.arange(n_texts, dtype=np.int64), norm_counts)
        text_start = np.cumsum(norm_counts) - norm_counts

        k = stream.astype(np.int64, copy=False)
        keys_by_n: dict[int, np.ndarray] = {1: k}
        prev = k
        for nn in range(2, max_n + 1):
            prev = prev[:-1] * V + k[nn - 1 :]
            keys_by_n[nn] = prev

        # raw hits per length: starts into the stream + surface row ids
        hit_starts: dict[int, np.ndarray] = {}
        hit_sid: dict[int, np.ndarray] = {}
        surf_eids: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        present = sorted(tabs)
        for nn in present:
            entries = tabs[nn]
            entries.sort(key=lambda t: t[0])
            skeys = np.array([e[0] for e in entries], np.int64)
            counts = np.array([len(e[1]) for e in entries], np.int64)
            offs = np.cumsum(counts) - counts
            flat = np.array(
                [c for e in entries for c in e[1]], np.int64
            )
            surf_eids[nn] = (counts, offs, flat)
            L = total - nn + 1
            if L <= 0:
                hit_starts[nn] = np.empty(0, np.int64)
                hit_sid[nn] = np.empty(0, np.int64)
                continue
            valid = within[:L] + nn <= tlen_rep[:L]
            cand = np.flatnonzero(valid)
            ck = keys_by_n[nn][cand]
            loc = np.searchsorted(skeys, ck)
            np.clip(loc, 0, len(skeys) - 1, out=loc)
            hit = skeys[loc] == ck
            hit_starts[nn] = cand[hit]
            hit_sid[nn] = loc[hit]

        # longest-match suppression: a hit (s, n) is dropped iff ANY raw
        # hit (s', l>n) spans it (s' <= s, s+n <= s'+l); equivalent to the
        # walk's kept-longer-span rule by induction on length.  Windowed
        # existence check via cumsum over per-length start flags.
        cums: dict[int, np.ndarray] = {}
        for nn in present:
            S = np.zeros(total + 1, np.int64)
            if len(hit_starts[nn]):
                flags = np.zeros(total, bool)
                flags[hit_starts[nn]] = True
                S[1:] = np.cumsum(flags)
            cums[nn] = S

        out_pos_stream: list[np.ndarray] = []
        out_codes: list[np.ndarray] = []
        for nn in present:
            starts = hit_starts[nn]
            if not len(starts):
                continue
            dropped = np.zeros(len(starts), bool)
            for ll in present:
                if ll <= nn:
                    continue
                C = cums[ll]
                a = np.maximum(starts + nn - ll, 0)
                dropped |= (C[starts + 1] - C[a]) > 0
            keep = ~dropped
            starts_k = starts[keep]
            sid_k = hit_sid[nn][keep]
            counts, offs, flat = surf_eids[nn]
            ec = counts[sid_k]
            out_pos_stream.append(np.repeat(starts_k, ec))
            out_codes.append(flat[np.repeat(offs[sid_k], ec) + _ranges(ec)])

        if not out_pos_stream:
            return empty
        all_stream = np.concatenate(out_pos_stream)
        all_codes = np.concatenate(out_codes)
        tx = text_of[all_stream]
        pos = all_stream - text_start[tx]
        order = np.lexsort((all_codes, pos, tx))
        hit_counts = np.bincount(tx, minlength=n_texts).astype(np.int64)
        return (
            hit_counts,
            pos[order].astype(np.int32),
            all_codes[order].astype(np.int32),
        )

    def _match_batch_fallback(self, texts: "pa.Array", norm_counts=None):
        """Per-text reference walk (packing-overflow guard path)."""
        pos_parts: list[np.ndarray] = []
        code_parts: list[np.ndarray] = []
        hit_counts = np.zeros(len(texts), np.int64)
        eid_index = self.eid_index
        for i, t in enumerate(texts.to_pylist()):
            hits = self.match_tokens(tokenize(t))
            hit_counts[i] = len(hits)
            if hits:
                pos_parts.append(np.array([h[0] for h in hits], np.int32))
                code_parts.append(
                    np.array([eid_index[h[1]] for h in hits], np.int32)
                )
        if not pos_parts:
            return hit_counts, np.empty(0, np.int32), np.empty(0, np.int32)
        return hit_counts, np.concatenate(pos_parts), np.concatenate(code_parts)


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3,0,2] -> [0,1,2,0,1] (position within each repeated segment)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    starts_at = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts_at, counts)


def _tokenize_batch(texts: "pa.Array"):
    """Vectorized :func:`tokenize` over a batch of non-null texts.

    Word split runs in Arrow C++ (same [A-Za-z0-9]+ token rule as
    _WORD_RE, expressed as a split on the complement), camelCase-split
    runs once per distinct RAW token (the batch vocabulary, via the
    memoized _split_token), and the normalized token stream is expanded
    with CSR arithmetic.  Returns ``(norm_counts, stream, vocab)``:
    per-text normalized-token counts (int64), the concatenated
    normalized-token code stream (int64), and the code vocabulary
    ``{normalized_token: code}``.
    """
    n = len(texts)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(texts, pattern="[^A-Za-z0-9]+")
    flat = pc.list_flatten(toks)
    raw_counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    text_ids = np.repeat(np.arange(n, dtype=np.int64), raw_counts)
    nonempty = pc.greater(pc.binary_length(flat), 0)
    mask = nonempty.to_numpy(zero_copy_only=False)
    flat = flat.filter(nonempty)
    text_ids = text_ids[mask]
    if len(flat) == 0:
        return np.zeros(n, np.int64), np.empty(0, np.int64), {}
    enc = flat.dictionary_encode()
    raw_codes = enc.indices.to_numpy().astype(np.int64, copy=False)
    raw_vocab = enc.dictionary.to_pylist()
    vocab: dict[str, int] = {}
    parts_counts = np.empty(len(raw_vocab), np.int64)
    parts_flat_list: list[int] = []
    for v, tok in enumerate(raw_vocab):
        parts = _split_token(tok)
        parts_counts[v] = len(parts)
        for p in parts:
            c = vocab.get(p)
            if c is None:
                c = len(vocab)
                vocab[p] = c
            parts_flat_list.append(c)
    parts_flat = np.asarray(parts_flat_list, np.int64)
    parts_offsets = np.cumsum(parts_counts) - parts_counts
    tok_counts = parts_counts[raw_codes]
    idx = np.repeat(parts_offsets[raw_codes], tok_counts) + _ranges(tok_counts)
    stream = parts_flat[idx]
    stream_text = np.repeat(text_ids, tok_counts)
    norm_counts = np.bincount(stream_text, minlength=n).astype(np.int64)
    return norm_counts, stream, vocab


# --- per-worker broadcast cache ------------------------------------------------

_MATCHER_CACHE: dict[str, GazetteerMatcher] = {}


def matcher_from_ref(rows_ref) -> GazetteerMatcher:
    """Resolve a ``ray.put`` ObjectRef of dictionary rows to a worker-local
    matcher, building the index at most once per worker process."""
    import ray

    key = rows_ref.hex()
    matcher = _MATCHER_CACHE.get(key)
    if matcher is None:
        matcher = GazetteerMatcher(ray.get(rows_ref))
        _MATCHER_CACHE.clear()  # at most one dictionary per job; avoid leaks
        _MATCHER_CACHE[key] = matcher
    return matcher
