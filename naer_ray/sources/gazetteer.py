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
