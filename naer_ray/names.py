"""Name normalization / canonicalization helpers.

Reproduces the reference's normalizers exactly and adds the
engine-native camelCase / abbreviation normalizers the north star
requires (alias generation feeding the same name pool).

Reference citations:
* clean_component_name — test/.../TestProjectEvaluator.java:40-43
* lowercase pooling    — model/NamedEntity.makeAllNamesLowerCase:112-126
"""

from __future__ import annotations

import re

_COMPONENT_WORD = re.compile(r"(?i)\bcomponent\b")
_WS = re.compile(r"\s+")
_CAMEL_SPLIT = re.compile(
    r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])|(?<=[A-Za-z])(?=[0-9])"
)
_NON_ALNUM = re.compile(r"[^a-z0-9]+")


def clean_component_name(name: str) -> str:
    """Strip the word 'component' (case-insensitive), collapse whitespace, trim.

    Exact port of TestProjectEvaluator.cleanComponentName
    (TestProjectEvaluator.java:40-43): aligns extractor names like
    "gui component" with gold names like "gui".
    """
    return _WS.sub(" ", _COMPONENT_WORD.sub("", name)).strip()


def camel_split(name: str) -> list[str]:
    """Split camelCase / PascalCase / digit boundaries: 'WebUI2Service' -> ['Web', 'UI2', 'Service']."""
    parts: list[str] = []
    for tok in name.replace("_", " ").replace("-", " ").split():
        parts.extend(p for p in _CAMEL_SPLIT.split(tok) if p)
    return parts


def normalize_surface(name: str) -> str:
    """Canonical surface-form key used for the canonicalization shuffle.

    lowercase, strip 'component', collapse camelCase/punctuation to
    single-space word sequence.  Deterministic; identical on every
    worker regardless of parallelism.
    """
    cleaned = clean_component_name(name)
    toks = [t.lower() for t in camel_split(cleaned)]
    return _NON_ALNUM.sub(" ", " ".join(toks)).strip()


def abbreviation(name: str) -> str:
    """First-letter abbreviation of a multi-word / camelCase name: 'Image Provider' -> 'ip'."""
    parts = camel_split(clean_component_name(name))
    return "".join(p[0] for p in parts if p).lower() if len(parts) >= 2 else ""


def alias_variants(name: str) -> list[str]:
    """Deterministic engine-generated alias variants for a dictionary entry.

    Used when seeding the entity dictionary: camelCase-joined,
    space-joined, lowercase, and abbreviation forms (deduped, name
    itself excluded, stable order).
    """
    out: list[str] = []
    parts = camel_split(clean_component_name(name))
    candidates = [
        " ".join(parts),
        "".join(parts),
        " ".join(parts).lower(),
        name.lower(),
    ]
    abbr = abbreviation(name)
    if abbr:
        candidates.append(abbr)
    seen = {name}
    for c in candidates:
        if c and c not in seen:
            seen.add(c)
            out.append(c)
    return out
