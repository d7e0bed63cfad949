"""S8: .env / environment-variable loader.

Mirrors the reference's ``util/Environment.java:53-105`` precedence:
values from a ``.env`` file (if present) override the process
environment; a missing required key logs an error and returns None
(the reference's getEnvNonNull does NOT raise).

The ``.env`` format accepted is the common dotenv subset the reference
library (java-dotenv) reads: ``KEY=value`` lines, ``#`` comments,
blank lines, optional ``export `` prefix, and single/double quotes
stripped from the value.  Parsing is driver-side only — worker
processes on a real cluster receive their environment through Ray's
``runtime_env`` instead, so nothing here touches the hot path.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_CACHE: dict[str, dict[str, str] | None] = {}


def parse_dotenv(text: str) -> dict[str, str]:
    """Parse dotenv text into a dict (last assignment wins)."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        if line.startswith("export "):
            line = line[len("export "):].lstrip()
        key, _, value = line.partition("=")
        key = key.strip()
        if not key:
            continue
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        out[key] = value
    return out


def _load(dotenv_path: str) -> dict[str, str] | None:
    """Load + memoize a .env file; None when the file doesn't exist.
    Keys are absolute so a relative ".env" doesn't alias across cwd
    changes within one process."""
    dotenv_path = os.path.abspath(dotenv_path)
    if dotenv_path not in _CACHE:
        if os.path.isfile(dotenv_path):
            with open(dotenv_path, encoding="utf-8") as f:
                _CACHE[dotenv_path] = parse_dotenv(f.read())
        else:
            logger.info("No %s file found, using system environment variables", dotenv_path)
            _CACHE[dotenv_path] = None
    return _CACHE[dotenv_path]


def get_env(key: str, dotenv_path: str = ".env") -> str | None:
    """.env value if present, else the process environment, else None."""
    dotenv = _load(dotenv_path)
    if dotenv is not None and key in dotenv:
        return dotenv[key]
    return os.environ.get(key)


def get_env_non_null(key: str, dotenv_path: str = ".env") -> str | None:
    """Like get_env, but logs an error when the key is missing.

    Reference parity: ``Environment.getEnvNonNull`` logs and still
    returns null rather than raising (Environment.java:73-79).
    """
    value = get_env(key, dotenv_path)
    if value is None:
        logger.error(
            "environment variable %s is missing, use '.env' or your system to set it up",
            key,
        )
    return value


def clear_cache() -> None:
    """Drop memoized .env files (tests / config reload)."""
    _CACHE.clear()
