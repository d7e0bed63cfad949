"""S8 env/dotenv loader (Environment.java:53-105 semantics)."""

import json
import os

from naer_ray import env


def setup_function(_fn):
    env.clear_cache()


def test_parse_dotenv_subset():
    text = (
        "# comment\n"
        "\n"
        "PLAIN=value\n"
        "export EXPORTED=yes\n"
        'QUOTED="with spaces"\n'
        "SINGLE='single'\n"
        "EQ=a=b=c\n"
        "  PADDED  =  padded  \n"
        "noequalsign\n"
        "LAST=first\n"
        "LAST=wins\n"
    )
    assert env.parse_dotenv(text) == {
        "PLAIN": "value",
        "EXPORTED": "yes",
        "QUOTED": "with spaces",
        "SINGLE": "single",
        "EQ": "a=b=c",
        "PADDED": "padded",
        "LAST": "wins",
    }


def test_dotenv_overrides_process_env(tmp_path, monkeypatch):
    dotenv = tmp_path / ".env"
    dotenv.write_text("NAER_TEST_KEY=from_dotenv\n")
    monkeypatch.setenv("NAER_TEST_KEY", "from_process")
    monkeypatch.setenv("NAER_ONLY_PROCESS", "fallback")
    # .env wins over the process env (reference precedence)
    assert env.get_env("NAER_TEST_KEY", dotenv_path=str(dotenv)) == "from_dotenv"
    # falls back to the process env for keys absent from .env
    assert env.get_env("NAER_ONLY_PROCESS", dotenv_path=str(dotenv)) == "fallback"
    # missing everywhere -> None
    assert env.get_env("NAER_ABSENT", dotenv_path=str(dotenv)) is None


def test_missing_file_uses_process_env(tmp_path, monkeypatch):
    monkeypatch.setenv("NAER_ONLY_PROCESS", "v")
    missing = str(tmp_path / "nope.env")
    assert env.get_env("NAER_ONLY_PROCESS", dotenv_path=missing) == "v"


def test_get_env_non_null_logs_but_returns_none(tmp_path, caplog):
    # reference parity: getEnvNonNull logs an error, does NOT raise
    missing = str(tmp_path / "nope.env")
    with caplog.at_level("ERROR", logger="naer_ray.env"):
        assert env.get_env_non_null("NAER_ABSENT", dotenv_path=missing) is None
    assert any("NAER_ABSENT" in r.message for r in caplog.records)


def test_config_env_substitution(tmp_path, monkeypatch):
    from naer_ray.job import load_config

    monkeypatch.setenv("NAER_CFG_OUT", str(tmp_path / "out"))
    monkeypatch.chdir(tmp_path)  # no .env in cwd -> process env path
    cfg = tmp_path / "cfg.json"
    monkeypatch.setenv("NAER_CFG_BUCKETS", "4")
    cfg.write_text(json.dumps({
        "transcripts": "/data/t",
        "out": "${ENV:NAER_CFG_OUT}",
        "buckets": "${ENV:NAER_CFG_BUCKETS}",
        "resume": "false",
    }))
    (run,) = load_config(str(cfg))
    assert run["out"] == os.environ["NAER_CFG_OUT"]
    assert run["transcripts"] == "/data/t"
    # env substitution yields strings; loader coerces known kwarg types
    assert run["buckets"] == 4
    assert run["resume"] is False


def test_config_env_substitution_missing_var_raises(tmp_path, monkeypatch):
    import json

    import pytest

    from naer_ray.job import load_config

    monkeypatch.delenv("NAER_CFG_MISSING", raising=False)
    monkeypatch.chdir(tmp_path)
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"out": "${ENV:NAER_CFG_MISSING}"}))
    # fail fast naming the variable — a silent None previously became a
    # literal "None/run-0" output directory
    with pytest.raises(ValueError, match="NAER_CFG_MISSING"):
        load_config(str(cfg))
