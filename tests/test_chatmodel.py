"""ST1 chat-model factory: wire formats, validation, env credentials
(ChatModelFactory.java:19-169 parity; transport injected — no network)."""

import base64
import json

import pytest

from naer_ray import env
from naer_ray.stages.chatmodel import (
    OLLAMA_DEFAULT_MODEL,
    OPENAI_DEFAULT_MODEL,
    ChatModelFactory,
    ModelProvider,
    WireRequest,
)
from naer_ray.stages.llm import SYSTEM_MESSAGE, LLMExtractor, Prompt

GOOD_ANSWER = (
    "COMPONENT entities recognized:\n"
    "GUI, 'The GUI talks to the DB.'\n"
    "Alternative names:\n"
    "GUI: None\n"
)


def setup_function(_fn):
    env.clear_cache()


def _openai_send(content):
    """Fake transport returning the documented chat-completions shape."""

    def send(req: WireRequest) -> dict:
        send.requests.append(req)
        return {"choices": [{"message": {"role": "assistant", "content": content}}]}

    send.requests = []
    return send


def _ollama_send(content):
    def send(req: WireRequest) -> dict:
        send.requests.append(req)
        return {"message": {"role": "assistant", "content": content}}

    send.requests = []
    return send


def test_builder_validation():
    with pytest.raises(ValueError):
        ChatModelFactory.with_provider(None)
    with pytest.raises(ValueError):
        ChatModelFactory.with_provider(ModelProvider.OPEN_AI).temperature(-0.1)
    with pytest.raises(ValueError):
        ChatModelFactory.with_provider(ModelProvider.OPEN_AI).timeout(0)
    with pytest.raises(NotImplementedError):
        ChatModelFactory.with_provider(ModelProvider.LOCAL).build()


def test_openai_wire_format(monkeypatch, tmp_path):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    send = _openai_send("hello")
    model = (
        ChatModelFactory.with_provider(ModelProvider.OPEN_AI)
        .temperature(0.25)
        .timeout(30)
        .build(send_fn=send, dotenv_path=str(tmp_path / "no.env"))
    )
    assert model("sys", "user text") == "hello"
    (req,) = send.requests
    assert req.method == "POST"
    assert req.url == "https://api.openai.com/v1/chat/completions"
    assert req.headers["Authorization"] == "Bearer sk-test"
    assert req.timeout_seconds == 30
    assert req.body == {
        "model": OPENAI_DEFAULT_MODEL,
        "temperature": 0.25,
        "messages": [
            {"role": "system", "content": "sys"},
            {"role": "user", "content": "user text"},
        ],
    }
    # body serializes to valid JSON bytes
    assert json.loads(req.body_bytes()) == req.body


def test_openai_model_name_override(monkeypatch, tmp_path):
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    send = _openai_send("x")
    model = (
        ChatModelFactory.with_provider(ModelProvider.OPEN_AI)
        .model_name("gpt-4o-mini")
        .build(send_fn=send, dotenv_path=str(tmp_path / "no.env"))
    )
    model("s", "p")
    assert send.requests[0].body["model"] == "gpt-4o-mini"


def test_ollama_wire_format_with_basic_auth(monkeypatch, tmp_path):
    monkeypatch.setenv("OLLAMA_HOST", "http://models.example:11434/")
    monkeypatch.setenv("OLLAMA_USER", "alice")
    monkeypatch.setenv("OLLAMA_PASSWORD", "s3cret")
    send = _ollama_send("pong")
    model = (
        ChatModelFactory.with_provider(ModelProvider.OLLAMA)
        .build(send_fn=send, dotenv_path=str(tmp_path / "no.env"))
    )
    assert model("sys", "ping") == "pong"
    (req,) = send.requests
    assert req.url == "http://models.example:11434/api/chat"
    expected = base64.b64encode(b"alice:s3cret").decode("ascii")
    assert req.headers["Authorization"] == f"Basic {expected}"
    assert req.body["model"] == OLLAMA_DEFAULT_MODEL
    assert req.body["stream"] is False
    assert req.body["options"] == {"temperature": 0.0}


def test_ollama_no_auth_header_without_both_credentials(monkeypatch, tmp_path):
    monkeypatch.setenv("OLLAMA_HOST", "http://models.example:11434")
    monkeypatch.delenv("OLLAMA_USER", raising=False)
    monkeypatch.delenv("OLLAMA_PASSWORD", raising=False)
    send = _ollama_send("x")
    model = (
        ChatModelFactory.with_provider(ModelProvider.OLLAMA)
        .build(send_fn=send, dotenv_path=str(tmp_path / "no.env"))
    )
    model("s", "p")
    assert "Authorization" not in send.requests[0].headers


def test_dotenv_credentials_feed_the_factory(tmp_path, monkeypatch):
    # S8 -> ST1 integration: the key comes from .env, not the process env
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    dotenv = tmp_path / ".env"
    dotenv.write_text("OPENAI_API_KEY=sk-from-dotenv\n")
    send = _openai_send("x")
    model = (
        ChatModelFactory.with_provider(ModelProvider.OPEN_AI)
        .build(send_fn=send, dotenv_path=str(dotenv))
    )
    model("s", "p")
    assert send.requests[0].headers["Authorization"] == "Bearer sk-from-dotenv"


def test_factory_model_drives_llm_extractor(monkeypatch, tmp_path):
    # end-to-end: factory-built chat_fn plugs into the ST2-ST4 extractor
    monkeypatch.setenv("OPENAI_API_KEY", "sk-test")
    send = _openai_send(GOOD_ANSWER)
    chat_fn = (
        ChatModelFactory.with_provider(ModelProvider.OPEN_AI)
        .build(send_fn=send, dotenv_path=str(tmp_path / "no.env"))
    )
    ex = LLMExtractor(chat_fn, Prompt("Find entities."))
    out = ex.extract("conv-1", ["The GUI talks to the DB.", "Users love it!"])
    assert "GUI" in out.column("subj").to_pylist()
    assert send.requests[0].body["messages"][0]["content"] == SYSTEM_MESSAGE
