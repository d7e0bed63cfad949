"""ST1: chat-model factory — providers, wire codecs, pluggable transport.

Mirrors the reference factory (util/ChatModelFactory.java:19-169):
provider enum (OPEN_AI / OLLAMA / LOCAL), builder-style temperature /
timeout / model_name with the same validation and defaults
("gpt-4.1-nano", "phi4:latest"), credentials resolved through the S8
env loader (OPENAI_API_KEY; OLLAMA_HOST/USER/PASSWORD with basic-auth
header, ChatModelFactory.java:126,144-153), LOCAL unimplemented
(ChatModelFactory.java:167-169).

The request/response codec is REAL — the factory builds the exact
HTTP method/url/headers/JSON body for the public OpenAI
chat-completions API and the public Ollama /api/chat API, and parses
their documented response shapes.  Only the socket is pluggable:
``build(send_fn)`` takes ``send_fn(request: WireRequest) -> dict``
(the parsed response JSON).  The default transport uses urllib over
real HTTP and is exercised only outside this no-network sandbox;
tests inject a fake ``send_fn`` and assert the wire format.

The built model is a ``chat_fn(system, prompt) -> str`` — exactly the
backend surface :class:`naer_ray.stages.llm.LLMExtractor` consumes, so
``ChatModelFactory.with_provider(...).build(...)`` plugs straight into
the actor-pool extractor (constructed once per actor in ``__init__``).
"""

from __future__ import annotations

import base64
import enum
import json
import logging
from dataclasses import dataclass, field

from ..env import get_env_non_null

logger = logging.getLogger(__name__)

OPENAI_DEFAULT_MODEL = "gpt-4.1-nano"
OLLAMA_DEFAULT_MODEL = "phi4:latest"
OPENAI_BASE_URL = "https://api.openai.com/v1"


class ModelProvider(enum.Enum):
    OPEN_AI = "open_ai"
    OLLAMA = "ollama"
    LOCAL = "local"


@dataclass(frozen=True)
class WireRequest:
    """One fully-formed HTTP request (everything but the socket)."""

    method: str
    url: str
    headers: dict[str, str]
    body: dict
    timeout_seconds: int

    def body_bytes(self) -> bytes:
        return json.dumps(self.body).encode("utf-8")


def urllib_send(request: WireRequest) -> dict:
    """Default transport: real HTTP POST via urllib (needs network)."""
    import urllib.request

    req = urllib.request.Request(
        request.url,
        data=request.body_bytes(),
        headers=request.headers,
        method=request.method,
    )
    with urllib.request.urlopen(req, timeout=request.timeout_seconds) as resp:
        return json.loads(resp.read().decode("utf-8"))


class ChatModelFactory:
    """Builder with reference validation semantics; see module docstring."""

    def __init__(self) -> None:
        self._provider: ModelProvider | None = None
        self._temperature = 0.0
        self._timeout_seconds = 60
        self._model_name: str | None = None

    @classmethod
    def with_provider(cls, provider: ModelProvider) -> "ChatModelFactory":
        if provider is None:
            logger.error("provider is null")
            raise ValueError("Provider cannot be null")
        f = cls()
        f._provider = provider
        return f

    def temperature(self, temperature: float) -> "ChatModelFactory":
        if temperature < 0.0:
            logger.error("temperature must be >= 0.0")
            raise ValueError("Temperature must be >= 0.0")
        self._temperature = temperature
        return self

    def timeout(self, timeout_seconds: int) -> "ChatModelFactory":
        if timeout_seconds < 1:
            logger.error("timeout must be >= 1")
            raise ValueError("Timeout must be >= 1")
        self._timeout_seconds = timeout_seconds
        return self

    def model_name(self, model_name: str) -> "ChatModelFactory":
        self._model_name = model_name
        return self

    def build(self, send_fn=urllib_send, dotenv_path: str = ".env"):
        """-> ``chat_fn(system, prompt) -> str`` for LLMExtractor."""
        if self._provider is ModelProvider.OPEN_AI:
            api_key = get_env_non_null("OPENAI_API_KEY", dotenv_path)
            if api_key is None:
                # fail at build time with the cause, not per-request with
                # an opaque 401 from a literal "Bearer None" header
                raise ValueError(
                    "OPENAI_API_KEY is missing — set it in .env or the environment"
                )
            return OpenAiChatModel(
                api_key=api_key,
                model_name=self._model_name or OPENAI_DEFAULT_MODEL,
                temperature=self._temperature,
                timeout_seconds=self._timeout_seconds,
                send_fn=send_fn,
            )
        if self._provider is ModelProvider.OLLAMA:
            host = get_env_non_null("OLLAMA_HOST", dotenv_path)
            if host is None:
                raise ValueError(
                    "OLLAMA_HOST is missing — set it in .env or the environment"
                )
            return OllamaChatModel(
                host=host,
                user=get_env_non_null("OLLAMA_USER", dotenv_path),
                password=get_env_non_null("OLLAMA_PASSWORD", dotenv_path),
                model_name=self._model_name or OLLAMA_DEFAULT_MODEL,
                temperature=self._temperature,
                timeout_seconds=self._timeout_seconds,
                send_fn=send_fn,
            )
        # LOCAL (ChatModelFactory.java:167-169)
        raise NotImplementedError("Local model not implemented yet")


@dataclass
class OpenAiChatModel:
    """Public OpenAI chat-completions wire format.

    POST {base}/chat/completions with bearer auth; answer text is
    ``choices[0].message.content`` (platform.openai.com API reference).
    """

    api_key: str | None
    model_name: str = OPENAI_DEFAULT_MODEL
    temperature: float = 0.0
    timeout_seconds: int = 60
    base_url: str = OPENAI_BASE_URL
    send_fn: object = field(default=urllib_send, repr=False)

    def request(self, system: str, prompt: str) -> WireRequest:
        return WireRequest(
            method="POST",
            url=f"{self.base_url}/chat/completions",
            headers={
                "Authorization": f"Bearer {self.api_key}",
                "Content-Type": "application/json",
            },
            body={
                "model": self.model_name,
                "temperature": self.temperature,
                "messages": [
                    {"role": "system", "content": system},
                    {"role": "user", "content": prompt},
                ],
            },
            timeout_seconds=self.timeout_seconds,
        )

    def __call__(self, system: str, prompt: str) -> str:
        resp = self.send_fn(self.request(system, prompt))
        return resp["choices"][0]["message"]["content"]


@dataclass
class OllamaChatModel:
    """Public Ollama ``/api/chat`` wire format (non-streaming).

    Basic-auth header from user/password when both are set
    (ChatModelFactory.java:150-153); answer text is
    ``message.content`` (github.com/ollama/ollama API docs).
    """

    host: str | None
    user: str | None = None
    password: str | None = None
    model_name: str = OLLAMA_DEFAULT_MODEL
    temperature: float = 0.0
    timeout_seconds: int = 60
    send_fn: object = field(default=urllib_send, repr=False)

    def request(self, system: str, prompt: str) -> WireRequest:
        headers = {"Content-Type": "application/json"}
        if self.user is not None and self.password is not None:
            token = base64.b64encode(
                f"{self.user}:{self.password}".encode("utf-8")
            ).decode("ascii")
            headers["Authorization"] = f"Basic {token}"
        return WireRequest(
            method="POST",
            url=f"{(self.host or '').rstrip('/')}/api/chat",
            headers=headers,
            body={
                "model": self.model_name,
                "stream": False,
                "options": {"temperature": self.temperature},
                "messages": [
                    {"role": "system", "content": system},
                    {"role": "user", "content": prompt},
                ],
            },
            timeout_seconds=self.timeout_seconds,
        )

    def __call__(self, system: str, prompt: str) -> str:
        resp = self.send_fn(self.request(system, prompt))
        return resp["message"]["content"]
