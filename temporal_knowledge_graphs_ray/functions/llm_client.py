"""Env-configurable OpenAI-compatible chat-completion client.

The reference talks to a LiteLLM proxy: an httpx.Client built once per
extractor, POST ``{api_base}/chat/completions`` with model/messages/
temperature/max_tokens and a Bearer key, the assistant message content
returned as the raw string
(/root/reference/src/temporal_kg_rag/ingestion/entity_extractor.py:56-118,
:163-230; config from env via pydantic settings, config/settings.py:27-31).

This module is the same wiring one setting away: set
``TKG_LLM_API_BASE`` (and optionally ``TKG_LLM_API_KEY`` /
``TKG_LLM_MODEL`` / ``TKG_LLM_TIMEOUT``) and
:func:`client_factory_from_env` returns a factory whose clients the
LLM-shaped actor stages (stages/entities.LlmEntityExtractorStage,
pipelines/rag.AnswerStage) construct once per actor in ``__init__``.
Unset, it returns None and the deterministic extractors stay the
default — the sandbox has no network, so the live path is exercised
through the injectable ``transport`` seam with canned responses.

The HTTP layer is stdlib urllib (no new dependency); the client is a
plain ``text -> content str`` callable, so the stages' bounded-retry /
empty-on-failure policy wraps it unchanged.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

_ENV_PREFIX = "TKG_LLM_"

_DEFAULT_SYSTEM_PROMPT = (
    "You are an expert at named entity recognition. Extract entities "
    "accurately and return them in valid JSON format."
)


@dataclass(frozen=True)
class LlmClientConfig:
    """Connection + sampling settings (reference settings.py:27-31 shape)."""

    api_base: str
    api_key: str = "sk-1234"
    model: str = "default"
    timeout: float = 60.0
    temperature: float = 0.1
    max_tokens: int = 2000
    system_prompt: str = field(default=_DEFAULT_SYSTEM_PROMPT)

    @classmethod
    def from_env(cls, environ=None) -> "LlmClientConfig | None":
        """Build from ``TKG_LLM_*`` env vars; None when the endpoint is
        unset (the deterministic extractors stay the default)."""
        env = os.environ if environ is None else environ
        base = env.get(_ENV_PREFIX + "API_BASE")
        if not base:
            return None
        kwargs: dict = {"api_base": base.rstrip("/")}
        if env.get(_ENV_PREFIX + "API_KEY"):
            kwargs["api_key"] = env[_ENV_PREFIX + "API_KEY"]
        if env.get(_ENV_PREFIX + "MODEL"):
            kwargs["model"] = env[_ENV_PREFIX + "MODEL"]
        if env.get(_ENV_PREFIX + "TIMEOUT"):
            kwargs["timeout"] = float(env[_ENV_PREFIX + "TIMEOUT"])
        if env.get(_ENV_PREFIX + "TEMPERATURE"):
            kwargs["temperature"] = float(env[_ENV_PREFIX + "TEMPERATURE"])
        if env.get(_ENV_PREFIX + "MAX_TOKENS"):
            kwargs["max_tokens"] = int(env[_ENV_PREFIX + "MAX_TOKENS"])
        return cls(**kwargs)


def _urllib_transport(url: str, body: bytes, headers: dict,
                      timeout: float) -> dict:
    """Default HTTP POST transport (stdlib; raises on HTTP errors the
    same way httpx's raise_for_status does)."""
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


class ChatCompletionClient:
    """``text -> assistant content str`` over an OpenAI-compatible
    endpoint — the reference's request/response shape byte-for-byte
    (entity_extractor.py:186-212). Construct once per actor; any
    transport error propagates so the stage's bounded retry owns the
    policy."""

    def __init__(self, cfg: LlmClientConfig, transport=None):
        self.cfg = cfg
        self._transport = transport or _urllib_transport
        self._url = f"{cfg.api_base}/chat/completions"
        self._headers = {
            "Authorization": f"Bearer {cfg.api_key}",
            "Content-Type": "application/json",
        }

    def __call__(self, text: str) -> str:
        body = json.dumps({
            "model": self.cfg.model,
            "messages": [
                {"role": "system", "content": self.cfg.system_prompt},
                {"role": "user", "content": text},
            ],
            "temperature": self.cfg.temperature,
            "max_tokens": self.cfg.max_tokens,
        }).encode("utf-8")
        data = self._transport(self._url, body, self._headers,
                               self.cfg.timeout)
        return data["choices"][0]["message"]["content"].strip()


def client_factory_from_env(environ=None, transport=None):
    """None when ``TKG_LLM_API_BASE`` is unset; else a zero-arg factory
    producing :class:`ChatCompletionClient`, suitable for per-actor
    construction (each actor process re-reads its own env copy at
    factory-call time — the factory closes over the CONFIG, not a
    socket, so it serializes cleanly into Ray actors)."""
    cfg = LlmClientConfig.from_env(environ)
    if cfg is None:
        return None

    def factory():
        return ChatCompletionClient(cfg, transport=transport)

    return factory
