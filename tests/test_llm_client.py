"""Env-configurable LLM endpoint (functions/llm_client.py): config
round-trip from TKG_LLM_* env vars, the reference's chat-completions
request shape (entity_extractor.py:186-212), and the one-setting-away
live path — exercised against a real localhost HTTP server serving
canned responses (the sandbox has no external network)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from temporal_knowledge_graphs_ray.functions.llm_client import (
    ChatCompletionClient,
    LlmClientConfig,
    client_factory_from_env,
)


class TestConfigRoundTrip:
    def test_unset_endpoint_means_none(self):
        assert LlmClientConfig.from_env({}) is None
        assert client_factory_from_env({}) is None

    def test_full_env_round_trip(self):
        env = {
            "TKG_LLM_API_BASE": "http://llm.example:4000/",
            "TKG_LLM_API_KEY": "sk-test",
            "TKG_LLM_MODEL": "my-model",
            "TKG_LLM_TIMEOUT": "12.5",
            "TKG_LLM_TEMPERATURE": "0.3",
            "TKG_LLM_MAX_TOKENS": "512",
        }
        cfg = LlmClientConfig.from_env(env)
        assert cfg.api_base == "http://llm.example:4000"  # rstrip'd
        assert cfg.api_key == "sk-test"
        assert cfg.model == "my-model"
        assert cfg.timeout == 12.5
        assert cfg.temperature == 0.3
        assert cfg.max_tokens == 512

    def test_defaults_match_reference_settings(self):
        # reference settings.py:27-31 defaults
        cfg = LlmClientConfig.from_env(
            {"TKG_LLM_API_BASE": "http://localhost:4000"})
        assert cfg.api_key == "sk-1234"
        assert cfg.model == "default"
        assert cfg.timeout == 60.0


class TestRequestShape:
    def test_request_matches_reference_contract(self):
        captured = {}

        def transport(url, body, headers, timeout):
            captured.update(url=url, body=json.loads(body),
                            headers=headers, timeout=timeout)
            return {"choices": [{"message": {"content": "  hello  "}}]}

        cfg = LlmClientConfig(api_base="http://h:4000", api_key="k",
                              model="m", timeout=9.0)
        client = ChatCompletionClient(cfg, transport=transport)
        assert client("extract this") == "hello"  # stripped
        assert captured["url"] == "http://h:4000/chat/completions"
        assert captured["headers"]["Authorization"] == "Bearer k"
        assert captured["headers"]["Content-Type"] == "application/json"
        assert captured["timeout"] == 9.0
        body = captured["body"]
        assert body["model"] == "m"
        assert body["temperature"] == 0.1
        assert body["max_tokens"] == 2000
        assert body["messages"][0]["role"] == "system"
        assert body["messages"][1] == {"role": "user",
                                       "content": "extract this"}

    def test_transport_error_propagates_for_stage_retry(self):
        def transport(url, body, headers, timeout):
            raise ConnectionError("down")

        client = ChatCompletionClient(
            LlmClientConfig(api_base="http://h"), transport=transport)
        with pytest.raises(ConnectionError):
            client("x")


class _CannedHandler(BaseHTTPRequestHandler):
    canned = '[{"name": "Acme", "type": "ORGANIZATION"}]'

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        req = json.loads(self.rfile.read(n))
        assert req["messages"][1]["role"] == "user"
        payload = json.dumps({
            "choices": [{"message": {"content": self.canned}}]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def llm_server():
    srv = HTTPServer(("127.0.0.1", 0), _CannedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_live_http_round_trip(llm_server):
    """Default urllib transport against a real local server."""
    factory = client_factory_from_env({"TKG_LLM_API_BASE": llm_server})
    client = factory()
    out = client("Acme acquired Globex.")
    assert out == '[{"name": "Acme", "type": "ORGANIZATION"}]'


@pytest.mark.usefixtures("ray_session")
def test_env_switches_kg_extraction_to_llm_stage(llm_server, monkeypatch):
    """One setting away: with TKG_LLM_API_BASE set, the KG extraction
    leg runs the LLM-shaped actor stage against the endpoint — entities
    come from the (canned) HTTP responses, not the deterministic
    extractor."""
    import datetime

    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.kg import (
        _LlmStageFromFactory,
    )
    from temporal_knowledge_graphs_ray.stages.entities import (
        LlmEntityExtractorStage,
    )

    monkeypatch.setenv("TKG_LLM_API_BASE", llm_server)
    factory = client_factory_from_env()
    assert factory is not None

    chunks = pa.Table.from_pylist([
        {"url": "u0", "part": 0, "chunk_id": "u0#0", "chunk_index": 0,
         "text": "Acme acquired Globex.", "token_count": 3,
         "valid_from": datetime.datetime(2020, 1, 1)}])
    from temporal_knowledge_graphs_ray.config import DEFAULT_CONFIG

    out = (rd.from_arrow(chunks)
           .map_batches(_LlmStageFromFactory,
                        fn_constructor_kwargs={
                            "factory": factory, "cfg": DEFAULT_CONFIG,
                            "stage_cls": LlmEntityExtractorStage},
                        batch_format="pyarrow", concurrency=(1, 1))
           .to_pandas())
    assert [e["name"] for e in out.iloc[0]["entities"]] == ["Acme"]
    assert out.iloc[0]["entities"][0]["type"] == "ORGANIZATION"


class TestLlmTemporalParsing:
    """M13's LLM leg (temporal_retrieval.py:62-147) with canned clients."""

    def _ctx(self, canned: str):
        from temporal_knowledge_graphs_ray.functions.query_parsing import (
            parse_temporal_with_llm,
        )

        return parse_temporal_with_llm("q", lambda prompt: canned)

    def test_point_in_time(self):
        from temporal_knowledge_graphs_ray.functions.temporal_filter import (
            TemporalQueryType,
        )

        ctx = self._ctx('{"has_temporal_reference": true, '
                        '"temporal_type": "point_in_time", '
                        '"dates": [{"date": "2024-01-21", "type": "point"}],'
                        ' "temporal_phrase": "on 21. Januar 2024"}')
        assert ctx.has_temporal_reference
        assert ctx.temporal_filter.query_type == \
            TemporalQueryType.POINT_IN_TIME
        assert ctx.temporal_filter.timestamp.year == 2024
        assert ctx.temporal_keywords == ["on 21. Januar 2024"]

    def test_time_range_and_latest_and_history(self):
        from temporal_knowledge_graphs_ray.functions.temporal_filter import (
            TemporalQueryType,
        )

        rng = self._ctx('{"has_temporal_reference": true, '
                        '"temporal_type": "time_range", "dates": '
                        '[{"date": "2020-01-01", "type": "start"}, '
                        '{"date": "2023-12-31", "type": "end"}], '
                        '"temporal_phrase": "Between 2020 and 2023"}')
        assert rng.temporal_filter.query_type == TemporalQueryType.TIME_RANGE
        assert rng.temporal_filter.start_time.year == 2020
        assert rng.temporal_filter.end_time.year == 2023
        latest = self._ctx('{"has_temporal_reference": true, '
                           '"temporal_type": "latest", "dates": [], '
                           '"temporal_phrase": "latest"}')
        assert latest.temporal_filter.query_type == TemporalQueryType.LATEST
        hist = self._ctx('{"has_temporal_reference": true, '
                         '"temporal_type": "history", "dates": [], '
                         '"temporal_phrase": null}')
        assert hist.temporal_filter.query_type == TemporalQueryType.HISTORY
        assert hist.temporal_keywords == [""]

    def test_no_reference_and_no_json(self):
        ctx = self._ctx('{"has_temporal_reference": false}')
        assert not ctx.has_temporal_reference
        assert self._ctx("no json here at all") is None

    def test_markdown_wrapped_json(self):
        # reference extracts the first {...} blob from chatty output
        ctx = self._ctx('Sure!\n```json\n{"has_temporal_reference": true, '
                        '"temporal_type": "latest", "dates": [], '
                        '"temporal_phrase": "now"}\n```')
        assert ctx.has_temporal_reference

    def test_dispatcher_falls_back_on_failure(self):
        from temporal_knowledge_graphs_ray.functions.query_parsing import (
            parse_temporal_query,
            parse_temporal_query_llm_first,
        )

        def broken(prompt):
            raise ConnectionError("down")

        q = "What changed between 2020 and 2023?"
        got = parse_temporal_query_llm_first(q, client=broken)
        want = parse_temporal_query(q)
        assert got.has_temporal_reference == want.has_temporal_reference
        assert got.temporal_keywords == want.temporal_keywords

    def test_dispatcher_unset_env_is_keyword_parser(self, monkeypatch):
        from temporal_knowledge_graphs_ray.functions.query_parsing import (
            parse_temporal_query,
            parse_temporal_query_llm_first,
        )

        monkeypatch.delenv("TKG_LLM_API_BASE", raising=False)
        q = "What is the latest on Acme?"
        assert parse_temporal_query_llm_first(q).temporal_keywords == \
            parse_temporal_query(q).temporal_keywords
