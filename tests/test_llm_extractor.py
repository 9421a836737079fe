"""The pluggable LLM extractor path (A1 with a real-model client shape):
canned LLM-style responses — fenced, malformed, truncated — must flow
through the actor-pool stage and the reference's JSON repair
(entity_extractor.py:213-269) into the chunk_ents schema."""

from __future__ import annotations

import pyarrow as pa
import pytest

from temporal_knowledge_graphs_ray.functions.llm_json import (
    parse_llm_entities,
    strip_code_fences,
)


class TestJsonRepair:
    def test_clean_json(self):
        assert parse_llm_entities('[{"name": "Acme", "type": "ORG"}]') == [
            {"name": "Acme", "type": "ORG"}]

    def test_json_fence(self):
        raw = 'Here you go:\n```json\n[{"name": "Acme"}]\n```\nDone.'
        assert parse_llm_entities(raw) == [{"name": "Acme"}]

    def test_bare_fence(self):
        raw = '```\n[{"name": "Acme"}]\n```'
        assert parse_llm_entities(raw) == [{"name": "Acme"}]

    def test_dict_wrapped_in_list(self):
        assert parse_llm_entities('{"name": "Acme"}') == [{"name": "Acme"}]

    def test_single_quotes_and_trailing_comma(self):
        raw = "Sure! [{'name': 'Acme', 'type': 'ORG',}]"
        assert parse_llm_entities(raw) == [{"name": "Acme", "type": "ORG"}]

    def test_truncated_array_completed_at_last_brace(self):
        raw = '[{"name": "Acme"}, {"name": "Globex"}, {"na'
        assert parse_llm_entities(raw) == [{"name": "Acme"},
                                           {"name": "Globex"}]

    def test_garbage_returns_empty(self):
        assert parse_llm_entities("I could not find any entities.") == []
        assert parse_llm_entities("") == []

    def test_fence_strip_identity_without_fence(self):
        assert strip_code_fences("[1, 2]") == "[1, 2]"


@pytest.mark.usefixtures("ray_session")
def test_llm_extractor_stage_with_canned_responses():
    """The actor-pool stage accepts a client callable and produces the
    standard chunk_ents schema from messy canned responses."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.entities import (
        CHUNK_ENTS_SCHEMA,
        LlmEntityExtractorStage,
    )

    CANNED = {
        "Acme acquired Globex.":
            '```json\n[{"name": "Acme", "type": "Organization"},'
            ' {"name": "Globex", "type": "Organization"}]\n```',
        "Alice joined Acme. Alice leads research.":
            "[{'name': 'Alice', 'type': 'PERSON'},"
            " {'name': 'Acme', 'type': 'ORGANIZATION'},]",
        "Nothing here.": "Sorry, no entities found.",
        "Truncated about Initech":
            '[{"name": "Initech", "type": "ORGANIZATION"}, {"nam',
    }

    def canned_client(text: str) -> str:
        return CANNED[text]

    import datetime

    chunks = pa.Table.from_pylist([
        {"url": f"u{i}", "part": 0, "chunk_id": f"u{i}#0", "chunk_index": 0,
         "text": t, "token_count": len(t.split()),
         "valid_from": datetime.datetime(2020, 1, 1)}
        for i, t in enumerate(CANNED)
    ])
    out = (
        rd.from_arrow(chunks)
        .map_batches(LlmEntityExtractorStage,
                     fn_constructor_kwargs={"client": canned_client},
                     batch_format="pyarrow", batch_size=2,
                     concurrency=(1, 2))
        .to_pandas()
    )
    assert len(out) == 4
    by_url = {r["url"]: [e["name"] for e in r["entities"]]
              for _, r in out.iterrows()}
    assert by_url["u0"] == ["Acme", "Globex"]
    assert by_url["u1"] == ["Alice", "Acme"]
    assert by_url["u2"] == []
    assert by_url["u3"] == ["Initech"]
    ents0 = out[out["url"] == "u0"].iloc[0]["entities"]
    assert ents0[0]["type"] == "ORGANIZATION"  # normalized upper
    assert ents0[1]["position"] == "Acme acquired Globex.".find("Globex")
    # schema identical to the rule-based stage's output
    cols = set(out.columns)
    assert cols == set(CHUNK_ENTS_SCHEMA.names)


class TestRepairFuzz:
    """The repair path's contract is fault-tolerance: ANY input yields a
    list, never an exception (the reference returns [] on all failures)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_parse_never_raises(self, content):
        out = parse_llm_entities(content)
        assert isinstance(out, list)

    @given(st.text(alphabet="[]{}'\",:`json \n\\abc01", max_size=120))
    @settings(max_examples=300, deadline=None)
    def test_parse_never_raises_jsonish(self, content):
        out = parse_llm_entities(content)
        assert isinstance(out, list)


class TestRetrySemantics:
    """Bounded retry + empty-result-on-failure (reference
    entity_extractor.py:151-154, generator.py:63-71): a transient fault
    retries with backoff; a poison chunk yields zero entities instead of
    killing the task (Ray would re-run the whole batch forever)."""

    def _stage(self, client, **kw):
        from temporal_knowledge_graphs_ray.stages.entities import (
            LlmEntityExtractorStage,
        )

        sleeps = []
        stage = LlmEntityExtractorStage(client, sleep=sleeps.append, **kw)
        return stage, sleeps

    def test_transient_fault_retries_then_succeeds(self):
        calls = {"n": 0}

        def flaky(text):
            calls["n"] += 1
            if calls["n"] <= 2:
                raise ConnectionError("transient")
            return '[{"name": "Acme", "type": "ORG"}]'

        stage, sleeps = self._stage(flaky)
        out = stage._extract("Acme acquired Globex.")
        assert [e["name"] for e in out] == ["Acme"]
        assert calls["n"] == 3
        # exponential backoff between attempts
        assert sleeps == [0.5, 1.0]

    def test_poison_chunk_yields_zero_entities(self):
        calls = {"n": 0}

        def dead(text):
            calls["n"] += 1
            raise TimeoutError("down")

        stage, _ = self._stage(dead, max_attempts=3)
        assert stage._extract("anything") == []
        assert calls["n"] == 3  # bounded, never infinite

    @pytest.mark.usefixtures("ray_session")
    def test_pipeline_completes_with_failing_client(self):
        """End-to-end: an always-failing client must not kill the Ray
        stage — every chunk flows through with empty entities."""
        import datetime

        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.entities import (
            LlmEntityExtractorStage,
        )

        def dead(text):
            raise ConnectionError("api down")

        chunks = pa.Table.from_pylist([
            {"url": f"u{i}", "part": 0, "chunk_id": f"u{i}#0",
             "chunk_index": 0, "text": f"text {i}", "token_count": 2,
             "valid_from": datetime.datetime(2020, 1, 1)}
            for i in range(4)
        ])
        out = (
            rd.from_arrow(chunks)
            .map_batches(LlmEntityExtractorStage,
                         fn_constructor_kwargs={
                             "client": dead, "max_attempts": 2,
                             "backoff_base": 0.0},
                         batch_format="pyarrow", batch_size=2,
                         concurrency=(1, 2))
            .to_pandas()
        )
        assert len(out) == 4
        assert all(len(e) == 0 for e in out["entities"])
