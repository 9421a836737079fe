"""M15 context formatting + Q9 batch RAG orchestration.

Kernel tests are pure (no Ray); the pipeline tests run over a small
synthesized KG and check the batched dataflow against per-query expectations
(the full sequential-oracle parity runs in test_queries_duckdb.py).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from temporal_knowledge_graphs_ray.functions.context_format import (
    TRUNCATION_MARKER,
    build_context,
    format_context,
    format_entity_relationships,
    format_temporal_context,
)
from temporal_knowledge_graphs_ray.functions.query_parsing import (
    parse_temporal_query,
)
from temporal_knowledge_graphs_ray.functions.temporal_filter import (
    TemporalFilter,
    TemporalQueryType,
)
from temporal_knowledge_graphs_ray.pipelines.rag import (
    NO_ANSWER_SENTINEL,
    NO_CONTEXT_SENTINEL,
    AnswerStage,
    DeterministicLlm,
    classify_query_type,
    render_prompt,
    select_template,
    synth_rag_queries,
)

RESULTS = [
    {"document_title": "Page A", "text": "Alpha text.",
     "created_at": datetime(2023, 5, 4, 12, 0),
     "entities": ["X Corp", "Bob", "Y Ltd", "Z Inc", "Berlin", "Sixth"]},
    {"document_title": "Page B", "text": "Beta text.",
     "created_at": "2021-01-02T09:00:00", "entities": []},
]


# ---------------------------------------------------------------------------
# M15 kernels
# ---------------------------------------------------------------------------

class TestFormatContext:
    def test_blocks_and_entity_line(self):
        out = format_context(RESULTS)
        assert out.splitlines()[0] == '[Source 1: "Page A" (2023-05-04)]'
        assert "Alpha text." in out
        # only first 5 entity names make the Key entities line
        assert ("Key entities: X Corp, Bob, Y Ltd, Z Inc, Berlin"
                in out)
        assert "Sixth" not in out
        # string created_at is cut to 10 chars
        assert '[Source 2: "Page B" (2021-01-02)]' in out
        # no entity line for the empty-entities result
        assert out.count("Key entities:") == 1

    def test_include_metadata_false(self):
        out = format_context(RESULTS, include_metadata=False)
        assert "Key entities:" not in out

    def test_missing_title_placeholder(self):
        out = format_context([{"text": "t", "created_at": None}])
        assert out.startswith('[Source 1: "Unknown Source" ()]')

    def test_entity_relationships_sorted_distinct(self):
        out = format_entity_relationships(
            [{"entities": ["b", "a"]}, {"entities": ["a", " ", None]}])
        assert out == "Entities mentioned: a, b"
        assert (format_entity_relationships([{"entities": []}])
                == "No entity relationships found.")

    def test_temporal_context_lines(self):
        assert format_temporal_context(None).startswith("Current information")
        f = TemporalFilter(query_type=TemporalQueryType.POINT_IN_TIME,
                           timestamp=datetime(2022, 12, 31, 23, 59, 59))
        assert format_temporal_context(f) == (
            "Information as of: 2022-12-31 23:59:59")
        r = TemporalFilter(query_type=TemporalQueryType.TIME_RANGE,
                           start_time=datetime(2020, 1, 1),
                           end_time=datetime(2023, 12, 31, 23, 59, 59))
        assert format_temporal_context(r).startswith(
            "Information from 2020-01-01")
        assert format_temporal_context(TemporalFilter.latest()) == (
            "Most recent/current information")
        assert "history" in format_temporal_context(TemporalFilter.history())


class TestBuildContext:
    def test_truncation(self):
        ctx = build_context("q", RESULTS, max_context_length=30)
        assert ctx["formatted_context"].endswith(TRUNCATION_MARKER)
        assert len(ctx["formatted_context"]) == 30 + len(TRUNCATION_MARKER)
        assert ctx["metadata"]["truncated"] is True
        assert ctx["metadata"]["context_length"] == len(
            ctx["formatted_context"])

    def test_no_truncation_and_sources(self):
        ctx = build_context("q", RESULTS, max_context_length=100_000)
        assert not ctx["metadata"]["truncated"]
        assert ctx["metadata"]["num_results"] == 2
        assert ctx["metadata"]["sources"] == ["Page A", "Page B"]

    def test_temporal_line_passthrough(self):
        tc = parse_temporal_query("revenue in 2022")
        ctx = build_context("q", RESULTS, temporal_context=tc)
        assert ctx["temporal_context"].startswith("Information as of: 2022")
        ctx2 = build_context("q", RESULTS, temporal_context=None)
        assert ctx2["temporal_context"] is None


# ---------------------------------------------------------------------------
# Q9 node heuristics
# ---------------------------------------------------------------------------

class TestUnderstand:
    @pytest.mark.parametrize("q,expected", [
        ("Compare revenue of A versus B", "comparison"),
        ("The history of the deal", "evolution"),
        ("What is this about?", "exploratory"),
        ("Describe the merger", "exploratory"),
        ("Revenue for 2022", "factual"),
    ])
    def test_classify(self, q, expected):
        assert classify_query_type(q) == expected

    def test_template_selection(self):
        assert select_template("comparison", True) == "comparison"
        assert select_template("factual", True) == "temporal"
        assert select_template("factual", False) == "factual"

    def test_synth_queries_deterministic_and_extractable(self):
        nodes = [
            {"entity_id": "e2", "name": "Duff Corp", "mention_count": 9},
            {"entity_id": "e1", "name": "Acme LLC", "mention_count": 9},
            {"entity_id": "e3", "name": "Irene Moore", "mention_count": 5},
        ]
        qs = synth_rag_queries(nodes)
        assert [q["query_id"] for q in qs] == list(range(8))
        # "Acme LLC" fails the extractable-name gate (all-caps token);
        # ranking is (mention_count desc, entity_id asc)
        assert "Duff Corp" in qs[0]["query"]
        assert qs == synth_rag_queries(list(reversed(nodes)))


# ---------------------------------------------------------------------------
# generate + verify stage (pluggable client, bounded retry)
# ---------------------------------------------------------------------------

def _row(**over) -> dict:
    row = {
        "query": "What did X announce?", "query_type": "exploratory",
        "temporal_detected": False, "temporal_context_str": None,
        "num_results": 1,
        "formatted_context": ('[Source 1: "Page A" (2023-05-04)]\n'
                              "Alpha text.\n"),
    }
    row.update(over)
    return row


class _FlakyClient:
    """Raises ``fails`` times, then answers."""

    fails = 2

    def __init__(self):
        self.calls = 0

    def __call__(self, prompt: str) -> str:
        self.calls += 1
        if self.calls <= self.fails:
            raise RuntimeError("transient")
        return "According to Source 1, alpha."


class _DeadClient:
    def __call__(self, prompt: str) -> str:
        raise RuntimeError("always down")


class TestAnswerStage:
    def test_deterministic_llm_cites_and_scopes(self):
        row = _row(temporal_detected=True,
                   temporal_context_str="Information as of: 2022-12-31")
        answer = DeterministicLlm()(render_prompt(row))
        assert answer.startswith('According to Source 1 ("Page A", '
                                 "2023-05-04): Alpha text.")
        assert "[time period: Information as of: 2022-12-31]" in answer

    def test_retry_then_success(self):
        stage = AnswerStage(client_factory=_FlakyClient, max_attempts=3)
        out = stage(pd.DataFrame([_row()]))
        assert out["answer"].iloc[0] == "According to Source 1, alpha."
        assert bool(out["verified"].iloc[0])
        assert stage._client.calls == 3

    def test_poison_client_completes_with_error_row(self):
        stage = AnswerStage(client_factory=_DeadClient, max_attempts=2)
        out = stage(pd.DataFrame([_row()]))
        assert out["answer"].iloc[0] == "Error generating answer"
        # verify still runs: the error answer lacks nothing length-wise,
        # pipeline completes rather than raising
        assert len(out) == 1

    def test_no_context_short_circuits_generate(self):
        stage = AnswerStage(client_factory=_DeadClient)
        out = stage(pd.DataFrame(
            [_row(formatted_context=NO_CONTEXT_SENTINEL, num_results=0)]))
        assert out["answer"].iloc[0] == NO_ANSWER_SENTINEL

    def test_verify_notes(self):
        ok, notes = AnswerStage._verify(_row(), "short")
        assert not ok and "too short" in notes
        ok, notes = AnswerStage._verify(
            _row(temporal_detected=True), "A plain answer with no markers!")
        assert ok  # notes-only checks don't fail verification
        assert "citations" in notes and "temporal" in notes


# ---------------------------------------------------------------------------
# end-to-end batch pipeline over a tiny synthesized KG
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_kg(ray_session, tmp_path_factory):
    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("rag_kg"))
    pages = rd.from_arrow(pages_table(list(range(40))))
    return build_kg(pages, out, alias_table=alias_table())


def test_rag_answer_batch_end_to_end(tiny_kg):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.rag import (
        RAG_OUTPUT_COLUMNS,
        rag_answer_batch,
    )

    nodes = rd.read_parquet(tiny_kg["nodes"]).to_pandas().to_dict("records")
    queries = synth_rag_queries(nodes)
    df = rag_answer_batch(
        rd.read_parquet(tiny_kg["chunk_ents"]),
        rd.read_parquet(tiny_kg["mentions"]),
        queries, max_context_length=1200,
    )
    assert list(df.columns) == RAG_OUTPUT_COLUMNS
    assert df["query_id"].tolist() == [q["query_id"] for q in queries]
    assert (df["num_results"] > 0).all()
    assert (df["context_length"] > 0).all()
    assert df["verified"].all()
    # every answer cites its top source
    assert df["answer"].str.startswith("According to Source 1").all()
    # the batch is deterministic
    df2 = rag_answer_batch(
        rd.read_parquet(tiny_kg["chunk_ents"]),
        rd.read_parquet(tiny_kg["mentions"]),
        queries, max_context_length=1200,
    )
    pd.testing.assert_frame_equal(df, df2)


def test_rag_distributed_reduce_output_identity(tiny_kg):
    """distributed_reduce=True (the 100 TB driver-state bound) must be
    bit-identical to the driver-collect path: the per-batch truncation
    already preserves each query's global top-pool, the groupby reduce
    only changes WHERE the final truncation happens."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.rag import (
        rag_answer_batch,
    )

    nodes = rd.read_parquet(tiny_kg["nodes"]).to_pandas().to_dict("records")
    queries = synth_rag_queries(nodes)
    frames = [
        rag_answer_batch(
            rd.read_parquet(tiny_kg["chunk_ents"]),
            rd.read_parquet(tiny_kg["mentions"]),
            queries, max_context_length=1200,
            distributed_reduce=flag,
        )
        for flag in (False, True)
    ]
    pd.testing.assert_frame_equal(frames[0], frames[1])


def test_rag_distributed_reduce_empty_corpus(tiny_kg):
    """The 100 TB reduce path must degrade to the no-hit sentinels on an
    empty corpus exactly like the driver path (the groupby would raise
    on the schema-less scored dataset without the count guard)."""
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.rag import rag_answer_batch

    chunks = rd.read_parquet(tiny_kg["chunk_ents"]).filter(lambda r: False)
    mentions = rd.read_parquet(tiny_kg["mentions"]).filter(lambda r: False)
    df = rag_answer_batch(chunks, mentions,
                          [{"query_id": 0, "query": "What about Acme?"}],
                          distributed_reduce=True)
    assert df["formatted_context"].iloc[0] == NO_CONTEXT_SENTINEL
    assert df["num_results"].iloc[0] == 0


def test_rag_no_hits_yields_sentinels(tiny_kg):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.pipelines.rag import rag_answer_batch

    # a query whose text embeds to SOMETHING always ranks chunks by cosine,
    # so force the no-context path with an empty corpus instead
    chunks = rd.read_parquet(tiny_kg["chunk_ents"]).filter(
        lambda r: False)
    mentions = rd.read_parquet(tiny_kg["mentions"]).filter(lambda r: False)
    df = rag_answer_batch(chunks, mentions,
                          [{"query_id": 0, "query": "What about Acme?"}])
    assert df["formatted_context"].iloc[0] == NO_CONTEXT_SENTINEL
    assert df["answer"].iloc[0] == NO_ANSWER_SENTINEL
    assert df["num_results"].iloc[0] == 0
