"""Cassette-style live-LLM integration (VERDICT r4 ask #3): build a
small KG end-to-end through the LLM-shaped path — chunk ->
LlmEntityExtractorStage over HTTP (functions/llm_client.py) -> relation
extraction -> graph materialize -> RAG generate over the SAME endpoint
— first against a recording server (responses computed once, every
(request, response) pair recorded to a cassette file), then REPLAYED
from the cassette by a strict server that refuses unrecorded requests.
The two builds must be byte-identical; the recorded path must also
agree with the deterministic-extractor build at triple P/R >= 0.95
(the north_rule gate, reference entity_extractor.py:56-118 /
relation_extractor.py:41-141 contract)."""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow.dataset as pads
import pytest

from temporal_knowledge_graphs_ray.functions import ner
from temporal_knowledge_graphs_ray.pipelines.rag import DeterministicLlm


def _compute_response(user_content: str) -> str:
    """What the 'live LLM' said during the recording session: entity
    JSON (fenced, exercising the llm_json repair path) for extraction
    prompts, a rendered answer for RAG generate prompts."""
    if ("\nTemporal scope: " in user_content
            and "Question: " in user_content):
        return DeterministicLlm()(user_content)
    ents = [{"name": e["name"], "type": e["type"]}
            for e in ner.extract_entities(user_content)]
    return "```json\n" + json.dumps(ents) + "\n```"


def _make_handler(cassette: dict, record: bool, misses: list):
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            key = hashlib.sha256(body).hexdigest()
            if record:
                if key not in cassette:
                    req = json.loads(body)
                    content = req["messages"][1]["content"]
                    cassette[key] = _compute_response(content)
                resp = cassette[key]
            else:
                if key not in cassette:
                    misses.append(body.decode("utf-8", "replace")[:200])
                    self.send_response(500)
                    self.end_headers()
                    return
                resp = cassette[key]
            payload = json.dumps({
                "choices": [{"message": {"content": resp}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    return Handler


class _Server:
    def __init__(self, cassette: dict, record: bool):
        self.misses: list = []
        self.srv = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            _make_handler(cassette, record, self.misses))
        self.thread = threading.Thread(target=self.srv.serve_forever,
                                       daemon=True)
        self.thread.start()
        self.base = f"http://127.0.0.1:{self.srv.server_address[1]}"

    def stop(self):
        self.srv.shutdown()


def _rows(path):
    t = (pads.dataset(path, format="parquet", partitioning="hive")
         .to_table())
    rows = []
    for r in t.to_pylist():
        rows.append(tuple(
            tuple(v) if isinstance(v, list) else v
            for _, v in sorted(r.items())))
    return sorted(rows, key=repr)


@pytest.mark.usefixtures("ray_session")
def test_kg_and_rag_through_recorded_llm_transcripts(tmp_path,
                                                     monkeypatch):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.oracle.kg_oracle import (
        precision_recall,
        triple_set,
    )
    from temporal_knowledge_graphs_ray.pipelines.kg import build_kg
    from temporal_knowledge_graphs_ray.pipelines.rag import (
        rag_answer_batch,
    )
    from temporal_knowledge_graphs_ray.sources.synth import (
        alias_table,
        pages_table,
    )

    pages = pages_table(list(range(40)))
    queries = [{"query_id": i, "query": q} for i, q in enumerate([
        "What did Acme Inc. announce in 2021?",
        "How did OpenAI change over time?",
    ])]
    cassette_path = tmp_path / "cassette.json"

    def _run(out_name: str, server: _Server):
        monkeypatch.setenv("TKG_LLM_API_BASE", server.base)
        res = build_kg(rd.from_arrow(pages), str(tmp_path / out_name),
                       alias_table=alias_table())
        answers = rag_answer_batch(
            rd.read_parquet(res["chunk_ents"]),
            rd.read_parquet(res["mentions"]), queries)
        return res, answers

    # ---- recording session ----
    cassette: dict = {}
    rec_srv = _Server(cassette, record=True)
    try:
        res_rec, ans_rec = _run("llm_rec", rec_srv)
    finally:
        rec_srv.stop()
    assert cassette, "no HTTP transcripts recorded — LLM path not taken"
    cassette_path.write_text(json.dumps(cassette))

    # ---- replay session: strict matcher over the SAVED transcripts ----
    replay = json.loads(cassette_path.read_text())
    rep_srv = _Server(replay, record=False)
    try:
        res_rep, ans_rep = _run("llm_rep", rep_srv)
    finally:
        rep_srv.stop()
    assert not rep_srv.misses, f"unrecorded requests: {rep_srv.misses}"

    # byte-identical KG across record/replay (the ask's gate)
    for key in ("nodes", "edges", "mentions"):
        assert _rows(res_rec[key]) == _rows(res_rep[key]), key
    # identical RAG answers through the same transcripts
    assert ans_rec.equals(ans_rep)
    assert (ans_rec["answer"].str.len() > 10).all()

    # ---- the LLM-path build vs the deterministic-extractor build ----
    monkeypatch.delenv("TKG_LLM_API_BASE")
    res_det = build_kg(rd.from_arrow(pages), str(tmp_path / "det"),
                       alias_table=alias_table())
    got = triple_set(_read_edges(res_rec["edges"]))
    want = triple_set(_read_edges(res_det["edges"]))
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)


def _read_edges(path):
    return (pads.dataset(path, format="parquet", partitioning="hive")
            .to_table().to_pylist())
