"""Decontamination: the hashed pipeline (broadcast AND join modes) must
equal an independent string-tuple set oracle exactly — distinct n-gram
counts, overlap counts, and flags — including short-doc and empty-doc
edge semantics."""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
N = 5

_TOK = re.compile(r"[a-z0-9]+")


def _oracle_shingles(text: str, n: int) -> set[tuple[str, ...]]:
    """Independent reimplementation: word tuples, not hashes."""
    words = _TOK.findall((text or "").lower())
    if not words:
        return set()
    if len(words) < n:
        return {tuple(words)}
    return {tuple(words[i:i + n]) for i in range(len(words) - n + 1)}


def _fixture():
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()
    # benchmark = sentences lifted verbatim from some docs (real
    # contamination), plus text present nowhere in the corpus
    bench_texts = [t[50:400] for t in docs["text"].head(20)]
    bench_texts += ["completely novel benchmark question about nothing",
                    "short one", ""]
    bench = pd.DataFrame({"text": bench_texts})
    extra = pd.DataFrame({
        "doc_id": [900001, 900002, 900003],
        "text": ["short one", "", "tiny doc"],  # <N words, empty
    })
    corpus = pd.concat([docs, extra], ignore_index=True)
    return corpus, bench


def _oracle(corpus: pd.DataFrame, bench: pd.DataFrame) -> pd.DataFrame:
    bench_set: set[tuple[str, ...]] = set()
    for t in bench["text"]:
        bench_set |= _oracle_shingles(t, N)
    rows = []
    for _, r in corpus.iterrows():
        sh = _oracle_shingles(r["text"], N)
        hit = len(sh & bench_set)
        rows.append((r["doc_id"], len(sh), hit, hit > 0))
    return pd.DataFrame(rows, columns=["doc_id", "n_ngrams",
                                       "n_contaminated", "contaminated"])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_decontaminate_matches_set_oracle(mode):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.decontaminate import (
        decontaminate,
    )

    corpus, bench = _fixture()
    got = (decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench),
                         n=N, mode=mode)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    want = _oracle(corpus, bench).sort_values("doc_id", ignore_index=True)

    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["n_ngrams"]) == list(want["n_ngrams"])
    assert list(got["n_contaminated"]) == list(want["n_contaminated"])
    assert list(got["contaminated"]) == list(want["contaminated"])
    # the fixture must actually exercise contamination both ways
    assert want["contaminated"].any()
    assert not want["contaminated"].all()
    # short-doc semantics: "short one" (2 words < N) matches the
    # benchmark's identical short text via the all-words shingle
    row = got.set_index("doc_id").loc[900001]
    assert row["n_ngrams"] == 1 and bool(row["contaminated"])
    empty = got.set_index("doc_id").loc[900002]
    assert empty["n_ngrams"] == 0 and not bool(empty["contaminated"])


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_modes_identical_output():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.decontaminate import (
        decontaminate,
    )

    corpus, bench = _fixture()
    outs = []
    for mode in ("broadcast", "join"):
        outs.append(decontaminate(rd.from_pandas(corpus),
                                  rd.from_pandas(bench), n=N, mode=mode)
                    .to_pandas().sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
