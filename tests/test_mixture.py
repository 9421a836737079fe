"""Weighted corpus mixing: membership AND stream order must equal the
DuckDB md5 oracles exactly (both are pure functions of the rows);
composition must track the weights; the shuffle must be decorrelated
from the membership hash (the seed-reuse trap: with the same seed, the
kept = smallest-hash rows of a downsampled corpus would all sort to
the front of the 'shuffled' stream)."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.1/documents.parquet"  # 250 docs per source
SOURCES = ("src0", "src1", "src2")
WEIGHTS = {"src0": 3.0, "src1": 1.0, "src2": 1.0}
SEED = 4


def _corpora_counts():
    rows = duckdb.sql(f"""
        SELECT source, count(*) FROM read_parquet('{SF}')
        WHERE source IN {SOURCES} GROUP BY source
    """).fetchall()
    return {s: n for s, n in rows}


def _oracle(fracs: dict[str, float]):
    from temporal_knowledge_graphs_ray.stages.sampling import (
        fraction_threshold_hex,
    )

    legs = " UNION ALL ".join(
        f"""SELECT doc_id, '{s}' AS corpus FROM read_parquet('{SF}')
            WHERE source = '{s}'
              AND md5(concat('{SEED}|{s}', '|', doc_id))
                  < '{fraction_threshold_hex(fracs[s])}'"""
        for s in SOURCES)
    return duckdb.sql(f"""
        WITH kept AS ({legs})
        SELECT doc_id, corpus FROM kept
        ORDER BY md5(concat('{SEED}#shuffle', '|',
                            corpus || '|' || CAST(doc_id AS VARCHAR))),
                 corpus || '|' || CAST(doc_id AS VARCHAR)
    """).df()


def _mixed_df():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.mixture import mix_corpora

    corpora = {
        s: rd.read_parquet(SF, columns=["doc_id", "text", "source"])
             .filter(expr=f"source == '{s}'")
        for s in SOURCES}
    out = mix_corpora(corpora, WEIGHTS, "doc_id", seed=SEED,
                      num_shards=16).to_pandas()
    return out.sort_values(["shard", "pos"], ignore_index=True)


def test_mixture_plan():
    from temporal_knowledge_graphs_ray.stages.mixture import mixture_plan

    plan = mixture_plan({"a": 100, "b": 300}, {"a": 1.0, "b": 1.0})
    assert plan == {"a": 1.0, "b": pytest.approx(1 / 3)}
    half = mixture_plan({"a": 100, "b": 300}, {"a": 1.0, "b": 1.0},
                        scale=0.5)
    assert half == {"a": 0.5, "b": pytest.approx(1 / 6)}
    with pytest.raises(ValueError, match="same corpora"):
        mixture_plan({"a": 1}, {"b": 1.0})
    with pytest.raises(ValueError, match="positive"):
        mixture_plan({"a": 1}, {"a": 0.0})
    with pytest.raises(ValueError, match="scale"):
        mixture_plan({"a": 1}, {"a": 1.0}, scale=0.0)


@pytest.mark.usefixtures("ray_session")
def test_membership_and_order_match_duckdb():
    from temporal_knowledge_graphs_ray.stages.mixture import mixture_plan

    got = _mixed_df()
    fracs = mixture_plan(_corpora_counts(), WEIGHTS)
    want = _oracle(fracs)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["corpus"].tolist() == want["corpus"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_composition_tracks_weights_and_stream_is_mixed():
    got = _mixed_df()
    by = got["corpus"].value_counts()
    # src0 keeps all 250; src1/src2 downsample to ~250/3 each
    assert by["src0"] == 250
    assert 55 <= by["src1"] <= 115 and 55 <= by["src2"] <= 115
    # decorrelation: each corpus should put roughly half its rows in
    # the first half of the stream (seed-reuse would put ALL of a
    # downsampled corpus's rows at the front)
    half = got.head(len(got) // 2)
    for s in SOURCES:
        share = (half["corpus"] == s).sum() / by[s]
        assert 0.3 < share < 0.7, (s, share)


@pytest.mark.usefixtures("ray_session")
def test_reserved_columns_refused():
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.mixture import mix_corpora

    ds = rd.from_items([{"doc_id": 1, "corpus": "x"}])
    with pytest.raises(ValueError, match="reserved"):
        mix_corpora({"a": ds}, {"a": 1.0}, "doc_id")
