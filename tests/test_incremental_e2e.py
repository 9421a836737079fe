"""Recurring-crawl end-to-end: snapshot 1 seeds BOTH persisted dedup
stores (exact fingerprints + MinHash near-dup state); snapshot 2 — a
mix of byte-exact recrawls, near-copy recrawls (one word changed),
within-snapshot duplicates and genuinely fresh docs — flows through
exact-store dedup then near-store dedup, and exactly the fresh docs
survive. The composition is the production shape: the cheap exact
store absorbs byte-identical recrawls first, the near store catches
the edited ones, both update so snapshot 3 dedups against everything
seen."""

from __future__ import annotations

import pyarrow as pa
import pytest

from temporal_knowledge_graphs_ray.stages.incdedup import (
    dedup_against_store,
    write_fingerprint_store,
)
from temporal_knowledge_graphs_ray.stages.incneardup import (
    neardup_against_store,
    write_neardup_store,
)


def _doc(i: int, n_words: int = 30) -> str:
    return " ".join(f"v{i}w{j}" for j in range(n_words))


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


@pytest.fixture()
def stores(tmp_path, ray_session):
    snap1 = [(i, _doc(i)) for i in range(40)]
    fp_store = str(tmp_path / "fp-store")
    mh_store = str(tmp_path / "mh-store")
    write_fingerprint_store(_ds(snap1), fp_store)
    write_neardup_store(_ds(snap1), mh_store)
    return fp_store, mh_store


def _snapshot2():
    docs = []
    # 8 byte-exact recrawls of snapshot-1 docs (exact store drops)
    docs += [(1000 + i, _doc(i)) for i in range(8)]
    # 6 near-copy recrawls: LAST word changed (ONLY the near store
    # catches these — the fingerprint differs; the last word touches
    # only 1 of 28 shingles, so true J ~0.93 sits comfortably above
    # the 0.8 threshold — an interior edit at word 3 gives J ~0.806,
    # right AT the threshold where the signature estimator
    # deterministically lands below for some docs)
    for i in range(10, 16):
        words = _doc(i).split()
        words[-1] = "EDITED"
        docs.append((2000 + i, " ".join(words)))
    # 4 within-snapshot exact duplicates of one fresh doc (exact store
    # keeps the min-id representative among them)
    docs += [(3000 + k, _doc(500)) for k in range(4)]
    # 10 genuinely fresh docs
    docs += [(4000 + i, _doc(600 + i)) for i in range(10)]
    return docs


def test_two_stage_incremental_dedup(stores, ray_session):
    fp_store, mh_store = stores
    snap2 = _snapshot2()

    after_exact = dedup_against_store(
        _ds(snap2), fp_store, update_store=True).materialize()
    # exact stage: byte-exact recrawls gone; near-copies + the single
    # representative of the within-dup group + fresh docs remain
    assert _ids(after_exact) == (
        [2000 + i for i in range(10, 16)] + [3000]
        + [4000 + i for i in range(10)])

    survivors = neardup_against_store(
        after_exact, mh_store, update_store=True).materialize()
    # near stage: the edited recrawls match their snapshot-1 originals
    assert _ids(survivors) == [3000] + [4000 + i for i in range(10)]

    # snapshot 3: recrawls of snapshot-2 SURVIVORS (exact + edited)
    # and of a snapshot-2 near-copy must all drop; fresh passes
    words = _doc(605).split()
    words[-1] = "EDITED2"
    snap3 = [
        (7000, _doc(600)),          # exact recrawl of a snap2 survivor
        (7001, " ".join(words)),    # near-copy of a snap2 survivor
        (7002, _doc(500)),          # exact recrawl of the dup-group rep
        (7003, _doc(900)),          # fresh
    ]
    s3 = dedup_against_store(_ds(snap3), fp_store).materialize()
    assert _ids(s3) == [7001, 7003]  # exact copies absorbed
    s3b = neardup_against_store(s3, mh_store).materialize()
    assert _ids(s3b) == [7003]  # edited copy absorbed by the near store


def test_curate_funnel_with_persisted_stores(tmp_path, ray_session):
    """The recurring-crawl production shape: snapshot 1 curates with
    --update-stores seeding both stores; snapshot 2's funnel drops its
    byte-exact and near-copy recrawls through the store legs and only
    the fresh docs reach the curated output."""
    from temporal_knowledge_graphs_ray.pipelines.curate import (
        curate_corpus,
    )

    fp_store = str(tmp_path / "fp")
    mh_store = str(tmp_path / "mh")
    snap1 = [(i, _doc(i)) for i in range(20)]
    rep1 = curate_corpus(
        _ds(snap1), str(tmp_path / "out1"),
        fingerprint_store=fp_store, neardup_store=mh_store,
        update_stores=True, min_words=3)
    assert rep1["stores_updated"] and rep1["curated_docs"] == 20

    snap2 = []
    snap2 += [(1000 + i, _doc(i)) for i in range(5)]      # exact recrawls
    for i in range(8, 12):                                # near recrawls
        words = _doc(i).split()
        words[-1] = "EDITED"
        snap2.append((2000 + i, " ".join(words)))
    snap2 += [(3000 + i, _doc(700 + i)) for i in range(6)]  # fresh
    rep2 = curate_corpus(
        _ds(snap2), str(tmp_path / "out2"),
        fingerprint_store=fp_store, neardup_store=mh_store,
        update_stores=True, min_words=3)
    # 5 exact recrawls die in the store-exact leg, 4 near recrawls in
    # the store-neardup leg, 6 fresh survive
    assert rep2["after_exact_dedup"] - rep2["after_store_exact_dedup"] == 5
    assert rep2["store_neardup_matched"] == 4
    assert rep2["curated_docs"] == 6

    import ray.data as rd

    out2 = sorted(r["doc_id"] for r in
                  rd.read_parquet(str(tmp_path / "out2")).take_all())
    assert out2 == [3000 + i for i in range(6)]

    # snapshot 3 sees snapshot 2's fresh docs via the updated stores
    snap3 = [(9000, _doc(700)), (9001, _doc(800))]
    rep3 = curate_corpus(
        _ds(snap3), str(tmp_path / "out3"),
        fingerprint_store=fp_store, neardup_store=mh_store,
        min_words=3)
    assert rep3["curated_docs"] == 1


def test_curate_typod_store_paths_refuse(tmp_path, ray_session):
    """Without update_stores, a missing store path is a loud error —
    silently deduping against nothing would pollute the training mix."""
    from temporal_knowledge_graphs_ray.pipelines.curate import (
        curate_corpus,
    )

    snap = _ds([(1, _doc(1))])
    with pytest.raises(ValueError, match="does not exist"):
        curate_corpus(snap, str(tmp_path / "o1"),
                      fingerprint_store=str(tmp_path / "fp-typo"))
    with pytest.raises(ValueError, match="does not exist"):
        curate_corpus(snap, str(tmp_path / "o2"),
                      neardup_store=str(tmp_path / "mh-typo"))


def test_cli_curate_with_stores(tmp_path):
    """CLI pass-through of the recurring-crawl flags: two curate
    subprocesses share the stores; the second's report shows the
    store legs firing."""
    import json as _json
    import os as _os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

    def write_snap(name, docs):
        p = str(tmp_path / name)
        pq.write_table(pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string())}), p)
        return p

    def run(args):
        env = dict(_os.environ)
        env["RAY_ADDRESS"] = "local"
        out = subprocess.run(
            [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
             *args, "--num-cpus", "4"],
            capture_output=True, text=True, check=True, cwd=repo,
            env=env, timeout=240)
        return _json.loads(out.stdout.strip().splitlines()[-1])

    fp, mh = str(tmp_path / "fp"), str(tmp_path / "mh")
    snap1 = write_snap("s1.parquet", [(i, _doc(i)) for i in range(12)])
    rep1 = run(["curate", "--documents", snap1,
                "--out", str(tmp_path / "c1"), "--min-words", "3",
                "--fingerprint-store", fp, "--neardup-store", mh,
                "--update-stores"])
    assert rep1["stores_updated"] and rep1["curated_docs"] == 12

    words = _doc(3).split()
    words[-1] = "EDITED"
    snap2 = write_snap("s2.parquet", [
        (100, _doc(0)),            # exact recrawl
        (101, " ".join(words)),    # near recrawl
        (102, _doc(777))])         # fresh
    rep2 = run(["curate", "--documents", snap2,
                "--out", str(tmp_path / "c2"), "--min-words", "3",
                "--fingerprint-store", fp, "--neardup-store", mh])
    assert rep2["after_store_exact_dedup"] == 2
    assert rep2["store_neardup_matched"] == 1
    assert rep2["curated_docs"] == 1
