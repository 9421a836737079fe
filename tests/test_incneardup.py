"""Incremental cross-snapshot NEAR-dedup: the distributed operator must
equal the pure-Python sequential oracle (same kernels, same shared-band
+ signature-agreement rule, no caps), broadcast and anti-join paths
must agree, a store update must make a replayed increment vanish, and
the hot-band partner cap must not cost the planted cluster (one
surviving partner is enough to drop a doc)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from temporal_knowledge_graphs_ray.stages.incneardup import (
    compact_neardup_store,
    neardup_against_store,
    neardup_against_store_sequential,
    write_neardup_store,
)


def _doc(i: int, n_words: int = 30) -> str:
    # doc-unique vocabulary -> disjoint shingles across distinct docs,
    # so only planted relationships can match
    return " ".join(f"w{i}x{j}" for j in range(n_words))


def _store_docs() -> list[tuple[int, str]]:
    return [(i, _doc(i)) for i in range(30)]


def _new_docs() -> list[tuple[int, str]]:
    docs: list[tuple[int, str]] = []
    # 10 fresh (unique vocab: survive)
    docs += [(1000 + i, _doc(100 + i)) for i in range(10)]
    # 5 exact copies of store docs (agreement 1.0: dropped)
    docs += [(2000 + i, _doc(i)) for i in range(5)]
    # 5 near-copies: last word changed (shingle Jaccard ~0.9: dropped)
    for i in range(5, 10):
        words = _doc(i).split()
        words[-1] = "CHANGED"
        docs.append((3000 + i, " ".join(words)))
    # 2 short docs (< shingle_k words: no full shingle, always survive)
    docs += [(4000, "too short"), (4001, "ab")]
    return docs


def _ds(docs: list[tuple[int, str]]):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string())}))


@pytest.fixture()
def store(tmp_path, ray_session):
    store_dir = str(tmp_path / "mh-store")
    n = write_neardup_store(_ds(_store_docs()), store_dir)
    assert n == 30
    return store_dir


def _survivor_ids(ds) -> list[int]:
    return sorted(r["doc_id"] for r in ds.take_all())


def test_matches_sequential_oracle(store, ray_session):
    got = _survivor_ids(neardup_against_store(_ds(_new_docs()), store))
    want = sorted(neardup_against_store_sequential(
        _store_docs(), _new_docs()))
    assert got == want
    # semantic spot checks: fresh + short survive, copies drop
    assert set(range(1000, 1010)) <= set(got)
    assert {4000, 4001} <= set(got)
    assert not any(2000 <= d < 2005 for d in got)
    assert not any(3005 <= d < 3010 for d in got)


def test_antijoin_path_equals_broadcast(store, ray_session):
    a = _survivor_ids(neardup_against_store(_ds(_new_docs()), store))
    b = _survivor_ids(neardup_against_store(
        _ds(_new_docs()), store, broadcast_limit=0))
    assert a == b


def test_update_store_then_replay(store, ray_session):
    surv, stats = neardup_against_store(
        _ds(_new_docs()), store, update_store=True, return_stats=True)
    first = _survivor_ids(surv)
    assert stats["matched"] == len(_new_docs()) - len(first)
    assert stats["candidates"] >= stats["matched"]
    # replay: every survivor with a full shingle now self-matches the
    # store (agreement 1.0); only the short docs come back
    replay = _survivor_ids(neardup_against_store(_ds(_new_docs()), store))
    assert replay == [4000, 4001]


def test_third_snapshot_sees_second(store, ray_session):
    neardup_against_store(_ds(_new_docs()), store, update_store=True)
    # near-copy of a FRESH doc from snapshot 2 (id 1003 -> vocab 103)
    words = _doc(103).split()
    words[0] = "CHANGED"
    third = [(5000, " ".join(words)), (5001, _doc(500))]
    got = _survivor_ids(neardup_against_store(_ds(third), store))
    assert got == [5001]


def test_empty_store_all_survive(tmp_path, ray_session):
    store_dir = str(tmp_path / "empty-store")
    got = _survivor_ids(neardup_against_store(_ds(_new_docs()), store_dir))
    assert got == sorted(d for d, _ in _new_docs())


def test_meta_mismatch_raises(store, ray_session):
    with pytest.raises(ValueError, match="built with"):
        neardup_against_store(_ds(_new_docs()), store, num_bands=8)
    with pytest.raises(ValueError, match="built with"):
        write_neardup_store(_ds(_new_docs()), store, shingle_k=5)
    meta = json.load(open(os.path.join(store, "_meta.json")))
    assert meta == {"num_perm": 64, "num_bands": 16, "shingle_k": 3}


def test_compaction_preserves_membership(store, ray_session):
    neardup_against_store(_ds(_new_docs()), store, update_store=True)
    before = _survivor_ids(neardup_against_store(_ds(_new_docs()), store))
    out = compact_neardup_store(store)
    assert out["bands"]["increments_after"] == 1
    assert out["sigs"]["increments_after"] == 1
    after = _survivor_ids(neardup_against_store(_ds(_new_docs()), store))
    assert before == after
    # a further compaction is a no-op
    again = compact_neardup_store(store)
    assert again["bands"]["increments_before"] == 1


def test_hot_band_cap_keeps_recall(tmp_path, ray_session, monkeypatch):
    from temporal_knowledge_graphs_ray.stages import incneardup

    monkeypatch.setattr(incneardup, "_MAX_STORE_PARTNERS", 1)
    store_dir = str(tmp_path / "hot-store")
    # 12 identical store docs under distinct ids: every band group is
    # 12 deep, so cap=1 skips 11 partners per (new doc, band) — but one
    # partner is enough to drop the matching new doc
    hot = [(i, _doc(7)) for i in range(100, 112)]
    write_neardup_store(_ds(hot), store_dir)
    new = [(9000, _doc(7)), (9001, _doc(777))]
    surv, stats = neardup_against_store(
        _ds(new), store_dir, return_stats=True)
    assert _survivor_ids(surv) == [9001]
    assert stats["hot_band_skipped"] > 0
    assert stats["matched"] == 1


def test_real_testdata_matches_oracle(ray_session):
    """sf0.001 documents split by source into store/new: the operator
    must equal the sequential oracle on real text."""
    import duckdb

    sf = "/root/testdata/sf0.001/documents.parquet"
    old = duckdb.sql(f"""
        SELECT doc_id, text FROM read_parquet('{sf}')
        WHERE source IN ('src0','src1','src2','src3','src4')
        ORDER BY doc_id""").fetchall()
    new = duckdb.sql(f"""
        SELECT doc_id, text FROM read_parquet('{sf}')
        WHERE source NOT IN ('src0','src1','src2','src3','src4')
        ORDER BY doc_id""").fetchall()
    # plant 5 recrawls of store docs under fresh ids
    new += [(did + 1_000_000, text) for did, text in old[:5]]
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        store = f"{td}/store"
        write_neardup_store(_ds(old), store)
        got = _survivor_ids(neardup_against_store(_ds(new), store))
    want = sorted(neardup_against_store_sequential(old, new))
    assert got == want
    assert not any(d >= 1_000_000 for d in got)  # recrawls dropped


def test_cli_incneardup_subcommand(tmp_path):
    import json
    import os
    import subprocess
    import sys

    sf = "/root/testdata/sf0.001/documents.parquet"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(args):
        env = dict(os.environ)
        env["RAY_ADDRESS"] = "local"
        out = subprocess.run(
            [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
             *args, "--num-cpus", "4"],
            capture_output=True, text=True, check=True, cwd=repo,
            env=env, timeout=240)
        return json.loads(out.stdout.strip().splitlines()[-1])

    store = str(tmp_path / "store")
    rep = run(["incneardup", "--store", store, "--init-from", sf])
    assert rep["docs"] > 0
    out = str(tmp_path / "surv")
    # replay the same corpus: every doc with a full shingle self-matches
    rep2 = run(["incneardup", "--store", store,
                "--documents", sf, "--out", out])
    assert rep2["matched"] == rep2["new_docs_with_shingles"]
    assert rep2["survivors"] == 500 - rep2["new_docs_with_shingles"]


def test_all_short_corpus_writes_nothing_and_replays(tmp_path, ray_session):
    """A corpus with no full shingles must init to an empty store (not
    crash in the append), and an update-store run whose survivors are
    all shingle-less must likewise append nothing."""
    store_dir = str(tmp_path / "short-store")
    shorts = [(1, "too short"), (2, "ab"), (3, "")]
    assert write_neardup_store(_ds(shorts), store_dir) == 0
    got = _survivor_ids(neardup_against_store(
        _ds(shorts), store_dir, update_store=True))
    assert got == [1, 2, 3]
    # store still holds nothing: a real doc passes through untouched
    got2 = _survivor_ids(neardup_against_store(
        _ds([(9, _doc(9))]), store_dir))
    assert got2 == [9]


def test_update_store_reuses_state_not_text(store, ray_session,
                                            monkeypatch):
    """update_store must append the FILTERED precomputed state, not
    re-shingle the survivors: after the dedup pass, minhash_state_rows
    must not run again."""
    from temporal_knowledge_graphs_ray.stages import incneardup

    calls = {"n": 0}
    real = incneardup.minhash_state_rows

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(incneardup, "minhash_state_rows", counting)
    incneardup.neardup_against_store(_ds(_new_docs()), store,
                                     update_store=True)
    assert calls["n"] == 1


def test_bucket_scaling_is_output_invariant(store, ray_session,
                                            monkeypatch):
    from temporal_knowledge_graphs_ray.stages import incneardup

    assert incneardup._scaled_num_buckets(store) == 64  # tiny store
    base = _survivor_ids(neardup_against_store(_ds(_new_docs()), store))
    # force a wider bucket count: 30 docs x 16 bands = 480 rows / 4 -> 128
    monkeypatch.setattr(incneardup, "_BAND_ROWS_PER_BUCKET", 4)
    assert incneardup._scaled_num_buckets(store) == 128
    wide = _survivor_ids(neardup_against_store(_ds(_new_docs()), store))
    assert base == wide
    # sidecar-missing fallback: footer scan gives the same answer
    os.remove(incneardup._counts_path(store, "bands"))
    assert incneardup._scaled_num_buckets(store) == 128


def test_cli_empty_survivors_still_writes_out(tmp_path):
    """0 survivors must still publish --out as an empty, readable
    parquet dataset with the snapshot's schema."""
    import json
    import os
    import subprocess
    import sys

    import duckdb
    import pyarrow.parquet as pq

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array([_doc(1), _doc(2)])})
    snap = str(tmp_path / "snap.parquet")
    pq.write_table(docs, snap)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(args):
        env = dict(os.environ)
        env["RAY_ADDRESS"] = "local"
        out = subprocess.run(
            [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
             *args, "--num-cpus", "4"],
            capture_output=True, text=True, check=True, cwd=repo,
            env=env, timeout=240)
        return json.loads(out.stdout.strip().splitlines()[-1])

    store = str(tmp_path / "store")
    run(["incneardup", "--store", store, "--init-from", snap])
    out = str(tmp_path / "surv")
    rep = run(["incneardup", "--store", store,
               "--documents", snap, "--out", out])
    assert rep["survivors"] == 0
    rows, cols = duckdb.sql(
        f"SELECT count(*), count(DISTINCT 1) FROM "
        f"read_parquet('{out}/*.parquet')").fetchone()
    assert rows == 0
    schema = pq.read_schema(os.path.join(out, "part-00000.parquet"))
    assert schema.names == ["doc_id", "text"]


@pytest.mark.parametrize("seed,threshold,num_bands", [
    (11, 0.8, 16), (29, 0.5, 8), (47, 0.9, 32)])
def test_randomized_corpus_matches_oracle(tmp_path, ray_session, seed,
                                          threshold, num_bands):
    """Random small-vocabulary corpora (accidental partial overlaps, so
    many signature agreements land NEAR the threshold) must agree with
    the sequential oracle exactly — both sides share the kernels, so
    estimator variance cannot diverge them; non-default store
    parameters ride through _meta.json end-to-end."""
    import numpy as np

    rng = np.random.RandomState(seed)
    vocab = [f"tok{v}" for v in range(40)]  # small vocab -> overlaps

    def rand_doc():
        n = rng.randint(3, 25)
        return " ".join(rng.choice(vocab, size=n))

    old = [(i, rand_doc()) for i in range(60)]
    new = [(1000 + i, rand_doc()) for i in range(60)]
    # plus mutated copies of store docs (high-but-not-1 agreement)
    for j in range(10):
        words = old[j][1].split()
        words[rng.randint(len(words))] = "mut"
        new.append((2000 + j, " ".join(words)))

    store_dir = str(tmp_path / f"rand-store-{seed}")
    write_neardup_store(_ds(old), store_dir, num_bands=num_bands)
    got = _survivor_ids(neardup_against_store(
        _ds(new), store_dir, jaccard_threshold=threshold,
        num_bands=num_bands))
    want = sorted(neardup_against_store_sequential(
        old, new, jaccard_threshold=threshold, num_bands=num_bands))
    assert got == want


def test_missing_store_leaves_no_side_effects(tmp_path, ray_session):
    """The dedup/read path must NOT create the store dir or _meta.json
    for a nonexistent path (a typo'd --store would otherwise leave a
    bogus half-initialized store and silently keep everything)."""
    store_dir = str(tmp_path / "typo-store")
    got = _survivor_ids(neardup_against_store(_ds(_new_docs()),
                                              store_dir))
    assert got == sorted(d for d, _ in _new_docs())
    assert not os.path.exists(store_dir)


def test_cli_missing_store_is_an_error(tmp_path):
    import os as _os
    import subprocess
    import sys

    sf = "/root/testdata/sf0.001/documents.parquet"
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env = dict(_os.environ)
    env["RAY_ADDRESS"] = "local"
    out = subprocess.run(
        [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
         "incneardup", "--store", str(tmp_path / "no-such-store"),
         "--documents", sf, "--out", str(tmp_path / "surv")],
        capture_output=True, text=True, cwd=repo, env=env, timeout=120)
    assert out.returncode == 2
    assert "does not exist" in out.stderr


def test_cli_output_invariant_across_parallelism(tmp_path):
    """House gate: identical survivors at --num-cpus 2 and 4 (block
    layout and shuffle parallelism must not leak into the result)."""
    import os as _os
    import subprocess
    import sys

    import duckdb

    sf = "/root/testdata/sf0.001/documents.parquet"
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

    def run(args, ncpu):
        env = dict(_os.environ)
        env["RAY_ADDRESS"] = "local"
        subprocess.run(
            [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
             *args, "--num-cpus", str(ncpu)],
            capture_output=True, text=True, check=True, cwd=repo,
            env=env, timeout=240)

    outs = {}
    for ncpu in (2, 4):
        store = str(tmp_path / f"store-{ncpu}")
        out = str(tmp_path / f"surv-{ncpu}")
        run(["incneardup", "--store", store, "--init-from", sf], ncpu)
        # dedup a disjoint slice (planted recrawls via doc_id shift)
        snap = str(tmp_path / f"snap-{ncpu}.parquet")
        duckdb.sql(f"""
            COPY (SELECT doc_id + 50000 AS doc_id, text
                  FROM read_parquet('{sf}') WHERE doc_id % 3 = 0
                  UNION ALL
                  SELECT doc_id + 90000, 'fresh doc ' ||
                         repeat('u' || doc_id || ' ', 10)
                  FROM read_parquet('{sf}') WHERE doc_id % 7 = 0)
            TO '{snap}' (FORMAT PARQUET)""")
        run(["incneardup", "--store", store, "--documents", snap,
             "--out", out], ncpu)
        outs[ncpu] = [r[0] for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{out}/*.parquet') "
            "ORDER BY doc_id").fetchall()]
    assert outs[2] == outs[4]
    assert all(d >= 90000 for d in outs[2])  # recrawls all absorbed


def test_store_data_without_meta_refuses(store, ray_session):
    """A store whose _meta.json was lost (partial copy) but still has
    band/sig data cannot be parameter-validated — the read path must
    refuse loudly, not warn-and-match-nothing."""
    os.remove(os.path.join(store, "_meta.json"))
    with pytest.raises(ValueError, match="no\\s+_meta.json"):
        neardup_against_store(_ds(_new_docs()), store)


def test_corrupt_counts_sidecar_degrades(store, ray_session):
    """A damaged _counts.json falls back to the footer scan (and the
    next append rewrites it) instead of bricking the store."""
    from temporal_knowledge_graphs_ray.stages import incneardup

    with open(incneardup._counts_path(store, "bands"), "w") as f:
        f.write("{ not json")
    assert incneardup._scaled_num_buckets(store) == 64
    got = _survivor_ids(neardup_against_store(
        _ds(_new_docs()), store, update_store=True))
    assert 4000 in got  # pipeline still works end to end
    # the append rewrote a valid sidecar
    assert isinstance(incneardup._load_counts(store, "bands"), dict)
    assert incneardup._load_counts(store, "bands")


def test_cli_compact_missing_store_is_an_error(tmp_path):
    import os as _os
    import subprocess
    import sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env = dict(_os.environ)
    env["RAY_ADDRESS"] = "local"
    for cmd in (["incneardup", "--store", str(tmp_path / "nope"),
                 "--compact"],
                ["incdedup", "--store", str(tmp_path / "nope2"),
                 "--documents", "x.parquet", "--out",
                 str(tmp_path / "o")]):
        out = subprocess.run(
            [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
             *cmd], capture_output=True, text=True, cwd=repo, env=env,
            timeout=120)
        assert out.returncode == 2
        assert "does not exist" in out.stderr


def test_remove_from_store_takedown(store, ray_session):
    """Takedown: removed docs stop matching future crawls; untouched
    store docs still match; increments consolidate to one entry."""
    from temporal_knowledge_graphs_ray.stages.incneardup import (
        remove_from_neardup_store,
    )

    # before: exact copies of store docs 0 and 1 both match
    probes = [(8000, _doc(0)), (8001, _doc(1))]
    assert _survivor_ids(neardup_against_store(_ds(probes), store)) == []

    out = remove_from_neardup_store(store, [0, 999999])  # 999999: no-op
    assert out["removed_ids"] == 2
    assert out["sigs"]["rows_before"] == 30
    assert out["sigs"]["rows_after"] == 29
    assert out["bands"]["rows_after"] == 29 * 16

    # after: the copy of removed doc 0 survives; doc 1's copy still drops
    got = _survivor_ids(neardup_against_store(_ds(probes), store))
    assert got == [8000]
    # removal is idempotent
    again = remove_from_neardup_store(store, [0])
    assert again["sigs"]["rows_after"] == 29


def test_cli_remove_ids_file(tmp_path):
    import json as _json
    import os as _os
    import subprocess
    import sys

    sf = "/root/testdata/sf0.001/documents.parquet"
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

    def run(args):
        env = dict(_os.environ)
        env["RAY_ADDRESS"] = "local"
        out = subprocess.run(
            [sys.executable, "-m", "temporal_knowledge_graphs_ray.cli",
             *args, "--num-cpus", "4"],
            capture_output=True, text=True, check=True, cwd=repo,
            env=env, timeout=240)
        return _json.loads(out.stdout.strip().splitlines()[-1])

    store = str(tmp_path / "store")
    rep = run(["incneardup", "--store", store, "--init-from", sf])
    ids_file = str(tmp_path / "takedown.txt")
    with open(ids_file, "w") as f:
        f.write("0\n1\n2\n")
    rep2 = run(["incneardup", "--store", store,
                "--remove-ids-file", ids_file])
    assert rep2["sigs"]["rows_before"] - rep2["sigs"]["rows_after"] <= 3
    assert rep2["sigs"]["rows_after"] < rep["docs"]


def test_remove_all_docs_leaves_valid_store(store, ray_session):
    """All-removed takedown must succeed (empty increments publish)
    and leave a store that matches nothing but accepts appends."""
    from temporal_knowledge_graphs_ray.stages.incneardup import (
        remove_from_neardup_store,
    )

    out = remove_from_neardup_store(store, range(30))
    assert out["sigs"]["rows_after"] == 0
    probes = [(8000, _doc(0))]
    assert _survivor_ids(neardup_against_store(_ds(probes), store)) \
        == [8000]
    # the emptied store still accepts a fresh append
    assert write_neardup_store(_ds([(50, _doc(50))]), store) == 1
    assert _survivor_ids(neardup_against_store(
        _ds([(8001, _doc(50))]), store)) == []
