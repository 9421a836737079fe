"""Incremental cross-snapshot dedup: surviving ids must equal the
DuckDB oracle (min-id representative per NEW fingerprint, fingerprint
NOT IN store), broadcast and anti-join paths must agree, and a store
update must make a replayed increment vanish entirely."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"
FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


@pytest.fixture()
def snapshots(tmp_path):
    """old = src0..src4 docs; new = src5..src9 docs + 5 recrawled old
    texts under fresh ids + 3 within-increment duplicates."""
    con = duckdb.connect()
    old = con.execute(f"""
        SELECT doc_id, text FROM read_parquet('{SF}')
        WHERE source IN ('src0','src1','src2','src3','src4')
    """).arrow()
    base_new = con.execute(f"""
        SELECT doc_id, text FROM read_parquet('{SF}')
        WHERE source IN ('src5','src6','src7','src8','src9')
    """).arrow()
    recrawl = con.execute(f"""
        SELECT doc_id + 100000 AS doc_id, text FROM read_parquet('{SF}')
        WHERE source = 'src1' LIMIT 5
    """).arrow()
    withindup = con.execute(f"""
        SELECT doc_id + 200000 AS doc_id, text FROM read_parquet('{SF}')
        WHERE source = 'src7' LIMIT 3
    """).arrow()
    new = pa.concat_tables([base_new, recrawl, withindup])
    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    pq.write_table(old, old_p)
    pq.write_table(new, new_p)
    return old_p, new_p, str(tmp_path / "store")


def _oracle_ids(old_p: str, new_p: str) -> list[int]:
    return [r[0] for r in duckdb.sql(f"""
        WITH reps AS (
          SELECT doc_id, {FP_SQL} AS f FROM read_parquet('{new_p}')
          QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1)
        SELECT doc_id FROM reps
        WHERE f NOT IN (SELECT {FP_SQL} FROM read_parquet('{old_p}'))
        ORDER BY doc_id
    """).fetchall()]


def _run(old_p, new_p, store, update=False, broadcast_limit=2_000_000):
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.incdedup import (
        dedup_against_store,
        write_fingerprint_store,
    )
    import os

    if not os.path.isdir(store):
        write_fingerprint_store(rd.read_parquet(old_p), store)
    out = dedup_against_store(rd.read_parquet(new_p), store,
                              update_store=update,
                              broadcast_limit=broadcast_limit)
    df = out.to_pandas()
    return sorted(df["doc_id"].tolist()) if len(df) else []


@pytest.mark.usefixtures("ray_session")
def test_survivors_match_oracle_broadcast(snapshots):
    old_p, new_p, store = snapshots
    got = _run(old_p, new_p, store)
    want = _oracle_ids(old_p, new_p)
    assert got == want
    # non-vacuous: recrawls (1e5+) and within-dups (2e5+) all dropped
    assert all(i < 100000 for i in got) and len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_anti_join_path_identical(snapshots):
    old_p, new_p, store = snapshots
    a = _run(old_p, new_p, store, broadcast_limit=0)  # force the join
    assert a == _oracle_ids(old_p, new_p)


@pytest.mark.usefixtures("ray_session")
def test_update_store_absorbs_increment(snapshots):
    old_p, new_p, store = snapshots
    first = _run(old_p, new_p, store, update=True)
    assert first == _oracle_ids(old_p, new_p)
    # replay the same increment: every fingerprint is now in the store
    again = _run(old_p, new_p, store)
    assert again == []
    import os

    assert len([f for f in os.listdir(store)
                if f.endswith(".parquet")]) == 2


@pytest.mark.usefixtures("ray_session")
def test_empty_store_keeps_all_reps(snapshots, tmp_path):
    _, new_p, _ = snapshots
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.incdedup import (
        dedup_against_store,
    )

    out = dedup_against_store(rd.read_parquet(new_p),
                              str(tmp_path / "nostore"))
    got = sorted(out.to_pandas()["doc_id"].tolist())
    want = [r[0] for r in duckdb.sql(f"""
        SELECT doc_id FROM (
          SELECT doc_id, {FP_SQL} AS f FROM read_parquet('{new_p}')
          QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1)
        ORDER BY doc_id
    """).fetchall()]
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_compact_store_preserves_membership(snapshots):
    import os

    import duckdb as dd

    from temporal_knowledge_graphs_ray.stages.incdedup import (
        compact_fingerprint_store,
    )

    old_p, new_p, store = snapshots
    _run(old_p, new_p, store, update=True)         # store: 2 files
    before = sorted(dd.sql(
        f"SELECT DISTINCT fingerprint FROM "
        f"read_parquet('{store}/*.parquet')").df()["fingerprint"])
    rep = compact_fingerprint_store(store)
    assert rep["files_before"] == 2 and rep["files_after"] == 1
    assert rep["fingerprints"] == len(before)
    files = [f for f in os.listdir(store) if f.endswith(".parquet")]
    assert len(files) == 1
    after = sorted(dd.sql(
        f"SELECT fingerprint FROM "
        f"read_parquet('{store}/*.parquet')").df()["fingerprint"])
    assert after == before                         # distinct, complete
    # replayed increment still fully absorbed post-compaction
    assert _run(old_p, new_p, store) == []
    # compacting a single-file store is a no-op
    assert compact_fingerprint_store(store)["files_after"] == 1


@pytest.mark.usefixtures("ray_session")
def test_increments_after_compaction_never_collide(tmp_path):
    """Regression: increment names derived from the file COUNT reused the
    compacted file's name after compaction left a numbering gap, and
    os.replace silently destroyed all pre-compaction fingerprints."""
    import pandas as pd
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.incdedup import (
        compact_fingerprint_store,
        dedup_against_store,
        write_fingerprint_store,
    )

    store = str(tmp_path / "store")

    def docs(ids):
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": ids, "text": [f"unique text {i}" for i in ids]}))

    write_fingerprint_store(docs([0, 1]), store)           # inc-00000
    dedup_against_store(docs([2, 3]), store,
                        update_store=True).to_pandas()     # inc-00001
    compact_fingerprint_store(store)                       # -> inc-00002
    # two more increments: the second previously computed inc-00002 and
    # overwrote the compacted file holding docs 0..3
    dedup_against_store(docs([4]), store,
                        update_store=True).to_pandas()
    dedup_against_store(docs([5]), store,
                        update_store=True).to_pandas()
    # every historical doc must still be fingerprinted: a full replay
    # yields ZERO new rows
    replay = dedup_against_store(docs([0, 1, 2, 3, 4, 5]), store,
                                 update_store=False).to_pandas()
    assert len(replay) == 0, replay


def test_remove_from_store_takedown(tmp_path, ray_session):
    """Takedown: a removed doc's byte-identical recrawl is no longer
    absorbed; other store content still dedups; all-removed leaves a
    valid empty store."""
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.incdedup import (
        dedup_against_store,
        remove_from_fingerprint_store,
        write_fingerprint_store,
    )

    def ds(docs):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string())}))

    corpus = [(i, f"takedown corpus doc number {i} " * 5)
              for i in range(10)]
    store = str(tmp_path / "fp-store")
    write_fingerprint_store(ds(corpus), store)

    recrawl = [(100 + i, t) for i, (_, t) in enumerate(corpus[:2])]
    assert dedup_against_store(ds(recrawl), store).count() == 0

    out = remove_from_fingerprint_store(store, ds(corpus[:1]))
    assert out["removed_fps"] == 1
    assert out["rows_after"] == 9
    surv = sorted(r["doc_id"] for r in
                  dedup_against_store(ds(recrawl), store).take_all())
    assert surv == [100]  # doc 0's recrawl now survives; doc 1's absorbed

    # remove everything: store empties but stays valid
    out2 = remove_from_fingerprint_store(store, ds(corpus))
    assert out2["rows_after"] == 0
    assert dedup_against_store(ds(recrawl), store).count() == 2
