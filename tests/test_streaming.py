"""Stateful streaming sessionizer vs the batch sessionize aggregate."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def event_log(ray_session):
    import ray.data as rd

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: two sessions (gap 2h between event 2 and 3)
    for mins in (0, 10, 150, 160, 170):
        rows.append({"user_id": 1, "ts": t0 + timedelta(minutes=mins)})
    # user 2: one session
    for mins in (5, 20):
        rows.append({"user_id": 2, "ts": t0 + timedelta(minutes=mins)})
    # user 9 hashes to a different bucket than 1 (9 % 8 = 1)
    rows.append({"user_id": 9, "ts": t0})
    schema = pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def test_streaming_sessionizer(event_log):
    from temporal_knowledge_graphs_ray.stages.streaming import (
        sessionize_streaming,
    )

    out = sessionize_streaming(event_log, gap_s=1800)
    by_user = out.groupby("user_id")
    assert len(by_user.get_group(1)) == 2
    s1 = by_user.get_group(1).iloc[0]
    assert s1["n_events"] == 2
    s2 = by_user.get_group(1).iloc[1]
    assert s2["n_events"] == 3
    assert len(by_user.get_group(2)) == 1
    assert by_user.get_group(2).iloc[0]["n_events"] == 2
    assert len(by_user.get_group(9)) == 1


def test_matches_batch_sessionize(ray_session):
    """Streaming actors and the batch groupby agree on real data."""
    from temporal_knowledge_graphs_ray.pipelines.queries import (
        _read,
        q_sessionize,
    )
    from temporal_knowledge_graphs_ray.stages.streaming import (
        sessionize_streaming,
    )

    sf = "/root/testdata/sf0.001"
    streamed = sessionize_streaming(_read(sf, "events", ["user_id", "ts"]))
    agg = (streamed.groupby("user_id")
           .agg(n_sessions=("user_id", "size"),
                n_events=("n_events", "sum"))
           .reset_index())
    batch = q_sessionize(sf).to_pandas().sort_values(
        "user_id", ignore_index=True)
    agg = agg.sort_values("user_id", ignore_index=True)
    assert agg["user_id"].tolist() == batch["user_id"].tolist()
    assert agg["n_sessions"].tolist() == batch["n_sessions"].tolist()
    assert agg["n_events"].tolist() == batch["n_events"].tolist()


def test_sourcefed_equals_driver_fed(ray_session):
    """The source-fed variant (hash exchange -> per-bucket group task
    feeding its actor directly) produces exactly the driver-fed output."""
    from temporal_knowledge_graphs_ray.pipelines.queries import _read
    from temporal_knowledge_graphs_ray.stages.streaming import (
        sessionize_streaming,
        sessionize_streaming_sourcefed,
    )

    sf = "/root/testdata/sf0.001"
    driver_fed = sessionize_streaming(_read(sf, "events", ["user_id", "ts"]))
    source_fed = sessionize_streaming_sourcefed(
        _read(sf, "events", ["user_id", "ts"]))
    assert driver_fed.equals(source_fed)
    assert len(source_fed) > 0


@pytest.mark.usefixtures("ray_session")
class TestWatermarkSessionizer:
    def _disordered_events(self, max_shuffle_s=120):
        """events sorted by ts, then deterministically perturbed within
        a +-max_shuffle_s window (bounded disorder)."""
        import duckdb
        import pyarrow as pa

        from temporal_knowledge_graphs_ray.functions.hashing import (
            fast_hash64,
        )

        t = duckdb.sql(
            "SELECT user_id, ts FROM "
            "'/root/testdata/sf0.001/events.parquet' ORDER BY ts"
        ).arrow()
        rows = list(zip(t["user_id"].to_pylist(), t["ts"].to_pylist()))
        # bounded shuffle: sort by (ts + deterministic jitter < bound)
        jittered = sorted(
            rows,
            key=lambda r: (r[1].timestamp()
                           + (fast_hash64(f"{r[0]}|{r[1]}")
                              % (2 * max_shuffle_s)) - max_shuffle_s))
        return pa.table({
            "user_id": pa.array([r[0] for r in jittered]),
            "ts": pa.array([r[1] for r in jittered],
                           pa.timestamp("us")),
        })

    def test_bounded_disorder_equals_sorted_feed(self):
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.streaming import (
            sessionize_streaming,
            sessionize_streaming_watermark,
        )

        tbl = self._disordered_events(max_shuffle_s=120)
        # lateness 300s >= the 240s disorder bound: no drops, output
        # equals the fully-sorted in-order run
        got, n_late = sessionize_streaming_watermark(
            rd.from_arrow(tbl), allowed_lateness_s=300)
        assert n_late == 0
        ref = sessionize_streaming(rd.from_arrow(tbl))
        assert got.values.tolist() == ref.values.tolist()

    def test_late_events_dropped_and_counted(self):
        import datetime

        import pyarrow as pa
        import ray.data as rd

        from temporal_knowledge_graphs_ray.stages.streaming import (
            sessionize_streaming_watermark,
        )

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (1, base),
            (1, base + datetime.timedelta(minutes=5)),
            (2, base + datetime.timedelta(hours=3)),
            # WAY late: 3 hours behind the watermark by arrival time
            (1, base + datetime.timedelta(minutes=6)),
        ]
        tbl = pa.table({
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        })
        got, n_late = sessionize_streaming_watermark(
            rd.from_arrow(tbl), allowed_lateness_s=60, num_buckets=1)
        assert n_late == 1
        u1 = got[got["user_id"] == 1]
        assert u1["n_events"].tolist() == [2]  # late event excluded


@pytest.mark.usefixtures("ray_session")
def test_nanosecond_timestamps_normalized():
    """A parquet written with pandas' historical timestamp[ns] must
    sessionize identically to the same data in timestamp[us] — the gap
    arithmetic is in MICROSECONDS, so feeding raw ns integers would
    shatter every session (any gap > 1.8ms)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from temporal_knowledge_graphs_ray.stages.streaming import (
        sessionize_streaming,
        sessionize_streaming_watermark,
    )

    ts = pd.to_datetime([
        "2024-01-01 10:00:00", "2024-01-01 10:10:00",  # same session
        "2024-01-01 12:00:00",                          # new session
        "2024-01-01 10:05:00", "2024-01-01 11:00:00",
    ])
    df = pd.DataFrame({"user_id": [1, 1, 1, 2, 2], "ts": ts})

    def tbl(unit):
        t = pa.Table.from_pandas(df, preserve_index=False)
        return t.set_column(1, "ts", t["ts"].cast(pa.timestamp(unit)))

    for fn in (sessionize_streaming,
               lambda ds, **kw: sessionize_streaming_watermark(ds, **kw)[0]):
        out_us = fn(rd.from_arrow(tbl("us")), gap_s=1800)
        out_ns = fn(rd.from_arrow(tbl("ns")), gap_s=1800)
        pd.testing.assert_frame_equal(out_us, out_ns)
        # u1: 10:00-10:10 then 12:00; u2: 10:05 then 11:00 (55min > gap)
        assert len(out_us) == 4


@pytest.mark.usefixtures("ray_session")
def test_feed_chunk_replay_is_idempotent():
    """The source-fed path feeds stateful actors from inside a RETRYABLE
    Ray Data task: a replay after a partial feed re-sends chunks from 0
    and must not double-count (idempotent feed_chunk protocol)."""
    import ray

    from temporal_knowledge_graphs_ray.stages.streaming import (
        _make_sessionizer_actor,
    )

    actor = _make_sessionizer_actor().remote(1_000_000)
    keys = [1, 1, 2]
    ts = [0, 500_000, 10_000_000]
    ray.get(actor.feed_chunk.remote(0, keys, ts))
    # simulated task retry: chunk 0 replays, then the feed continues
    assert ray.get(actor.feed_chunk.remote(0, keys, ts)) == 0
    ray.get(actor.feed_chunk.remote(1, [1], [20_000_000]))
    sessions = ray.get(actor.flush.remote())
    # u1: (0, 500ms, 2 events) then (20s); u2: one event — NO duplicates
    assert sessions == [
        (1, 0, 500_000, 2), (1, 20_000_000, 20_000_000, 1),
        (2, 10_000_000, 10_000_000, 1)]
    # a chunk arriving beyond the applied frontier is a protocol error
    import pytest as _pytest

    with _pytest.raises(Exception, match="out of order"):
        ray.get(actor.feed_chunk.remote(5, [1], [1]))
