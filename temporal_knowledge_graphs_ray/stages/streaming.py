"""Streaming-shaped processing with incremental actor state (§2.8).

Ray Data has no event-time windows or watermarks; batch pipelines express
windows as groupby+map_groups over the ordered log (pipelines/queries.py
q_tumbling_window / q_sessionize). This module is the OTHER §2.8 pattern —
for semantics that genuinely need incremental state across arrivals (late
events, unbounded logs processed in arrival order): one ``@ray.remote``
actor per key-hash bucket holding open-window state, fed batches in
timestamp order; closed sessions stream out, a final flush emits the tail.

This is the engine's only raw-actor construct — used exactly where the
Dataset API cannot express the semantics (a shared mutable per-key state
across an ordered feed), per the architecture rules.

Ordering assumption (documented per §2.8): batches are fed in globally
non-decreasing ts order (the driver sorts or the log is naturally
ordered); within a bucket actor, state transitions are sequential.

All variants normalize event time to MICROSECONDS via an explicit
timestamp("us") cast before the int64 reinterpret — a parquet written with
pandas' historical timestamp[ns] would otherwise feed nanoseconds into
microsecond gap arithmetic and shatter every session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class _SessionState:
    """The shared gap-sessionization transition function + open/closed
    state. Plain object, embedded by BOTH actor flavors so the session
    semantics cannot drift between them."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # key -> (session_start_us, last_ts_us, n_events)
        self.open: dict[int, tuple[int, int, int]] = {}
        self.closed: list[tuple[int, int, int, int]] = []

    def apply(self, k: int, t: int) -> int:
        """One event; returns 1 if a session closed."""
        cur = self.open.get(k)
        if cur is None:
            self.open[k] = (t, t, 1)
            return 0
        start, last, n = cur
        if t - last > self.gap_us:
            self.closed.append((k, start, last, n))
            self.open[k] = (t, t, 1)
            return 1
        self.open[k] = (start, max(last, t), n + 1)
        return 0

    def drain(self) -> list[tuple[int, int, int, int]]:
        for k, (start, last, n) in sorted(self.open.items()):
            self.closed.append((k, start, last, n))
        self.open.clear()
        out = sorted(self.closed)
        self.closed = []
        return out


def _ts_us_int64(arrow_col) -> np.ndarray:
    """Arrow ts/int column -> int64 MICROSECONDS (unit-normalizing)."""
    import pyarrow as pa

    col = arrow_col
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _sessions_frame(flushed, key_col: str) -> pd.DataFrame:
    """Assemble flushed (key, start_us, last_us, n) tuples into the
    canonical output frame (shared by every variant)."""
    rows = [
        {
            key_col: k,
            "session_start": np.datetime64(start, "us"),
            "session_end": np.datetime64(last, "us"),
            "n_events": n,
        }
        for closed in flushed
        for k, start, last, n in closed
    ]
    out = pd.DataFrame(rows, columns=[key_col, "session_start",
                                      "session_end", "n_events"])
    return out.sort_values([key_col, "session_start"], ignore_index=True)


def _make_sessionizer_actor():
    import ray

    @ray.remote
    class SessionizerActor:
        """Holds open sessions for the keys hashed to this bucket."""

        def __init__(self, gap_us: int):
            self.state = _SessionState(gap_us)
            self.chunks_applied = 0

        def feed(self, keys, ts_us) -> int:
            """Consume one batch (arrays of key, ts). Returns #closed."""
            apply = self.state.apply
            return sum(apply(int(k), int(t)) for k, t in zip(keys, ts_us))

        def feed_chunk(self, chunk_idx: int, keys, ts_us) -> int:
            """Idempotent ordered feed for RETRYABLE feeders: a Ray Data
            task that died after partially feeding this bucket replays its
            chunks from 0 — already-applied chunk indices are skipped, so
            the replay converges on exactly-once application (the chunking
            is deterministic: the feeder sorts its bucket on a total
            order before slicing)."""
            if chunk_idx < self.chunks_applied:
                return 0  # replay of an already-applied chunk
            if chunk_idx != self.chunks_applied:
                raise RuntimeError(
                    f"feed_chunk out of order: got {chunk_idx}, "
                    f"expected {self.chunks_applied}")
            self.chunks_applied += 1
            return self.feed(keys, ts_us)

        def flush(self):
            """Close all open sessions; return every closed session."""
            return self.state.drain()

    return SessionizerActor


def sessionize_streaming(events_ds, key_col: str = "user_id",
                         ts_col: str = "ts", gap_s: int = 1800,
                         num_buckets: int = 8) -> pd.DataFrame:
    """Stream the (sorted) events log through stateful sessionizer actors.

    Returns (user_id, session_start, session_end, n_events) — one row per
    closed session. Equivalent to the batch q_sessionize aggregate (tested
    against it) but computed incrementally, the shape a true stream feed
    would use.
    """
    import ray

    SessionizerActor = _make_sessionizer_actor()
    gap_us = gap_s * 1_000_000
    actors = [SessionizerActor.remote(gap_us) for _ in range(num_buckets)]

    ordered = events_ds.select_columns([key_col, ts_col]).sort(ts_col)
    pending = []
    for batch in ordered.iter_batches(batch_size=8192,
                                     batch_format="pyarrow"):
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype("int64")
        ts_us = _ts_us_int64(batch[ts_col])
        buckets = keys % num_buckets
        for b in range(num_buckets):
            mask = buckets == b
            if mask.any():
                pending.append(actors[b].feed.remote(
                    keys[mask].tolist(), ts_us[mask].tolist()))
    ray.get(pending)  # all feeds applied before flushing

    return _sessions_frame(ray.get([a.flush.remote() for a in actors]),
                           key_col)


def sessionize_streaming_sourcefed(events_ds, key_col: str = "user_id",
                                   ts_col: str = "ts", gap_s: int = 1800,
                                   num_buckets: int = 8) -> pd.DataFrame:
    """Source-fed streaming sessionization: the data path never touches
    the driver.

    ``sessionize_streaming`` demonstrates the semantics but iterates the
    log on the driver (one feed point). Here the feed itself is
    distributed the way a real stream fabric partitions by key: ONE hash
    exchange routes every event row to its key bucket, each bucket's
    group task sorts its own rows by event time and streams them straight
    to that bucket's stateful actor in feed-batch chunks. Per-key
    ordering (all sessionization needs) is guaranteed because a key lives
    in exactly one bucket; buckets feed in parallel. Output is identical
    to ``sessionize_streaming`` and the batch aggregate (tested).

    Retry safety: the feeding group task is retryable (Ray re-executes it
    on worker death), so feeds go through the actor's idempotent
    ``feed_chunk`` — the bucket is sorted on a TOTAL order (ts, key) so a
    replay produces identical chunks, and already-applied chunk indices
    are skipped instead of double-counted.
    """
    import ray

    SessionizerActor = _make_sessionizer_actor()
    gap_us = gap_s * 1_000_000
    actors = [SessionizerActor.remote(gap_us) for _ in range(num_buckets)]

    import pyarrow as pa

    def add_bucket(t: "pa.Table") -> "pa.Table":
        keys = t[key_col].to_numpy(zero_copy_only=False).astype("int64")
        return t.append_column(
            "bucket", pa.array((keys % num_buckets).astype("int32")))

    def feed_bucket(group: pd.DataFrame) -> pd.DataFrame:
        b = int(group["bucket"].iloc[0])
        # total order -> deterministic chunking under task retries
        g = group.sort_values([ts_col, key_col], kind="mergesort")
        keys = g[key_col].to_numpy().astype("int64")
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        handle = actors[b]
        for ci, i in enumerate(range(0, len(g), 8192)):
            # sequential per bucket (ray.get preserves in-bucket order);
            # buckets run concurrently as separate group tasks
            ray.get(handle.feed_chunk.remote(
                ci, keys[i:i + 8192].tolist(), ts_us[i:i + 8192].tolist()))
        return pd.DataFrame({"bucket": [b], "fed": [len(g)]})

    (events_ds.select_columns([key_col, ts_col])
     .map_batches(add_bucket, batch_format="pyarrow")
     .groupby("bucket")
     .map_groups(feed_bucket, batch_format="pandas")
     .materialize())  # drives the feeds; result is per-bucket counts only

    return _sessions_frame(ray.get([a.flush.remote() for a in actors]),
                           key_col)


def _make_watermark_actor():
    import heapq

    import ray

    @ray.remote
    class WatermarkSessionizerActor:
        """Sessionizer tolerating BOUNDED event-time disorder.

        The standard streaming construction: a min-heap reorder buffer
        holds arrivals until the watermark (max event time seen minus
        ``allowed_lateness``) passes them, then they replay through the
        in-order session logic; arrivals already older than the
        watermark are DROPPED and counted (the late-data policy).
        With allowed_lateness >= the feed's true disorder bound, output
        is identical to a fully-sorted feed — tested.
        """

        def __init__(self, gap_us: int, lateness_us: int):
            self.state = _SessionState(gap_us)
            self.lateness_us = lateness_us
            self.buffer: list[tuple[int, int]] = []  # (ts, key) heap
            self.max_ts = -(1 << 62)
            self.n_late = 0

        def feed(self, keys, ts_us) -> int:
            for k, t in zip(keys, ts_us):
                t = int(t)
                wm = self.max_ts - self.lateness_us
                if t < wm:
                    self.n_late += 1  # beyond the lateness bound: drop
                    continue
                heapq.heappush(self.buffer, (t, int(k)))
                if t > self.max_ts:
                    self.max_ts = t
            # release everything the watermark has passed, in ts order
            wm = self.max_ts - self.lateness_us
            released = 0
            while self.buffer and self.buffer[0][0] <= wm:
                t, k = heapq.heappop(self.buffer)
                self.state.apply(k, t)
                released += 1
            return released

        def flush(self):
            while self.buffer:
                t, k = heapq.heappop(self.buffer)
                self.state.apply(k, t)
            return self.state.drain(), self.n_late

    return WatermarkSessionizerActor


def sessionize_streaming_watermark(events_ds, key_col: str = "user_id",
                                   ts_col: str = "ts", gap_s: int = 1800,
                                   allowed_lateness_s: int = 300,
                                   num_buckets: int = 8):
    """Sessionize an UNSORTED (bounded-disorder) arrival stream.

    Unlike ``sessionize_streaming`` this does NOT globally sort: events
    flow in arrival order; per-bucket actors reorder within the
    ``allowed_lateness_s`` watermark window and drop anything later.
    Returns (sessions DataFrame, n_late_dropped).
    """
    import ray

    Actor = _make_watermark_actor()
    gap_us = gap_s * 1_000_000
    late_us = allowed_lateness_s * 1_000_000
    actors = [Actor.remote(gap_us, late_us) for _ in range(num_buckets)]

    pending = []
    for batch in events_ds.select_columns([key_col, ts_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype("int64")
        ts_us = _ts_us_int64(batch[ts_col])
        buckets = keys % num_buckets
        for b in range(num_buckets):
            mask = buckets == b
            if mask.any():
                pending.append(actors[b].feed.remote(
                    keys[mask].tolist(), ts_us[mask].tolist()))
    ray.get(pending)

    flushed, n_late = [], 0
    for closed, late in ray.get([a.flush.remote() for a in actors]):
        n_late += late
        flushed.append(closed)
    return _sessions_frame(flushed, key_col), n_late
