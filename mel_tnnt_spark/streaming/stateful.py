"""Custom stateful streaming operator: first-seen dedup with running
duplicate counts, via applyInPandasWithState.

Role: the streaming twin of `operators/dedup.exact_dedup` + the
reference's skip-already-processed gate (code/MEL/__init__.py:
2365-2368) — in a continuous ingest, only the FIRST document with a
given content hash should flow downstream (NER, linking, triples);
later arrivals only bump a duplicate counter. Spark's built-in
`dropDuplicates` on a stream cannot report those counts and keeps
state forever by default; a custom GroupState gives both the
first-seen row and a live dup-count signal for monitoring.

Semantics (update output mode):
- first batch a key appears in emits (key, first_id, dups) where
  first_id = min id in the batch and dups = arrivals - 1;
- every later batch containing the key emits the same first_id with
  the cumulative dup count — state persists across micro-batches via
  the streaming checkpoint, so a restart resumes exactly.

Scale notes: state is per content-hash, O(distinct docs) across the
cluster, hash-partitioned by the groupBy — the same key layout as the
batch exact_dedup shuffle. Keys are hashes (fixed width), values two
scalars, so state size is bounded and skew-free. For bounded state on
unbounded streams, add a watermark on an event-time column and switch
to EventTimeTimeout to expire keys (not needed for the ingest-dedup
role, where keys must live for the corpus lifetime; production would
periodically compact state into the batch lineage table).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, first_id string, dups long"
STATE_SCHEMA = "first_id string, dups long"

SESSION_OUT = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE = "start long, last long, n long"  # epoch millis


def sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time sessionization with EventTimeTimeout — the bounded-
    state pattern the first-seen dedup deliberately omits: a session
    closes (and its state is FREED) when the watermark passes
    last_event + gap, so state size tracks concurrent activity, not
    history. Emits one row per closed session (append mode); open
    sessions survive restarts via the checkpoint and close on a later
    micro-batch. Spark's built-in session_window covers plain counts;
    the custom GroupState version is the extension point for carrying
    richer per-session payloads (e.g. mention sets per repo-ingest
    session)."""
    gap_ms = gap_minutes * 60 * 1000
    wm = stream.select(
        stream[user_col].alias("user_id"), stream[ts_col].alias("ts")
    ).withWatermark("ts", watermark)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "session_start": pd.Timestamp(start, unit="ms"),
                        "session_end": pd.Timestamp(last, unit="ms"),
                        "n_events": n,
                    }
                ]
            )
            return
        mn = mx = None
        cnt = 0
        for pdf in pdfs:
            ts = pdf["ts"].dropna()  # NaT would wrap to min-int64
            if len(ts):
                cnt += len(ts)
                ms = ts.astype("int64") // 1_000_000
                bmn, bmx = int(ms.min()), int(ms.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
        if cnt:
            if state.exists:
                start, last, n = state.get
                # out-of-order events above the watermark can precede
                # the stored start; sessions extend in BOTH directions
                state.update((min(start, mn), max(last, mx), n + cnt))
            else:
                state.update((mn, mx, cnt))
            state.setTimeoutTimestamp(state.get[1] + gap_ms)
        return

    return wm.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_OUT, SESSION_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )


def first_seen_batch(
    df: DataFrame, key_col: str = "text_hash", id_col: str = "doc_id"
) -> DataFrame:
    """Batch twin of first_seen_updates: the state the stream converges
    to after all arrivals — per key, the minimum id as first_id and
    arrivals-1 as dups. One map-side-combined groupBy; the oracle gate
    (q54) pins it, and test_streaming pins stream==batch convergence."""
    from pyspark.sql import functions as F

    # cast BEFORE min: the stream carries string ids (OUT_SCHEMA), so
    # the twin must use the same lexicographic min, not a numeric one
    return df.groupBy(df[key_col].alias("key")).agg(
        F.min(df[id_col].cast("string")).alias("first_id"),
        (F.count(F.lit(1)) - 1).alias("dups"),
    )


def first_seen_updates(
    stream: DataFrame, key_col: str = "text_hash", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming first-seen dedup: one update row per (key, batch) with
    the stable first_id and the cumulative duplicate count."""
    narrow = stream.select(
        stream[key_col].alias("key"), stream[id_col].alias("id")
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        arrivals = 0
        batch_min: str | None = None
        for pdf in pdfs:
            if len(pdf):
                arrivals += len(pdf)
                m = pdf["id"].min()
                batch_min = m if batch_min is None else min(batch_min, m)
        if arrivals == 0:
            return
        if state.exists:
            first_id, dups = state.get
            dups += arrivals
        else:
            first_id, dups = batch_min, arrivals - 1
        state.update((first_id, dups))
        yield pd.DataFrame([{"key": key[0], "first_id": first_id, "dups": dups}])

    return narrow.groupBy("key").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
