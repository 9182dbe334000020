"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The reference is strictly batch (SURVEY.md §2.3 — no streaming surface), so
this is the engine's Structured-Streaming extension of its own batch
``operators/sessions.sessionize``: the same gap semantics expressed as an
arbitrary-stateful operator (Spark's built-in ``session_window`` covers the
aggregate case; this shape is the template for custom per-key state —
counters, open-session carry-over, per-key sequence numbers — that windowed
aggs can't express).

Semantics (matches the batch twin; asserted in tests/test_streaming.py):

* events are grouped per user; state carries the OPEN session
  (session ordinal, start, end, event count);
* within a batch, events are processed in (ts, event_id) order: a gap
  > ``gap_seconds`` CLOSES the current session (emitted downstream) and
  opens the next, incrementing the per-user ordinal — identical numbering
  to the batch window-function implementation for in-order streams;
* the open session stays in state with an EVENT-TIME timeout at
  ``end + gap``: once the watermark passes that point no event can extend
  the session any more (late events beyond the watermark are dropped by
  the watermark itself), so the timeout closes and emits it — the
  streaming-correctness argument is exactly the watermark contract;
* output mode is append (only closed sessions are emitted, each exactly
  once per the state transition).

Scale: state is O(active users), one tiny row each; each micro-batch
shuffles only its own events on user_id.  At 100 TB-scale event volumes the
operator parallelizes per key like any streaming agg — no per-key history
is retained beyond the single open-session row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_s long, end_s long"
)
STATE_SCHEMA = "sid long, start_s long, end_s long, n long"


def _session_fn(gap_seconds: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        out: list[tuple] = []
        if state.hasTimedOut:
            sid, st, en, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user, sid, n, st, en)],
                columns=["user_id", "session_id", "n_events", "start_s", "end_s"],
            )
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(["ts", "event_id"])
        ts = (
            batch["ts"].astype("datetime64[ns]").astype("int64") // 10**9
        ).to_numpy()
        if state.exists:
            sid, st, en, n = state.get
        else:
            sid, st, en, n = 0, None, None, 0
        for t in ts:
            t = int(t)
            if st is None:
                sid, st, en, n = sid + 1, t, t, 1
            elif t - en > gap_seconds:
                out.append((user, sid, n, st, en))
                sid, st, en, n = sid + 1, t, t, 1
            else:
                en, n = max(en, t), n + 1
        state.update((int(sid), int(st), int(en), int(n)))
        # event-time timeout: once the watermark passes end + gap, no
        # in-watermark event can extend this session — close it then
        state.setTimeoutTimestamp((int(en) + gap_seconds) * 1000)
        if out:
            yield pd.DataFrame(
                out,
                columns=["user_id", "session_id", "n_events", "start_s", "end_s"],
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming gap-based sessionization (see module docstring).

    ``events`` is a STREAMING DataFrame with (user_id, event_id, ts, ...);
    returns the append-mode stream of CLOSED sessions
    (user_id, session_id, n_events, start_s, end_s) — session ids are the
    same per-user ordinals the batch ``sessionize`` assigns."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return (
        src.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
