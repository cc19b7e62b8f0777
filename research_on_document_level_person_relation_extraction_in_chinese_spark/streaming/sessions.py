"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState`` (SURVEY §2.8 — beyond the batch-only reference;
the batch twin is the ``user_sessions`` gap-window query).

Semantics (classic gap sessionization): per user, consecutive events closer
than ``gap`` belong to one session; a session CLOSES when a later event
arrives more than ``gap`` after it (works across micro-batches through the
persisted per-key state) or when the event-time watermark passes
``last_event + gap`` (GroupState event-time timeout), so idle keys emit and
their state is freed — bounded state at any corpus rate. Emitted rows are
append-only (each closed session exactly once), so the parquet sink plus a
streaming checkpoint gives exactly-once sessions and kill-and-rerun resume,
same contract as the other sinks here.

Scale shape: state is one 4-field tuple per ACTIVE user (not per event);
the shuffle is the single hash partition by user_id that any stateful
operator needs; Arrow batches cross the Python boundary, never single rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, sv double"


def _ts_ms(col: pd.Series) -> pd.Series:
    return pd.to_datetime(col).astype("datetime64[ns]").astype("int64") // 1_000_000


def make_sessionizer(gap_ms: int):
    """The per-key stateful kernel, factored out so the timeout path is
    directly unit-testable against a fake GroupState (the streaming harness
    only exercises gap-closure deterministically)."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, float]] = []
        cur = state.get if state.exists else None  # (start, last, n, sv)

        if state.hasTimedOut:
            if cur is not None:
                closed.append(cur)
            state.remove()
        else:
            rows = []
            for pdf in pdfs:
                if len(pdf):
                    rows.append(
                        pd.DataFrame(
                            {"ms": _ts_ms(pdf["ts"]), "value": pdf["value"]}
                        )
                    )
            if rows:
                # Treat the open session from prior batches as a SPAN and
                # interval-merge it with this batch's events in event-time
                # order: a late (within-watermark) event that predates the
                # open session extends session_start backwards when within
                # the gap, or closes as its own earlier session when beyond
                # it — matching batch gap-sessionization over everything
                # seen so far. (Events older than an already-EMITTED session
                # remain forward-only: append mode cannot retract.)
                ev = pd.concat(rows)
                spans = [
                    (int(ms), int(ms), 1, float(v))
                    for ms, v in zip(ev["ms"], ev["value"])
                ]
                if cur is not None:
                    spans.append(cur)
                spans.sort(key=lambda s: (s[0], s[1]))
                cur = None
                for s in spans:
                    if cur is None:
                        cur = s
                    elif s[0] - cur[1] > gap_ms:
                        closed.append(cur)
                        cur = s
                    else:
                        cur = (
                            cur[0],
                            max(cur[1], s[1]),
                            cur[2] + s[2],
                            cur[3] + s[3],
                        )
            if cur is not None:
                state.update(cur)
                # event-time timeout must stay ahead of the current watermark
                state.setTimeoutTimestamp(
                    max(cur[1] + gap_ms, state.getCurrentWatermarkMs() + 1)
                )

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.to_datetime(s, unit="ms") for s, *_ in closed],
                    "session_end": [pd.to_datetime(e, unit="ms") for _, e, *_ in closed],
                    "n_events": [n for *_, n, _ in closed],
                    "sum_value": [round(sv, 6) for *_, sv in closed],
                }
            )

    return fn


_UNIT_MS = {
    "ms": 1,
    "millisecond": 1,
    "sec": 1_000,
    "second": 1_000,
    "min": 60_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _parse_gap_ms(gap: str) -> int:
    """'30 minutes' / '1 minute' / '90 sec' → milliseconds, with the same
    unit tolerance as Spark's interval parser for the sibling ``watermark``
    string (singular/plural/abbreviated), and a clear error otherwise."""
    try:
        qty, unit = gap.split()
        unit = unit.lower()
        if unit != "ms":
            unit = unit.rstrip("s") or "sec"  # 'seconds'→'second', 's'→'sec'
        unit = {"m": "min", "h": "hour", "d": "day"}.get(unit, unit)
        return int(qty) * _UNIT_MS[unit]
    except (ValueError, KeyError):
        raise ValueError(
            f"unparseable gap {gap!r}: expected '<int> "
            f"{'|'.join(sorted(_UNIT_MS))}' (singular or plural)"
        ) from None


def sessionize(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Gap sessionization of a STREAMING events frame (ts, user_id, value …)
    → closed sessions, append-mode."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = _parse_gap_ms(gap)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_ms),
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessions(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
):
    """Drain ``input_dir`` (parquet event files) through the stateful
    sessionizer into a parquet sink, exactly-once, resumable."""
    from .events import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    sessions = sessionize(stream, gap=gap, watermark=watermark)
    query = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_dir)
        .start()
    )
    query.awaitTermination()
    return query
