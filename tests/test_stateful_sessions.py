"""Stateful streaming sessionization (applyInPandasWithState): hand-computed
gap-closure across micro-batches, exactly-once sink, state survival across a
query restart, and the event-time-timeout kernel path against a fake
GroupState."""

import time as _time
from datetime import datetime

import pandas as pd

from research_on_document_level_person_relation_extraction_in_chinese_spark.streaming.sessions import (
    make_sessionizer,
    stream_sessions,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(i, ts, user):
    return (i, datetime.fromisoformat(f"2024-05-01T{ts}"), user, "click", 1.0, "{}")


def _write_chunk(spark, rows, in_dir):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(0.05)  # distinct mtimes: file-source pickup order == arrival order


def _sessions(spark, out_dir):
    return {
        (r["user_id"], r["session_start"].isoformat(), r["session_end"].isoformat(), r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }


def test_sessionize_gap_closure_across_batches(spark, tmp_path):
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # batch 1: user 1 has a 3-event session then a lone event; user 2 a pair
    _write_chunk(
        spark,
        [
            _ev(1, "10:00:00", 1), _ev(2, "10:10:00", 1), _ev(3, "10:20:00", 1),
            _ev(4, "12:00:00", 1),
            _ev(5, "10:05:00", 2), _ev(6, "10:20:00", 2),
        ],
        in_dir,
    )
    # batch 2 (all rows AFTER batch 1's watermark, 11:50): closers
    _write_chunk(
        spark,
        [_ev(7, "13:30:00", 1), _ev(8, "12:10:00", 2), _ev(9, "14:00:00", 2)],
        in_dir,
    )
    stream_sessions(spark, in_dir, out_dir, ckpt, gap="30 minutes", watermark="10 minutes")

    got = _sessions(spark, out_dir)
    assert got == {
        (1, "2024-05-01T10:00:00", "2024-05-01T10:20:00", 3, 3.0),
        (1, "2024-05-01T12:00:00", "2024-05-01T12:00:00", 1, 1.0),
        (2, "2024-05-01T10:05:00", "2024-05-01T10:20:00", 2, 2.0),
        (2, "2024-05-01T12:10:00", "2024-05-01T12:10:00", 1, 1.0),
    }

    # exactly-once: re-draining the same checkpoint adds nothing
    stream_sessions(spark, in_dir, out_dir, ckpt)
    assert len(_sessions(spark, out_dir)) == 4

    # restart with NEW data: the still-open (1, 13:30) session lives in the
    # checkpointed state and is closed by the late-arriving event
    _write_chunk(spark, [_ev(10, "15:00:00", 1)], in_dir)
    stream_sessions(spark, in_dir, out_dir, ckpt)
    assert (1, "2024-05-01T13:30:00", "2024-05-01T13:30:00", 1, 1.0) in _sessions(
        spark, out_dir
    )


class _FakeState:
    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        self._v = value
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = ms

    def getCurrentWatermarkMs(self):
        return self._wm


def test_sessionizer_timeout_kernel():
    fn = make_sessionizer(gap_ms=1_800_000)
    # timeout path: open state emits as a closed session and is freed
    st = _FakeState(value=(1000, 61000, 3, 4.5), timed_out=True)
    out = list(fn((7,), iter([]), st))
    assert st.removed and len(out) == 1
    row = out[0].iloc[0]
    assert (
        row["user_id"],
        row["n_events"],
        row["sum_value"],
        row["session_start"],
        row["session_end"],
    ) == (7, 3, 4.5, pd.Timestamp(1000, unit="ms"), pd.Timestamp(61000, unit="ms"))

    # data path: gap split inside one batch + timeout registered beyond watermark
    st2 = _FakeState(watermark_ms=50)
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([0, 60_000, 5_000_000], unit="ms"),
            "value": [1.0, 2.0, 4.0],
        }
    )
    out2 = list(fn((9,), iter([pdf]), st2))
    assert len(out2) == 1 and len(out2[0]) == 1  # first session closed by the gap
    assert out2[0].iloc[0]["n_events"] == 2 and out2[0].iloc[0]["sum_value"] == 3.0
    assert st2._v == (5_000_000, 5_000_000, 1, 4.0)  # second stays open
    assert st2.timeout_set == 5_000_000 + 1_800_000


def test_sessionizer_late_event_kernel():
    """Round-3 advice: a late (within-watermark) event that predates the
    open session must extend session_start BACKWARDS when within the gap,
    and close as its own earlier session when beyond it — matching batch
    gap-sessionization, not the old forward-only merge."""
    gap = 1_800_000  # 30 min
    fn = make_sessionizer(gap_ms=gap)

    # late event 10 min BEFORE the open session's start → start extends back
    st = _FakeState(value=(3_600_000, 3_900_000, 2, 2.0))
    pdf = pd.DataFrame({"ts": pd.to_datetime([3_000_000], unit="ms"), "value": [5.0]})
    assert list(fn((1,), iter([pdf]), st)) == []  # nothing closes
    assert st._v == (3_000_000, 3_900_000, 3, 7.0)

    # late event >gap before the open session → separate EARLIER session
    # closes immediately; the open session is untouched
    st2 = _FakeState(value=(7_200_000, 7_500_000, 2, 2.0))
    pdf2 = pd.DataFrame(
        {"ts": pd.to_datetime([1_000_000, 1_060_000], unit="ms"), "value": [1.0, 1.0]}
    )
    out = list(fn((1,), iter([pdf2]), st2))
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert (row["n_events"], row["sum_value"]) == (2, 2.0)
    assert row["session_start"] == pd.Timestamp(1_000_000, unit="ms")
    assert row["session_end"] == pd.Timestamp(1_060_000, unit="ms")
    assert st2._v == (7_200_000, 7_500_000, 2, 2.0)

    # chain: late events bridge backwards INTO the open session
    st3 = _FakeState(value=(3_600_000, 3_900_000, 2, 2.0))
    pdf3 = pd.DataFrame(
        {"ts": pd.to_datetime([500_000, 2_000_000], unit="ms"), "value": [1.0, 1.0]}
    )
    out3 = list(fn((1,), iter([pdf3]), st3))
    # 500k → 2000k gap is 1500k < 30min? no: 1_500_000 < 1_800_000 → merge;
    # 2000k → 3600k gap is 1600k < 1800k → merge: one open session
    assert out3 == []
    assert st3._v == (500_000, 3_900_000, 4, 4.0)


def test_parse_gap_units():
    from research_on_document_level_person_relation_extraction_in_chinese_spark.streaming.sessions import (
        _parse_gap_ms,
    )
    import pytest

    assert _parse_gap_ms("30 minutes") == 1_800_000
    assert _parse_gap_ms("1 minute") == 60_000
    assert _parse_gap_ms("90 sec") == 90_000
    assert _parse_gap_ms("2 hours") == 7_200_000
    assert _parse_gap_ms("1 h") == 3_600_000
    assert _parse_gap_ms("250 ms") == 250
    assert _parse_gap_ms("1 day") == 86_400_000
    with pytest.raises(ValueError, match="unparseable gap"):
        _parse_gap_ms("soon")
    with pytest.raises(ValueError, match="unparseable gap"):
        _parse_gap_ms("5 fortnights")
