"""Custom stateful streaming operator: applyInPandasWithState
sessionization — unit-level state-transition tests with a fake GroupState,
plus an end-to-end micro-batch run through a real memory-sink stream."""

import pandas as pd

from no_ocr_spark.streaming.stateful import GAP_SECONDS, make_session_update


class FakeState:
    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _batch(ts_values):
    return pd.DataFrame(
        {"ts": [pd.Timestamp(t, unit="s") for t, _ in ts_values],
         "value": [v for _, v in ts_values]}
    )


def test_events_accumulate_in_open_session():
    fn = make_session_update(gap_seconds=100)
    st = FakeState()
    out = list(fn((7,), [_batch([(1000, 1.0), (1050, 2.0)])], st))
    assert out == []  # session still open
    assert st.get == (1000, 1050, 2, 3.0)
    assert st.timeout_ms == 100 * 1000


def test_gap_inside_batch_closes_session():
    fn = make_session_update(gap_seconds=100)
    st = FakeState(value=(1000, 1050, 2, 3.0))
    (emitted,) = list(fn((7,), [_batch([(1300, 5.0)])], st))
    assert emitted.iloc[0]["n_events"] == 2
    assert emitted.iloc[0]["sum_value"] == 3.0
    assert emitted.iloc[0]["session_end"] == pd.Timestamp(1050, unit="s")
    assert st.get == (1300, 1300, 1, 5.0)  # new session opened


def test_timeout_flushes_and_clears():
    fn = make_session_update(gap_seconds=100)
    st = FakeState(value=(1000, 1050, 2, 3.0), timed_out=True)
    (emitted,) = list(fn((7,), [], st))
    assert emitted.iloc[0]["user_id"] == 7
    assert emitted.iloc[0]["n_events"] == 2
    assert st.removed


def test_multiple_sessions_in_one_batch():
    fn = make_session_update(gap_seconds=10)
    st = FakeState()
    (emitted,) = list(fn(
        (1,), [_batch([(0, 1.0), (5, 1.0), (100, 2.0), (300, 3.0)])], st
    ))
    assert len(emitted) == 2  # [0,5] and [100] closed; [300] stays open
    assert emitted.iloc[0]["n_events"] == 2
    assert emitted.iloc[1]["n_events"] == 1
    assert st.get == (300, 300, 1, 3.0)


def test_stream_end_to_end(spark, tmp_path_factory):
    """Real micro-batch run: in-batch gap closes one session immediately;
    the processing-time timeout later flushes the open ones. (A stateful
    query with ProcessingTimeTimeout keeps scheduling timeout-service
    batches, so availableNow never terminates — poll-then-stop is the
    correct harness shape.)"""
    import datetime as dt
    import time

    from no_ocr_spark.streaming.stateful import sessionize_stream

    def _t(s):
        return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s)

    in_dir = str(tmp_path_factory.mktemp("ev_in"))
    spark.createDataFrame(
        [(1, _t(0), 1.0), (1, _t(3), 2.0), (1, _t(5000), 4.0),
         (2, _t(0), 8.0)],
        "user_id bigint, ts timestamp, value double",
    ).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp, value double")
        .parquet(in_dir)
    )
    q = (
        sessionize_stream(stream, gap_seconds=5)
        .writeStream.format("memory").queryName("sessions_t")
        .outputMode("update").trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 90
        got = set()
        while time.time() < deadline and len(got) < 3:
            got = {(r.user_id, r.n_events, r.sum_value)
                   for r in spark.sql("SELECT * FROM sessions_t").collect()}
            time.sleep(1)
    finally:
        q.stop()
    # in-batch gap closed user1's [0,3]; timeouts flushed user1's [5000]
    # and user2's [0]
    assert (1, 2, 3.0) in got
    assert (1, 1, 4.0) in got
    assert (2, 1, 8.0) in got
