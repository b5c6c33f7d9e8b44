"""Streaming sessionization ≡ batch sessionization on the same files."""

from pyspark.sql import functions as F

from ssb_sgis_spark.operators.sessions import DEFAULT_GAP_US, session_stats
from ssb_sgis_spark.streaming.sessions import session_rollup_stream

SF = "/root/testdata/sf0.001"


def test_stream_sessions_equal_batch(spark, tmp_path):
    src = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt")
    batch = spark.read.parquet(f"{SF}/events.parquet").limit(2000)
    batch.write.parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        session_rollup_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions_test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # the stream converted NTZ wall time to the same UTC wall time, so
    # unix_micros on the tz'd session bounds recovers the NTZ micros
    got = {
        (r.user_id, r.start_us): (r.n_events, r.end_us)
        for r in spark.sql(
            """SELECT user_id,
                      unix_micros(session_start) AS start_us,
                      unix_micros(session_end) AS end_us,
                      n_events
               FROM sessions_test"""
        ).collect()
    }
    exp = {
        (r.user_id, r.start_us): (r.n_events, r.end_us)
        for r in session_stats(spark.read.parquet(src)).collect()
    }
    assert set(got) == set(exp)
    for k, (n, end_us) in got.items():
        # session_window's end = last event + gap; batch end = last event
        assert exp[k][0] == n
        assert exp[k][1] + DEFAULT_GAP_US == end_us
    assert sum(n for n, _ in got.values()) == spark.read.parquet(src).count()


def test_stream_sessions_non_utc_session_tz(spark, tmp_path):
    """The NTZ conversion must be timezone-neutral: same session bounds
    with the session timezone set to Europe/Oslo (a to_utc_timestamp
    mixup would shift bounds by -2x the offset)."""
    src = str(tmp_path / "ev")
    batch = spark.read.parquet(f"{SF}/events.parquet").limit(200)
    batch.write.parquet(src)
    exp = {
        (r.user_id, r.start_us): r.n_events
        for r in session_stats(spark.read.parquet(src)).collect()
    }
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Europe/Oslo")
        q = (
            session_rollup_stream(
                spark.readStream.schema(batch.schema).parquet(src)
            )
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("sessions_tz_test")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.start_us): r.n_events
            for r in spark.sql(
                """SELECT user_id, unix_micros(session_start) AS start_us,
                          n_events FROM sessions_tz_test"""
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    assert got == exp
