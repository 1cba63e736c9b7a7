"""Structured-Streaming tests: windowed counts and sessionization over a
file-source stream (AvailableNow drain -> memory sink)."""

import os


def test_windowed_counts_stream(spark, tmp_path):
    from amundsendatabuilder_spark.session import load_tables
    from amundsendatabuilder_spark.streaming.events import (
        read_event_stream, run_to_memory, windowed_counts)
    # stage events as a stream-source directory
    events = load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
    src = str(tmp_path / "events_src")
    events.write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    got = run_to_memory(agg, spark, "windowed_counts_test",
                        str(tmp_path / "ckpt"), output_mode="append")
    # batch equivalent for comparison (watermark drops nothing in a
    # bounded replay ordered within one batch)
    from pyspark.sql import functions as F
    want = (events.groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                           "event_type")
            .agg(F.count("*").alias("n_events")))
    got_c = {(str(r["window_start"]), r["event_type"]): r["n_events"]
             for r in got.collect()}
    want_c = {(str(r["window_start"]), r["event_type"]): r["n_events"]
              for r in want.collect()}
    # append mode emits only windows older than the watermark; every
    # emitted window must match the batch result exactly
    assert got_c
    assert all(want_c[k] == v for k, v in got_c.items())


def test_sessionize_stream(spark, tmp_path):
    from amundsendatabuilder_spark.streaming.events import (
        read_event_stream, run_to_memory, sessionize)
    import datetime
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0), 1, "click", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 0, 10), 1, "click", 1.0, "{}"),
        (3, datetime.datetime(2024, 1, 1, 2, 0), 1, "click", 1.0, "{}"),
        (4, datetime.datetime(2024, 1, 1, 0, 5), 2, "view", 2.0, "{}"),
        # late sentinel far in the future closes the earlier sessions
        (5, datetime.datetime(2024, 1, 2, 0, 0), 9, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    src = str(tmp_path / "sess_src")
    df.write.mode("overwrite").parquet(src)
    stream = read_event_stream(spark, src)
    got = run_to_memory(sessionize(stream, gap="30 minutes"), spark,
                        "sessions_test", str(tmp_path / "ckpt2"))
    sessions = {(r["user_id"], str(r["window_start"])): r["n_events"]
                for r in got.collect()}
    # user 1: events at 0:00+0:10 merge (gap<30m), 2:00 separate
    assert sessions[(1, "2024-01-01 00:00:00")] == 2
    assert sessions[(1, "2024-01-01 02:00:00")] == 1
    assert sessions[(2, "2024-01-01 00:05:00")] == 1
