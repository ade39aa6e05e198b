"""Structured Streaming tests: file stream -> watermarked windows,
stateful sessionization, metastore foreachBatch sink."""

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pramen_spark.config.models import DataFormat, TableConfig
from pramen_spark.metastore.metastore import Metastore
from pramen_spark.streaming.stream import (
    metastore_foreach_batch_sink,
    read_file_stream,
    sessionize,
    windowed_aggregation,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_events(spark, path, base=dt.datetime(2024, 1, 10, 12, 0, 0)):
    rows = []
    for i in range(60):
        rows.append((i, base + dt.timedelta(minutes=i), i % 3, float(i)))
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(path)


def run_available_now(stream_df, sink_fn=None, query_name="q"):
    if sink_fn is not None:
        q = (
            stream_df.writeStream.foreachBatch(sink_fn)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"/tmp/ckpt_{query_name}_{time.time_ns()}")
            .start()
        )
    else:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"/tmp/ckpt_{query_name}_{time.time_ns()}")
            .start()
        )
    q.awaitTermination(120)
    return q


class TestStreamingDedup:
    def test_duplicates_dropped_within_watermark(self, spark, tmp_path):
        from pramen_spark.streaming.stream import streaming_dedup

        src = str(tmp_path / "events")
        base = dt.datetime(2024, 1, 10, 12, 0, 0)
        rows = [(i, base + dt.timedelta(minutes=i), i % 3, float(i)) for i in range(20)]
        rows += rows[:5]  # redelivered duplicates
        spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(src)

        stream = read_file_stream(spark, src, EVENTS_SCHEMA)
        deduped = streaming_dedup(stream, "ts", key_cols=("event_id",))
        run_available_now(deduped, query_name="sdedup")
        out = spark.sql("SELECT event_id FROM sdedup").collect()
        ids = sorted(r["event_id"] for r in out)
        assert ids == list(range(20))  # each id exactly once

    def test_unbounded_variant(self, spark, tmp_path):
        from pramen_spark.streaming.stream import streaming_dedup

        src = str(tmp_path / "events2")
        write_events(spark, src)
        stream = read_file_stream(spark, src, EVENTS_SCHEMA)
        deduped = streaming_dedup(stream, "ts", key_cols=("user_id",),
                                  within_watermark=False)
        run_available_now(deduped, query_name="sdedup2")
        assert spark.sql("SELECT COUNT(*) n FROM sdedup2").collect()[0]["n"] == 3


class TestWindowedAggregation:
    def test_tumbling_windows(self, spark, tmp_path):
        src = str(tmp_path / "events")
        write_events(spark, src)
        stream = read_file_stream(spark, src, EVENTS_SCHEMA)
        agg = windowed_aggregation(stream, "ts", "10 minutes", watermark="5 minutes",
                                   group_cols=("user_id",), value_col="value")
        run_available_now(agg, query_name="win1")
        out = spark.sql("SELECT * FROM win1").collect()
        # 60 minutes of data -> 6 windows x 3 users, but append mode only
        # emits windows the watermark (max event time - 5 min) has passed:
        # the final 12:50-13:00 window per user stays open -> 15 emitted
        assert len(out) == 15
        assert all(r["cnt"] > 0 for r in out)
        total = sum(r["sum_value"] for r in out)
        assert total == sum(range(50))  # events 50..59 are in the open window

    def test_batch_mode_windows_too(self, spark, tmp_path):
        # the same helper works on batch DataFrames (no watermark state)
        src = str(tmp_path / "events_b")
        write_events(spark, src)
        df = spark.read.parquet(src)
        agg = windowed_aggregation(df, "ts", "30 minutes", watermark="5 minutes")
        rows = agg.collect()
        assert len(rows) == 2
        assert sum(r["cnt"] for r in rows) == 60


class TestSessionize:
    def test_sessions_close_on_gap(self, spark, tmp_path):
        src = str(tmp_path / "sess")
        base = dt.datetime(2024, 1, 10, 12, 0, 0)
        rows = []
        # user 1: two bursts separated by 2 hours -> 2 sessions
        for i in range(5):
            rows.append((i, base + dt.timedelta(minutes=i), 1, 0.0))
        for i in range(5):
            rows.append((100 + i, base + dt.timedelta(hours=2, minutes=i), 1, 0.0))
        spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(src)

        stream = read_file_stream(spark, src, EVENTS_SCHEMA)
        sessions = sessionize(stream, "user_id", "ts", gap="30 minutes")
        run_available_now(sessions, query_name="sess1")
        out = spark.sql("SELECT * FROM sess1").collect()
        # both micro-batch arrivals land in one batch; the first session
        # closes when the second burst arrives past the gap
        assert len(out) >= 1
        s = out[0]
        assert s["n_events"] == 5
        assert s["session_start"] == base
        assert s["session_end"] == base + dt.timedelta(minutes=4)


class TestMetastoreForeachBatch:
    def test_stream_to_metastore_partitions(self, spark, tmp_path):
        src = str(tmp_path / "events_ms")
        base = dt.datetime(2024, 1, 10, 23, 30, 0)
        rows = [(i, base + dt.timedelta(minutes=i), i % 2, float(i)) for i in range(60)]
        spark.createDataFrame(rows, EVENTS_SCHEMA).write.mode("overwrite").parquet(src)

        ms = Metastore(
            spark,
            [TableConfig(name="stream_events",
                         format=DataFormat.parquet(str(tmp_path / "stream_events")),
                         save_mode="append")],
        )
        stream = read_file_stream(spark, src, EVENTS_SCHEMA)
        sink = metastore_foreach_batch_sink(ms, "stream_events", "ts")
        run_available_now(stream, sink_fn=sink, query_name="ms1")

        # events straddle midnight -> two partitions
        d1, d2 = dt.date(2024, 1, 10), dt.date(2024, 1, 11)
        n1 = ms.get_table("stream_events", d1, d1).count()
        n2 = ms.get_table("stream_events", d2, d2).count()
        assert n1 == 30 and n2 == 30
        df = ms.get_table("stream_events", d1, d2)
        assert "pramen_batchid" in df.columns


class TestSessionizeBatch:
    def test_batch_sessions(self, spark):
        from pramen_spark.streaming.stream import sessionize_batch

        base = dt.datetime(2024, 1, 10, 12, 0, 0)
        rows = []
        for i in range(5):
            rows.append((i, base + dt.timedelta(minutes=i), 1, 0.0))
        for i in range(5):
            rows.append((100 + i, base + dt.timedelta(hours=2, minutes=i), 1, 0.0))
        rows.append((200, base, 2, 0.0))
        df = spark.createDataFrame(rows, EVENTS_SCHEMA)
        out = {(r["user_id"], r["session_start"], r["n_events"])
               for r in sessionize_batch(df, "user_id", "ts", "30 minutes").collect()}
        assert out == {
            (1, base, 5),
            (1, base + dt.timedelta(hours=2), 5),
            (2, base, 1),
        }
