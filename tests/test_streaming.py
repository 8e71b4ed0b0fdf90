"""Structured Streaming: the stream twin of each windowed operator must
produce exactly the batch result when drained with availableNow."""

import shutil

import pytest

from nmalign_spark.streaming import windows as stw

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def src_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def _drain(spark, sdf, name, tmp_path):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return (df.sort_values(by=list(df.columns)).reset_index(drop=True)
            .to_csv(index=False))


def test_stream_hourly_equals_batch(spark, src_dir, tmp_path):
    got = _drain(spark, stw.stream_hourly_event_stats(spark, src_dir),
                 "hourly_stream", tmp_path)
    want = stw.hourly_event_stats(spark, SF).toPandas()
    assert _canon(got) == _canon(want)


def test_stream_sessions_equal_batch(spark, src_dir, tmp_path):
    got = _drain(spark, stw.stream_session_windows(spark, src_dir),
                 "session_stream", tmp_path)
    want = stw.session_windows(spark, SF).toPandas()
    assert _canon(got) == _canon(want)


def test_watermark_present_in_plan(spark, src_dir):
    sdf = stw.stream_hourly_event_stats(spark, src_dir)
    assert sdf.isStreaming
    plan = sdf._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_append_mode_watermark_closes_windows(spark, tmp_path):
    """Append mode only emits a window once the watermark passes its end —
    the bounded-state contract. Two micro-batches: early events, then a
    far-future event that advances the watermark past every early window;
    the final append output must contain exactly the closed early windows."""
    import pandas as pd
    schema = stw.EVENTS_DDL
    d = tmp_path / "wm_src"
    early = [(1, "2024-01-01 00:10:00", 1, "view", 1.0, "{}"),
             (2, "2024-01-01 00:20:00", 1, "view", 2.0, "{}"),
             (3, "2024-01-01 01:10:00", 2, "click", 3.0, "{}")]
    late = [(4, "2024-02-01 00:00:00", 3, "view", 4.0, "{}")]

    def write(rows, name):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                          "event_type", "value", "props"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        df = spark.createDataFrame(pdf)
        df.coalesce(1).write.parquet(str(d / f"batch={name}"))

    write(early, "a")
    write(late, "b")
    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(str(d))
          .withWatermark("ts", "2 hours"))
    agg = (ev.groupBy(stw.F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(stw.F.count(stw.F.lit(1)).alias("n"))
           .select(stw.F.col("w.start").alias("ws"), "event_type", "n"))
    q = (agg.writeStream.format("memory").queryName("wm_append")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM wm_append ORDER BY ws").toPandas()
    # the two early windows are closed by the 2024-02 watermark and emitted;
    # the late event's own window is still open -> NOT emitted
    assert len(got) == 2
    assert got["n"].tolist() == [2, 1]
    assert str(got["ws"].iloc[0]).startswith("2024-01-01 00:00")
    assert str(got["ws"].iloc[1]).startswith("2024-01-01 01:00")


def test_stream_dedup_keys_equal_batch(spark, src_dir, tmp_path):
    """dropDuplicatesWithinWatermark keeps exactly one arrival per content
    key: the surviving key set equals the batch groupBy's key set (which
    arrival survives is order-dependent, so rows aren't compared)."""
    sdf = stw.stream_event_dedup(spark, src_dir)
    q = (sdf.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT user_id, event_type, props "
                    "FROM dedup_stream").toPandas()
    want = stw.event_dedup(spark, SF).toPandas()[
        ["user_id", "event_type", "props"]]
    key = lambda df: set(map(tuple, df.itertuples(index=False)))
    assert key(got) == key(want)
    assert len(got) == len(key(got))        # no duplicate keys survived
