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
