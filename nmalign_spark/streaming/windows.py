"""Structured Streaming operators over the events table.

The reference is strictly batch (SURVEY.md §2.9), so these are the engine's
*additional* streaming surface: the transformations are defined once and run
identically over a batch DataFrame (giving the DuckDB-checkable oracle twin)
or a ``readStream`` source with a watermark (late-data bound) — the standard
Spark unified-batch-streaming shape.

Scale notes: tumbling/session windows are hash-partitioned by their group
key, state is bounded by the watermark horizon, and a parquet/Iceberg stream
source at 100 TB feeds the same plan incrementally (file-listing per
microbatch; ``maxFilesPerTrigger`` bounds batch size).
"""

from __future__ import annotations

from pyspark.sql import functions as F

__all__ = ["EVENTS_DDL", "hourly_event_stats", "session_windows",
           "props_extract", "stream_hourly_event_stats",
           "stream_session_windows", "QUERIES", "ORACLES"]

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

SESSION_GAP = "30 minutes"


def _events(spark, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --- tumbling window ---------------------------------------------------------

def _hourly(ev):
    """Shared batch/stream transformation: 1-hour tumbling window stats."""
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def hourly_event_stats(spark, sf_dir):
    return _hourly(_events(spark, sf_dir))


def stream_hourly_event_stats(spark, src_dir: str):
    """Streaming twin: parquet file stream + 2h watermark so window state is
    dropped once the watermark passes (bounded state at any scale)."""
    ev = (spark.readStream.schema(EVENTS_DDL).parquet(src_dir)
          .withWatermark("ts", "2 hours"))
    return _hourly(ev)


ORACLE_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- session windows ---------------------------------------------------------

def _sessions(ev):
    """Shared transformation: per-user session windows (gap-merged)."""
    return (ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"),
                       "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    "n_events"))


def session_windows(spark, sf_dir):
    return _sessions(_events(spark, sf_dir))


def stream_session_windows(spark, src_dir: str):
    ev = (spark.readStream.schema(EVENTS_DDL).parquet(src_dir)
          .withWatermark("ts", "2 hours"))
    return _sessions(ev)


# gaps-and-islands: a session starts where the gap from the previous event of
# the same user exceeds SESSION_GAP; session id = running count of starts.
ORACLE_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL '30 minutes'
              THEN 0 ELSE 1 END AS is_start
  FROM events),
numbered AS (
  SELECT user_id, ts,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM marked)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, sess
"""


# --- JSON props extraction (F-family: JSON scalar functions) ----------------

def props_extract(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"))


ORACLE_PROPS = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
FROM events
"""


# --- streaming exact dedup ---------------------------------------------------

def event_dedup(spark, sf_dir):
    """Batch twin of the streaming dedup: first (min event_id) arrival per
    content key (user_id, event_type, props) plus the duplicate count —
    the exact-dedup tier applied AT INGEST in a streaming crawl pipeline."""
    ev = _events(spark, sf_dir)
    return (ev.groupBy("user_id", "event_type", "props")
            .agg(F.min("event_id").alias("first_event_id"),
                 F.count(F.lit(1)).alias("n_dups")))


ORACLE_EVENT_DEDUP = """
SELECT user_id, event_type, props,
       MIN(event_id) AS first_event_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM events GROUP BY user_id, event_type, props
"""


def stream_event_dedup(spark, src_dir: str):
    """Streaming twin: ``dropDuplicatesWithinWatermark`` on the content
    key — keeps ONE arrival per key while the watermark bounds the dedup
    state (keys older than the horizon are evicted, the standard
    at-ingest dedup of an event firehose).  Which arrival survives is
    arrival-order dependent, so the batch equivalence test compares the
    surviving KEY SET (tests/test_streaming.py), not row identity."""
    ev = (spark.readStream.schema(EVENTS_DDL).parquet(src_dir)
          .withWatermark("ts", "2 hours"))
    return ev.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "props"])


QUERIES = {
    "st_hourly_counts": hourly_event_stats,
    "st_session_windows": session_windows,
    "ev_props_extract": props_extract,
    "st_event_dedup": event_dedup,
}

ORACLES = {
    "st_hourly_counts": ORACLE_HOURLY,
    "st_session_windows": ORACLE_SESSIONS,
    "ev_props_extract": ORACLE_PROPS,
    "st_event_dedup": ORACLE_EVENT_DEDUP,
}
