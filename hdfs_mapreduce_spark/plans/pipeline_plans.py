"""Windowed/session/multimodal queries with DuckDB oracle twins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.multimodal import (
    attach_payload,
    content_dedup,
    payload_stats,
)
from hdfs_mapreduce_spark.sources.catalog import load_table
from hdfs_mapreduce_spark.streaming.events import (
    SESSION_GAP_MIN,
    session_stats,
    windowed_event_stats,
)


def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_stats(spark, sf_dir)


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(spark, sf_dir)


def multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata scan over documents-as-payloads."""
    docs = load_table(spark, sf_dir, "documents")
    return payload_stats(attach_payload(docs, "doc_id", "text"))


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return content_dedup(attach_payload(docs, "doc_id", "text"))


QUERIES = {
    "events_windowed": events_windowed,
    "events_sessions": events_sessions,
    "multimodal_stats": multimodal_stats,
    "multimodal_dedup": multimodal_dedup,
}

ORACLE_SQL = {
    "events_windowed": """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type, COUNT(*) AS n_events, SUM(value) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    "events_sessions": f"""
        WITH flagged AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts)
                                > {SESSION_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS session_seq
            FROM flagged
        )
        SELECT user_id, session_seq, COUNT(*) AS n_events,
               date_diff('second', MIN(ts), MAX(ts)) AS duration_sec
        FROM sessions GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
    "multimodal_stats": """
        SELECT doc_id AS id, 'text/plain' AS mime,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256
        FROM documents ORDER BY id
    """,
    "multimodal_dedup": """
        SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY keep_id
    """,
}
