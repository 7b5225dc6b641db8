"""Registry part 4 — the Structured Streaming surface beyond the daily
rollup (q33): sliding windows, watermarked dedup under re-delivery,
native session windows, and a custom stateful operator via
``applyInPandasWithState`` (SURVEY §2.7 streaming row; §7.1 step 6).

Every query replays the events table with ``Trigger.AvailableNow`` —
the reference's daily micro-batch model (SURVEY §1.4) — and is checked
against a BATCH DuckDB oracle: the streaming answer must equal the
batch answer. Timestamps cross the comparison as epoch microseconds
(LongType) so session-timezone handling can't skew the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import q

_12H_US = 12 * 3600 * 1_000_000
_1D_US = 24 * 3600 * 1_000_000
_GAP_US = 30 * 60 * 1_000_000


@q(
    "q47_stream_sliding_window",
    oracle=f"""
WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
w AS (
  SELECT (us // {_12H_US}) * {_12H_US} AS ws, event_type FROM e
  UNION ALL
  SELECT (us // {_12H_US}) * {_12H_US} - {_12H_US}, event_type FROM e
)
SELECT ws AS window_start_us, ws + {_1D_US} AS window_end_us,
  event_type, COUNT(*) AS n_events
FROM w GROUP BY 1, 2, 3
""",
)
def q47_stream_sliding_window(spark, sf_dir):
    """Streaming sliding-window counts (1-day window, 12-h slide): each
    event lands in exactly window_len/slide = 2 epoch-aligned windows,
    which is what the batch oracle enumerates explicitly. Lifecycle
    memoized per corpus (574f795 pattern) — see
    :func:`..streaming.events.memoized_stream_result`."""
    from .streaming.events import memoized_stream_result, stream_sliding_counts

    def build():
        return stream_sliding_counts(spark, sf_dir).select(
            F.unix_micros("window_start").alias("window_start_us"),
            F.unix_micros("window_end").alias("window_end_us"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
        )

    return memoized_stream_result(spark, sf_dir, "q47sw", build).select(
        "window_start_us", "window_end_us", "event_type", "n_events"
    )


@q(
    "q48_stream_dedup_redelivery",
    oracle="""
SELECT event_type, COUNT(DISTINCT event_id) AS n_events
FROM events GROUP BY event_type
""",
)
def q48_stream_dedup_redelivery(spark, sf_dir):
    """Watermarked streaming dedup under re-delivery (stream unioned
    with itself => every event arrives twice;
    ``dropDuplicatesWithinWatermark`` must collapse each back to one)
    — the streaming twin of the H1/H4 checksum dedup. Lifecycle
    memoized per corpus (574f795 pattern)."""
    from .streaming.events import memoized_stream_result, stream_dedup_union

    def build():
        return stream_dedup_union(spark, sf_dir).select(
            "event_type", F.col("n_events").cast("long").alias("n_events")
        )

    return memoized_stream_result(spark, sf_dir, "q48dd", build).select(
        "event_type", "n_events"
    )


@q(
    "q49_stream_session_window",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT *, CASE
    WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL THEN 1
    WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
      >= {_GAP_US} THEN 1
    ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT *, SUM(new_session) OVER (
    PARTITION BY user_id ORDER BY us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
  MIN(us) AS session_start_us,
  MAX(us) + {_GAP_US} AS session_end_us,
  COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
)
def q49_stream_session_window(spark, sf_dir):
    """Native streaming ``session_window`` (30-min gap). Oracle is the
    gaps-and-islands batch formulation with the session_window boundary
    rule: a session is [t, t+gap), so diff == gap does NOT merge
    (hence >= in the oracle where batch q32 uses >), and session_end =
    last_event + gap. Lifecycle memoized per corpus (574f795
    pattern)."""
    from .streaming.events import memoized_stream_result, stream_session_windows

    def build():
        return stream_session_windows(spark, sf_dir).select(
            "user_id",
            F.unix_micros("session_start").alias("session_start_us"),
            F.unix_micros("session_end").alias("session_end_us"),
            F.col("n_events").cast("long").alias("n_events"),
        )

    return memoized_stream_result(spark, sf_dir, "q49sn", build).select(
        "user_id", "session_start_us", "session_end_us", "n_events"
    )


@q(
    "q50_stream_stateful_user",
    oracle="""
WITH last AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT e.user_id,
  COUNT(*) AS n_events,
  MIN(e.value) AS min_value,
  MAX(e.value) AS max_value,
  MAX(l.event_type) AS last_event_type
FROM events e
JOIN last l ON l.user_id = e.user_id AND l.rn = 1
GROUP BY e.user_id
""",
)
def q50_stream_stateful_user(spark, sf_dir):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user GroupState carrying count/min/max/last-event — the
    reference's keyed incremental state ledger as an online operator.
    Only order-independent stats are kept so the batch oracle is exact
    (no float accumulation order dependence). Lifecycle memoized per
    corpus (574f795 pattern)."""
    from .streaming.events import memoized_stream_result, stream_user_state

    def build():
        return stream_user_state(spark, sf_dir).select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            "min_value",
            "max_value",
            "last_event_type",
        )

    return memoized_stream_result(spark, sf_dir, "q50us", build).select(
        "user_id", "n_events", "min_value", "max_value", "last_event_type"
    )
