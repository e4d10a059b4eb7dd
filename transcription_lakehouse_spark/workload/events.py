"""Event-stream workload: the reference's sequential/window operators (W1-W6)
mapped onto the `events` table, plus catalog aggregations (A1/A3) and the
batch twin of streaming tumbling-window rollups (§2.11).

Timestamps are exact epoch-microsecond longs (`ts_us`, see sources/tables.py)
so window arithmetic is integer and hash-identical to DuckDB's epoch_us().

Scale notes: every window partitions by `user_id` — at 100 TB this is a
single shuffle on a high-cardinality key; sessions/islands then collapse via
map-side-combinable groupBys. Synthetic intervals derive end = start +
floor(value*1e6) µs so the interval operators have real overlap structure.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.intervals import (
    merged_intervals,
    monotonicity_violations,
    sweep_concurrency,
)
from ..operators.sessionization import with_session_id
from ..sources.tables import load_table

SESSION_GAP_US = 600 * 1_000_000  # 10 min


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[start_us, end_us) intervals: end = ts + value seconds (floored µs)."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("start_us"),
        (
            F.col("ts_us")
            + F.floor(F.col("value") * F.lit(1_000_000.0)).cast("long")
        ).alias("end_us"),
    )


_INTERVALS_SQL = """
  SELECT user_id, event_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + CAST(floor(value * 1000000.0) AS BIGINT) AS end_us
  FROM events
"""


def evt_user_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 'episode catalog' analog: per-user activity profile with
    sorted-distinct set aggregation (SO3/SO4)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
        F.round((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000.0), 6).alias(
            "active_span_sec"
        ),
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


EVT_USER_CATALOG_SQL = """
SELECT user_id,
       count(*)                                   AS n_events,
       count(DISTINCT event_type)                 AS n_event_types,
       min(epoch_us(ts))                          AS first_us,
       max(epoch_us(ts))                          AS last_us,
       round((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0, 6) AS active_span_sec,
       array_to_string(list_sort(list(DISTINCT event_type)), ',')    AS event_types,
       round(sum(value), 2)                       AS sum_value
FROM events
GROUP BY user_id
"""


def evt_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 'speaker catalog' analog + A7 distribution stats (exact median)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        # no derived avg: 2-decimal money avgs land on rounding
        # half-boundaries where engine ulp drift flips the digit — emit
        # rounded sum + count and let consumers divide (parity rule)
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.stddev("value"), 4).alias("std_value"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
    )


EVT_TYPE_STATS_SQL = """
SELECT event_type,
       count(*)                      AS n_events,
       count(DISTINCT user_id)       AS n_users,
       round(sum(value), 2)          AS sum_value,
       round(min(value), 2)          AS min_value,
       round(max(value), 2)          AS max_value,
       round(stddev_samp(value), 4)  AS std_value,
       round(quantile_cont(value, 0.5), 4) AS median_value
FROM events
GROUP BY event_type
"""


def evt_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 sessionization: per-user sessions split on >10 min idle gaps."""
    ev = _events(spark, sf_dir)
    tagged = with_session_id(
        ev,
        ["user_id"],
        "ts_us",
        SESSION_GAP_US,
        tiebreak_cols=["event_id"],
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


EVT_SESSIONS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), numbered AS (
  -- CAST: DuckDB window sum() yields HUGEINT, which .df() coerces to
  -- float64 and breaks the driver's value hash vs Spark's long
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       count(*)             AS n_events,
       min(ts_us)           AS session_start_us,
       max(ts_us)           AS session_end_us,
       round(sum(value), 2) AS session_value
FROM numbered
GROUP BY user_id, session_id
"""


def evt_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 interval union: per-user merged-coverage stats (overlap-aware, so
    covered time never double-counts — `coverage.py:19-80` semantics)."""
    merged = merged_intervals(
        _intervals(spark, sf_dir), ["user_id"], "start_us", "end_us"
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("end_us") - F.col("start_us")).alias("covered_us"),
        F.max(F.col("end_us") - F.col("start_us")).alias("longest_island_us"),
        F.sum("n_merged").alias("n_intervals"),
    )


EVT_INTERVAL_UNION_SQL = f"""
WITH iv AS ({_INTERVALS_SQL}),
tagged AS (
  SELECT *, CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                   OR start_us > max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_island
  FROM iv
), islands AS (
  SELECT *, sum(new_island) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                  ROWS UNBOUNDED PRECEDING) AS island_id
  FROM tagged
), merged AS (
  SELECT user_id, island_id, min(start_us) AS s, max(end_us) AS e, count(*) AS n_merged
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       count(*)       AS n_islands,
       CAST(sum(e - s) AS BIGINT) AS covered_us,
       max(e - s)     AS longest_island_us,
       CAST(sum(n_merged) AS BIGINT) AS n_intervals
FROM merged
GROUP BY user_id
"""


def evt_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 gap detection: holes between a user's merged activity islands."""
    merged = merged_intervals(
        _intervals(spark, sf_dir), ["user_id"], "start_us", "end_us"
    )
    w = Window.partitionBy("user_id").orderBy("start_us")
    gap = F.lead("start_us").over(w) - F.col("end_us")
    per_gap = merged.withColumn("gap_us", gap).filter(F.col("gap_us") > 0)
    return per_gap.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_us").alias("total_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


EVT_GAP_STATS_SQL = f"""
WITH iv AS ({_INTERVALS_SQL}),
tagged AS (
  SELECT *, CASE WHEN max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                   OR start_us > max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_island
  FROM iv
), islands AS (
  SELECT *, sum(new_island) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                  ROWS UNBOUNDED PRECEDING) AS island_id
  FROM tagged
), merged AS (
  SELECT user_id, island_id, min(start_us) AS start_us, max(end_us) AS end_us
  FROM islands GROUP BY user_id, island_id
), gapped AS (
  SELECT user_id,
         lead(start_us) OVER (PARTITION BY user_id ORDER BY start_us) - end_us AS gap_us
  FROM merged
)
SELECT user_id, count(*) AS n_gaps, CAST(sum(gap_us) AS BIGINT) AS total_gap_us, max(gap_us) AS max_gap_us
FROM gapped WHERE gap_us > 0
GROUP BY user_id
"""


def evt_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 sweep line: per-user peak number of simultaneously-open intervals
    and how many boundary events sit inside an overlap (active >= 2)."""
    swept = sweep_concurrency(
        _intervals(spark, sf_dir), ["user_id"], "start_us", "end_us"
    )
    return swept.groupBy("user_id").agg(
        F.max("active").alias("max_active"),
        F.sum((F.col("active") >= 2).cast("long")).alias("n_overlap_points"),
    )


EVT_MAX_CONCURRENCY_SQL = f"""
WITH iv AS ({_INTERVALS_SQL}),
ev AS (
  SELECT user_id, start_us AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT user_id, end_us AS t, -1 AS delta FROM iv
), running AS (
  SELECT user_id, sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta
                                   ROWS UNBOUNDED PRECEDING) AS active
  FROM ev
)
SELECT user_id,
       CAST(max(active) AS BIGINT) AS max_active,
       CAST(sum(CASE WHEN active >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap_points
FROM running
GROUP BY user_id
"""


def evt_monotonicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 regression check: intervals whose end overruns the next start."""
    return monotonicity_violations(
        _intervals(spark, sf_dir), ["user_id"], "start_us", "end_us"
    )


EVT_MONOTONICITY_SQL = f"""
WITH iv AS ({_INTERVALS_SQL}),
flagged AS (
  SELECT user_id,
         CASE WHEN lead(start_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us) IS NOT NULL
               AND end_us > lead(start_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us)
              THEN 1 ELSE 0 END AS viol
  FROM iv
)
SELECT user_id, CAST(sum(viol) AS BIGINT) AS n_regressions, count(*) AS n_rows
FROM flagged GROUP BY user_id
"""


def evt_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (batch twin of the Structured Streaming path,
    §2.11): events per (hour, type)."""
    ev = _events(spark, sf_dir)
    hour = F.expr("ts_us div 3600000000").alias("hour_id")
    return ev.groupBy(hour, "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


EVT_HOURLY_SQL = """
SELECT epoch_us(ts) // 3600000000 AS hour_id, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def evt_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup cascade (hypertable continuous-aggregate
    shape): DAILY stats composed from HOURLY partials — sum-of-sums,
    min-of-mins, count-of-counts; avg derived from composed sums, never
    averaged-of-averages (the reference's speakers.py:101 inexactness).

    At 100 TB the hourly level is a materialized table and each coarser
    resolution reads the previous one, so the raw scan is paid once; the
    oracle checks the algebraic identity by computing daily directly from
    raw events."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.expr("ts_us div 3600000000").alias("hour_id"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return (
        hourly.withColumn("day_id", F.expr("hour_id div 24"))
        .groupBy("day_id", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            # no avg column: round(rounded_sum/count, 4) lands exactly on
            # half-boundaries for power-of-two counts, where Spark
            # (string-BigDecimal HALF_UP) and DuckDB (binary) disagree;
            # consumers derive avg from sum_value/n_events
            F.round(F.sum("sv"), 2).alias("sum_value"),
            F.round(F.min("mn"), 2).alias("min_value"),
            F.round(F.max("mx"), 2).alias("max_value"),
        )
    )


EVT_ROLLUP_CASCADE_SQL = """
SELECT (epoch_us(ts) // 3600000000) // 24 AS day_id, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY 1, 2
"""


def evt_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 fixed-bin histogram of event values per type (bin width 50)."""
    ev = _events(spark, sf_dir)
    bin_id = F.floor(F.col("value") / F.lit(50.0)).cast("long").alias("bin_id")
    return ev.groupBy("event_type", bin_id).agg(
        F.count(F.lit(1)).alias("n_events"),
    )


EVT_HISTOGRAM_SQL = """
SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin_id, count(*) AS n_events
FROM events
GROUP BY 1, 2
"""


def evt_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (scalar-function family §2.7): parse props.k and
    profile it per event type."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


EVT_JSON_PROPS_SQL = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def evt_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20/A21 correlation battery: Pearson corr(value, props.k) per event
    type plus global Spearman.

    Scale: the Spearman ranks use the DISTRIBUTED global row_number
    (range shuffle + per-partition numbering + broadcast offsets,
    operators/ranking.py) — no single-partition window anywhere. event_id
    is a unique tiebreak, so row_number == rank(). NULL k/value rows are
    filtered explicitly (Spark and DuckDB disagree on NULL sort placement).
    """
    from ..operators.ranking import global_row_number

    ev = (
        _events(spark, sf_dir)
        .withColumn("k", F.get_json_object("props", "$.k").cast("double"))
        .filter(F.col("k").isNotNull() & F.col("value").isNotNull())
        .select("event_type", "event_id", "value", "k")
    )
    ranked = global_row_number(
        global_row_number(ev, ["value", "event_id"], "rv"),
        ["k", "event_id"],
        "rk",
    )
    return ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("value", "k"), 6).alias("pearson_value_k"),
        F.round(F.corr("rv", "rk"), 6).alias("spearman_value_k"),
    )


EVT_CORR_SQL = """
WITH src AS (
  SELECT event_type, event_id, value,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
  FROM events
  WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
    AND value IS NOT NULL
), ranked AS (
  SELECT event_type, value, k,
         rank() OVER (ORDER BY value, event_id) AS rv,
         rank() OVER (ORDER BY k, event_id) AS rk
  FROM src
)
SELECT event_type, count(*) AS n,
       round(corr(value, k), 6)  AS pearson_value_k,
       round(corr(rv, rk), 6)    AS spearman_value_k
FROM ranked GROUP BY event_type
"""


def evt_user_catalog_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant twin of the per-user rollup: salted two-phase
    aggregation whose result must hash-match the PLAIN single-phase oracle —
    the correctness proof that salting changes the plan, not the answer."""
    from ..operators.skew import salted_agg

    ev = _events(spark, sf_dir)
    out = salted_agg(
        ev,
        ["user_id"],
        {
            "n_events": ("count", "event_id"),
            "first_us": ("min", "ts_us"),
            "last_us": ("max", "ts_us"),
            "sum_value_raw": ("sum", "value"),
        },
        n_salts=8,
    )
    # no derived avg: round(rounded_sum/count, 4) sits exactly on .xxxx5
    # when count is a power of two (seen failing live at sf0.1) — emit
    # rounded sum + count instead (parity rule)
    return out.select(
        "user_id",
        "n_events",
        "first_us",
        "last_us",
        F.round("sum_value_raw", 2).alias("sum_value"),
    )


EVT_USER_CATALOG_SALTED_SQL = """
SELECT user_id,
       count(*)             AS n_events,
       min(epoch_us(ts))    AS first_us,
       max(epoch_us(ts))    AS last_us,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY user_id
"""


def evt_first_last_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax aggregation (min_by/max_by): each user's first and last
    event type plus the value carried at those moments.

    The ordering key is the composite (ts_us, event_id): two events CAN share
    a timestamp, and a bare ts_us key would let Spark and DuckDB resolve the
    tie differently — nondeterministic run-to-run."""
    ev = _events(spark, sf_dir)
    key = F.struct("ts_us", "event_id")
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", key).alias("first_type"),
        F.max_by("event_type", key).alias("last_type"),
        F.round(F.min_by("value", key), 2).alias("first_value"),
        F.round(F.max_by("value", key), 2).alias("last_value"),
    )


EVT_FIRST_LAST_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id,
       max(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
       max(CASE WHEN rn_d = 1 THEN event_type END) AS last_type,
       round(max(CASE WHEN rn_a = 1 THEN value END), 2) AS first_value,
       round(max(CASE WHEN rn_d = 1 THEN value END), 2) AS last_value
FROM ordered GROUP BY user_id
"""


def evt_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent view at
    or before it (point-in-time-correct feature lookup). The right side is
    pre-deduped to one row per (user, instant) keeping max event_id, so the
    match — and the DuckDB ``ASOF LEFT JOIN`` twin — is fully deterministic.
    Scale: one shuffle on user_id (union + keyed running-carry window), no
    range explosion."""
    from ..operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts_us").alias("view_ts_us"))
        .agg(F.max("event_id").alias("view_event_id"))
    )
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts_us", right_ts="view_ts_us"
    )
    return out.select(
        "user_id",
        "event_id",
        "ts_us",
        "view_event_id",
        "view_ts_us",
        (F.col("ts_us") - F.col("view_ts_us")).alias("lag_us"),
    )


EVT_ASOF_SQL = """
WITH l AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, epoch_us(ts) AS view_ts_us, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, epoch_us(ts)
)
SELECT l.user_id, l.event_id, l.ts_us, r.view_event_id, r.view_ts_us,
       l.ts_us - r.view_ts_us AS lag_us
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts_us >= r.view_ts_us
"""


def evt_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window aggregation: per-user running value total over time
    (the batch shape of a stateful streaming accumulator)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts_us", "event_id"))
        .alias("seq"),
    )


EVT_RUNNING_TOTAL_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            AS INTEGER) AS seq
FROM events
"""


def evt_error_only_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (SO2): users who errored but never purchased, with
    their error counts (EXCEPT → re-join for the aggregate)."""
    ev = _events(spark, sf_dir)
    err = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    buy = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    only = err.exceptAll(buy)
    return (
        ev.filter(F.col("event_type") == "error")
        .join(only, "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )


EVT_ERROR_ONLY_SQL = """
WITH err_only AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
SELECT user_id, count(*) AS n_errors
FROM events
WHERE event_type = 'error' AND user_id IN (SELECT user_id FROM err_only)
GROUP BY user_id
"""


def evt_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation (the streaming-capable twin of
    evt_sessions): events merge while each is < gap after the previous.

    Note the boundary differs from the lag-based variant by one edge case:
    session_window treats [t, t+gap) as half-open, so a follower exactly
    gap later starts a NEW session (>= vs >) — the oracle mirrors that.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_US // 1_000_000} seconds"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
        .select("user_id", "n_events", "session_start_us", "session_end_us")
    )


EVT_SESSION_WINDOW_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), numbered AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, count(*) AS n_events,
       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
FROM numbered
GROUP BY user_id, session_id
"""


def evt_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total window: each event type's share of its user's events
    (groupBy + windowed total on the grouped result — no second scan)."""
    ev = _events(spark, sf_dir)
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    total = F.sum("n_events").over(Window.partitionBy("user_id"))
    return per.select(
        "user_id",
        "event_type",
        "n_events",
        F.round(F.col("n_events") / total, 6).alias("share"),
    )


EVT_TYPE_SHARE_SQL = """
WITH per AS (
  SELECT user_id, event_type, count(*) AS n_events
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type, n_events,
       round(n_events / CAST(sum(n_events) OVER (PARTITION BY user_id) AS DOUBLE), 6) AS share
FROM per
"""


def evt_session_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: percentile battery OVER the derived sessions (the W2
    output feeds A7) — per user, median/p90 session length and event count."""
    sessions = evt_sessions(spark, sf_dir).withColumn(
        "len_sec", (F.col("session_end_us") - F.col("session_start_us")) / 1e6
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.percentile("len_sec", F.lit(0.5)), 4).alias("median_len_sec"),
        F.round(F.percentile("len_sec", F.lit(0.9)), 4).alias("p90_len_sec"),
        F.max("n_events").alias("max_session_events"),
    )


EVT_SESSION_LENGTH_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), numbered AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM flagged
), sessions AS (
  SELECT user_id, session_id, count(*) AS n_events,
         (max(ts_us) - min(ts_us)) / 1000000.0 AS len_sec
  FROM numbered GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       round(quantile_cont(len_sec, 0.5), 4) AS median_len_sec,
       round(quantile_cont(len_sec, 0.9), 4) AS p90_len_sec,
       max(n_events) AS max_session_events
FROM sessions GROUP BY user_id
"""


def evt_random_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA2 oracle over `quality.sampling.random_pairs`: two independent
    sha2-seeded shufflings zipped by position — content-deterministic, so
    DuckDB reproduces the exact pair set. Each side plans as TakeOrdered
    (per-partition top-k), never a global sort."""
    from ..quality.sampling import random_pairs

    ev = _events(spark, sf_dir).select("event_id")
    return random_pairs(ev, "event_id", 100)


EVT_RANDOM_PAIRS_SQL = """
WITH s1 AS (
  SELECT event_id AS id_1,
         sha256(concat(CAST(event_id AS VARCHAR), '|', '42')) AS o
  FROM events ORDER BY o LIMIT 100
), r1 AS (
  SELECT id_1, row_number() OVER (ORDER BY o) AS i FROM s1
), s2 AS (
  SELECT event_id AS id_2,
         sha256(concat(CAST(event_id AS VARCHAR), '|', '43')) AS o
  FROM events ORDER BY o LIMIT 100
), r2 AS (
  SELECT id_2, row_number() OVER (ORDER BY o) AS i FROM s2
)
SELECT id_1, id_2 FROM r1 JOIN r2 USING (i) WHERE id_1 <> id_2
"""


def evt_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap RANGE JOIN: every pair of a user's event intervals
    that overlaps in time, with the overlap length. Spark plans a pure
    inequality join as a nested loop, so the operator bins both sides to
    64 s buckets and equi-joins on (user, bin) — each pair is emitted once
    from its anchor bin, no distinct needed (`operators/rangejoin.py`).
    The DuckDB twin is the naive inequality join, so the oracle proves
    binning + anchor ≡ true range-join semantics."""
    from ..operators.rangejoin import interval_overlap_join

    iv = _intervals(spark, sf_dir)
    a = iv.select(
        "user_id",
        F.col("event_id").alias("id_1"),
        F.col("start_us").alias("s_1"),
        F.col("end_us").alias("e_1"),
    )
    b = iv.select(
        "user_id",
        F.col("event_id").alias("id_2"),
        F.col("start_us").alias("s_2"),
        F.col("end_us").alias("e_2"),
    )
    j = interval_overlap_join(a, b, ["user_id"], "s_1", "e_1", "s_2", "e_2")
    return (
        j.filter(F.col("id_1") < F.col("id_2"))
        .select(
            "user_id",
            "id_1",
            "id_2",
            (F.least("e_1", "e_2") - F.greatest("s_1", "s_2")).alias(
                "overlap_us"
            ),
        )
        .orderBy("user_id", "id_1", "id_2")
    )


EVT_OVERLAP_JOIN_SQL = f"""
WITH iv AS ({_INTERVALS_SQL})
SELECT a.user_id, a.event_id AS id_1, b.event_id AS id_2,
       least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us) AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND a.start_us < b.end_us AND b.start_us < a.end_us
 -- mirror the operator's empty-interval guard (end <= start never joins)
 AND a.end_us > a.start_us AND b.end_us > b.start_us
ORDER BY a.user_id, id_1, id_2
"""


def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel view → click → purchase: each step's
    timestamp is the user's FIRST occurrence of that type strictly ordered
    after the previous step. Three per-user aggregates, each joined back on
    user_id — the partitioning is established once and every subsequent
    shuffle reuses it (same key), so the funnel costs one real exchange of
    the fact table plus small per-user relations. `stage` counts completed
    steps (ties at the same µs count as ordered: >=)."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    t1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts_us").alias("t_view_us")
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts_us") >= F.col("t_view_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click_us"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts_us") >= F.col("t_click_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase_us"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "t_view_us",
            "t_click_us",
            "t_purchase_us",
            (
                F.lit(1)
                + F.when(F.col("t_click_us").isNotNull(), 1).otherwise(0)
                + F.when(F.col("t_purchase_us").isNotNull(), 1).otherwise(0)
            ).alias("stage"),
        )
        .orderBy("user_id")
    )


EVT_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t_view_us
  FROM events WHERE event_type = 'view' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, min(epoch_us(ts)) AS t_click_us
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE event_type = 'click' AND epoch_us(ts) >= t_view_us
  GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, min(epoch_us(ts)) AS t_purchase_us
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE event_type = 'purchase' AND epoch_us(ts) >= t_click_us
  GROUP BY e.user_id
)
SELECT t1.user_id, t_view_us, t_click_us, t_purchase_us,
       1 + CASE WHEN t_click_us IS NOT NULL THEN 1 ELSE 0 END
         + CASE WHEN t_purchase_us IS NOT NULL THEN 1 ELSE 0 END AS stage
FROM t1
LEFT JOIN t2 ON t1.user_id = t2.user_id
LEFT JOIN t3 ON t1.user_id = t3.user_id
ORDER BY t1.user_id
"""


def evt_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week, then
    distinct active users per (cohort_week, week_offset). Two aggregates on
    the SAME user_id key — the per-user first-week relation joins back
    without a new shuffle partitioning — then a small (cohort, offset)
    rollup. Weeks are epoch-µs div 7-days (epoch-anchored, no calendar
    ambiguity between engines)."""
    wk = 7 * 24 * 3600 * 1_000_000
    ev = _events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {wk}").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


EVT_COHORT_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
), first AS (
  SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
)
SELECT cohort_week, week - cohort_week AS week_offset,
       count(DISTINCT e.user_id) AS n_active
FROM e JOIN first ON e.user_id = first.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def evt_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (1 h windows every 30 min): each event
    lands in duration/slide = 2 overlapping windows — Spark's `F.window`
    with a slide explodes exactly those assignments JVM-side (the batch
    twin of the streaming sliding monitor). The DuckDB twin reproduces the
    window set with a 2-element offset series. Emitted as epoch-µs window
    starts so both engines compare integers, not timestamps."""
    ev = _events(spark, sf_dir)
    w = F.window(F.timestamp_micros(F.col("ts_us")), "1 hour", "30 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("win_start_us", "event_type")
    )


EVT_SLIDING_SQL = """
WITH e AS (
  SELECT epoch_us(ts) AS t, event_type, value FROM events
), assigned AS (
  -- the two 1h/30min sliding windows covering t: starts at
  -- floor(t/slide)*slide - k*slide for k in 0..(duration/slide - 1),
  -- keeping only windows that actually contain t (t < start + duration)
  SELECT (t // 1800000000 - k) * 1800000000 AS win_start_us, event_type, value
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k)
  WHERE t < (t // 1800000000 - k) * 1800000000 + 3600000000
)
SELECT win_start_us, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
FROM assigned
GROUP BY 1, 2 ORDER BY 1, 2
"""


def evt_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — windows can't COUNT(DISTINCT),
    so the scalable identity is: flag each user's FIRST-ever event (one
    per-user window), then a running sum of flags over the per-day rollup.
    Two shuffles (user window, day rollup) plus a day-grain running window
    over a tiny relation."""
    day = 24 * 3600 * 1_000_000
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.expr(f"ts_us div {day}").alias("d")
    )
    w = Window.partitionBy("user_id").orderBy("d", "event_id")
    flagged = ev.withColumn(
        "is_first", (F.row_number().over(w) == 1).cast("long")
    )
    per_day = flagged.groupBy("d").agg(
        F.sum("is_first").alias("new_users"),
        F.countDistinct("user_id").alias("active_users"),
    )
    run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d").alias("day_id"),
        "new_users",
        "active_users",
        F.sum("new_users").over(run).alias("cumulative_users"),
    ).orderBy("day_id")


EVT_CUMULATIVE_USERS_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) // 86400000000 AS d FROM events
), flagged AS (
  SELECT d, user_id,
         CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY d, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM e
), per_day AS (
  SELECT d AS day_id, CAST(sum(is_first) AS BIGINT) AS new_users,
         count(DISTINCT user_id) AS active_users
  FROM flagged GROUP BY d
)
SELECT day_id, new_users, active_users,
       CAST(sum(new_users) OVER (ORDER BY day_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM per_day ORDER BY day_id
"""


def evt_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier battery per event type: median + MAD (median absolute
    deviation), and the count of events beyond median ± 3·1.4826·MAD — the
    robust z-score rule that survives the heavy tails that break stddev
    fences. Two passes over the fact table (median, then MAD), each an
    exact-percentile aggregate on the type key; the 3-row stats relation
    broadcasts back for the final conditional count."""
    ev = _events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .select("event_type", F.abs(F.col("value") - F.col("med")).alias("ad"))
        .groupBy("event_type")
        .agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    )
    stats = med.join(mad, "event_type")
    fence = F.lit(3.0) * F.lit(1.4826) * F.col("mad")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("med"), 6).alias("median"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > fence).cast("long")
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


EVT_ROBUST_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(value - med), 0.5) AS mad
  FROM events e JOIN med ON e.event_type = med.event_type
  GROUP BY e.event_type
)
SELECT e.event_type, count(*) AS n_events,
       round(min(med), 6) AS median,
       round(min(mad), 6) AS mad,
       CAST(sum(CASE WHEN abs(value - med) > 3.0 * 1.4826 * mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e
JOIN med ON e.event_type = med.event_type
JOIN mad ON e.event_type = mad.event_type
GROUP BY e.event_type ORDER BY e.event_type
"""


def evt_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `groupBy().pivot()` — per user, one column per event type
    (counts). The explicit value list keeps the plan a single pass
    (omitting it adds a distinct-scan job to discover the columns — never
    do that on a 100 TB table)."""
    ev = _events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent combinations; a count should read 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    ).orderBy("user_id")


EVT_TYPE_PIVOT_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


def evt_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window spike detection over the hourly event-rate series:
    per type, each hour's count against the mean/std of the PRECEDING 24
    hourly buckets (ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING — the
    classic trailing-baseline frame), flagged when count > mean + 3σ.
    The window runs over the per-(type, hour) ROLLUP, not raw events, so
    the frame relation is tiny regardless of corpus size. Variance uses
    the explicit E[x²]−E[x]² form with decimal-safe integer sums so both
    engines agree bitwise; hours with fewer than 6 baseline buckets are
    unflagged (cold start)."""
    hour = 3600 * 1_000_000
    per_hour = (
        _events(spark, sf_dir)
        .select("event_type", F.expr(f"ts_us div {hour}").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    base_n = F.count("n").over(w)
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    mean = s1.cast("double") / base_n
    var = s2.cast("double") / base_n - mean * mean
    spike = (
        (base_n >= 6)
        & (F.col("n").cast("double") > mean + F.lit(3.0) * F.sqrt(var))
    )
    return (
        per_hour.select(
            "event_type",
            F.col("h").alias("hour_id"),
            "n",
            F.round(mean, 6).alias("baseline_mean"),
            spike.alias("is_spike"),
        )
        .filter(F.col("baseline_mean").isNotNull())
        .orderBy("event_type", "hour_id")
    )


EVT_RATE_SPIKES_SQL = """
WITH per_hour AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS n
  FROM events GROUP BY 1, 2
), framed AS (
  SELECT event_type, h AS hour_id, n,
         count(n) OVER w AS base_n,
         sum(n) OVER w AS s1,
         sum(n * n) OVER w AS s2
  FROM per_hour
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_id, n,
       round(CAST(s1 AS DOUBLE) / base_n, 6) AS baseline_mean,
       base_n >= 6 AND CAST(n AS DOUBLE) >
         CAST(s1 AS DOUBLE) / base_n
         + 3.0 * sqrt(CAST(s2 AS DOUBLE) / base_n
                      - (CAST(s1 AS DOUBLE) / base_n) * (CAST(s1 AS DOUBLE) / base_n))
         AS is_spike
FROM framed
WHERE base_n > 0
ORDER BY event_type, hour_id
"""


def evt_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height histogram via ntile(10) within each event type: per
    decile — row count, min/max/avg value. One keyed window shuffle (the
    type key), then a rollup on (type, decile) that reuses the window's
    partitioning."""
    ev = _events(spark, sf_dir).select("event_type", "value", "event_id")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 2
            ).cast("double").alias("total"),
        )
        .orderBy("event_type", "decile")
    )


EVT_VALUE_DECILES_SQL = """
SELECT event_type, decile, count(*) AS n,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
FROM (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
  FROM events
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def evt_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey mining: the 20 most common 3-step event-type paths across
    user timelines. Each user's ordered sequence is ONE map-side
    `sort_array(collect_list(struct(ts, id, type)))` per user (bounded by
    per-user event counts), the path trigrams are an in-array transform —
    so the only shuffles are the user rollup and the small path count.
    Ordering ties break on (ts, event_id) so both engines see identical
    sequences."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts_us", "event_id", "event_type"))
        ).alias("_seq")
    )
    types = F.transform("_seq", lambda x: x["event_type"])
    per_user = per_user.select(
        "user_id", types.alias("_t")
    ).filter(F.size("_t") >= 3)
    trigrams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - F.lit(3)),
        lambda i: F.concat_ws(
            ">",
            F.element_at(F.col("_t"), i + 1),
            F.element_at(F.col("_t"), i + 2),
            F.element_at(F.col("_t"), i + 3),
        ),
    )
    return (
        per_user.select(F.explode(trigrams).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


EVT_TOP_PATHS_SQL = """
WITH per_user AS (
  SELECT user_id,
         list(event_type ORDER BY epoch_us(ts), event_id) AS t
  FROM events GROUP BY user_id
), paths AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 2),
                               i -> t[i] || '>' || t[i + 1] || '>' || t[i + 2])) AS path
  FROM per_user WHERE len(t) >= 3
)
SELECT path, count(*) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path ASC
LIMIT 20
"""


def evt_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day. Windows cannot COUNT(DISTINCT) over a
    trailing range, so WAU uses the contribution-explode identity: each
    (user, day) pair contributes to the 7 target days [d, d+6], and a
    plain distinct-count per target day IS the trailing-7-day active
    count. Cost: 7× the (user, day) relation — already deduped, tiny next
    to the fact table — then two map-side-combinable rollups."""
    day = 24 * 3600 * 1_000_000
    ud = (
        _events(spark, sf_dir)
        .select("user_id", F.expr(f"ts_us div {day}").alias("d"))
        .distinct()
    )
    dau = ud.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(6))).alias("td"),
    )
    wau = contrib.groupBy("td").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau["d"] == wau["td"])
        .select(
            F.col("d").alias("day_id"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day_id")
    )


EVT_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
), dau AS (
  SELECT d, count(DISTINCT user_id) AS dau FROM ud GROUP BY d
), contrib AS (
  SELECT user_id, unnest(generate_series(d, d + 6)) AS td FROM ud
), wau AS (
  SELECT td, count(DISTINCT user_id) AS wau FROM contrib GROUP BY td
)
SELECT d AS day_id, dau, wau, round(dau / CAST(wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau ON d = td
ORDER BY day_id
"""


def evt_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005): top-20
    users by sketch-estimated event count, with the exact count alongside —
    the one-pass, fixed-memory, mergeable answer to "who dominates the
    stream" that replaces a full per-key count shuffle at 100 TB. Every
    counter is md5-derived integer arithmetic, so the DuckDB twin replays
    the sketch exactly (hash-gated, not error-band-gated); the CMS
    guarantee (estimate >= exact, bounded overshoot) is pinned in tests."""
    from ..operators.sketches import cms_topk

    ev = _events(spark, sf_dir)
    top = cms_topk(ev, "user_id", k=20)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        top.join(exact, "user_id")
        .select("user_id", "cms_count", "exact_count")
        .orderBy(F.desc("cms_count"), F.asc("user_id"))
    )


def _cms_sql(d: int, w: int, k: int) -> str:
    # Carter-Wegman family from ONE md5 (mirrors operators/sketches.py):
    # h_i = ((a + i*b) mod (2^31-1)) mod w
    return f"""
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
ab AS (
  SELECT user_id, k,
         CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) AS a,
         CAST(('0x' || substr(md5(k), 9, 8)) AS BIGINT) AS b
  FROM ev
),
rb AS (
  SELECT user_id, k, i AS row,
         ((a + i * b) % 2147483647) % {w} AS bucket
  FROM ab, generate_series(0, {d - 1}) AS t(i)
),
sketch AS (
  SELECT row, bucket, count(*) AS cnt FROM rb GROUP BY row, bucket
),
probe_rb AS (
  SELECT DISTINCT user_id, row, bucket FROM rb
),
est AS (
  SELECT p.user_id, min(COALESCE(s.cnt, 0)) AS cms_count
  FROM probe_rb p LEFT JOIN sketch s ON p.row = s.row AND p.bucket = s.bucket
  GROUP BY p.user_id
),
ranked AS (
  SELECT user_id, cms_count,
         row_number() OVER (ORDER BY cms_count DESC, user_id ASC) AS rk
  FROM est
)
SELECT r.user_id, r.cms_count, e.exact_count
FROM ranked r
JOIN (SELECT user_id, count(*) AS exact_count FROM events GROUP BY user_id) e
  ON r.user_id = e.user_id
WHERE r.rk <= {k}
ORDER BY r.cms_count DESC, r.user_id ASC
"""


EVT_CMS_SQL = _cms_sql(4, 512, 20)


def evt_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type (Flajolet et al.
    2007, m=256 registers): one pass, 256 ints of state per group, registers
    merge by max across partitions/days — vs countDistinct's full key
    shuffle. The harmonic sum is carried as an exact integer (Σ2^(25-M[j]))
    so the sketch STATE hash-matches the DuckDB twin; the estimate is one
    double division on top. Exact distincts ride along to show the error."""
    from ..operators.sketches import hll_cardinality

    ev = _events(spark, sf_dir)
    est = hll_cardinality(ev, "user_id", ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "zero_registers",
            "harmonic_sum_scaled",
            "hll_estimate",
            "exact_distinct",
        )
        .orderBy("event_type")
    )


def _hll_sql(b: int) -> str:
    m = 1 << b
    rank_bits = 32 - b
    alpha = 0.7213 / (1 + 1.079 / m)
    # bit_length via exact integer comparisons — mirrors the Spark side
    bit_len = " + ".join(
        f"(CASE WHEN suffix >= {1 << j} THEN 1 ELSE 0 END)"
        for j in range(rank_bits)
    )
    return f"""
WITH ev AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS k FROM events),
h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) AS hv
  FROM ev
),
parts AS (
  SELECT event_type, hv // {1 << rank_bits} AS register,
         hv % {1 << rank_bits} AS suffix
  FROM h
),
ranked AS (
  SELECT event_type, register,
         CASE WHEN suffix = 0 THEN {rank_bits + 1}
              ELSE {rank_bits} - ({bit_len}) + 1 END AS rank
  FROM parts
),
regs AS (
  SELECT event_type, register, max(rank) AS max_rank
  FROM ranked GROUP BY event_type, register
),
agg AS (
  SELECT event_type,
         count(*) AS nonzero,
         sum(CAST(power(2.0, {rank_bits + 1} - max_rank) AS BIGINT)) AS present_sum
  FROM regs GROUP BY event_type
),
scal AS (
  SELECT event_type,
         ({m} - nonzero) AS zero_registers,
         CAST(present_sum + ({m} - nonzero) * CAST({1 << (rank_bits + 1)} AS BIGINT)
              AS BIGINT) AS harmonic_sum_scaled
  FROM agg
),
est AS (
  SELECT event_type, zero_registers, harmonic_sum_scaled,
         CAST({alpha!r} AS DOUBLE) * {m} * {m}
           * CAST({float(1 << (rank_bits + 1))!r} AS DOUBLE)
           / harmonic_sum_scaled AS raw
  FROM scal
)
SELECT e.event_type, e.zero_registers, e.harmonic_sum_scaled,
       round(CASE WHEN raw <= CAST({2.5 * m!r} AS DOUBLE) AND zero_registers > 0
             THEN CAST({float(m)!r} AS DOUBLE)
                  * ln(CAST({m} AS DOUBLE) / zero_registers)
             ELSE raw END, 4) AS hll_estimate,
       x.exact_distinct
FROM est e
JOIN (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type) x
  ON e.event_type = x.event_type
ORDER BY e.event_type
"""


EVT_HLL_SQL = _hll_sql(8)


def evt_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles (mergeable approximate percentiles): per
    event type, deciles 0.1/0.5/0.9 estimated from a 64-bin equi-width
    sketch by in-bin linear interpolation — the fixed-memory alternative to
    a full sort at 100 TB, with error bounded by one bin width. Unlike
    Spark's approx_percentile (engine-private sketch), the bin counts are
    exact integers and the interpolation is a fixed-order double formula,
    so DuckDB replays it bit-for-bit — hash-gated, not error-band-gated."""
    from ..operators.sketches import histogram_quantiles, histogram_sketch

    ev = _events(spark, sf_dir)
    sk = histogram_sketch(ev, "value", ["event_type"])
    return histogram_quantiles(sk, [0.1, 0.5, 0.9], ["event_type"]).select(
        "event_type", "q", "est"
    )


def _quantile_sketch_sql(n_bins: int) -> str:
    return f"""
WITH b AS (
  SELECT event_type, min(CAST(value AS DOUBLE)) AS lo,
         max(CAST(value AS DOUBLE)) AS hi
  FROM events GROUP BY event_type
),
binned AS (
  SELECT e.event_type, bd.lo, bd.hi,
         CASE WHEN bd.hi - bd.lo = 0 THEN 0
              ELSE least({n_bins - 1}, greatest(0,
                CAST(floor((CAST(e.value AS DOUBLE) - bd.lo)
                           / (bd.hi - bd.lo) * {n_bins}) AS INTEGER))) END AS bin
  FROM events e JOIN b bd ON e.event_type = bd.event_type
),
sk AS (
  SELECT event_type, lo, hi, bin, count(*) AS cnt
  FROM binned GROUP BY event_type, lo, hi, bin
),
cum AS (
  SELECT *,
         CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n_total,
         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM sk
),
cur AS (SELECT *, cum - cnt AS cum_before FROM cum),
qs AS (SELECT unnest([0.1, 0.5, 0.9]) AS q)
SELECT event_type, CAST(q AS DOUBLE) AS q,
       round(lo + (hi - lo) / {n_bins}
               * (bin + (CAST(q AS DOUBLE) * n_total - cum_before) / cnt), 6)
         AS est
FROM cur JOIN qs
  ON cum >= CAST(q AS DOUBLE) * n_total
 AND cum_before < CAST(q AS DOUBLE) * n_total
ORDER BY event_type, q
"""


EVT_QUANTILE_SKETCH_SQL = _quantile_sketch_sql(64)


def evt_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch set-intersection cardinality (Bar-Yossef 2002;
    Beyer 2007): estimated number of users shared by every PAIR of event
    types, from k=256 retained hash minima per type — the set-expression
    question HLL cannot answer (HLL unions but never intersects). At
    100 TB: one pass + k longs per group replaces a distinct-users
    self-join across types. The retained set is a pure function of the
    data (k smallest md5 values), so the DuckDB twin replays the sketch
    exactly; the exact overlap rides along to show the error."""
    from ..operators.sketches import KMV_K, kmv_intersection, kmv_sketch

    ev = _events(spark, sf_dir)
    sk = kmv_sketch(ev, "user_id", ["event_type"], k=KMV_K)
    est = kmv_intersection(sk, "event_type", k=KMV_K)
    u = ev.select("event_type", "user_id").distinct()
    exact = (
        u.select(F.col("event_type").alias("g_a"), "user_id")
        .join(u.select(F.col("event_type").alias("g_b"), "user_id"), "user_id")
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("exact_common"))
    )
    return (
        est.join(exact, ["g_a", "g_b"], "left")
        .select(
            "g_a", "g_b", "theta_scaled", "n_common", "est_common",
            # a pair the estimator calls disjoint still gets its row —
            # mirror that completeness for the exact count
            F.coalesce(F.col("exact_common"), F.lit(0)).cast("long").alias(
                "exact_common"
            ),
        )
        .orderBy("g_a", "g_b")
    )


def _kmv_sql(k: int) -> str:
    return f"""
WITH u AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS uk FROM events
), h AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(uk), 1, 8)) AS BIGINT) AS h
  FROM u
), rk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), sk AS (
  SELECT event_type, h FROM rk WHERE rn <= {k}
), per AS (
  SELECT event_type,
         CASE WHEN count(*) < {k} THEN 4294967296 ELSE max(h) END AS theta
  FROM sk GROUP BY event_type
), allpairs AS (
  -- complete pair universe from the per-group theta relation: disjoint
  -- pairs surface as n_common=0 rows instead of vanishing
  SELECT pa.event_type AS g_a, pb.event_type AS g_b,
         least(pa.theta, pb.theta) AS theta
  FROM per pa JOIN per pb ON pa.event_type < pb.event_type
), common AS (
  SELECT a.event_type AS g_a, b.event_type AS g_b, a.h
  FROM sk a JOIN sk b ON a.h = b.h AND a.event_type < b.event_type
), counts AS (
  SELECT g_a, g_b,
         sum(CASE WHEN h < least(pa.theta, pb.theta) THEN 1 ELSE 0 END)
           AS n_common
  FROM common
  JOIN per pa ON pa.event_type = g_a
  JOIN per pb ON pb.event_type = g_b
  GROUP BY g_a, g_b
), agg AS (
  SELECT ap.g_a, ap.g_b, ap.theta, COALESCE(ct.n_common, 0) AS n_common
  FROM allpairs ap LEFT JOIN counts ct USING (g_a, g_b)
), exact AS (
  SELECT ua.event_type AS g_a, ub.event_type AS g_b, count(*) AS exact_common
  FROM u ua JOIN u ub ON ua.uk = ub.uk AND ua.event_type < ub.event_type
  GROUP BY 1, 2
)
SELECT a.g_a, a.g_b,
       CAST(a.theta AS BIGINT) AS theta_scaled,
       CAST(a.n_common AS BIGINT) AS n_common,
       round(a.n_common * 4294967296.0 / a.theta, 4) AS est_common,
       CAST(COALESCE(e.exact_common, 0) AS BIGINT) AS exact_common
FROM agg a LEFT JOIN exact e USING (g_a, g_b)
ORDER BY g_a, g_b
"""


EVT_KMV_OVERLAP_SQL = _kmv_sql(256)


def evt_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis (the decision input for salting / AQE
    tuning): the 10 hottest user keys with row share and cumulative share.
    A key whose share exceeds ~1/shuffle-partitions owns entire tasks —
    the signal to route its aggregations through `salted_agg`."""
    from ..operators.skew import key_skew_stats

    ev = _events(spark, sf_dir)
    return key_skew_stats(ev, ["user_id"], top_n=10)


EVT_KEY_SKEW_SQL = """
WITH per AS (
  SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
),
t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM events),
top AS (
  SELECT user_id, n_rows FROM per ORDER BY n_rows DESC, user_id LIMIT 10
)
SELECT user_id, n_rows,
       round(n_rows / total, 6) AS share,
       round(CAST(sum(n_rows) OVER (ORDER BY n_rows DESC, user_id
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / total, 6) AS cum_share
FROM top, t
"""


QUERIES = {
    "evt_cms_heavy_hitters": evt_cms_heavy_hitters,
    "evt_hll_cardinality": evt_hll_cardinality,
    "evt_quantile_sketch": evt_quantile_sketch,
    "evt_kmv_overlap": evt_kmv_overlap,
    "evt_key_skew": evt_key_skew,
    "evt_stickiness": evt_stickiness,
    "evt_top_paths": evt_top_paths,
    "evt_value_deciles": evt_value_deciles,
    "evt_rate_spikes": evt_rate_spikes,
    "evt_cumulative_users": evt_cumulative_users,
    "evt_robust_outliers": evt_robust_outliers,
    "evt_type_pivot": evt_type_pivot,
    "evt_sliding_counts": evt_sliding_counts,
    "evt_cohort_retention": evt_cohort_retention,
    "evt_funnel": evt_funnel,
    "evt_overlap_join": evt_overlap_join,
    "evt_random_pairs": evt_random_pairs,
    "evt_corr_stats": evt_corr_stats,
    "evt_error_only_users": evt_error_only_users,
    "evt_session_length_stats": evt_session_length_stats,
    "evt_session_window": evt_session_window,
    "evt_type_share": evt_type_share,
    "evt_first_last_actions": evt_first_last_actions,
    "evt_running_total": evt_running_total,
    "evt_asof_last_view": evt_asof_last_view,
    "evt_user_catalog": evt_user_catalog,
    "evt_user_catalog_salted": evt_user_catalog_salted,
    "evt_type_stats": evt_type_stats,
    "evt_sessions": evt_sessions,
    "evt_interval_union": evt_interval_union,
    "evt_gap_stats": evt_gap_stats,
    "evt_max_concurrency": evt_max_concurrency,
    "evt_monotonicity": evt_monotonicity,
    "evt_hourly_rollup": evt_hourly_rollup,
    "evt_rollup_cascade": evt_rollup_cascade,
    "evt_value_histogram": evt_value_histogram,
    "evt_json_props": evt_json_props,
}

ORACLES = {
    "evt_cms_heavy_hitters": EVT_CMS_SQL,
    "evt_hll_cardinality": EVT_HLL_SQL,
    "evt_quantile_sketch": EVT_QUANTILE_SKETCH_SQL,
    "evt_kmv_overlap": EVT_KMV_OVERLAP_SQL,
    "evt_key_skew": EVT_KEY_SKEW_SQL,
    "evt_stickiness": EVT_STICKINESS_SQL,
    "evt_top_paths": EVT_TOP_PATHS_SQL,
    "evt_value_deciles": EVT_VALUE_DECILES_SQL,
    "evt_rate_spikes": EVT_RATE_SPIKES_SQL,
    "evt_cumulative_users": EVT_CUMULATIVE_USERS_SQL,
    "evt_robust_outliers": EVT_ROBUST_OUTLIERS_SQL,
    "evt_type_pivot": EVT_TYPE_PIVOT_SQL,
    "evt_sliding_counts": EVT_SLIDING_SQL,
    "evt_cohort_retention": EVT_COHORT_SQL,
    "evt_funnel": EVT_FUNNEL_SQL,
    "evt_overlap_join": EVT_OVERLAP_JOIN_SQL,
    "evt_random_pairs": EVT_RANDOM_PAIRS_SQL,
    "evt_corr_stats": EVT_CORR_SQL,
    "evt_error_only_users": EVT_ERROR_ONLY_SQL,
    "evt_session_length_stats": EVT_SESSION_LENGTH_SQL,
    "evt_session_window": EVT_SESSION_WINDOW_SQL,
    "evt_type_share": EVT_TYPE_SHARE_SQL,
    "evt_first_last_actions": EVT_FIRST_LAST_SQL,
    "evt_running_total": EVT_RUNNING_TOTAL_SQL,
    "evt_asof_last_view": EVT_ASOF_SQL,
    "evt_user_catalog": EVT_USER_CATALOG_SQL,
    "evt_user_catalog_salted": EVT_USER_CATALOG_SALTED_SQL,
    "evt_type_stats": EVT_TYPE_STATS_SQL,
    "evt_sessions": EVT_SESSIONS_SQL,
    "evt_interval_union": EVT_INTERVAL_UNION_SQL,
    "evt_gap_stats": EVT_GAP_STATS_SQL,
    "evt_max_concurrency": EVT_MAX_CONCURRENCY_SQL,
    "evt_monotonicity": EVT_MONOTONICITY_SQL,
    "evt_hourly_rollup": EVT_HOURLY_SQL,
    "evt_rollup_cascade": EVT_ROLLUP_CASCADE_SQL,
    "evt_value_histogram": EVT_HISTOGRAM_SQL,
    "evt_json_props": EVT_JSON_PROPS_SQL,
}
