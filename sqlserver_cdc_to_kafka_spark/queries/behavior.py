"""Behavioral analytics over the `events` log: ordered conversion funnels
and cohort retention — the two canonical event-sequence aggregations a
product-analytics consumer of the engine's materialized event stream runs.

Neither exists in the reference (it stops at transporting the events); both
are pure DataFrame compositions — sequential funnels as a chain of
SHRINKING min-aggregate joins (each step's input is only the users who
completed the previous step, so the join sides contract monotonically),
cohorts as two hash aggregates.  No windows over unpartitioned frames, no
per-user sorting: at 100 TB each step is one shuffle on user_id and AQE
sizes the contracted joins.

Timezone safety: all bucketing is on epoch-micros integers (UTC), outputs
are epoch numbers — hashes identical under any session timezone."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table

_WEEK_US = 7 * 86_400_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id", "event_type", epoch_micros(ev, "ts").alias("us")
    )


def _events_us_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id", "event_id", "value", epoch_micros(ev, "ts").alias("us")
    )


@query(
    "events_funnel_conversion",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, MIN(us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, MIN(us) AS t2 FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND us >= t1 GROUP BY ev.user_id),
p AS (SELECT ev.user_id, MIN(us) AS t3 FROM ev JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND us >= t2 GROUP BY ev.user_id)
SELECT * FROM (
  SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
  UNION ALL
  SELECT '2_click', COUNT(*) FROM c
  UNION ALL
  SELECT '3_purchase', COUNT(*) FROM p) f
""",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view→click→purchase: a user counts at step
    k only if the step-k event happened AT OR AFTER their earliest step-k-1
    completion (strict event-time ordering, not mere co-occurrence).

    Expressed as a chain of min-aggregate + join stages — the step-k input
    is semi-joined down to step-k-1 completers BEFORE its aggregate, so the
    per-step shuffle shrinks with the funnel.  The alternative (one window
    sort per user over all events) shuffles the full log once per step and
    sorts inside every user partition; this formulation never sorts."""
    ev = _events_us(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )

    def step(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("step"), "n_users"
        )

    return (
        step("1_view", v).unionByName(step("2_click", c)).unionByName(
            step("3_purchase", p)
        )
    )


@query(
    "events_cohort_retention",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
first_seen AS (
  SELECT user_id, (MIN(us) // {_WEEK_US}) AS cohort_week FROM ev
  GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, us // {_WEEK_US} AS week FROM ev)
SELECT f.cohort_week * {_WEEK_US} AS cohort_week_us,
       CAST(a.week - f.cohort_week AS BIGINT) AS week_offset,
       COUNT(*) AS n_users
FROM activity a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-seen week,
    counted in every subsequent week they were active.  Two hash aggregates
    (first-seen per user; distinct user-weeks) and one equi-join on
    user_id — the distinct collapses the event volume to ≤ users×weeks rows
    before the join, so the join input is orders of magnitude below the raw
    log.  COUNT(*) after the join is exact because activity rows are
    already distinct per (user, week)."""
    ev = _events_us(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        (F.min("us") / _WEEK_US).cast("bigint").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", (F.col("us") / _WEEK_US).cast("bigint").alias("week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            (F.col("cohort_week") * _WEEK_US).alias("cohort_week_us"),
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "events_moving_sum",
    oracle="""
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
SELECT user_id, event_id, us,
       CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS sum5_micros,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_in_frame
FROM ev
""",
)
def q_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-event moving sum of `value` per user — the ROWS-frame
    window aggregation (rolling KPIs, anomaly baselines).  Sums run in
    exact integer micro-units: a ROWS frame sum of doubles is association-
    order-dependent and engines disagree (DuckDB's segment-tree windowed
    sum groups differently than Spark's running buffer), so the decimal→
    long scaling isn't style, it's what makes the hash gate pass.  One
    shuffle on user_id; frame evaluation is streaming within each sorted
    partition, and (us, event_id) ordering makes the frame total."""
    from pyspark.sql import Window

    ev = _events_us_full(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    v_micros = (F.col("value").cast("decimal(18,6)") * 1_000_000)
    return ev.select(
        "user_id",
        "event_id",
        "us",
        F.sum(v_micros).over(w).cast("bigint").alias("sum5_micros"),
        F.count("*").over(w).cast("bigint").alias("n_in_frame"),
    )


@query(
    "events_moving_sum_chunked",
    oracle="""
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
SELECT user_id, event_id, us,
       CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000)
              OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS sum5_micros,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_in_frame
FROM ev
""",
)
def q_moving_sum_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_moving_sum through the SKEW REMEDY: the identical trailing
    5-event frame computed by operators/skew.chunked_trailing_agg — the
    hot key is split across daily time buckets, so a user holding 30% of
    all events no longer sorts in ONE task (the r10 skew probe's 5.13x
    straggler; chunked form measured 1.68x AND 20% faster at alpha=1.5).
    Same oracle SQL as events_moving_sum: the driver gate witnesses the
    two plans bit-identical, which is the operator's whole contract.  The
    day bucket is a monotone function of the leading order column (us),
    satisfying the documented chunk_col precondition."""
    from sqlserver_cdc_to_kafka_spark.operators.skew import (
        chunked_trailing_agg,
    )

    ev = _events_us_full(spark, sf_dir).withColumn(
        "v_micros", F.col("value").cast("decimal(18,6)") * 1_000_000
    ).withColumn("__day", F.floor(F.col("us") / 86_400_000_000))
    out = chunked_trailing_agg(
        ev, "user_id", ["us", "event_id"], "v_micros", 4, "__day"
    )
    return out.select(
        "user_id",
        "event_id",
        "us",
        F.col("__sum").cast("bigint").alias("sum5_micros"),
        F.col("__cnt").cast("bigint").alias("n_in_frame"),
    )


@query(
    "join_salted_user_weight",
    oracle="""
WITH ev AS (SELECT user_id, event_type FROM events),
dim AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM ev GROUP BY user_id)
SELECT e.event_type,
       CAST(SUM(d.n_total) AS BIGINT) AS weight,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ev e JOIN dim d USING (user_id)
GROUP BY e.event_type
""",
)
def q_salted_user_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SALTED JOIN as an oracle-gated witness: events (big, Zipf-prone
    user_id) x per-user activity dim (small), joined through
    operators/skew.salted_join — the big side sprays its hot keys over 8
    salt sub-partitions, the dim replicates once per salt value, and the
    result set is EXACTLY the plain join's (the oracle runs the plain
    SQL).  Salting's measured crossover is ~30% hot-key share
    (BENCH_r10_salted.json: +44% cost at 9.6%, fastest and most balanced
    at 29.4%) — this entry pins correctness so the remedy can be applied
    at that crossover without a parity question."""
    from sqlserver_cdc_to_kafka_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    dim = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_total")
    )
    joined = salted_join(ev, dim, ["user_id"], salt_factor=8)
    return joined.groupBy("event_type").agg(
        F.sum("n_total").cast("bigint").alias("weight"),
        F.count("*").cast("bigint").alias("n_events"),
    )


_DEBOUNCE_US = 43_200_000_000  # suppress same-kind events within 12 h
# (12 h, not a UI-scale 5 s: the synthetic log averages ~2-day gaps per
# (user, type) key, and a threshold that drops nothing witnesses nothing)


@query(
    "events_debounce",
    oracle=f"""
WITH ev AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
            FROM events),
marked AS (
  SELECT user_id, event_type, event_id, us,
         lag(us) OVER (PARTITION BY user_id, event_type
                       ORDER BY us, event_id) AS prev_us
  FROM ev)
SELECT user_id, event_type, event_id, us
FROM marked
WHERE prev_us IS NULL OR us - prev_us >= {_DEBOUNCE_US}
""",
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: drop events of the same (user, type) arriving within 5 s
    of the PREVIOUS KEPT-OR-DROPPED event — the duplicate/retry
    suppressor (at log density, a digest throttle).  Deliberately lag-based (each event compares to its
    immediate predecessor), which is one window pass; the stricter
    'compare to last KEPT event' semantics is inherently sequential and
    lives in the stateful sessionizer (streaming/stateful.py) instead.
    One shuffle on (user_id, event_type); (us, event_id) makes the order
    total so ties can't flake the gate."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    return (
        ev.select("user_id", "event_type", "event_id", us.alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") >= _DEBOUNCE_US)
        )
        .drop("prev_us")
    )


@query(
    "events_anomaly_zscore",
    oracle="""
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                   CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v
            FROM events),
st AS (
  SELECT user_id, event_id, us, v,
         COUNT(*) OVER w AS n_prior,
         SUM(v) OVER w AS s,
         SUM(v * v) OVER w AS q
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 9 PRECEDING AND 1 PRECEDING))
SELECT user_id, event_id, us, v AS v_millis,
       CAST(n_prior AS BIGINT) AS n_prior,
       CASE WHEN n_prior < 4 THEN 'insufficient'
            WHEN (n_prior * v - s) * (n_prior * v - s)
                 > 9 * (n_prior * q - s * s) THEN 'anomaly'
            ELSE 'normal' END AS verdict
FROM st
""",
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly flag: an event is anomalous when its value
    sits more than 3 sigma from the mean of the user's previous ≤9 events.

    The 3-sigma test runs ENTIRELY in integers: with n,s,q the count, sum
    and sum-of-squares of the milli-scaled window, (n·x−s)² > 9(n·q−s²) is
    (x−mean)² > (3σ)² multiplied through by n² — no float mean, no float
    variance (both are summation-order-dependent cross-engine; the
    rearrangement is what makes an approximate-sounding statistic
    hash-exact).  Milli not micro scaling keeps v² sums inside int64
    (µ-scaled squares would overflow at ~9 window values).  One shuffle on
    user_id, streaming frame evaluation, 'insufficient' below 4 priors."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    base = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        (F.col("value").cast("decimal(18,3)") * 1000).cast("bigint").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-9, -1)
    )
    st = base.select(
        "user_id",
        "event_id",
        "us",
        "v",
        F.count("*").over(w).alias("n_prior"),
        F.sum("v").over(w).alias("s"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("q"),
    )
    dev = F.col("n_prior") * F.col("v") - F.col("s")
    var_n2 = F.col("n_prior") * F.col("q") - F.col("s") * F.col("s")
    return st.select(
        "user_id",
        "event_id",
        "us",
        F.col("v").alias("v_millis"),
        F.col("n_prior").cast("bigint").alias("n_prior"),
        # three-valued STRING verdict, not a nullable boolean: pandas
        # represents engine nullable-bools with different dtypes and the
        # gate's dtype-strict compare would flake on identical values
        F.when(F.col("n_prior") < 4, F.lit("insufficient"))
        .when(dev * dev > 9 * var_n2, F.lit("anomaly"))
        .otherwise(F.lit("normal"))
        .alias("verdict"),
    )


_SESS_GAP_US = 600_000_000  # 10 min view-session gap
_BURST_GAP_US = 300_000_000  # 5 min error-burst gap


@query(
    "join_interval_overlap_incidents",
    oracle=f"""
WITH v AS (SELECT user_id, epoch_us(ts) AS us FROM events
           WHERE event_type = 'view'),
vm AS (SELECT user_id, us,
              CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                        >= {_SESS_GAP_US}
                   OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                   THEN 1 ELSE 0 END AS brk
       FROM v),
vs AS (SELECT user_id, us,
              SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS sess
       FROM vm),
sessions AS (SELECT user_id, MIN(us) AS s_lo,
                    MAX(us) + {_SESS_GAP_US} AS s_hi
             FROM vs GROUP BY user_id, sess),
e AS (SELECT epoch_us(ts) AS us FROM events WHERE event_type = 'error'),
em AS (SELECT us, CASE WHEN us - lag(us) OVER (ORDER BY us)
                            >= {_BURST_GAP_US}
                       OR lag(us) OVER (ORDER BY us) IS NULL
                       THEN 1 ELSE 0 END AS brk
       FROM e),
eb AS (SELECT us, SUM(brk) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING)
                    AS burst
       FROM em),
bursts AS (SELECT MIN(us) AS b_lo, MAX(us) + {_BURST_GAP_US} AS b_hi,
                  COUNT(*) AS n_errors
           FROM eb GROUP BY burst)
SELECT user_id, s_lo AS session_start_us, b_lo AS burst_start_us, n_errors,
       LEAST(s_hi, b_hi) - GREATEST(s_lo, b_lo) AS overlap_us
FROM sessions JOIN bursts ON s_lo < b_hi AND b_lo < s_hi
""",
)
def q_interval_overlap_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: which user view-sessions overlapped
    a global error burst (the incident-impact question).  Both interval
    sets derive from the same log (gaps-and-islands sessionization at two
    granularities); the overlap join is the BANDED form
    (operators/rangejoin.interval_overlap_join): both sides explode into
    1-hour time bands, equi-join on band, and each pair matches exactly
    once at its first shared band — a hash join at any scale, where the
    naive ``s_lo < b_hi AND b_lo < s_hi`` theta join is a nested loop.
    The oracle runs the naive form (exact at sf scale); results must
    agree, proving the banding loses and duplicates nothing."""
    from pyspark.sql import Window

    from sqlserver_cdc_to_kafka_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = _events_us(spark, sf_dir)
    wv = Window.partitionBy("user_id").orderBy("us")
    views = ev.filter(F.col("event_type") == "view")
    sessions = (
        views.withColumn(
            "brk",
            (
                (F.col("us") - F.lag("us").over(wv) >= _SESS_GAP_US)
                | F.lag("us").over(wv).isNull()
            ).cast("int"),
        )
        .withColumn(
            "sess",
            F.sum("brk").over(wv.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sess")
        .agg(
            F.min("us").alias("s_lo"),
            (F.max("us") + _SESS_GAP_US).alias("s_hi"),
        )
        .drop("sess")
    )
    # the error stream has NO partition key — the plain lag/prefix-sum
    # sessionize is a one-task total order over every error at 100 TB;
    # global_gap_islands is the range-bucketed exact equivalent
    # (equality-pinned in tests/test_global_order_ops.py)
    from sqlserver_cdc_to_kafka_spark.operators.merge import (
        global_gap_islands,
    )

    bursts = (
        global_gap_islands(
            ev.filter(F.col("event_type") == "error").select("us"),
            "us",
            _BURST_GAP_US,
            "burst",
        )
        .groupBy("burst")
        .agg(
            F.min("us").alias("b_lo"),
            (F.max("us") + _BURST_GAP_US).alias("b_hi"),
            F.count("*").alias("n_errors"),
        )
        .drop("burst")
    )
    out = interval_overlap_join(
        sessions,
        bursts,
        l_lo="s_lo",
        l_hi="s_hi",
        r_lo="b_lo",
        r_hi="b_hi",
        band_width=3_600_000_000,
    )
    return out.select(
        "user_id",
        F.col("s_lo").alias("session_start_us"),
        F.col("b_lo").alias("burst_start_us"),
        "n_errors",
        (F.least("s_hi", "b_hi") - F.greatest("s_lo", "b_lo")).alias("overlap_us"),
    )


_HOUR_US_GF = 3_600_000_000


@query(
    "events_gapfill_hourly",
    bench=True,
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
spans AS (SELECT user_id,
                 MIN(us) // {_HOUR_US_GF} AS h_lo,
                 MAX(us) // {_HOUR_US_GF} AS h_hi
          FROM ev GROUP BY user_id),
grid AS (SELECT user_id, unnest(range(h_lo, h_hi + 1)) AS hour
         FROM spans),
actual AS (SELECT user_id, us // {_HOUR_US_GF} AS hour,
                  COUNT(*) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT)
                    AS value_micros
           FROM ev GROUP BY 1, 2)
SELECT g.user_id, CAST(g.hour * {_HOUR_US_GF} AS BIGINT) AS hour_us,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
       CAST(COALESCE(a.value_micros, 0) AS BIGINT) AS value_micros,
       a.n IS NULL AS is_gap
FROM grid g LEFT JOIN actual a
  ON g.user_id = a.user_id AND g.hour = a.hour
""",
)
def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: each user's hourly series densified over
    their [first, last] activity span — absent hours emitted as explicit
    zero rows flagged is_gap (the densification every downstream
    window/forecast op assumes; a timeseries DB's time_bucket_gapfill).
    The grid generates from a per-user sequence+explode (rows ∝ span
    hours, no cross join against a global calendar — a user active one
    day never expands to the corpus's full history), then one
    co-partitioned left join against the actual hourly aggregate."""
    # r15 wave 3 (guide §2.4 — remove the join outright): every hour in a
    # user's [min, max] span either HAS an actual row or lies strictly
    # between two consecutive actual hours of that user.  So instead of a
    # spans aggregate (a second full scan of events) + sequence-exploded
    # grid + grid⋈actual left join, each hourly-aggregate row emits ITSELF
    # plus its trailing gap hours: explode
    # sequence(hour, coalesce(next_hour − 1, hour)) over a lead() window —
    # adjacent hours add nothing, the span's last hour has no successor so
    # no gaps trail it (exactly the old [min, max] grid semantics).  ONE
    # subtree: one events scan (was 2), two exchanges (the hourly
    # aggregate + the user window over hour-level rows), zero joins (was
    # 3 exchanges + join; a present/gaps union form was tried first but
    # column pruning specialised the two branches' aggregates and broke
    # AQE stage reuse — this single-Generate form shares everything by
    # construction).
    ev = _events_us_full(spark, sf_dir)
    hours = ev.select(
        "user_id", (F.col("us") / _HOUR_US_GF).cast("bigint").alias("hour"), "value"
    )
    actual = hours.groupBy("user_id", "hour").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value").cast("decimal(18,6)") * 1_000_000))
        .cast("bigint")
        .alias("value_micros"),
    )
    w_next = Window.partitionBy("user_id").orderBy("hour")
    with_next = actual.withColumn("next_hour", F.lead("hour").over(w_next))
    filled = with_next.select(
        "user_id",
        F.col("hour").alias("actual_hour"),
        "n",
        "value_micros",
        F.explode(
            F.sequence(
                F.col("hour"),
                F.coalesce(F.col("next_hour") - 1, F.col("hour")),
            )
        ).alias("hour"),
    )
    is_gap = F.col("hour") != F.col("actual_hour")
    return filled.select(
        "user_id",
        (F.col("hour") * _HOUR_US_GF).alias("hour_us"),
        F.when(is_gap, F.lit(0)).otherwise(F.col("n")).cast("bigint").alias("n"),
        F.when(is_gap, F.lit(0))
        .otherwise(F.coalesce("value_micros", F.lit(0)))
        .cast("bigint")
        .alias("value_micros"),
        is_gap.alias("is_gap"),
    )


@query(
    "events_gapfill_locf",
    oracle=f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
spans AS (SELECT user_id,
                 MIN(us) // {_HOUR_US_GF} AS h_lo,
                 MAX(us) // {_HOUR_US_GF} AS h_hi
          FROM ev GROUP BY user_id),
grid AS (SELECT user_id, unnest(range(h_lo, h_hi + 1)) AS hour FROM spans),
actual AS (SELECT user_id, us // {_HOUR_US_GF} AS hour,
                  CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000) AS BIGINT)
                    AS observed_micros
           FROM ev GROUP BY 1, 2),
joined AS (
  SELECT g.user_id, g.hour, a.observed_micros
  FROM grid g LEFT JOIN actual a
    ON g.user_id = a.user_id AND g.hour = a.hour)
SELECT user_id, CAST(hour * {_HOUR_US_GF} AS BIGINT) AS hour_us,
       observed_micros,
       last_value(observed_micros IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY hour
               ROWS UNBOUNDED PRECEDING) AS carried_micros
FROM joined
""",
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over the gap-filled grid: absent
    hours inherit the most recent observed hourly total (the imputation
    behind downsampling/feature windows; a timeseries DB's locf()).  Gap
    hours stay NULL in observed_micros (distinguishable from a real zero)
    and the carry is one ignore-nulls last_value window — streaming
    evaluation within each user partition, no per-gap join."""
    from pyspark.sql import Window

    ev = _events_us_full(spark, sf_dir)
    hours = ev.select(
        "user_id", (F.col("us") / _HOUR_US_GF).cast("bigint").alias("hour"), "value"
    )
    spans = hours.groupBy("user_id").agg(
        F.min("hour").alias("h_lo"), F.max("hour").alias("h_hi")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence(F.col("h_lo"), F.col("h_hi"))).alias("hour"),
    )
    actual = hours.groupBy("user_id", "hour").agg(
        F.sum((F.col("value").cast("decimal(18,6)") * 1_000_000))
        .cast("bigint")
        .alias("observed_micros")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(actual, ["user_id", "hour"], "left")
        .select(
            "user_id",
            (F.col("hour") * _HOUR_US_GF).alias("hour_us"),
            "observed_micros",
            F.last("observed_micros", ignorenulls=True)
            .over(w)
            .alias("carried_micros"),
        )
    )


_RANGE_US = 3_600_000_000  # trailing 1 h by event-time VALUE


@query(
    "events_range_frame_sum",
    oracle=f"""
WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
                   CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
            FROM events)
SELECT user_id, event_id, us,
       CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN {_RANGE_US} PRECEDING
                                   AND CURRENT ROW) AS BIGINT)
         AS trailing_hour_micros,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                           RANGE BETWEEN {_RANGE_US} PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
         AS n_in_hour
FROM ev
""",
)
def q_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per event, the user's value total over the
    trailing HOUR BY EVENT-TIME VALUE — the frame type ROWS can't express
    (a quiet hour contributes nothing regardless of how many rows back it
    is; same-timestamp peers are IN the frame even 'after' the current
    row, which is what distinguishes RANGE semantics and what the oracle
    pins).  Integer micro sums keep it engine-exact; one shuffle on
    user_id with streaming frame evaluation over the sorted partition."""
    from pyspark.sql import Window

    ev = _events_us_full(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_id",
        "us",
        (F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("bigint")
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_RANGE_US, Window.currentRow)
    )
    return base.select(
        "user_id",
        "event_id",
        "us",
        F.sum("v").over(w).cast("bigint").alias("trailing_hour_micros"),
        F.count("*").over(w).cast("bigint").alias("n_in_hour"),
    )


_ATTR_WINDOW_US = 3_600_000_000  # credit clicks within 1 h before purchase


@query(
    "events_attribution_linear",
    oracle=f"""
WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
           FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'),
touches AS (
  SELECT p.user_id, purchase_id, click_id, c_us, p_us,
         COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY c_us DESC, click_id DESC) AS recency
  FROM p JOIN c ON p.user_id = c.user_id
                AND c_us <= p_us AND c_us > p_us - {_ATTR_WINDOW_US})
SELECT user_id, purchase_id, click_id,
       CAST(n_touches AS BIGINT) AS n_touches,
       CAST(1000000 // n_touches
            + CASE WHEN recency = 1 THEN 1000000 % n_touches ELSE 0 END
            AS BIGINT) AS credit_ppm
FROM touches
""",
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution: every purchase's credit split
    evenly across the user's clicks in the preceding hour, in integer ppm
    — floor share to every touch, remainder to the MOST RECENT (so each
    purchase's credits sum to exactly 1,000,000; float shares would leak
    ppm off the total and order-depend).  The touch join is the
    stream-stream attribution shape (equi-key + time band); the per-
    purchase window runs over touch groups bounded by the time window,
    not the log."""
    from pyspark.sql import Window

    ev = _events_us(spark, sf_dir)
    ev_id = load_table(spark, sf_dir, "events")
    base = ev_id.select(
        "user_id", "event_id", "event_type", epoch_micros(ev_id, "ts").alias("us")
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("us").alias("c_us"),
    )
    purchases = base.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("us").alias("p_us")
    )
    touches = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_us <= purchases.p_us)
        & (clicks.c_us > purchases.p_us - _ATTR_WINDOW_US),
    )
    wn = Window.partitionBy("purchase_id")
    wr = Window.partitionBy("purchase_id").orderBy(
        F.col("c_us").desc(), F.col("click_id").desc()
    )
    return touches.select(
        "user_id",
        "purchase_id",
        "click_id",
        F.count("*").over(wn).cast("bigint").alias("n_touches"),
        F.row_number().over(wr).alias("recency"),
    ).select(
        "user_id",
        "purchase_id",
        "click_id",
        "n_touches",
        (
            F.expr("1000000 div n_touches")
            + F.when(F.col("recency") == 1, F.expr("1000000 % n_touches")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("credit_ppm"),
    )


@query(
    "events_trend_regression",
    oracle="""
WITH t0 AS (SELECT MIN(epoch_us(ts)) AS base_us FROM events),
ev AS (SELECT event_type,
              (epoch_us(ts) - base_us) // 3600000000 AS x,
              CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS y
       FROM events, t0)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS slope_num,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS slope_den,
       CAST((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) * 1000
            // (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS BIGINT)
         AS slope_milli_per_hour
FROM ev GROUP BY event_type
""",
)
def q_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise least-squares TREND: per event type, the OLS slope of
    value against time, computed entirely from exact integer moment sums —
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) emitted as an integer
    rational (numerator/denominator) plus its milli-units/hour integer
    quotient.  Float OLS is summation-order-dependent; the moment-sum
    form is one hash aggregate (each moment a map-side partial) and the
    division happens once per GROUP, after aggregation.  x rescales to
    hours-since-corpus-start so x² sums stay far inside int64 (raw
    epoch-micros squares overflow at one row)."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    base = ev.agg(F.min(us).alias("base_us"))
    evn = (
        ev.select(
            "event_type",
            us.alias("us"),
            (F.col("value").cast("decimal(18,3)") * 1000)
            .cast("bigint")
            .alias("y"),
        )
        .crossJoin(F.broadcast(base))
        .withColumn("x", F.expr("(us - base_us) div 3600000000"))
    )
    agg = evn.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
    )
    num = F.col("n") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y")
    den = F.col("n") * F.col("sum_xx") - F.col("sum_x") * F.col("sum_x")
    return agg.select(
        "event_type",
        "n",
        F.col("sum_x").cast("bigint").alias("sum_x"),
        F.col("sum_y").cast("bigint").alias("sum_y"),
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.expr(
            "cast((n * sum_xy - sum_x * sum_y) * 1000 div "
            "(n * sum_xx - sum_x * sum_x) as bigint)"
        ).alias("slope_milli_per_hour"),
    )


@query(
    "events_correlation",
    oracle="""
WITH t0 AS (SELECT MIN(epoch_us(ts)) AS base_us FROM events),
ev AS (SELECT event_type,
              (epoch_us(ts) - base_us) // 3600000000 AS x,
              CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS y
       FROM events, t0),
mo AS (SELECT event_type, COUNT(*) AS n,
              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * y) AS BIGINT) AS sxy,
              CAST(SUM(x * x) AS BIGINT) AS sxx,
              CAST(SUM(y * y) AS BIGINT) AS syy
       FROM ev GROUP BY event_type)
SELECT event_type, n,
       ROUND((n * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS pearson_r
FROM mo
""",
)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of value against time per event type — from the
    SAME exact integer moment sums as the trend regression, so the only
    float ops are the final per-group expression (int→double conversion,
    two multiplies, sqrt, divide — every one IEEE-correctly-rounded, so
    both engines produce the identical double, unlike corr()'s streaming
    float accumulation which is order-dependent and engine-specific).
    One hash aggregate; the statistic is assembled after it."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    us = epoch_micros(ev, "ts")
    base = ev.agg(F.min(us).alias("base_us"))
    evn = (
        ev.select(
            "event_type",
            us.alias("us"),
            (F.col("value").cast("decimal(18,3)") * 1000)
            .cast("bigint")
            .alias("y"),
        )
        .crossJoin(F.broadcast(base))
        .withColumn("x", F.expr("(us - base_us) div 3600000000"))
    )
    mo = evn.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (F.col("n").cast("double") * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return mo.select("event_type", "n", F.round(r, 6).alias("pearson_r"))


@query(
    "events_winsorized_stats",
    oracle="""
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type)
SELECT e.event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_low,
       CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_high,
       CAST(SUM(CAST(CAST(
              CASE WHEN value < lo THEN lo
                   WHEN value > hi THEN hi
                   ELSE value END AS DECIMAL(18,6)) * 1000000 AS BIGINT))
            AS BIGINT) AS winsorized_sum_micros
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type
""",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%/95%-clipped) robust statistics per event type — the
    outlier-hardened aggregate behind robust feature scaling and SLA
    reporting.  Thresholds come from the exact interpolated percentile
    (deterministic-double precedent pinned by olap_value_percentiles),
    broadcast back as a per-group bound table; each value clips and the
    clipped sum rides in exact integer micros.  Two passes by necessity
    (quantiles before clipping); the bound table is |groups| rows, so the
    join is broadcast-scale."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy(F.col("event_type").alias("b_type")).agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = (
        ev.join(bounds, ev.event_type == bounds.b_type)
        .withColumn(
            "w",
            F.when(F.col("value") < F.col("lo"), F.col("lo"))
            .when(F.col("value") > F.col("hi"), F.col("hi"))
            .otherwise(F.col("value")),
        )
    )
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.sum((F.col("w").cast("decimal(18,6)") * 1_000_000).cast("bigint"))
        .cast("bigint")
        .alias("winsorized_sum_micros"),
    )


@query(
    "events_json_props_rollup",
    oracle="""
WITH ex AS (
  SELECT event_type,
         CAST(props->>'$.k' AS BIGINT) AS k
  FROM events WHERE props IS NOT NULL)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM ex GROUP BY event_type
""",
)
def q_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction + rollup: the events
    feed carries a free-form ``props`` JSON payload (the reference
    transports it opaquely; an analytics engine must open it).  Parsed
    with an EXPLICIT schema via from_json — never schema inference, which
    at 100 TB means a second full scan and nondeterministic drift as new
    keys appear; unknown keys are simply not projected, malformed JSON
    degrades to NULL (PERMISSIVE) and drops out via the filter.  The
    extraction is a JVM-side expression (JsonToStructs) inside
    whole-stage codegen — no Python, one map-side-combined shuffle."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k bigint")["k"]
    ex = ev.filter(F.col("props").isNotNull()).select(
        "event_type", k.alias("k")
    )
    return ex.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


@query(
    "events_markov_transitions",
    oracle="""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
            FROM events),
seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS prev_type
  FROM ev),
t AS (SELECT prev_type, event_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, event_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         AS prob_ppm
FROM t
""",
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MARKOV transition matrix over per-user event sequences:
    lag(event_type) within each user's (ts, event_id)-ordered stream, then
    a (prev, curr) count with row-normalized probabilities in integer ppm.
    The per-user window partitions on user_id (no global sort); the
    transition matrix is |types|² rows, so the normalizing window is
    negligible.  This is the sequence-model feature extraction (next-event
    prediction priors, anomalous-transition detection) run downstream of
    the CDC event feed."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        epoch_micros(ev, "ts").alias("us"),
        "event_id",
    ).withColumn(
        "prev_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("us", "event_id")
        ),
    )
    t = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )
    return t.select(
        "prev_type",
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "cast(n * 1000000 div sum(n) over (partition by prev_type)"
            " as bigint)"
        ).alias("prob_ppm"),
    )


_CAP_N = 10


@query(
    "events_contribution_cap",
    oracle=f"""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS rn
  FROM ev)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS raw_events,
       CAST(COUNT(*) FILTER (WHERE rn <= {_CAP_N}) AS BIGINT)
         AS capped_events,
       CAST(SUM(cents) AS BIGINT) AS raw_value_cents,
       CAST(COALESCE(SUM(cents) FILTER (WHERE rn <= {_CAP_N}), 0) AS BIGINT)
         AS capped_value_cents
FROM ranked GROUP BY event_type
""",
)
def q_contribution_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CONTRIBUTION CAPPING (the differential-privacy /
    robust-aggregation prep step): keep each user's earliest {_CAP_N}
    events — rank by (ts, event_id) within user, deterministic — and
    report raw-vs-capped counts and value sums per event type, so the
    sensitivity of every downstream aggregate is bounded by the cap.
    Value rides as integer cents (round(value*100) — two-decimal fixture
    currency, identical IEEE arithmetic in both engines).  One per-user
    window (partitioned, no global sort) + one hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    ranked = ev.select(
        "user_id",
        "event_type",
        epoch_micros(ev, "ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("us", "event_id")
        ),
    )
    capped = F.col("rn") <= _CAP_N
    return ranked.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("raw_events"),
        F.sum(F.when(capped, 1).otherwise(0)).cast("bigint").alias(
            "capped_events"
        ),
        F.sum("cents").cast("bigint").alias("raw_value_cents"),
        F.coalesce(F.sum(F.when(capped, F.col("cents"))), F.lit(0))
        .cast("bigint")
        .alias("capped_value_cents"),
    )
