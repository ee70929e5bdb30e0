"""Validation-analytics queries — the reference's `--run-validations` audit
workload (SURVEY §2.4 A2/A4/A5/A7/A8, §2.5 O5, §2.2 P8, §2.7 W1/W3/W6)
declared over the driver's test tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import (
    CDC_EVENTS_SQL,
    CDC_LINEITEM_SQL,
    cdc_events,
    cdc_lineitem_events,
)
from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_seconds
from sqlserver_cdc_to_kafka_spark.model.envelope import OP_DELETE, OP_INSERT
from sqlserver_cdc_to_kafka_spark.operators.compaction import last_value_per_key
from sqlserver_cdc_to_kafka_spark.operators.counts import key_range_count, max_key
from sqlserver_cdc_to_kafka_spark.operators.replay import set_reconciliation
from sqlserver_cdc_to_kafka_spark.operators.validation import (
    duplicate_index_check,
    lag_regressions,
    missing_offsets,
    topic_summary,
)
from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table


@query(
    "val_topic_summary",
    oracle=f"""
WITH {CDC_EVENTS_SQL}
SELECT o_orderkey % 4 AS bucket,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE __operation = 0) AS n_snapshots,
       COUNT(*) FILTER (WHERE __operation = 2) AS n_inserts,
       COUNT(*) FILTER (WHERE __operation = 4) AS n_updates,
       COUNT(*) FILTER (WHERE __operation = 1) AS n_deletes,
       COUNT(DISTINCT o_orderkey) AS n_distinct_keys,
       MIN(change_seq) AS min_idx,
       MAX(change_seq) AS max_idx,
       MAX(epoch_us(__event_time)) AS max_event_time_us
FROM cdc_events GROUP BY 1
""",
    bench=True,
)
def q_topic_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (validation.py:109-197): the one-pass per-topic summary — counts by
    operation, exact distinct keys, index extrema, latest event time. The
    reference streams rows through Python sets; here it is a single
    distributed aggregation with map-side combine."""
    feed = cdc_events(spark, sf_dir).withColumn("bucket", F.col("o_orderkey") % 4)
    return topic_summary(feed, ["bucket"], ["o_orderkey"])


@query(
    "val_lag_regressions",
    oracle="""
SELECT bucket,
       COUNT(*) FILTER (WHERE prev > ts) AS regressions,
       COUNT(*) AS n_rows
FROM (SELECT user_id % 8 AS bucket, ts,
             lag(ts) OVER (PARTITION BY user_id % 8 ORDER BY event_id) AS prev
      FROM events)
GROUP BY bucket
""",
)
def q_lag_regressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (validation.py:184-193): per-partition change-index regression
    detector, here over the events log keyed by (partition=user_id%8,
    offset=event_id)."""
    ev = load_table(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 8)
    return lag_regressions(ev, "bucket", "event_id", "ts")


@query(
    "val_missing_offsets",
    oracle="""
SELECT bucket,
       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS missing,
       COUNT(*) AS n_rows
FROM (SELECT user_id % 8 AS bucket,
             event_id - lag(event_id) OVER (PARTITION BY user_id % 8
                                            ORDER BY event_id) - 1 AS gap
      FROM events)
GROUP BY bucket
""",
)
def q_missing_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 (validation.py:123-127): summed offset gaps per partition."""
    ev = load_table(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 8)
    return missing_offsets(ev, "bucket", "event_id")


@query(
    "val_duplicate_entries",
    oracle="""
SELECT bucket,
       COUNT(*) FILTER (WHERE prev = event_type) AS duplicates,
       COUNT(*) AS n_rows
FROM (SELECT user_id % 8 AS bucket, event_type,
             lag(event_type) OVER (PARTITION BY user_id % 8
                                   ORDER BY event_id) AS prev
      FROM events)
GROUP BY bucket
""",
)
def q_duplicate_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 (progress_topic_validator.py:106-111): consecutive-duplicate
    detector per partition."""
    ev = load_table(spark, sf_dir, "events").withColumn("bucket", F.col("user_id") % 8)
    return duplicate_index_check(ev, "bucket", "event_id", "event_type")


@query(
    "val_set_reconciliation",
    oracle=f"""
WITH {CDC_EVENTS_SQL},
exp AS (
  SELECT COUNT(*) AS expected_count FROM (
    SELECT o_orderkey FROM (
      SELECT o_orderkey FROM orders
      UNION
      SELECT o_orderkey FROM cdc_events WHERE __operation = 2)
    EXCEPT
    SELECT o_orderkey FROM cdc_events WHERE __operation = 1)),
act AS (
  SELECT COUNT(*) AS actual_count FROM (
    SELECT o_orderkey FROM (
      SELECT o_orderkey, __operation,
             row_number() OVER (PARTITION BY o_orderkey
                                ORDER BY change_seq DESC) AS rn
      FROM cdc_events) WHERE rn = 1 AND __operation <> 1))
SELECT expected_count, actual_count,
       expected_count = actual_count AS is_match
FROM exp, act
""",
)
def q_set_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (validation.py:258-285): |snapshot ∪ inserted − deleted| vs the
    actual live-row count after compaction — pure distributed set algebra."""
    feed = cdc_events(spark, sf_dir)
    key = ["o_orderkey"]
    snapshot = load_table(spark, sf_dir, "orders").select(*key)
    inserted = feed.filter(F.col("__operation") == OP_INSERT).select(*key)
    deleted = feed.filter(F.col("__operation") == OP_DELETE).select(*key)
    actual = last_value_per_key(feed, key, "change_seq").select(*key)
    return set_reconciliation(snapshot, inserted, deleted, actual)


@query(
    "val_schema_checksum",
    oracle="""
SELECT source,
       md5(string_agg(md5(text), '' ORDER BY md5(text))) AS checksum,
       COUNT(*) AS n_docs
FROM documents GROUP BY source
""",
)
def q_schema_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (sql_queries.py:14-26): grouped order-insensitive fingerprint —
    the capture-instance metadata checksum pattern, over document groups.
    Order-insensitivity comes from sorting the per-row hashes before the
    rollup hash. At 100 TB swap collect_list for a commutative reduce
    (sum of per-row hash) — kept exact here to mirror CHECKSUM_AGG."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.md5(F.concat_ws("", F.sort_array(F.collect_list(F.md5("text"))))).alias(
            "checksum"
        ),
        F.count("*").alias("n_docs"),
    )


@query(
    "val_max_key_sentinel",
    oracle=f"""
WITH {CDC_LINEITEM_SQL},
u AS (SELECT l_orderkey, l_linenumber FROM cdc_lineitem
      UNION ALL SELECT CAST(-1 AS BIGINT), -1)
SELECT l_orderkey AS max_l_orderkey, l_linenumber AS max_l_linenumber
FROM u ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 1
""",
)
def q_max_key_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/U2/A6 (sql_queries.py:199-215): max change key over the union of
    the feed and a synthetic minimum sentinel row — ``max(struct(...))``,
    no sort."""
    feed = cdc_lineitem_events(spark, sf_dir).select("l_orderkey", "l_linenumber")
    sentinel = spark.range(1).select(
        F.lit(-1).cast("bigint").alias("l_orderkey"),
        F.lit(-1).cast("int").alias("l_linenumber"),
    )
    m = max_key(feed.unionByName(sentinel), ["l_orderkey", "l_linenumber"])
    return m.select(
        F.col("l_orderkey").alias("max_l_orderkey"),
        F.col("l_linenumber").alias("max_l_linenumber"),
    )


@query(
    "val_key_range_count",
    oracle="""
SELECT COUNT(*) AS n FROM lineitem
WHERE (l_orderkey > 1000 OR (l_orderkey = 1000 AND l_linenumber >= 1))
  AND (l_orderkey < 2000 OR (l_orderkey = 2000 AND l_linenumber <= 4))
""",
)
def q_key_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/P6 (sql_queries.py:120-133): COUNT(*) within a composite-PK tuple
    range — native struct comparison vs the oracle's hand-expanded
    OR-of-ANDs (P4 equivalence proof)."""
    li = load_table(spark, sf_dir, "lineitem")
    return key_range_count(li, ["l_orderkey", "l_linenumber"], (1000, 1), (2000, 4))


@query(
    "val_rate_estimate",
    oracle="""
SELECT COUNT(*) AS n,
       ROUND(COUNT(*) / (MAX(epoch_us(ts)) / 1000000.0
                         - MIN(epoch_us(ts)) / 1000000.0), 4) AS rows_per_sec
FROM events
""",
)
def q_rate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/J4 (sql_queries.py:68-74): rows/sec estimate with NULL guards —
    sizing input for the topic-partition heuristic
    (build_startup_state.py:110-119)."""
    ev = load_table(spark, sf_dir, "events")
    ep = epoch_seconds(ev, "ts")
    agg = ev.agg(F.count("*").alias("n"), F.min(ep).alias("t0"), F.max(ep).alias("t1"))
    return agg.select(
        "n",
        F.round(
            F.when(F.col("t1") > F.col("t0"), F.col("n") / (F.col("t1") - F.col("t0"))),
            4,
        ).alias("rows_per_sec"),
    )


@query(
    "val_topic_regex",
    oracle="""
SELECT source,
       'cdc.dbo.' || source AS topic,
       regexp_extract('cdc.dbo.' || source, '^([^.]+)\\.([^.]+)\\.(.+)$', 2) AS schema_part,
       regexp_extract('cdc.dbo.' || source, '^([^.]+)\\.([^.]+)\\.(.+)$', 3) AS table_part
FROM (SELECT DISTINCT source FROM documents)
""",
)
def q_topic_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/F14 (row_comparison_validator.py:46-59): topic-name templating and
    regex decomposition back into (schema, table)."""
    src = load_table(spark, sf_dir, "documents").select("source").distinct()
    topic = F.concat(F.lit("cdc.dbo."), F.col("source"))
    pat = r"^([^.]+)\.([^.]+)\.(.+)$"
    return src.select(
        "source",
        topic.alias("topic"),
        F.regexp_extract(topic, pat, 2).alias("schema_part"),
        F.regexp_extract(topic, pat, 3).alias("table_part"),
    )


@query(
    "val_row_comparison",
    oracle=f"""
WITH {CDC_EVENTS_SQL},
actual AS (
  SELECT change_seq,
         CASE WHEN change_seq % 97 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM cdc_events WHERE change_seq % 101 <> 0),
d AS (
  SELECT COALESCE(e.change_seq, a.change_seq) AS idx,
         CASE WHEN e.change_seq IS NULL THEN 'missing_in_expected'
              WHEN a.change_seq IS NULL THEN 'missing_in_actual'
              WHEN NOT (e.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus)
                OR NOT (e.o_totalprice IS NOT DISTINCT FROM a.o_totalprice)
              THEN 'mismatch' ELSE 'match' END AS status
  FROM cdc_events e FULL OUTER JOIN actual a ON e.change_seq = a.change_seq)
SELECT status, COUNT(*) AS n FROM d GROUP BY status
""",
)
def q_row_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§5 validator 2 (row_comparison_validator.py:183-347): row-by-row
    comparison of the expected change feed against a perturbed 'topic' copy
    (every 97th row's status corrupted, every 101st row dropped) — the
    sequential two-cursor replay becomes ONE full-outer join on the change
    index with column-wise null-safe comparison."""
    from sqlserver_cdc_to_kafka_spark.operators.row_compare import row_diff

    expected = cdc_events(spark, sf_dir)
    actual = expected.filter(F.col("change_seq") % 101 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("change_seq") % 97 == 0, "X").otherwise(F.col("o_orderstatus")),
    )
    diff = row_diff(
        expected, actual, "change_seq", ["o_orderstatus", "o_totalprice"]
    )
    return diff.groupBy("status").agg(F.count("*").alias("n"))
