"""applyInPandasWithState sessionization: cross-batch state correctness."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros
from sqlserver_cdc_to_kafka_spark.streaming.stateful import (
    batch_closed_sessions,
    sessionize_stateful,
)
from sqlserver_cdc_to_kafka_spark.tables import load_table


def _events_us(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", epoch_micros(ev, "ts").alias("us"), "event_id")


def test_stateful_sessions_match_batch_across_microbatches(spark, sf_dir, tmp_path):
    ev = _events_us(spark, sf_dir)
    # split the log in event-time order into two files -> two micro-batches;
    # sessions spanning the split exercise the carried state
    cut = ev.approxQuantile("us", [0.5], 0.001)[0]
    src = tmp_path / "src"
    src.mkdir()
    for i, part in enumerate(
        [ev.filter(F.col("us") <= cut), ev.filter(F.col("us") > cut)]
    ):
        stage = tmp_path / f"stage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(stage))
        shutil.copyfile(
            next(stage.glob("part-*.parquet")), src / f"{chr(97 + i)}.parquet"
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    want = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in batch_closed_sessions(ev).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_sessionize_crash_resume(spark, sf_dir, tmp_path):
    """The reference's exactly-once progress-resume guarantee (T2,
    main.py:319-350) applied to the one operator family that carries
    cross-batch state: kill the sessionizer after batch 1 (query object
    discarded — only the checkpoint + state store survive), let the second
    file arrive while it is down, then resume with a NEW query from the
    same checkpoint.  The restored open-session state must close exactly
    the batch gaps-and-islands oracle's sessions — no loss, no
    re-emission.  The cut is placed at the last event of a known
    multi-event session so at least one session provably straddles the
    restart."""
    from sqlserver_cdc_to_kafka_spark.streaming.stateful import (
        SESSION_GAP_US,
    )

    ev = _events_us(spark, sf_dir)
    straddle = (
        batch_closed_sessions(ev)
        .filter(F.col("n_events") >= 2)
        .orderBy("user_id", "session_start_us")
        .first()
    )
    assert straddle is not None, "test data must contain a multi-event session"
    cut = straddle["session_end_us"] - SESSION_GAP_US  # its last event's us
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def stage(df, name):
        d = tmp_path / ("stage_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(str(d))
        shutil.copyfile(next(d.glob("part-*.parquet")), src / f"{name}.parquet")

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(str(src))
        q = (
            sessionize_stateful(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    stage(ev.filter(F.col("us") < cut), "a")
    run_once()  # crash: query gone; checkpoint + state store remain
    stage(ev.filter(F.col("us") >= cut), "b")
    run_once()  # fresh query resumes from the checkpoint

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(str(out))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .collect()
    )
    want = sorted(
        (
            r["user_id"],
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
        )
        for r in batch_closed_sessions(ev).collect()
    )
    assert got == want
    assert tuple(straddle) in got  # the session that straddled the restart


def test_funnel_stateful_same_instant_ties_and_order(spark, tmp_path):
    """Equal-timestamp events must process in funnel-step order (a click at
    the exact instant of the first view still counts, matching the batch
    >= semantics), and out-of-order arrival within a batch must not matter."""
    import pandas as pd

    from sqlserver_cdc_to_kafka_spark.streaming.stateful import funnel_stateful

    rows = [
        # user 1: all three steps at the same instant -> full funnel
        (1, "click", 11, 100),
        (1, "view", 12, 100),
        (1, "purchase", 13, 100),
        # user 2: click strictly before first view -> funnel stops at view
        (2, "purchase", 21, 50),
        (2, "click", 22, 90),
        (2, "view", 23, 100),
    ]
    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(
        rows, columns=["user_id", "event_type", "event_id", "us"]
    ).to_parquet(src / "a.parquet")
    batch = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch.schema).parquet(str(src))
    )
    out = tmp_path / "out"
    q = (
        funnel_stateful(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["step"], r["at_us"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {
        (1, 1, 100),
        (1, 2, 100),
        (1, 3, 100),
        (2, 1, 100),
    }


def test_running_totals_transform_with_state(spark, tmp_path):
    """Spark 4 transformWithStateInPandas operator: per-user running
    totals must equal the batch prefix-sum window. Skips where the
    transformWithState protobuf runtime is unavailable."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState runtime needs it")

    import pandas as pd

    from pyspark.sql import functions as F

    from sqlserver_cdc_to_kafka_spark.streaming.stateful import (
        running_totals_stateful,
    )

    rows = [(1, 10, 100, 5), (1, 11, 200, 7), (2, 20, 150, 3), (1, 12, 300, 2)]
    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(
        rows, columns=["user_id", "event_id", "us", "v_micros"]
    ).to_parquet(src / "a.parquet")
    batch = spark.read.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    out = tmp_path / "out"
    q = (
        running_totals_stateful(stream)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_id"]): (r["running_n"], r["running_value_micros"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {
        (1, 10): (1, 5),
        (1, 11): (2, 12),
        (1, 12): (3, 14),
        (2, 20): (1, 3),
    }


def test_markov_transitions_stateful_across_microbatches(spark, sf_dir, tmp_path):
    """Boundary-straddling pairs: the last event of batch 1 must pair with
    the first event of batch 2 via carried state — the transition multiset
    must equal the batch lag() result exactly."""
    from pyspark.sql import Window

    from sqlserver_cdc_to_kafka_spark.streaming.stateful import (
        markov_transitions_stateful,
    )
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros

    ev_raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = ev_raw.select(
        "user_id",
        "event_type",
        epoch_micros(ev_raw, "ts").alias("us"),
        "event_id",
    )
    types = tuple(
        r.event_type
        for r in ev.select("event_type").distinct().orderBy("event_type").collect()
    )
    cut = ev.approxQuantile("us", [0.5], 0.001)[0]
    src = tmp_path / "src"
    src.mkdir()
    for i, part in enumerate(
        [ev.filter(F.col("us") <= cut), ev.filter(F.col("us") > cut)]
    ):
        stage = tmp_path / f"mstage{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(stage))
        shutil.copyfile(
            next(stage.glob("part-*.parquet")), src / f"{chr(97 + i)}.parquet"
        )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        markov_transitions_stateful(stream, types)
        .writeStream.format("memory")
        .queryName("markov_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    from collections import Counter

    got = Counter(
        (r["user_id"], r["prev_rank"], r["curr_rank"])
        for r in spark.sql("SELECT * FROM markov_out").collect()
    )
    rank = {t: i for i, t in enumerate(types)}
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    batch = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("user_id", "prev_type", "event_type")
        .collect()
    )
    want = Counter(
        (r["user_id"], rank[r["prev_type"]], rank[r["event_type"]]) for r in batch
    )
    assert got == want
    assert sum(got.values()) > 0


def test_markov_late_cross_batch_row_is_dropped(spark, tmp_path):
    """The operator's documented late-data policy: a row arriving in a
    LATER micro-batch with (us, event_id) at or behind the stored last
    event sits behind the emitted frontier (its pairs are already out in
    append mode) and must be DROPPED — not spliced in to emit transitions
    the batch oracle never saw.  Subsequent in-order rows still pair
    against the stored frontier event."""
    import pandas as pd

    from sqlserver_cdc_to_kafka_spark.streaming.stateful import (
        markov_transitions_stateful,
    )

    types = ("A", "B", "C")
    src = tmp_path / "src"
    src.mkdir()
    cols = ["user_id", "event_type", "us", "event_id"]
    pd.DataFrame(
        [(1, "A", 100, 1), (1, "B", 200, 2)], columns=cols
    ).to_parquet(src / "a.parquet")
    pd.DataFrame(
        [(1, "C", 150, 3), (1, "A", 300, 4)], columns=cols
    ).to_parquet(src / "b.parquet")
    batch = spark.read.parquet(str(src))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        markov_transitions_stateful(stream, types)
        .writeStream.format("memory")
        .queryName("markov_late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["user_id"], r["prev_rank"], r["curr_rank"])
        for r in spark.sql("SELECT * FROM markov_late_out").collect()
    )
    # A->B in batch 1; the late C (us=150 < frontier 200) is dropped, so
    # batch 2 emits only frontier(B) -> A
    assert got == [(1, 0, 1), (1, 1, 0)]
