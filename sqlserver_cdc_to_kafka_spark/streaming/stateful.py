"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 closing note — the Spark surface for operators the reference
hand-rolls as in-process dicts).

Sessionization with explicit state: per user, events accumulate into the
current session; an event ≥ gap after the previous one CLOSES the session
(emitted downstream) and starts a new one. State = (session_start_us,
last_us, n_events) per user, carried across micro-batches in the state
store — the distributed restatement of the reference's per-key dicts
(e.g. replayer.py:499-525, show_snapshot_history.py:73-77).

The final open session per user stays in state (emitted only on timeout in
a live stream); bounded tests compare closed sessions against the batch
gaps-and-islands equivalent."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 600_000_000  # 10 min

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stateful(events: DataFrame, ts_us_col: str = "us") -> DataFrame:
    """events(user_id, us) stream -> closed sessions stream. State-store
    backed; each micro-batch folds its (sorted) events into the carried
    session. Event-time ordering within a user relies on source order per
    micro-batch (bounded replay); a production stream adds a watermark and
    timeout-based flush."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        closed: list[tuple[Any, ...]] = []
        for pdf in pdfs:
            for us in sorted(pdf[ts_us_col]):
                us = int(us)
                if last is None:
                    start, last, n = us, us, 1
                elif us - last >= SESSION_GAP_US:
                    closed.append((user_id, start, last + SESSION_GAP_US, n))
                    start, last, n = us, us, 1
                else:
                    last = us
                    n += 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_closed_sessions(events: DataFrame, ts_us_col: str = "us") -> DataFrame:
    """Batch gaps-and-islands equivalent: all sessions except each user's
    last (which a stream would only close on timeout)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(ts_us_col)
    marked = events.withColumn(
        "new_sess",
        (
            (F.col(ts_us_col) - F.lag(ts_us_col).over(w) >= SESSION_GAP_US)
            | F.lag(ts_us_col).over(w).isNull()
        ).cast("int"),
    )
    grouped = marked.withColumn(
        "sess", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sessions = grouped.groupBy("user_id", "sess").agg(
        F.min(ts_us_col).alias("session_start_us"),
        (F.max(ts_us_col) + F.lit(SESSION_GAP_US)).alias("session_end_us"),
        F.count("*").alias("n_events"),
    )
    last_sess = sessions.groupBy("user_id").agg(F.max("sess").alias("last_sess"))
    return (
        sessions.join(last_sess, "user_id")
        .filter(F.col("sess") < F.col("last_sess"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )


FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step", LongType()),
        StructField("at_us", LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType()),
        StructField("t_prev", LongType()),
    ]
)


def funnel_stateful(events: DataFrame, steps: tuple = FUNNEL_STEPS) -> DataFrame:
    """events(user_id, event_type, us, event_id) stream -> step-completion
    stream: the per-user funnel STATE MACHINE (stage reached + completion
    time), advanced greedily in event order and carried across
    micro-batches.  Greedy in-order advancement computes exactly the batch
    first-completion times (t1 = min view, t2 = min click ≥ t1, ...) —
    equal-timestamp events process in funnel-step order so a same-instant
    next-step event still counts, mirroring the oracle's >= comparisons.
    Emits (user, step, at_us) once per step the moment it completes —
    the live form of events_funnel_conversion."""
    rank = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        stage, t_prev = state.get if state.exists else (0, 0)
        out: list[tuple[Any, ...]] = []
        rows: list[tuple[int, int, int, str]] = []
        for pdf in pdfs:
            for us, ev_id, et in zip(
                pdf["us"], pdf["event_id"], pdf["event_type"]
            ):
                if et in rank:
                    rows.append((int(us), rank[et], int(ev_id), et))
        rows.sort()
        for us, step_rank, _ev_id, _et in rows:
            if stage < n_steps and step_rank == stage and (
                stage == 0 or us >= t_prev
            ):
                stage += 1
                t_prev = us
                out.append((user_id, stage, us))
        state.update((stage, t_prev))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "step", "at_us"])

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("us", LongType()),
        StructField("running_n", LongType()),
        StructField("running_value_micros", LongType()),
    ]
)


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Per-user LIFETIME running aggregates via ``transformWithStateInPandas``
    — the Spark 4 stateful-processor API (typed ValueState handles, explicit
    init/close lifecycle), distinct from the applyInPandasWithState surface
    the sessionizer and funnel use.  Every event emits the user's running
    event count and value total INCLUDING itself, in (us, event_id) order —
    a running-aggregate changelog.  State = one (n, total) tuple per user,
    carried across micro-batches; within a batch rows sort by event time
    (bounded-replay ordering assumption, same as the sessionizer).

    ENVIRONMENT GATE: the transformWithState runtime speaks protobuf to
    the JVM; where google.protobuf is absent/broken the query START raises
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE) — hence this operator
    is witnessed by a skippable test, not a registered driver query (this
    container ships a broken protobuf; applyInPandasWithState operators
    above need no protobuf and carry the registered stateful witnesses)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n BIGINT, total BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._agg.exists():
                n, total = self._agg.get()
            else:
                n, total = 0, 0
            buf = []
            for pdf in rows:
                for ev_id, us, v in zip(
                    pdf["event_id"], pdf["us"], pdf["v_micros"]
                ):
                    buf.append((int(us), int(ev_id), int(v)))
            buf.sort()
            out = []
            for us, ev_id, v in buf:
                n += 1
                total += v
                out.append((user_id, ev_id, us, n, total))
            self._agg.update((n, total))
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_id", "us", "running_n",
                    "running_value_micros",
                ],
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


TRANSITION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_rank", LongType()),
        StructField("curr_rank", LongType()),
    ]
)

TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_rank", LongType()),
    ]
)


def markov_transitions_stateful(
    events: DataFrame, type_order: tuple[str, ...]
) -> DataFrame:
    """events(user_id, event_type, us, event_id) stream -> transition
    stream: one (prev_rank, curr_rank) row per consecutive event pair in
    each user's (us, event_id)-ordered history, with the LAST event
    carried in the state store so pairs that straddle a micro-batch
    boundary are still emitted — the live form of
    events_markov_transitions (the batch lag() window).

    Event types ride as integer ranks from the caller-supplied
    ``type_order`` (state rows are fixed-width longs; the caller maps
    ranks back to names).  Unlike sessionization nothing ever stays
    pending: every transition is closed the moment its second event
    arrives, so a bounded drain reproduces the batch matrix EXACTLY.

    Ordering contract: rows are sorted within each micro-batch, but a row
    arriving in a LATER batch with (us, event_id) at or behind the stored
    last event sits behind the emitted frontier — its pairs were already
    emitted in append mode and cannot be retracted.  Such rows are
    DROPPED (a per-key frontier, the same late-data policy as a
    watermark), so the hash-exact batch-oracle claim requires that
    cross-batch delivery be non-decreasing per key, as it is for the
    ordered CDC feeds this engine drains (cf. reference
    cdc_kafka/validation.py ordering guarantees)."""
    rank = {t: i for i, t in enumerate(type_order)}

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_us, last_id, last_rank = state.get
        else:
            last_us = last_id = last_rank = None
        rows: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            for us, ev_id, et in zip(
                pdf["us"], pdf["event_id"], pdf["event_type"]
            ):
                rows.append((int(us), int(ev_id), rank[et]))
        rows.sort()
        out: list[tuple[int, int, int]] = []
        for us, ev_id, r in rows:
            if last_rank is not None:
                if (us, ev_id) <= (last_us, last_id):
                    # behind the emitted frontier: pairs involving the
                    # stored last event are already out (append mode) —
                    # drop rather than silently diverge from the oracle
                    continue
                out.append((user_id, last_rank, r))
            last_us, last_id, last_rank = us, ev_id, r
        if last_rank is not None:
            state.update((last_us, last_id, last_rank))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "prev_rank", "curr_rank"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
