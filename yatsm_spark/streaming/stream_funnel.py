"""Streaming ordered-funnel (the §2.6 twin of ``series.funnel``).

Stateful ``applyInPandasWithState`` keyed by the funnel key: state is the
n step times (micro-seconds, -1 = unreached) plus the key's high-water
timestamp and a late-row counter.  Each micro-batch replays the SAME
greedy fold as the batch operator over its (within-batch-sorted) new
events and emits one append-mode row per step TRANSITION:
(key, step 1-based, step ts) — downstream "furthest step" / conversion
aggregates are a plain groupBy over the transitions.

Determinism contract (mirrors the batch twin exactly, and is pinned by
test_stream_funnel.py): output is independent of micro-batch slicing
whenever each key's events arrive in non-decreasing event-time order
ACROSS batches — within a batch, order does not matter (sorted before the
fold).  The greedy fold is order-sensitive by nature, so an event-time
regression across batches cannot be folded retroactively; such rows are
counted in state (n_late) and skipped — the streaming analog of a
watermark drop, loud in the metric rather than silently wrong.  (Spark's
own funnel-free building blocks cannot express this operator without
buffering the full per-key history; O(steps) state is the point.)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUT_SCHEMA = "user_id long, step int, ts timestamp"
FUNNEL_STATE_SCHEMA = (
    "times array<long>, last_tu long, n_late long"
)


def make_funnel(steps: list, max_span_seconds: int | None = None):
    """Build the stateful per-key fold for ``applyInPandasWithState``."""
    n = len(steps)
    if n < 1:
        raise ValueError("funnel needs at least one step")
    step_idx = {s: i for i, s in enumerate(steps)}
    span_us = None if max_span_seconds is None else int(max_span_seconds) * 1_000_000

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            times, last_tu, n_late = state.get
            times = list(times)
        else:
            times, last_tu, n_late = [-1] * n, -1, 0
        n_done = sum(1 for t in times if t >= 0)
        out_step: list[int] = []
        out_tu: list[int] = []
        for pdf in pdfs:
            pdf = pdf[pdf["event_type"].isin(step_idx)]
            if pdf.empty:
                continue
            # within-batch order is OURS to fix: sort by (ts, step index)
            # exactly like the batch twin's sort_array over (_tu, _s)
            tu = pdf["ts"].astype("int64").to_numpy() // 1000  # ns -> us
            sx = pdf["event_type"].map(step_idx).to_numpy(dtype=np.int64)
            order = np.lexsort((sx, tu))
            for i in order:
                t, s = int(tu[i]), int(sx[i])
                if t < last_tu:  # event-time regression across batches
                    n_late += 1
                    continue
                last_tu = t
                if n_done >= n or s != n_done:
                    continue
                if n_done > 0 and not (
                    t > times[n_done - 1]
                    and (span_us is None or t - times[0] <= span_us)
                ):
                    continue
                times[n_done] = t
                n_done += 1
                out_step.append(n_done)
                out_tu.append(t)
        state.update((times, int(last_tu), int(n_late)))
        if out_step:
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "step": np.array(out_step, dtype=np.int32),
                    "ts": pd.to_datetime(np.array(out_tu, dtype="int64") * 1000),
                }
            )

    return fold


def funnel_stream(
    stream: DataFrame,
    steps: list,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel over a stream: one transition row per step advance."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            F.col(key_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(type_col).alias("event_type"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel(steps, max_span_seconds),
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
