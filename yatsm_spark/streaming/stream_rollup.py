"""Structured Streaming surface (SURVEY.md §2.6) — the online analog of
the batch engine: watermarked tumbling rollups, session windows, and a
stateful per-key CCDC monitor.

Semantic difference vs the reference, documented per §2.6: YATSM always
reprocesses the whole series (no lateness concept); the streaming rollup
drops rows later than the watermark.  The batch engine remains the source
of truth — streaming serves the "monitor new crawls as they land" loop the
reference runs by re-fitting whole pixels.

All aggregates reuse the batch tier algebra (cnt+sum, never means) so a
streamed tier can be unioned with / reconciled against a batch backfill
without re-reading raw data.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from yatsm_spark.operators.rollup import TIERS


def stream_rollup(
    stream: DataFrame,
    tier: str = "1h",
    watermark: str = "2 hours",
    key_col: str = "url",
    ts_col: str = "warc_ts",
    value_col: str = "text_len",
) -> DataFrame:
    """A1 as a streaming query: tumbling ``F.window`` aggregation with a
    watermark; append-mode compatible (finalized windows only).

    The window start equals the batch engine's epoch-aligned bucket, so
    streamed rows re-aggregate exactly into the batch tier tables.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col, F.window(ts_col, TIERS[tier]).alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(value_col).alias("sum_val"),
            F.min(value_col).alias("min_val"),
            F.max(value_col).alias("max_val"),
        )
        .select(
            key_col,
            F.col("w.start").alias("bucket_ts"),
            "cnt",
            "sum_val",
            (F.col("sum_val") / F.col("cnt")).alias("mean_val"),
            "min_val",
            "max_val",
        )
    )


def stream_sessionize(
    stream: DataFrame,
    gap: str = "36 hours",
    watermark: str = "2 hours",
    key_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """A8 as a streaming query: ``session_window`` with a gap timeout."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col, F.session_window(ts_col, gap).alias("s"))
        .agg(F.count("*").alias("n_obs"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_obs",
        )
    )


def tier_batch_sink(path: str):
    """Exactly-once parquet sink for a streamed tier, for
    ``writeStream.foreachBatch``: each micro-batch lands in its own
    ``batch=<id>`` directory with mode=overwrite, so a batch REPLAYED
    after a failure overwrites its own previous (possibly partial) output
    instead of appending duplicates — idempotence comes from the
    deterministic (batch_id -> directory) mapping, the standard
    foreachBatch exactly-once recipe.

    Downstream, the directory unions back into one tier (append-mode
    windows are final, each emitted once) and can be folded into the
    stored batch tier with the cnt+sum algebra
    (operators/rollup.py::merge_tiers / the series-shaped union-groupBy)
    — see test_streaming.py::test_streamed_tier_reconciles_with_batch_backfill.
    """

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return write


def stream_exact_dedup(
    stream: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of operators/dedup.py::exact_dedup: keep the
    first-seen row per content fingerprint (md5) within the watermark
    horizon — the online front door of the training-data dedup stack.

    ``dropDuplicatesWithinWatermark`` bounds the state store by the
    watermark (a fingerprint older than the horizon is evicted), so state
    is O(unique docs per window), never O(corpus).  Exactness across the
    whole corpus still belongs to the batch pass; this op keeps a live
    ingest feed duplicate-free between batch passes — same split as the
    rollup (§2.6 semantics note at the top of this module).
    """
    from yatsm_spark.functions.textops import fingerprint

    return (
        stream.withColumn("fp", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


MONITOR_STATE_SCHEMA = (
    "coef array<double>, rmse double, consec int, n_seen long, "
    "buf_t array<double>, buf_y array<double>"
)
MONITOR_OUT_SCHEMA = (
    "url string, warc_ts timestamp, score double, consec int, is_break boolean"
)


def make_monitor(threshold: float = 3.5, consecutive: int = 5, period: float = 7.0):
    """Stateful K6 Shewhart monitor for ``applyInPandasWithState``.

    State per url = (harmonic coef, rmse, consecutive-exceedance counter,
    n_seen, training buffers).  The training buffers (buf_t/buf_y) persist
    across micro-batches so a key whose first ``train_n`` observations are
    split over many batches still trains — output is therefore independent
    of micro-batch boundaries (determinism contract; see
    test_streaming.py::test_monitor_trains_across_many_tiny_batches).
    The model is trained on the first ``train_n`` observations
    (simple OLS on the harmonic design — the streaming analog of K5's
    stable-period init); each later observation is scored
    |y-yhat|/max(rmse, 1); ``consecutive`` exceedances emit a break row and
    reset the model, mirroring CCDCesque.monitor [U].
    """
    train_n = 16

    def monitor(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from yatsm_spark.functions.ccdc import harmonic_design

        if state.exists:
            coef, rmse, consec, n_seen, buf_t, buf_y = state.get
            coef = np.array(coef) if coef is not None else None
            buf_t = list(buf_t) if buf_t is not None else []
            buf_y = list(buf_y) if buf_y is not None else []
        else:
            coef, rmse, consec, n_seen = None, 1.0, 0, 0
            buf_t, buf_y = [], []
        out_frames: list[pd.DataFrame] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("warc_ts", kind="mergesort")
            t_days = pdf["warc_ts"].astype("int64").to_numpy() / 1e9 / 86400.0
            y = pdf["text_len"].to_numpy(dtype=np.float64)
            ts_vals = pdf["warc_ts"].to_numpy()
            n = y.size
            n_seen += n
            idx = 0
            # chunk-vectorized twin of the batch K6 monitor: while trained,
            # score every remaining row with ONE matvec (per-row dgemv dots
            # are bit-identical to the old scalar x@coef, so output is
            # still independent of micro-batch slicing); the consecutive
            # counter is a run-length scan with carry-in from state.
            while idx < n:
                if coef is None:  # training: absorb rows into the buffers
                    take = min(train_n - len(buf_t), n - idx)
                    buf_t.extend(t_days[idx : idx + take])
                    buf_y.extend(y[idx : idx + take])
                    idx += take
                    if len(buf_t) >= train_n:
                        X = harmonic_design(np.array(buf_t), 1, period)
                        coef, *_ = np.linalg.lstsq(X, np.array(buf_y), rcond=None)
                        resid = np.array(buf_y) - X @ coef
                        rmse = max(float(np.sqrt(np.mean(resid**2))), 1.0)
                        buf_t, buf_y = [], []  # trained: buffers done
                    continue
                Xb = harmonic_design(t_days[idx:n], 1, period)
                scores = np.abs(y[idx:n] - Xb @ coef) / max(rmse, 1.0)
                exceed = scores > threshold
                pos = np.arange(exceed.size)
                last_ok = np.maximum.accumulate(np.where(~exceed, pos, -1))
                consec_vec = np.where(exceed, pos - last_ok, 0)
                if consec:  # run carried in from the previous block/batch
                    consec_vec = np.where(
                        exceed & (last_ok == -1), consec_vec + consec, consec_vec
                    )
                brk = consec_vec >= consecutive
                hits = np.flatnonzero(brk)
                stop = int(hits[0]) + 1 if hits.size else exceed.size
                out_frames.append(
                    pd.DataFrame(
                        {
                            "url": key[0],
                            "warc_ts": ts_vals[idx : idx + stop],
                            "score": scores[:stop],
                            "consec": consec_vec[:stop].astype(np.int32),
                            "is_break": brk[:stop],
                        }
                    )
                )
                if hits.size:  # reset: start retraining a new stable model
                    coef, rmse, consec = None, 1.0, 0
                    buf_t, buf_y = [], []
                else:
                    consec = int(consec_vec[-1]) if exceed.size else consec
                idx += stop

        state.update(
            (
                [float(c) for c in coef] if coef is not None else None,
                float(rmse),
                int(consec),
                int(n_seen),
                [float(v) for v in buf_t],
                [float(v) for v in buf_y],
            )
        )
        out_frames = [f for f in out_frames if not f.empty]
        if out_frames:
            yield pd.concat(out_frames, ignore_index=True)

    return monitor


def monitor_stream(
    stream: DataFrame,
    threshold: float = 3.5,
    consecutive: int = 5,
    period: float = 7.0,
) -> DataFrame:
    """K5+K6 as a stateful streaming operator (applyInPandasWithState)."""
    return (
        stream.select("url", "warc_ts", "text_len")
        .groupBy("url")
        .applyInPandasWithState(
            make_monitor(threshold, consecutive, period),
            outputStructType=MONITOR_OUT_SCHEMA,
            stateStructType=MONITOR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
