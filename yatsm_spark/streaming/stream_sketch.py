"""Streaming maintenance of the NON-ALGEBRAIC sketch tiers (§2.6 +
operators/sketch.py): percentiles, distinct counts, and heavy-hitter
counter matrices kept continuously up to date as crawls land, without
re-reading raw history.

The batch tier cascade carries cnt/sum/min/max exactly because they are
algebraic; ``hist_sketch`` / ``kmv_sketch`` extend that to percentiles
and COUNT DISTINCT by storing the mergeable sufficient statistic.  This
module is the ONLINE half of that argument: because the statistics are
mergeable, a micro-batch's sketch folds into the stored tier — the
update is per-batch work, never a rescan.

Design (the ``tier_batch_sink`` exactly-once recipe, specialized):

  * :func:`sketch_batch_sink` — a ``foreachBatch`` sink that sketches
    each micro-batch with the BATCH operator (inside foreachBatch the
    micro-batch is a plain DataFrame, so the window-rank bottom-k —
    unsupported in a streaming agg — is available unchanged; one code
    path, no semantic twin to keep in sync) and writes it to its own
    ``batch=<id>`` directory with mode=overwrite.  A replayed batch
    overwrites its own previous output: exactly-once by idempotent
    placement, same as the rollup tier sink.
  * :func:`read_sketch_tier` — reads the directory and merges per-batch
    sketches with the SAME cascade operator the batch tiers use
    (same-tier cascade = pure merge: re-bucketing aligned buckets is the
    identity).  Merge-on-read; a compaction pass can fold the directory
    into one sketch per (key, bucket) with the identical call.

Lateness: NONE is lost.  Unlike the watermarked streaming rollup (which
must drop late rows to finalize append-mode windows), the sketch tier
never finalizes — a late row's hashes/counts land in whatever batch
carries them and the merge is order-insoluble by algebra (KMV bottom-k
union is idempotent, commutative, associative; histogram counts are
additive with per-batch-directory exactly-once).  The streamed tier
therefore equals the batch-built tier EXACTLY on the same rows, pinned
by test.

Scale notes (100 TB design): per micro-batch the sink shuffles only that
batch's slim (key, bucket, hv|hb) tuples — map-side combined like the
batch build; the stored tier is sketch-sized (k bigints / occupied
buckets per key-bucket), so merge-on-read touches no raw data and the
compacted tier answers percentile + NDV dashboards at interactive cost.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def sketch_batch_sink(
    path: str, sketch_fn: Callable[[DataFrame], DataFrame]
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` sink: write ``sketch_fn(micro_batch)`` to
    ``{path}/batch={id}`` with mode=overwrite (exactly-once under
    replay, per the deterministic batch->directory mapping).

    ``sketch_fn`` is the batch sketch builder partially applied, e.g.
    ``lambda df: kmv_sketch(df, "1h")``, ``lambda df:
    hist_sketch(df, "1h")``, or ``lambda df: cm_sketch(df, "1h")`` —
    all three sketch families are mergeable, so all three stream
    through the same sink (pinned bit-equal to batch by test each).
    """

    def write(df: DataFrame, batch_id: int) -> None:
        sketch_fn(df).write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return write


def read_sketch_tier(
    spark: SparkSession,
    path: str,
    merge_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Merge-on-read of a streamed sketch-tier directory: union the
    per-batch sketches and fold them with ``merge_fn`` — the same-tier
    cascade, e.g. ``lambda s: kmv_cascade(s, "1h")`` or ``lambda s:
    hist_cascade(s, "1h")``.  The result is bit-identical to building
    the sketch from all raw rows at once (mergeability), so readouts
    (:func:`~yatsm_spark.operators.sketch.hist_percentile`,
    :func:`~yatsm_spark.operators.sketch.kmv_estimate`) apply unchanged.
    """
    return merge_fn(spark.read.parquet(path))
