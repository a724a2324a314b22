"""Main batch job: crawl -> rollup tiers -> gap-fill -> blobs [-> segments].

The spark-submit analog of the reference CLI ``yatsm line <config> <job>
<total>`` (yatsm/cli/line.py [U], SURVEY.md §3.1) — Spark tasks replace the
external GNU-parallel process scheduler, and the per-partition checkpoint
manifest replaces the ``--resume`` npz-glob.

Usage (cluster):
    spark-submit --master ... --py-files engine.zip jobs/rollup.py \
        --input /path/to/crawl --output /path/to/out --run-id r1 \
        [--synthetic N_URLS:SPAN_DAYS] [--chunked] [--segment] [--no-blobs]
        [--no-bucketed]

Modes:
  * default (one-pass): the whole table in one DAG — maximum cluster
    utilization, used for benchmarks and fresh builds.
  * --chunked: process per p_bucket with checkpoint-manifest resume —
    interrupted runs redo only unfinished buckets (north_star
    resumability).  Each chunk is itself fully distributed.

Every run appends lineage metrics JSONL (rows in/out, bytes, wall) per
chunk under <output>/_meta/.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from yatsm_spark.datagen import generate_crawl, write_crawl  # noqa: E402
from yatsm_spark.functions.ccdc import CCDCParams  # noqa: E402
from yatsm_spark.operators.rollup import (  # noqa: E402
    RETENTION_DEFAULTS,
    TIERS,
    apply_retention,
    cascade,
    gap_fill,
    merge_tiers,
    rollup,
    series_clean,
)
from yatsm_spark.plans.blobs import encode_blobs  # noqa: E402
from yatsm_spark.plans.segmentation import segment_series  # noqa: E402
from yatsm_spark.session import get_spark  # noqa: E402
from yatsm_spark.sources import checkpoints as ckpt  # noqa: E402
from yatsm_spark.sources.storage import write_bucketed_tier, write_table  # noqa: E402


def build_tiers(crawl, tiers: list[str]):
    """clean -> 1h -> cascade coarser tiers (exact re-aggregation)."""
    clean = series_clean(crawl, keep_text=False)
    out = {}
    finest = tiers[0]
    out[finest] = rollup(clean, finest)
    prev = finest
    for t in tiers[1:]:
        out[t] = cascade(out[prev], t)
        prev = t
    return out


def process(spark, crawl, out_dir: str, tiers: list[str], do_blobs: bool,
            do_segment: bool, suffix: str = "", bucketed: bool = False,
            retain: bool = False) -> dict[str, int]:
    # row-count lineage metrics ride the write itself via df.observe()
    # (SURVEY.md §7 step 7) — no post-write re-read jobs
    from pyspark.sql import Observation

    counts = {}
    tier_dfs = build_tiers(crawl, tiers)
    # persist every tier: each is read 2-4x below (its own write + the next
    # cascade; plus the retention max-anchor subquery and the kernel-input
    # fingerprint) — without persist each consumer re-runs the whole
    # clean->rollup->cascade chain from the scan (ReuseExchange does not
    # cover the agg+join shapes; see BENCH/BASELINE.md pitfall 4)
    for t in tier_dfs:
        tier_dfs[t] = tier_dfs[t].persist()
    for t, df in tier_dfs.items():
        if retain:
            # retention BEFORE gap-fill: aged-out windows get neither rows
            # nor gap rows; cascade inputs stay unretained (coarser tiers
            # aggregate the full history before the finer tier ages out)
            df = apply_retention(df, RETENTION_DEFAULTS.get(t))
        filled = gap_fill(df, t).withColumn("p_day", F.to_date("bucket_ts"))
        obs = Observation(f"rollup_{t}")
        target = f"{out_dir}/rollup_{t}{suffix}"
        write_table(
            filled.observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                # A10: HLL sketch rides the write — distinct-url lineage
                # without a countDistinct shuffle
                F.approx_count_distinct("url").alias("approx_urls"),
            ),
            target,
            partition_cols=("p_day",),
        )
        counts[f"rollup_{t}"] = int(obs.get["rows"])
        counts[f"rollup_{t}_approx_urls"] = int(obs.get["approx_urls"])
    if do_blobs or do_segment:
        # kernel stages prefer the 1d tier (bounded group size, regular
        # cadence); the tier label MUST name the tier actually selected so
        # segment_blobs metadata matches its contents
        if "1d" in tier_dfs:
            kernel_tier = "1d"
        else:
            kernel_tier = tiers[-1] if len(tiers) > 1 else tiers[0]
        src = tier_dfs[kernel_tier]
        if bucketed:
            # write the kernel-stage input url-bucketed + url-sorted once,
            # then BOTH kernel stages run shuffle-free (presorted scan ->
            # mapInPandas; see sources/storage.py::write_bucketed_tier).
            # AUTO-REUSE: if the table already holds THIS input (content
            # fingerprint stored as a table property matches), skip the
            # rewrite — resumed/repeated runs go straight to the
            # shuffle-free kernels.  A stale table never survives: any
            # input change flips the multiplicity-sensitive fingerprint.
            tbl = f"tier_kernel_input{suffix.replace('/', '_').replace('=', '_')}"
            fp = ckpt.fingerprint_chunk(src, ("url", "bucket_ts", "mean_len"))
            reuse = False
            if spark.catalog.tableExists(tbl):
                props = {
                    r["key"]: r["value"]
                    for r in spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect()
                }
                reuse = props.get("yatsm.input_fingerprint") == fp
            print(f"bucketed kernel input {tbl}: {'REUSED' if reuse else 'written'} (fp={fp})")
            if not reuse:
                write_bucketed_tier(src, tbl)
                spark.sql(
                    f"ALTER TABLE {tbl} SET TBLPROPERTIES "
                    f"('yatsm.input_fingerprint'='{fp}')"
                )
            src = spark.table(tbl)
    if do_blobs:
        blobs = encode_blobs(
            src, kernel_tier, value_col="mean_len", presorted=bucketed
        )
        obs = Observation("segment_blobs")
        target = f"{out_dir}/segment_blobs{suffix}"
        blobs.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(target)
        counts["segment_blobs"] = int(obs.get["rows"])
    if do_segment:
        params = CCDCParams(period=7.0, min_span=56.0, retrain_time=56.0)
        segs = segment_series(src, params, presorted=bucketed)
        obs = Observation("segments")
        target = f"{out_dir}/segments{suffix}"
        segs.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(target)
        counts["segments"] = int(obs.get["rows"])
    for df in tier_dfs.values():
        df.unpersist()
    return counts


def process_incremental(spark, delta_crawl, out_dir: str, tiers: list[str],
                        retain: bool = False) -> dict[str, int]:
    """Fold a DELTA crawl into the stored tiers under ``out_dir`` without
    re-reading raw history (operators/rollup.py::merge_tiers): delta rows
    -> delta tiers -> algebraic merge with each stored tier [-> retention]
    -> gap-refill -> TWO-PHASE swap.  First run (no stored tier) degrades
    to a plain build.  Exactness: incremental(part1)+incremental(part2) ==
    one-shot(all rows), tested in tests/test_incremental.py.

    EXACTNESS PRECONDITION: deltas must be (url, warc_ts)-disjoint from
    data already folded in — series_clean's duplicate-row dedup runs per
    delta, so a crawl record RE-DELIVERED in a later delta counts twice
    (the one-shot build would dedup it).  Append-only feeds keyed by fetch
    time satisfy this; re-ingesting feeds need upstream dedup or periodic
    full rebuilds (the standard continuous-aggregate caveat).

    Crash-safety: every merged tier is fully written to ``.tmp_rollup_*``
    BEFORE any live tier moves (phase 1), so a mid-write crash leaves all
    live tiers untouched and the delta simply re-runs.  Phase 2 swaps each
    tier via backup-rename (live -> .bak, tmp -> live) and removes ONLY
    the .bak dirs this run itself created, after every swap succeeded — a
    crash inside phase 2 leaves each tier as either old or new plus its
    recoverable .bak/.tmp.  A run REFUSES to start over leftover .bak
    dirs from ANY prior run (phase 2 started: some tiers may already hold
    the merged delta, and replaying would double-merge — the merge is not
    idempotent); leftover .tmp dirs WITHOUT a .bak mean the crash was in
    phase 1, which is safe: they are cleared and the delta re-runs.
    Local-fs renames here; on a cluster use the FileSystem.rename
    equivalents.
    """
    import shutil

    from pyspark.sql import Observation

    import glob as _glob

    # scan the WHOLE output dir, not just this run's tier list — a prior
    # run with a different --tiers set leaves debris too.
    # .bak => phase 2 started: some tiers may already hold the merged
    # delta, so replaying would double-merge — refuse until recovered.
    # .tmp alone => the crash was in phase 1: live tiers are untouched and
    # the delta safely re-runs; clear the stale tmp and continue.
    baks = sorted(_glob.glob(f"{out_dir}/rollup_*.bak"))
    if baks:
        raise SystemExit(
            "incremental refuses to run over leftover swap backups (a "
            f"prior run died mid-swap; some tiers may already be merged): "
            f"{baks} — restore or remove these first; re-running the delta "
            "blindly would double-merge the already-swapped tiers"
        )
    for stale in sorted(_glob.glob(f"{out_dir}/.tmp_rollup_*")):
        print(f"clearing stale phase-1 tmp {stale} (safe: live tiers untouched)")
        shutil.rmtree(stale)

    counts: dict[str, int] = {}
    persisted_merges: list = []
    delta_tiers = build_tiers(delta_crawl, tiers)
    # persist: each delta tier feeds its own merge AND the next cascade
    # (and the retention anchor re-reads the merged frame) — same
    # ReuseExchange gap as process() (BENCH/BASELINE.md pitfall 4)
    for t in delta_tiers:
        delta_tiers[t] = delta_tiers[t].persist()
    swaps: list[tuple[str, str]] = []
    for t, delta in delta_tiers.items():
        stored_path = f"{out_dir}/rollup_{t}"
        if os.path.exists(stored_path):
            stored = spark.read.parquet(stored_path)
            merged = merge_tiers(stored, delta)
        else:
            merged = delta
        if retain:
            merged = merged.persist()  # retention's max-anchor reads it twice
            persisted_merges.append(merged)
            merged = apply_retention(merged, RETENTION_DEFAULTS.get(t))
        filled = gap_fill(merged, t).withColumn("p_day", F.to_date("bucket_ts"))
        obs = Observation(f"incr_rollup_{t}")
        tmp = f"{out_dir}/.tmp_rollup_{t}"
        write_table(
            filled.observe(obs, F.count(F.lit(1)).alias("rows")),
            tmp,
            partition_cols=("p_day",),
        )
        counts[f"rollup_{t}"] = int(obs.get["rows"])
        swaps.append((tmp, stored_path))
    for df in delta_tiers.values():
        df.unpersist()
    for df in persisted_merges:
        df.unpersist()
    # phase 2: all tiers written durably; swap with backups, then clean up
    # only the baks WE created once every swap has succeeded
    own_baks: list[str] = []
    for tmp, stored_path in swaps:
        bak = stored_path + ".bak"
        if os.path.exists(stored_path):
            os.rename(stored_path, bak)
            own_baks.append(bak)
        os.rename(tmp, stored_path)
    for bak in own_baks:
        shutil.rmtree(bak)
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="crawl parquet path")
    ap.add_argument("--synthetic", help="N_URLS:SPAN_DAYS deterministic crawl instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--tiers", default="1h,1d,30d")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--chunked", action="store_true", help="per-bucket checkpointed mode")
    ap.add_argument("--segment", action="store_true")
    ap.add_argument("--no-blobs", action="store_true")
    ap.add_argument("--incremental", action="store_true",
                    help="treat --input as a DELTA crawl and fold it into the "
                         "stored tiers under --output (merge_tiers; no raw "
                         "history re-read); implies tier-only processing")
    ap.add_argument("--retain", action="store_true",
                    help="enforce RETENTION_DEFAULTS per tier (1h: 7d, 1d: 90d, "
                         "30d: forever) before the tier writes")
    ap.add_argument("--bucketed", action=argparse.BooleanOptionalAction, default=True,
                    help="url-bucketed kernel input -> shuffle-free segment/blob "
                         "stages (default ON; reused across runs via content "
                         "fingerprint; --no-bucketed for catalogs without "
                         "bucketBy support)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    tiers = [t.strip() for t in args.tiers.split(",")]
    for t in tiers:
        if t not in TIERS:
            raise SystemExit(f"unknown tier {t}; choose from {list(TIERS)}")
    run_id = args.run_id or uuid.uuid4().hex[:12]

    spark = get_spark("yatsm_spark_rollup", master=args.master, hive=args.bucketed)
    os.makedirs(f"{args.output}/_meta", exist_ok=True)
    metrics = ckpt.PartitionMetrics(f"{args.output}/_meta/lineage.jsonl")

    if args.synthetic:
        n_urls, span = (int(x) for x in args.synthetic.split(":"))
        crawl_path = f"{args.output}/crawl_input"
        if not os.path.exists(crawl_path):
            write_crawl(generate_crawl(spark, n_urls=n_urls, span_days=span), crawl_path)
        crawl = spark.read.parquet(crawl_path)
    else:
        if not args.input:
            raise SystemExit("need --input or --synthetic")
        crawl = spark.read.parquet(args.input)

    t_start = time.time()
    if args.incremental:
        # incremental maintains TIERS only: kernel outputs (blobs/segments)
        # would silently go stale, so asking for them here is an error —
        # refresh them with a follow-up full run (the bucketed kernel input
        # auto-reuses when unchanged) or compact_blobs.
        if args.segment or args.chunked:
            raise SystemExit("--incremental is tier-only: run --segment/--chunked separately")
        counts = process_incremental(spark, crawl, args.output, tiers, retain=args.retain)
        metrics.emit(run_id=run_id, partition_key="DELTA",
                     wall_ms=int((time.time() - t_start) * 1000), **counts)
    elif not args.chunked:
        counts = process(spark, crawl, args.output, tiers, not args.no_blobs, args.segment, bucketed=args.bucketed, retain=args.retain)
        metrics.emit(run_id=run_id, partition_key="ALL", wall_ms=int((time.time() - t_start) * 1000), **counts)
    else:
        manifest_path = f"{args.output}/_meta/checkpoints"
        buckets = crawl.select(F.col("p_bucket").cast("string").alias("partition_key")).distinct()
        manifest = ckpt.read_manifest(spark, manifest_path)
        pending = [r["partition_key"] for r in ckpt.pending_partitions(buckets, manifest, run_id).collect()]
        done = buckets.count() - len(pending)
        print(f"run {run_id}: {len(pending)} pending buckets ({done} already done)")
        for pk in sorted(pending, key=int):
            t0 = time.time()
            chunk = crawl.filter(F.col("p_bucket") == int(pk))
            rows_in = chunk.count()
            counts = process(spark, chunk, args.output, tiers, not args.no_blobs,
                             args.segment, suffix=f"/b={pk}", bucketed=args.bucketed,
                             retain=args.retain)
            wall = int((time.time() - t0) * 1000)
            chunk_dirs = [f"{args.output}/rollup_{t}/b={pk}" for t in tiers]
            if not args.no_blobs:
                chunk_dirs.append(f"{args.output}/segment_blobs/b={pk}")
            if args.segment:
                chunk_dirs.append(f"{args.output}/segments/b={pk}")
            bytes_out = ckpt.dir_bytes(*chunk_dirs)
            # rows_out = data rows only — the *_approx_urls observe metrics
            # are cardinality sketches, not rows
            rows_out = sum(v for k, v in counts.items() if not k.endswith("_approx_urls"))
            ckpt.mark_done(spark, manifest_path, run_id, pk, rows_in,
                           rows_out, bytes_out, wall)
            metrics.emit(run_id=run_id, partition_key=pk, rows_in=rows_in,
                         bytes_out=bytes_out, wall_ms=wall, **counts)
    total = time.time() - t_start
    print(f"run {run_id} finished in {total:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
