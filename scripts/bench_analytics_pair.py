"""Product-analytics scaling pairs: N-vs-4N evidence for the round-4
analytics family (series.funnel, series.cohort_retention,
series.interval_overlap_join), companion to bench_pair.py (tiers) and
bench_corpus_pair.py (corpus pipeline).

No real cluster exists in this sandbox, so the two-cluster-size criterion
is evidenced by the SAME jobs on the SAME on-disk events table at
local[8] vs local[32]:

    strong efficiency = (T_8 / T_32) / (32 / 8)
    weak   efficiency = T_8(N events) / T_32(4N events)

Methodology (same as the sibling scripts): the host carries invisible
co-tenant load, so single-shot numbers are meaningless — run
back-to-back PAIRS (noise hits both levels of a pair similarly),
accumulate pairs across invocations into a JSONL, report min-of-N per
level.

Input: deterministic synthetic events (hash-seeded exprs, no rand() —
identical bytes at every parallelism), ~U users x E events/user over 30
days; event_type cycles through view/click/purchase/error/signup by
content hash so every op has matching rows.

Usage: python scripts/bench_analytics_pair.py [--events 4000000]
       python scripts/bench_analytics_pair.py --summarize
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OUT = "/root/repo/.benchdata/analytics_pairs.jsonl"
TYPES = ["view", "click", "purchase", "error", "signup"]


def ensure_data(n_events: int) -> str:
    from pyspark.sql import functions as F

    from yatsm_spark.session import get_spark

    path = f"/root/repo/.benchdata/events_n{n_events}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    spark = get_spark("events_datagen", master="local[32]")
    t0 = time.time()
    n_users = max(n_events // 2000, 1)  # ~2000 events/user
    base = spark.range(n_events).select(F.col("id").alias("event_id"))
    h = F.xxhash64(F.col("event_id"), F.lit(42))
    span_s = 30 * 86400
    df = base.select(
        "event_id",
        F.timestamp_seconds(
            F.lit(1704067200) + F.pmod(h, F.lit(span_s))
        ).alias("ts"),
        F.pmod(F.xxhash64(F.col("event_id"), F.lit(7)), F.lit(n_users)).alias(
            "user_id"
        ),
        F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.pmod(F.xxhash64(F.col("event_id"), F.lit(13)), F.lit(len(TYPES))) + 1)
            .cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64(F.col("event_id"), F.lit(99)), F.lit(10_000)) / 100.0)
        .alias("value"),
    )
    df.repartition(32).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    print(f"generated {n} events in {time.time()-t0:.0f}s -> {path}", file=sys.stderr)
    spark.stop()
    return path


def run_once(path: str, cores: int, suite: str = "analytics") -> dict:
    from pyspark.sql import functions as F

    from yatsm_spark.operators.series import (
        cohort_retention,
        funnel,
        interval_overlap_join,
    )
    from yatsm_spark.session import get_spark

    spark = get_spark(
        f"bench_analytics_{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    ev = spark.read.parquet(path)
    walls: dict[str, float] = {}

    if suite == "sketch":
        # part-11 family: CM heavy-hitter tier (build+cascade+probe),
        # Hampel rolling-median/MAD flags, rolling 7d distinct actives
        from yatsm_spark.operators.series import hampel_flags, rolling_active
        from yatsm_spark.operators.sketch import (
            cm_candidates,
            cm_cascade,
            cm_sketch,
            cm_topk,
        )

        # warm the scan + JVM before timing: the first heavy job in a
        # fresh session pays page-cache first-touch and codegen/JIT
        # warmup, which the per-stage probe showed dominating the first
        # measured job at local[32] (cm_topk_full ran 17.6 s AFTER
        # warmup in the same session where a cold cm_sketch took 82.9 s)
        ev.count()

        t0 = time.time()
        sk1d = cm_cascade(cm_sketch(ev, "1h"), "1d")
        cm_topk(sk1d, cm_candidates(ev, "1h", m=8), "1d", topk=5).write.format(
            "noop"
        ).mode("overwrite").save()
        walls["cm_topk"] = time.time() - t0

        t0 = time.time()
        hampel_flags(ev, order_tiebreak="event_id").write.format("noop").mode(
            "overwrite"
        ).save()
        walls["hampel"] = time.time() - t0

        t0 = time.time()
        rolling_active(ev, days=7).write.format("noop").mode(
            "overwrite"
        ).save()
        walls["wau"] = time.time() - t0

        walls["total"] = sum(walls.values())
        spark.stop()
        return walls

    t0 = time.time()
    funnel(ev, ["view", "click", "purchase"]).write.format("noop").mode(
        "overwrite"
    ).save()
    walls["funnel"] = time.time() - t0

    t0 = time.time()
    cohort_retention(ev).write.format("noop").mode("overwrite").save()
    walls["cohort"] = time.time() - t0

    t0 = time.time()
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    interval_overlap_join(
        purch, errors, ts_col="ts", key_cols=("user_id",), bin_seconds=3600
    ).write.format("noop").mode("overwrite").save()
    walls["interval"] = time.time() - t0

    walls["total"] = sum(walls.values())
    spark.stop()
    return walls


def summarize(out_path: str) -> None:
    rows = [json.loads(x) for x in open(out_path)] if os.path.exists(out_path) else []
    by: dict[tuple, list] = {}
    for r in rows:
        by.setdefault((r["events"], r["cores"]), []).append(r["walls"]["total"])
    print("level mins:")
    for (n, c), ws in sorted(by.items()):
        print(f"  {n} events @ local[{c}]: min {min(ws):.1f}s over {len(ws)} legs")
    for n in sorted({k[0] for k in by}):
        if (n, 8) in by and (n, 32) in by:
            eff = (min(by[(n, 8)]) / min(by[(n, 32)])) / 4
            print(f"strong eff @ {n}: {eff:.2f}")
        if (n, 8) in by and (n * 4, 32) in by:
            eff = min(by[(n, 8)]) / min(by[(n * 4, 32)])
            print(f"weak eff {n}@8 vs {n*4}@32: {eff:.2f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--suite", choices=("analytics", "sketch"),
                    default="analytics")
    ap.add_argument("--summarize", action="store_true")
    args = ap.parse_args()
    if args.out is None:
        args.out = (DEFAULT_OUT if args.suite == "analytics"
                    else DEFAULT_OUT.replace(".jsonl", "_sketch.jsonl"))
    if args.summarize:
        summarize(args.out)
        return
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    path = ensure_data(args.events)
    for cores in (8, 32):
        walls = run_once(path, cores, args.suite)
        rec = {"events": args.events, "cores": cores, "walls": walls,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
