"""Regenerate the committed golden-fixture parquets for the CCDC queries
whose semantics are not SQL-expressible (segmentation / changemap / RF
classification).

The fixtures turn those queries' driver correctness checks from rows-only
into full value-hash checks: the DuckDB oracle is simply
``SELECT ... FROM '<fixture>.parquet'``, so ANY drift in the deterministic
kernel pipeline (seeded datagen -> rollup -> CCDC fit -> classify) shows
up as a hash mismatch.  Regenerate ONLY when an intentional semantic
change lands, and review the diff like code:

    python scripts/make_golden_fixtures.py

Determinism prerequisites (all hold by construction): seeded synthetic
crawl, pure-numpy kernels with fixed iteration caps, seeded RF, UTC
session.  tests/test_determinism.py guards run-to-run stability.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")
GOLDEN_QUERIES = (
    "ccdc_segments_synth",
    "ccdc_changemap_synth",
    "ccdc_classify_synth",
    "multimodal_media_synth",
    "pheno_longterm_synth",
    "stl_decompose_synth",
    "hw_forecast_synth",
)


def main() -> None:
    import __spark_entry__ as entry
    from yatsm_spark.session import get_spark

    # the golden queries are sf-independent synthetics, but they receive a
    # data dir per the driver contract — overridable, never hardcoded-only
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    spark = get_spark("golden_fixtures", master="local[8]", shuffle_partitions=16)
    qs = entry.queries()
    for name in GOLDEN_QUERIES:
        pdf = qs[name](spark, sf_dir).toPandas()
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        out = os.path.join(FIXTURE_DIR, f"{name}.parquet")
        pq.write_table(table, out, compression="zstd")
        print(f"wrote {out}: {len(pdf)} rows, cols={list(pdf.columns)}")
    spark.stop()


if __name__ == "__main__":
    main()
