"""JSONL (newline-delimited JSON) ingest with schema enforcement and
corrupt-record quarantine — the wire format crawl pipelines actually
receive (WET/CDX sidecars, API dumps, log shippers) before anything is
columnar.

Two layers:

  * :func:`read_jsonl` — file ingest: ``spark.read.schema(...).json`` in
    PERMISSIVE mode with an explicit ``_corrupt`` quarantine column.  An
    EXPLICIT schema is non-negotiable at scale: schema inference is a
    full extra pass over 100 TB and infers from whatever the first
    sampled partition happens to contain.
  * :func:`parse_json_lines` — column ingest: the same contract applied
    to an already-loaded line column (Kafka values, WARC payload
    records) via ``from_json``; no files involved, fully codegen'd.

Quarantine contract (both layers): every input row survives — parsed
rows carry their typed columns, unparseable rows carry NULL typed
columns and ``corrupt=1`` plus the raw line for replay.  Dropping bad
rows silently is how ingest pipelines lose data; counting them is how
lineage metrics (jobs/corpus.py stage counts) stay truthful.

Scale shape: both paths are pure map-side expression work — zero
shuffles, zero Python; JSONL files are splittable by newline so scan
parallelism tracks input size (unlike e.g. gzip-whole-file inputs,
which serialize a 100 TB read onto one task per file — recompress or
chunk upstream).

Reference analog: none — YATSM reads GDAL rasters [U]; this is the
ingest edge the webtext north_star needs in front of the Iceberg table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Read JSONL files under an enforced schema; returns the typed
    columns plus ``corrupt`` (0/1) and ``raw`` (the offending line, NULL
    for clean rows).  PERMISSIVE mode: a malformed line yields NULL typed
    columns, never a task failure — one byte-flipped record in a 100 TB
    ingest must quarantine one ROW, not kill the job (FAILFAST) or
    silently vanish (DROPMALFORMED)."""
    # StructType.add MUTATES the receiver — build a fresh struct so the
    # caller's schema object survives (a shared schema constant otherwise
    # grows a _corrupt_record field and breaks every later use).
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    corrupt = F.col(CORRUPT_COL).isNotNull()
    return df.select(
        *[F.col(f.name) for f in schema.fields],
        corrupt.cast("int").alias("corrupt"),
        F.col(CORRUPT_COL).alias("raw"),
    )


def parse_json_lines(
    df: DataFrame,
    line_col: str,
    schema: T.StructType,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Parse a JSON-line STRING column under an enforced schema.

    ``from_json`` in PERMISSIVE mode returns an all-NULL struct for a
    malformed line; corrupt = struct is null OR every schema field came
    back NULL (a line of valid-JSON-but-wrong-shape, e.g. a bare array,
    also parses to all-NULL — that is quarantine-worthy, not data).
    ``keep_cols`` are passthrough columns (record position, source file,
    kafka offset) that must survive quarantine for replay.
    """
    parsed = F.from_json(F.col(line_col), schema)
    corrupt = F.lit(True)
    for f in schema.fields:
        corrupt = corrupt & parsed.getField(f.name).isNull()
    return df.select(
        *[F.col(c) for c in keep_cols],
        *[parsed.getField(f.name).alias(f.name) for f in schema.fields],
        F.coalesce(corrupt, F.lit(True)).cast("int").alias("corrupt"),
        F.when(corrupt | parsed.isNull(), F.col(line_col)).alias("raw"),
    )
