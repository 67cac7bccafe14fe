"""JSONL (ndjson) source with a corrupt-record quarantine lane.

Web-scale caption/metadata feeds arrive overwhelmingly as
newline-delimited JSON (CommonCrawl sidecars, LAION metadata dumps,
API export logs — the reference itself stores API responses as JSON text
columns, corpusama/database/database.py). At 10^12 rows two ingestion
mistakes are fatal and both are defaults somewhere:

- **schema inference** samples the input and silently locks in whatever
  the sample showed — a rare-but-valid field becomes a corrupt record a
  week later. The reader here REQUIRES an explicit schema.
- **DROPMALFORMED** silently deletes broken lines — at scale "0.01%
  dropped" is 10^8 rows nobody can audit. The reader here runs
  PERMISSIVE with ``columnNameOfCorruptRecord`` and splits the result
  into (clean, quarantine) so every malformed line is retained with its
  raw text for triage, and the clean lane is guaranteed fully-parsed.

Spark's JSON reader is scan-stage JVM (Jackson inside whole-stage
codegen, splittable by newline) — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """Read newline-delimited JSON under an EXPLICIT schema; returns
    ``(clean, quarantine)``. ``schema`` is a Spark DDL string WITHOUT
    the corrupt column (added internally). Quarantine rows carry the
    raw line plus a best-effort parse of the fields that did decode.

    A row lands in quarantine when it is unparseable JSON *or* when any
    declared field failed to convert (PERMISSIVE nulls the bad field and
    fills ``_corrupt_record`` — both cases surface the raw line).
    Multi-line objects are NOT supported by design: multiLine JSON makes
    the file unsplittable, which is an ingestion anti-pattern at scale.
    """
    if CORRUPT_COL in schema:
        raise ValueError(f"schema must not declare {CORRUPT_COL}")
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # Spark requires caching/materialization barriers before filtering on
    # the corrupt column alone; referencing data columns alongside it (as
    # both lanes below do) is the supported pattern.
    bad = F.col(CORRUPT_COL).isNotNull()
    clean = df.where(~bad).drop(CORRUPT_COL)
    quarantine = df.where(bad).withColumnRenamed(CORRUPT_COL, "raw_line")
    return clean, quarantine


def quarantine_report(quarantine: DataFrame) -> DataFrame:
    """One row per failure shape: malformed JSON vs type-mismatch per
    declared column (a field present in the raw line but NULL after
    parsing), with counts — the triage summary an ingestion on-call
    reads before deciding replay vs schema evolution."""
    data_cols = [c for c in quarantine.columns if c != "raw_line"]
    parses = F.when(
        F.isnull(F.try_parse_json(F.col("raw_line"))), F.lit("not_json")
    )
    shape = parses
    for c in data_cols:
        # field visible in the raw JSON text yet NULL after schema parse
        # -> that column's type rejected the value
        shape = shape.when(
            F.col(c).isNull()
            & F.col("raw_line").rlike(f'"{c}"\\s*:'),
            F.lit(f"bad_{c}"),
        )
    shape = shape.otherwise(F.lit("other"))
    return (
        quarantine.groupBy(shape.alias("failure"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("failure")
    )
