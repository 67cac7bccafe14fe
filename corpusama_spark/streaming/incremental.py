"""Incremental / streaming ingest of the captions table.

The reference's incremental contract is `get_new_records`: resume from the
stored high-water mark, abort/restart safely, never double-process
(corpusama/source/reliefweb.py:47-75, S2 in SURVEY.md §2.1). Its Spark-native
equivalent is Structured Streaming over the input table directory with
`Trigger.AvailableNow`:

- the stream checkpoint directory IS the high-water mark (file-source offsets
  → with an Iceberg catalog, snapshot ids);
- each trigger processes exactly the files not yet committed, then stops —
  the same "catch up, then exit" shape as the reference's harvest runs;
- the filter plan is the zero-shuffle `narrow_decisions` variant, so the
  stream needs no watermarks or state store: every micro-batch is
  embarrassingly parallel and the sink append is idempotent per offset
  range (exactly-once for the parquet/file sink).

A crashed run restarts from the checkpoint and reprocesses at most one
uncommitted micro-batch — the reference's "can be aborted and restarted
safely" (reliefweb.py:55-56) with stronger guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from corpusama_spark.pipeline import FilterConfig, narrow_decisions
from corpusama_spark.sources.synth import CAPTIONS_SCHEMA


def read_caption_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a captions parquet directory."""
    reader = spark.readStream.schema(CAPTIONS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def stream_filter(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    config: FilterConfig = FilterConfig(),
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming filter job; returns the StreamingQuery.

    With ``available_now`` (default) the query drains everything new since
    the last checkpointed offset and terminates — call `.awaitTermination()`.
    With ``available_now=False`` it runs continuously on new files.
    """
    captions = read_caption_stream(spark, input_path)
    decisions = narrow_decisions(captions, config)
    writer = (
        decisions.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
