"""Streaming ingest drift monitor: per-microbatch PSI vs a reference.

The batch drift lane (operators/drift.py) answers "did the corpus
move?" after the fact; an INGEST pipeline wants the same answer while
data lands — every arriving batch scored against the frozen reference
histogram, the score appended to a metrics table next to the lineage
the checkpointed writer already keeps (north rule: per-partition
lineage + metrics). A batch whose PSI jumps is quarantined BEFORE it
pollutes the corpus.

Shape: Structured Streaming file source → ``foreachBatch``. Inside the
batch function everything is the same relational algebra as the batch
operator — one map-side-combinable groupBy over fixed-width bins, a
broadcast join against the (tiny, frozen) reference histogram, a
one-row PSI — and the result row (epoch, n_rows, psi, coverage) is
appended to the metrics directory. The checkpoint gives exactly-once
per-epoch metrics across restarts: a drained source re-run adds no
rows (same guarantee test_streaming pins for the filter sink).

Why foreachBatch and not a windowed-aggregation sink: the monitor's
unit of quarantine IS the ingest batch (what you would roll back), not
an event-time window; per-batch foreachBatch also keeps the metric
available immediately at availableNow drains instead of waiting for a
watermark to close a window. An event-time windowed variant is the
batch operator applied to the landed data — no extra machinery needed.

Scale: state is zero (the reference is broadcast, each batch
aggregates independently); the metrics table grows one row per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["reference_histogram", "stream_batch_drift"]


def reference_histogram(
    df: DataFrame,
    value_col: str = "value",
    bin_width: float = 50.0,
    n_bins: int = 10,
) -> DataFrame:
    """(bin, ref_n) fixed-width histogram of the frozen reference
    corpus — compute once, it broadcasts into every batch score."""
    bucket = F.least(
        F.greatest(
            F.floor(F.col(value_col) / F.lit(float(bin_width))), F.lit(0)
        ),
        F.lit(int(n_bins) - 1),
    ).cast("long")
    return (
        df.select(bucket.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("ref_n"))
    )


def stream_batch_drift(
    spark: SparkSession,
    src_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    ref_hist: DataFrame,
    value_col: str = "value",
    bin_width: float = 50.0,
    n_bins: int = 10,
    schema=None,
):
    """Drain ``src_dir`` (parquet file stream) with availableNow and
    append one PSI row per microbatch to ``metrics_dir``. Returns the
    started query (caller awaits termination). Bins empty on either
    side are excluded from the sum with coverage exposed — same
    semantics as operators/drift.psi_report."""
    ref = ref_hist.collect()
    ref_rows = [(int(r["bin"]), int(r["ref_n"])) for r in ref]
    n_ref = sum(n for _, n in ref_rows)
    if schema is None:
        schema = spark.read.parquet(src_dir).schema
    bucket = F.least(
        F.greatest(
            F.floor(F.col(value_col) / F.lit(float(bin_width))), F.lit(0)
        ),
        F.lit(int(n_bins) - 1),
    ).cast("long")

    def _score(batch: DataFrame, epoch_id: int) -> None:
        s = batch.sparkSession
        refdf = s.createDataFrame(ref_rows, "bin long, ref_n long")
        cur = (
            batch.select(bucket.alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").cast("long").alias("cn"))
        )
        j = cur.join(F.broadcast(refdf), "bin", "full").select(
            F.coalesce(F.col("cn"), F.lit(0)).alias("cn"),
            F.coalesce(F.col("ref_n"), F.lit(0)).alias("rn"),
        )
        used = (F.col("cn") > 0) & (F.col("rn") > 0)
        tot = j.agg(F.sum("cn").alias("n_cur")).collect()[0]
        n_cur = int(tot["n_cur"] or 0)
        if n_cur == 0:
            return
        pr = F.col("rn") / F.lit(float(n_ref))
        pc = F.col("cn") / F.lit(float(n_cur))
        row = j.agg(
            F.round(
                F.sum(
                    F.when(used, (pc - pr) * F.log(pc / pr)).otherwise(
                        F.lit(0.0)
                    )
                ),
                6,
            ).alias("psi"),
            F.round(
                F.sum(F.when(used, F.col("cn")).otherwise(0))
                / F.lit(float(n_cur)),
                6,
            ).alias("cur_cover"),
        ).collect()[0]
        s.createDataFrame(
            [(int(epoch_id), n_cur, float(row["psi"]),
              float(row["cur_cover"]))],
            "epoch long, n_rows long, psi double, cur_cover double",
        ).write.mode("append").parquet(metrics_dir)

    return (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
