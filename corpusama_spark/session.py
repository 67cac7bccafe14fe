"""SparkSession factory with scale-oriented defaults.

The same settings are used for tests (local[*]) and for cluster runs via
``spark-submit --py-files``; only master/parallelism differ. AQE is enabled so
skewed shuffles re-plan at runtime; Arrow execution is enabled for all pandas
UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str | None = None,
    app_name: str = "corpusama_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Args:
        cores: int N -> ``local[N]``; None -> $SPARK_GRAFT_CPUS or ``local[*]``.
            On a real cluster, pass the master URL via ``extra_conf`` /
            spark-submit instead.
        shuffle_partitions: defaults to 2x cores locally (small-file friendly);
            a cluster run should set this to ~2-3x total executor cores.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, 2 * int(cores))
        except (TypeError, ValueError):
            shuffle_partitions = 32

    # one BLAS/OpenMP thread per Python worker: with W workers each spawning
    # an ncores-wide pool (numpy/OpenBLAS default), W x ncores threads thrash
    # the box and parallel efficiency collapses; UDF batches are small enough
    # that intra-op threading buys nothing
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # runtime re-planning: skew-join splitting, partition coalescing
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow exchange for every pandas UDF on the hot path
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # timestamps without timezone surprises in parquet round-trips
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def assert_no_row_python(df) -> None:
    """Fail if the physical plan contains row-at-a-time Python evaluation.

    The reference is row-at-a-time pandas everywhere; our contract
    (BASELINE.json input_hint: "no per-row Python") allows only Arrow-batched
    exchange. ``BatchEvalPython`` = pickled row UDF (forbidden);
    ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas`` are fine.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "BatchEvalPython" in plan:
        raise AssertionError(
            "row-at-a-time Python UDF found in physical plan:\n" + plan
        )
