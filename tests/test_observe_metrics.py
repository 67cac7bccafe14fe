"""Observation-based in-flight metrics (plans/metrics.py): the observed
counts must equal a recount of the materialized rows, with no second
aggregation pass."""

from corpusama_spark.pipeline import FilterConfig, run_pipeline
from corpusama_spark.plans.metrics import metrics_row, observe_decisions
from corpusama_spark.sources.synth import captions_df


def test_observed_metrics_match_recount(spark):
    caps = captions_df(spark, 400, partitions=8)
    observed, obs = observe_decisions(run_pipeline(caps, FilterConfig()))
    rows = observed.collect()  # the ONE action; metrics ride along
    got = metrics_row(obs)
    assert got["n_rows"] == len(rows) == 400
    assert got["n_keep"] == sum(r.keep for r in rows)
    recount: dict = {}
    for r in rows:
        if r.drop_reason is not None:
            recount[r.drop_reason] = recount.get(r.drop_reason, 0) + 1
    for k, v in got.items():
        if k.startswith("n_") and k not in ("n_rows", "n_keep"):
            assert v == recount.get(k[2:], 0), k
    # every drop the pipeline produced is named in the metrics row
    assert sum(v for k, v in got.items()
               if k not in ("n_rows", "n_keep")) == sum(recount.values())


def test_observed_metrics_survive_write(tmp_path, spark):
    caps = captions_df(spark, 100, partitions=4)
    observed, obs = observe_decisions(run_pipeline(caps, FilterConfig()))
    observed.write.mode("overwrite").parquet(str(tmp_path / "dec"))
    got = metrics_row(obs)
    back = spark.read.parquet(str(tmp_path / "dec"))
    assert got["n_rows"] == 100
    assert got["n_keep"] == back.where("keep").count()
