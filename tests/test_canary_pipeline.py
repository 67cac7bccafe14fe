"""Pipeline canaries (X250): all five canaries get their expected
verdict through the REAL pipeline, scrub-bait comes back scrubbed,
stripping removes exactly the canaries, a broken gate is caught."""

from pyspark.sql import functions as F

from corpusama_spark.pipeline import FilterConfig, run_pipeline
from corpusama_spark.sources.synth import captions_df


def test_canaries_end_to_end(spark):
    from corpusama_spark.operators.validation import (
        canary_rows,
        inject_canaries,
        strip_canaries,
        verify_canaries,
    )

    caps = captions_df(spark, 200, partitions=4)
    canaries = canary_rows(spark)
    injected = inject_canaries(caps, canaries)
    decisions = run_pipeline(injected, FilterConfig())

    report = {r.canary: r for r in verify_canaries(decisions, canaries).collect()}
    assert len(report) == 5
    for name, r in report.items():
        assert r.ok, (name, r)
    assert report["clean"].actual_keep is True
    assert report["empty_caption"].actual_keep is False
    assert report["corrupt_image"].actual_keep is False
    assert report["scrub_bait"].scrubbed_ok

    shipped = strip_canaries(decisions)
    assert shipped.count() == 200
    assert shipped.where(F.col("image_id").startswith("__canary__")).count() == 0


def test_broken_gate_is_caught(spark):
    from corpusama_spark.operators.validation import (
        canary_rows,
        inject_canaries,
        verify_canaries,
    )

    caps = captions_df(spark, 50, partitions=2)
    canaries = canary_rows(spark)
    decisions = run_pipeline(inject_canaries(caps, canaries), FilterConfig())
    # simulate a config push that flips everything to keep=true
    broken = decisions.withColumn("keep", F.lit(True))
    rep = {r.canary: r for r in verify_canaries(broken, canaries).collect()}
    assert not rep["empty_caption"].ok and not rep["corrupt_image"].ok
    assert rep["clean"].ok

    # a canary vanishing from the output fails loudly too
    missing = decisions.where(F.col("image_id") != "__canary__clean")
    rep2 = {r.canary: r for r in verify_canaries(missing, canaries).collect()}
    assert not rep2["clean"].ok and rep2["clean"].actual_keep is None
