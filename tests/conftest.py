import importlib.util
import pathlib
import sys

import pytest

REFERENCE = pathlib.Path("/root/reference")
TESTDATA = pathlib.Path("/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from corpusama_spark.session import get_spark

    spark = get_spark(cores=8, app_name="corpusama_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def uninorm_ref():
    """The reference's normalizer, loaded by path as the in-process oracle.

    pipeline/ske_fr/uninorm_4.py is stdlib-only, so it imports cleanly without
    the reference's heavy dependencies. We never copy it — we run it.
    """
    path = REFERENCE / "pipeline/ske_fr/uninorm_4.py"
    spec = importlib.util.spec_from_file_location("uninorm_ref", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["uninorm_ref"] = mod
    spec.loader.exec_module(mod)
    return mod
