from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codeclone_spark.session import get_spark  # noqa: E402
from codeclone_spark.synth import ensure_profile  # noqa: E402

CLIPS_BASE = "/root/repo/testclips"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ccspark-tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_dir() -> str:
    return ensure_profile(CLIPS_BASE, "tiny")


@pytest.fixture(scope="session")
def tiny_manifest(tiny_dir) -> dict:
    import json

    with open(os.path.join(tiny_dir, "manifest.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def tiny_run(spark, tiny_dir, tmp_path_factory):
    """One shared full validation run over the tiny corpus."""
    from codeclone_spark.plans.runner import RunConfig, run

    out = str(tmp_path_factory.mktemp("tiny_run"))
    return run(spark, RunConfig(data_dir=tiny_dir, out_dir=out))
