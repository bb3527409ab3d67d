"""Shared Spark session for the test suite (local, small parallelism)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from flod_spark.session import get_spark

    s = get_spark("flod-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    """The sf0.01 testdata dir (the driver's gate scale) — same sibling
    convention as sf01_dir; skip where the data isn't present."""
    d = str(Path(SF_DIR).parent / "sf0.01")
    if not Path(d).is_dir():
        pytest.skip(f"sf0.01 testdata not present at {d}")
    return d


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    """The sf0.1 testdata dir for scale-bound tests: honor the same
    SPARK_GRAFT_SF_DIR convention bench.py uses, else the sf0.1 sibling
    of SF_DIR; skip (not error) on machines without that data."""
    import os

    d = os.environ.get("SPARK_GRAFT_SF_DIR") or str(Path(SF_DIR).parent / "sf0.1")
    if not Path(d).is_dir():
        pytest.skip(f"sf0.1 testdata not present at {d}")
    return d
