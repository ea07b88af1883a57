"""Shared pytest fixtures (SURVEY.md §5: hermetic session, fixed
shuffle partitions, the analog of the reference's autouse mock
environment in tests/conftest.py:27-45)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_8x8_spark.session import get_spark

    s = get_spark("pytest", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
