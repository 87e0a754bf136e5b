from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from cosmoz_data_pipeline_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "scale_gate: oracle-parity gates that need a tools/scale_corpus.py "
        "corpus on disk (skipped when absent; run via `pytest -m scale_gate`)",
    )


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="cosmoz-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
