from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from environmental_stac_generator_spark.session import get_spark  # noqa: E402

# Overridable for hosts without the driver corpus (ADVICE r7: CI
# synthesizes a schema-faithful twin via tools/make_testdata.py)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    sp = get_spark(app_name="envstac-tests", master="local[4]", shuffle_partitions=4)
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
