from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from mel_tnnt_spark.session import get_spark

    s = get_spark("mel-tnnt-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def code_files(spark):
    from mel_tnnt_spark.datagen import code_files_df

    return code_files_df(spark, n_rows=120, seed=42).cache()
