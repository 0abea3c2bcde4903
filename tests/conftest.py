from __future__ import annotations

import pytest

from etl_wlg_metlink_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return build_session(app_name="etl_wlg_metlink_spark-tests", shuffle_partitions=4)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
