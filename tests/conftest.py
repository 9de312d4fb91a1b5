import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fdblucene_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fdblucene-tests", cores=int(os.environ.get("TEST_CORES", "8")),
                  extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "4096"})
    yield s


@pytest.fixture()
def tmp_index_root():
    d = tempfile.mkdtemp(prefix="sparklucene-idx-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
