import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from table_ocr_spark.session import build_session

    spark = build_session(app_name="table_ocr_spark_tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
