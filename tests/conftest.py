import pytest

from ssis_to_dbt_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="ssis_to_dbt_spark_tests",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
