import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from news_rss_spark.session import get_spark

    scratch = tempfile.mkdtemp(prefix="nrs-test-wh-")
    s = get_spark("nrs-tests", cpus=4, shuffle_partitions=8, extra_conf={
        # keep the metastore/warehouse (needed only by the bucketed-table
        # tests) out of the repo working tree
        "spark.sql.warehouse.dir": f"{scratch}/warehouse",
        "spark.driver.extraJavaOptions":
            f"-XX:+UseParallelGC -Dderby.system.home={scratch}",
    })
    yield s
    s.stop()
