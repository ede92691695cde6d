"""Split each bench query's wall into DataFrame-construction time (driver:
py4j plan building + any bounded collects the builder runs) vs action time
(the noop write).  Optimization-round diagnostic for the r14 finding that
driver-side plan construction can dominate on high-latency py4j.

Usage: python tools/profile_split.py [names...] [--sf DIR]
Defaults to every bench HEADLINE entry.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from ssis_to_dbt_spark import catalog
from ssis_to_dbt_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    import bench

    names = args or list(bench.HEADLINE)

    spark = build_session(
        app_name="profile_split",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from ssis_to_dbt_spark.sources.readers import testdata

    for df in testdata(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    spark.range(256, numPartitions=64).mapInArrow(
        lambda it: it, "id long"
    ).collect()
    spark.range(256, numPartitions=64).groupBy("id").applyInPandas(
        lambda pdf: pdf, "id long"
    ).collect()

    out = {}
    for name in names:
        fn = catalog.ALL_QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        out[name] = {
            "construct": round(t1 - t0, 3),
            "action": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
