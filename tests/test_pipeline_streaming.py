"""Pipeline DAG executor (C1-C6) and streaming window (ST1-ST4) tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from ssis_to_dbt_spark.pipeline import Model, Pipeline, topo_order
from ssis_to_dbt_spark.streaming import (
    session_window,
    sliding_window,
    streaming_dedup,
    tumbling_window,
    with_watermark,
)


class TestTopoOrder:
    def test_linear_chain(self):
        models = {
            "c": Model("c", lambda f, v: None, deps=["b"]),
            "a": Model("a", lambda f, v: None),
            "b": Model("b", lambda f, v: None, deps=["a"]),
        }
        assert topo_order(models) == ["a", "b", "c"]

    def test_diamond_deterministic(self):
        models = {
            "d": Model("d", lambda f, v: None, deps=["b", "c"]),
            "b": Model("b", lambda f, v: None, deps=["a"]),
            "c": Model("c", lambda f, v: None, deps=["a"]),
            "a": Model("a", lambda f, v: None),
        }
        assert topo_order(models) == ["a", "b", "c", "d"]

    def test_cycle_raises(self):
        models = {
            "a": Model("a", lambda f, v: None, deps=["b"]),
            "b": Model("b", lambda f, v: None, deps=["a"]),
        }
        with pytest.raises(ValueError, match="cycle"):
            topo_order(models)

    def test_external_deps_ignored(self):
        # deps naming pipeline INPUTS (not models) don't block ordering
        models = {"m": Model("m", lambda f, v: None, deps=["raw_table"])}
        assert topo_order(models) == ["m"]


class TestPipelineRun:
    def test_vars_flow_and_refs_resolve(self, spark):
        src = spark.createDataFrame([(1, 5), (2, 50)], "k int, n int")

        def stg(frames, vars):
            return frames["src"].filter(F.col("n") > vars["min_n"])

        def agg(frames, vars):
            return frames["stg"].agg(F.count(F.lit(1)).alias("cnt"))

        pipe = Pipeline(spark, vars={"min_n": 10})
        pipe.add(Model("stg", stg))
        pipe.add(Model("agg", agg, deps=["stg"]))
        out = pipe.run({"src": src})
        assert out["agg"].first()["cnt"] == 1

    def test_table_materialization(self, spark, tmp_path):
        src = spark.createDataFrame([(1,), (2,)], "k int")
        pipe = Pipeline(spark)
        pipe.add(
            Model("tbl", lambda f, v: f["src"], materialization="table",
                  path=str(tmp_path / "tbl"))
        )
        pipe.add(Model("downstream", lambda f, v: f["tbl"].filter("k = 1"),
                       deps=["tbl"]))
        out = pipe.run({"src": src})
        assert out["downstream"].count() == 1
        assert spark.read.parquet(str(tmp_path / "tbl")).count() == 2


@pytest.fixture()
def events(spark):
    rows = [
        (1, "2024-01-01 00:01:00", 10, "a", 1.0),
        (2, "2024-01-01 00:04:00", 10, "a", 2.0),
        (3, "2024-01-01 00:11:00", 10, "b", 3.0),
        (4, "2024-01-01 01:00:00", 10, "a", 4.0),
        (5, "2024-01-01 00:02:00", 20, "a", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id int, ts string, user_id int, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestWindows:
    def test_tumbling_buckets(self, spark, events):
        out = tumbling_window(events, "ts", "10 minutes",
                              aggs={"n": F.count(F.lit(1))})
        buckets = {r["window_start"]: r["n"] for r in out.collect()}
        assert buckets[datetime.datetime(2024, 1, 1, 0, 0)] == 3
        assert buckets[datetime.datetime(2024, 1, 1, 0, 10)] == 1
        assert buckets[datetime.datetime(2024, 1, 1, 1, 0)] == 1

    def test_sliding_overlap(self, spark, events):
        out = sliding_window(events, "ts", "10 minutes", "5 minutes",
                             aggs={"n": F.count(F.lit(1))})
        # event at 00:01 belongs to windows starting 23:55 and 00:00
        starts = [r["window_start"] for r in out.collect()]
        assert datetime.datetime(2023, 12, 31, 23, 55) in starts

    def test_session_window_gap(self, spark, events):
        out = session_window(events, "ts", "30 minutes", keys=["user_id"],
                             aggs={"n": F.count(F.lit(1))})
        per_user = {}
        for r in out.collect():
            per_user.setdefault(r["user_id"], []).append(r["n"])
        # user 10: events at 00:01/00:04/00:11 in one session; 01:00 alone
        assert sorted(per_user[10]) == [1, 3]
        assert per_user[20] == [1]

    def test_watermark_passthrough_on_batch(self, spark, events):
        assert with_watermark(events, "ts", "1 hour").count() == events.count()

    def test_streaming_dedup_batch(self, spark, events):
        dup = events.unionByName(events)
        assert streaming_dedup(dup, ["event_id"], "ts").count() == events.count()
