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


class TestRunWithRetries:
    def _base(self, spark):
        return spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a")], "k int, g string"
        )

    def test_transient_failure_retries_to_success(self, spark):
        from ssis_to_dbt_spark.pipeline import run_with_retries

        state = {"first": True}

        def flaky(frames, _v):
            if state["first"]:
                state["first"] = False
                raise RuntimeError("transient")
            return frames["src"].groupBy("g").count()

        pipe = Pipeline(spark).add(Model("agg", flaky))
        frames, report = run_with_retries(
            pipe, {"src": self._base(spark)}, max_retries=2
        )
        assert report.phase == "complete"
        assert report.runs["agg"].status == "success"
        assert report.runs["agg"].attempts == 2
        assert frames["agg"].count() == 2

    def test_exhausted_budget_fails_and_skips_dependents_only(self, spark):
        from ssis_to_dbt_spark.pipeline import run_with_retries

        def bad(_f, _v):
            raise RuntimeError("permanent")

        pipe = (
            Pipeline(spark)
            .add(Model("bad", bad))
            .add(Model("child", lambda f, _v: f["bad"], deps=["bad"]))
            .add(Model("healthy", lambda f, _v: f["src"].filter("k > 1")))
        )
        frames, report = run_with_retries(
            pipe, {"src": self._base(spark)}, max_retries=1
        )
        assert report.phase == "failed"
        assert report.runs["bad"].status == "failed"
        assert report.runs["bad"].attempts == 2  # initial + 1 retry
        assert len(report.runs["bad"].errors) == 2
        assert report.runs["child"].status == "skipped"
        assert report.runs["healthy"].status == "success"
        assert frames["healthy"].count() == 2

    def test_diagnose_hook_can_replace_the_build(self, spark):
        from ssis_to_dbt_spark.pipeline import run_with_retries

        def bad(_f, _v):
            raise RuntimeError("wrong column")

        def fixed(frames, _v):
            return frames["src"].filter("g = 'a'")

        seen = []

        def diagnose(name, exc, attempt):
            seen.append((name, str(exc), attempt))
            return fixed

        pipe = Pipeline(spark).add(Model("m", bad))
        frames, report = run_with_retries(
            pipe, {"src": self._base(spark)}, max_retries=1,
            on_diagnose=diagnose,
        )
        assert report.runs["m"].status == "success"
        assert seen == [("m", "wrong column", 1)]
        assert frames["m"].count() == 2

    def test_validation_failure_enters_retry_loop(self, spark):
        from ssis_to_dbt_spark.pipeline import run_with_retries

        calls = {"n": 0}

        def check(df):
            calls["n"] += 1
            if calls["n"] == 1:
                raise AssertionError("row count drifted")

        pipe = Pipeline(spark).add(Model("m", lambda f, _v: f["src"]))
        _, report = run_with_retries(
            pipe, {"src": self._base(spark)}, max_retries=2,
            validate={"m": check},
        )
        assert report.runs["m"].status == "success"
        assert report.runs["m"].attempts == 2
        assert "AssertionError" in report.runs["m"].errors[0]

    def test_table_model_materializes_inside_the_loop(self, spark, tmp_path):
        from ssis_to_dbt_spark.pipeline import run_with_retries

        path = str(tmp_path / "m_tbl")
        pipe = Pipeline(spark).add(
            Model("m", lambda f, _v: f["src"], materialization="table",
                  path=path)
        )
        frames, report = run_with_retries(pipe, {"src": self._base(spark)})
        assert report.runs["m"].status == "success"
        assert spark.read.parquet(path).count() == 3
        assert frames["m"].count() == 3


class TestCurationOrchestration:
    """The orchestrated Pipeline form of the curation chain (stage-boundary
    parquet materialization, curation.py) must reproduce the one-plan
    catalog query exactly — the stages are SHARED code, this pins the
    orchestration seams (parquet round-trip per stage, dep wiring,
    vars-driven dsir_k)."""

    def test_orchestrated_equals_composed_query(self, spark, tmp_path):
        from ssis_to_dbt_spark import catalog
        from ssis_to_dbt_spark.curation import run_curation

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        frames = run_curation(spark, docs, str(tmp_path / "cur"))

        rows = catalog.q_curation_pipeline_docs(spark, sf).collect()
        by = {}
        for r in rows:
            by.setdefault(r["component"], []).append(r)

        # per-stage id sets equal the composed query's components
        def ids(name):
            return {r["doc_id"] for r in frames[name].select("doc_id").collect()}

        assert ids("gate") == {r["doc_id"] for r in by["gate"]}
        assert ids("contaminated") == {
            r["doc_id"] for r in by["contaminated"]
        }
        assert ids("clean") == {r["doc_id"] for r in by["clean"]}
        assert ids("selected") == {r["doc_id"] for r in by["dsir_sel"]}
        assert ids("mixed") == {r["doc_id"] for r in by["mixture"]}
        # the final packing is value-identical, not just id-identical
        packed = sorted(
            (r["doc_id"], r["seq_id"], r["start_tok"], r["end_tok"])
            for r in frames["packed"].collect()
        )
        want = sorted(
            (r["doc_id"], r["v1"], r["v2"], int(r["s1"]))
            for r in by["pack"]
        )
        assert packed == want and packed
        # every stage really materialized as parquet
        import os

        for stage in (
            "gate", "pruned", "deduped", "contaminated", "clean",
            "selected", "mixed", "packed",
        ):
            assert os.path.isdir(str(tmp_path / "cur" / stage)), stage

    def test_vars_override_dsir_k(self, spark, tmp_path):
        from ssis_to_dbt_spark.curation import run_curation

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        frames = run_curation(spark, docs, str(tmp_path / "cur5"), dsir_k=5)
        assert frames["selected"].count() == 5
