"""Source/sink operator tests (S3-S10, D1/D2/D5, C2/C6)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssis_to_dbt_spark.pipeline import Model, Pipeline, foreach_partition_values
from ssis_to_dbt_spark.sources.readers import (
    SourceRegistry,
    read_csv,
    read_excel,
    read_json,
    read_rest_api,
    testdata as load_testdata,
)
from ssis_to_dbt_spark.sources.writers import (
    append,
    audit_append,
    overwrite,
    partition_overwrite,
    write_csv,
    write_json,
)

SCHEMA = T.StructType(
    [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
)


@pytest.fixture()
def kv(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)


class TestReaders:
    def test_csv_roundtrip_with_declared_schema(self, spark, kv, tmp_path):
        p = str(tmp_path / "csv")
        write_csv(kv, p)
        back = read_csv(spark, p, SCHEMA)
        assert sorted((r["k"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]
        assert back.schema == SCHEMA  # declared, not inferred

    def test_json_roundtrip(self, spark, kv, tmp_path):
        p = str(tmp_path / "json")
        write_json(kv, p)
        back = read_json(spark, p, SCHEMA)
        assert back.count() == 2

    def test_excel_shim_refuses_real_xlsx(self, spark):
        with pytest.raises(NotImplementedError, match="CSV"):
            read_excel(spark, "/tmp/book.xlsx", SCHEMA)

    def test_rest_refuses_live_urls(self, spark):
        with pytest.raises(NotImplementedError, match="out-of-band"):
            read_rest_api(spark, "https://api.example.com/items", SCHEMA)

    def test_rest_reads_landed_json(self, spark, kv, tmp_path):
        p = str(tmp_path / "landed")
        write_json(kv, p)
        assert read_rest_api(spark, p, SCHEMA).count() == 2

    def test_source_registry_binding(self, spark, kv, tmp_path):
        p = str(tmp_path / "pq")
        kv.write.parquet(p)
        reg = SourceRegistry(spark)
        reg.declare_source("stg", "kv", p, SCHEMA)
        assert reg.source("stg", "kv").count() == 2
        reg.register_model("stg_kv", reg.source("stg", "kv").filter("k = 1"))
        assert reg.ref("stg_kv").count() == 1

    def test_testdata_loads_all_tables(self, spark):
        t = load_testdata(spark, "/root/testdata/sf0.001")
        assert set(t) >= {"lineitem", "orders", "customer", "events", "documents"}
        # events.ts converted from raw nanos to a usable timestamp
        assert dict(t["events"].dtypes)["ts"] == "timestamp"


class TestWriters:
    def test_append_then_overwrite(self, spark, kv, tmp_path):
        p = str(tmp_path / "t")
        append(kv, p)
        append(kv, p)
        assert spark.read.parquet(p).count() == 4
        overwrite(kv, p)  # D1: TRUNCATE+reload
        assert spark.read.parquet(p).count() == 2

    def test_partition_overwrite_touches_only_listed_partitions(self, spark, tmp_path):
        p = str(tmp_path / "pt")
        df = spark.createDataFrame(
            [("2024-01-01", 1), ("2024-01-02", 2)], "d string, v int"
        )
        partition_overwrite(df, p, ["d"])
        # D2: rewrite ONLY partition 2024-01-02
        upd = spark.createDataFrame([("2024-01-02", 99)], "d string, v int")
        partition_overwrite(upd, p, ["d"])
        # partition columns come back type-inferred (string date -> DateType)
        rows = {str(r["d"]): r["v"] for r in spark.read.parquet(p).collect()}
        assert rows == {"2024-01-01": 1, "2024-01-02": 99}

    def test_audit_append(self, spark, tmp_path):
        p = str(tmp_path / "audit")
        audit_append(spark, p, {"sync_type": "Inventory", "records": 42})
        audit_append(spark, p, {"sync_type": "Inventory", "records": 7})
        assert spark.read.parquet(p).count() == 2


class TestContainers:
    def test_foreach_loop_rebinds_var(self, spark):
        src = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "g string, v int"
        )
        pipe = Pipeline(spark)
        pipe.add(
            Model("filtered", lambda f, v: f["src"].filter(F.col("g") == v["grp"]))
        )
        results = foreach_partition_values(pipe, {"src": src}, "grp", ["a", "b"])
        assert results["a"]["filtered"].count() == 2
        assert results["b"]["filtered"].count() == 1

    def test_parallel_table_writes(self, spark, kv, tmp_path):
        pipe = Pipeline(spark)
        pipe.add(Model("t1", lambda f, v: f["src"], materialization="table",
                       path=str(tmp_path / "t1")))
        pipe.add(Model("t2", lambda f, v: f["src"].filter("k = 1"),
                       materialization="table", path=str(tmp_path / "t2")))
        out = pipe.run({"src": kv}, parallel_tables=True)
        assert out["t1"].count() == 2
        assert out["t2"].count() == 1


class TestUpdateFlagPartitioned:
    def test_touches_only_affected_partitions(self, spark, tmp_path):
        from ssis_to_dbt_spark.sources.writers import update_flag_partitioned

        p = str(tmp_path / "flags")
        df = spark.createDataFrame(
            [(d, i, 0) for d in ("d1", "d2", "d3") for i in range(10)],
            "part string, id int, flag int",
        )
        df.write.partitionBy("part").parquet(p)
        # flip flags only where part='d2' and id < 5
        update_flag_partitioned(
            spark, p, ["part"], "flag",
            lambda f: (f["part"] == "d2") & (f["id"] < 5), 1,
        )
        back = spark.read.parquet(p)
        assert back.count() == 30
        flipped = {(r["part"], r["id"]) for r in back.filter("flag = 1").collect()}
        assert flipped == {("d2", i) for i in range(5)}
