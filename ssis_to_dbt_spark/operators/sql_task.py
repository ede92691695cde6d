"""ExecuteSQLTask analog (SURVEY §1.1): arbitrary SQL over registered views.

Reference semantics (/root/reference/src/parser/models.py:122-130): an
ExecuteSQLTask carries a SQL statement and a ``result_set`` contract —
None (side effect), SingleRow, or Full.  Spark-first mapping: register the
pipeline's DataFrames as temp views and hand the statement to ``spark.sql``
— Catalyst compiles it into the same optimized plans as the DataFrame API,
so SQL-expressed models interoperate freely with operator-built ones (a
``spark.sql`` result is just another DataFrame in the pipeline DAG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_views(spark: SparkSession, frames: dict[str, DataFrame]) -> None:
    """Expose DataFrames to SQL by name (the dbt source()/ref() analog for
    the SQL surface)."""
    for name, df in frames.items():
        df.createOrReplaceTempView(name)


def execute_sql(
    spark: SparkSession,
    statement: str,
    result_set: str = "Full",
):
    """Run a statement with the SSIS result_set contract:

    - ``"None"``: execute for effect, return None (DDL/DML statements).
    - ``"SingleRow"``: return the first Row (scalar/watermark reads —
      InventorySync's TOP-1 sync-log lookup).
    - ``"Full"``: return the DataFrame (lazy — composes into the DAG).
    """
    df = spark.sql(statement)
    if result_set == "None":
        df.collect()
        return None
    if result_set == "SingleRow":
        return df.first()
    return df
