"""dtsx ingestion tests: parse the reference's actual sample packages,
bind them to the engine, and execute end-to-end on tiny frames."""

from datetime import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from ssis_to_dbt_spark.dtsx import (
    bind_package,
    classify_sql,
    parse_dtsx,
    rewrite_tsql,
    run_package,
)
from ssis_to_dbt_spark.pipeline import topo_order

PKG_DIR = "/root/reference/samples/ssis_packages"


class TestParse:
    def test_sales_fact_structure(self):
        pkg = parse_dtsx(f"{PKG_DIR}/SalesFactETL.dtsx")
        assert pkg.name == "SalesFactETL"
        assert [t.task_type for t in pkg.tasks] == [
            "Microsoft.ExecuteSQLTask",
            "Microsoft.Pipeline",
            "Microsoft.ExecuteSQLTask",
        ]
        flow = pkg.tasks[1]
        assert [c.class_id.rsplit(".", 1)[-1] for c in flow.components] == [
            "OLEDBSource", "Lookup", "Lookup", "Lookup",
            "DerivedColumn", "OLEDBDestination",
        ]
        src = flow.components[0]
        assert [c.name for c in src.output_columns][:3] == [
            "SaleID", "CustomerID", "ProductID"
        ]
        assert src.output_columns[5].data_type == "numeric"
        assert (src.output_columns[5].precision, src.output_columns[5].scale) == (18, 2)
        derived = flow.components[4]
        assert derived.output_columns[0].expression == "[Quantity] * [UnitPrice]"
        assert len(pkg.constraints) == 2

    def test_variables_typed(self):
        pkg = parse_dtsx(f"{PKG_DIR}/SalesFactETL.dtsx")
        vals = pkg.variable_values()
        assert vals["User::StartDate"] == datetime(2024, 1, 1)
        assert vals["User::RowCount"] == 0

    def test_connection_managers(self):
        pkg = parse_dtsx(f"{PKG_DIR}/CustomerDataLoad.dtsx")
        names = [c.name for c in pkg.connection_managers]
        assert names == ["SourceDB", "TargetDW"]
        assert "CRMSRV" in pkg.connection_managers[0].connection_string

    def test_inventory_task_mix(self):
        pkg = parse_dtsx(f"{PKG_DIR}/InventorySync.dtsx")
        kinds = [t.task_type.rsplit(".", 1)[-1] for t in pkg.tasks]
        assert kinds == [
            "ExecuteSQLTask", "ScriptTask", "Pipeline",
            "ExecuteSQLTask", "SendMailTask",
        ]
        assert pkg.tasks[0].result_type == "ResultSetType_SingleRow"


class TestRewrite:
    def test_table_params_and_top(self):
        sql = "SELECT TOP 1 A FROM etl.SyncLog WHERE T >= ? ORDER BY A DESC;"
        out = rewrite_tsql(
            sql, {"etl.SyncLog": "v_log"}, params=[datetime(2020, 1, 2, 3, 4, 5)]
        )
        assert out == (
            "SELECT A FROM v_log WHERE T >= TIMESTAMP '2020-01-02 03:04:05' "
            "ORDER BY A DESC LIMIT 1"
        )

    def test_variable_binding_and_quoting(self):
        out = rewrite_tsql(
            "SELECT * FROM [dim].[Customer] WHERE N = @Name",
            {"dim.Customer": "v_dim"},
            variables={"User::Name": "O'Brien"},
        )
        assert out == "SELECT * FROM v_dim WHERE N = 'O''Brien'"

    def test_unbound_param_raises(self):
        with pytest.raises(ValueError, match="unbound"):
            rewrite_tsql("SELECT * FROM t WHERE a = ?", {})

    def test_classify(self):
        assert classify_sql("SELECT 1") == "runnable"
        assert classify_sql("-- note\nSELECT a FROM b") == "runnable"
        assert classify_sql("TRUNCATE TABLE x;") == "manual"
        assert classify_sql("MERGE dim.c AS t USING s ...") == "manual"
        assert classify_sql("DECLARE @x INT; SELECT 1") == "manual"


class TestExecution:
    @pytest.fixture()
    def sales_tables(self, spark):
        tx = spark.createDataFrame(
            [
                (1, 10, 100, datetime(2024, 1, 5), 2,
                 Decimal("50.00"), Decimal("10.00"), 1, 1, 0),
                (2, 10, 101, datetime(2024, 1, 6), 1,
                 Decimal("30.00"), Decimal("0.00"), 1, 1, 0),
                (3, 11, 100, datetime(2024, 1, 7), 4,
                 Decimal("25.00"), Decimal("5.00"), 2, 2, 0),
                (4, 12, 101, datetime(2024, 1, 8), 1,
                 Decimal("99.00"), Decimal("0.00"), 2, 2, 1),
                (5, 10, 100, datetime(2024, 6, 1), 1,
                 Decimal("10.00"), Decimal("0.00"), 1, 1, 0),
            ],
            "SaleID long, CustomerID int, ProductID int, SaleDate timestamp,"
            "Quantity int, UnitPrice decimal(18,2), DiscountPercent decimal(5,2),"
            "SalesRepID int, StoreID int, IsVoided int",
        )
        dim_customer = spark.createDataFrame(
            [(1010, 10, 1), (1011, 11, 1), (1012, 12, 0)],
            "CustomerKey int, CustomerID int, IsCurrent int",
        )
        dim_product = spark.createDataFrame(
            [(2100, 100, 7, 1), (2101, 101, 8, 1)],
            "ProductKey int, ProductID int, CategoryID int, IsActive int",
        )
        dim_date = spark.createDataFrame(
            [
                (20240105, datetime(2024, 1, 5)),
                (20240106, datetime(2024, 1, 6)),
                (20240107, datetime(2024, 1, 7)),
                (20240108, datetime(2024, 1, 8)),
                (20240601, datetime(2024, 6, 1)),
            ],
            "DateKey int, FullDate timestamp",
        )
        return {
            "sales.Transactions": tx,
            "dim.Customer": dim_customer,
            "dim.Product": dim_product,
            "dim.Date": dim_date,
        }

    def test_sales_fact_end_to_end(self, spark, sales_tables):
        frames, report = run_package(
            spark,
            f"{PKG_DIR}/SalesFactETL.dtsx",
            tables=sales_tables,
            param_bindings={"Sales Source": ["User::StartDate", "User::EndDate"]},
        )
        # package vars pin Jan 2024: sale 5 (June) and sale 4 (voided) drop
        out = {r["SaleID"]: r for r in frames["Load Sales Facts"].collect()}
        assert set(out) == {1, 2, 3}
        r = out[1]
        assert (r["CustomerKey"], r["ProductKey"], r["CategoryID"]) == (1010, 2100, 7)
        assert r["DateKey"] == 20240105
        assert float(r["GrossAmount"]) == 100.00
        assert float(r["DiscountAmount"]) == 10.00
        assert float(r["NetAmount"]) == 90.00
        statuses = {b.name: b.status for b in report}
        assert statuses["Load Sales Facts"] == "bound"
        assert statuses["Pre-ETL Validation"] == "manual_review_required"

    def test_lookup_ignore_failure_yields_null(self, spark, sales_tables):
        # customer 12 is not IsCurrent — NoMatchBehavior 1 keeps the row
        tables = dict(sales_tables)
        tables["sales.Transactions"] = tables["sales.Transactions"].withColumn(
            "IsVoided", F.lit(0)
        )
        frames, _ = run_package(
            spark, f"{PKG_DIR}/SalesFactETL.dtsx", tables=tables,
            param_bindings={"Sales Source": ["User::StartDate", "User::EndDate"]},
        )
        out = {r["SaleID"]: r for r in frames["Load Sales Facts"].collect()}
        assert out[4]["CustomerKey"] is None

    def test_date_lookup_fail_component_raises(self, spark, sales_tables):
        # NoMatchBehavior 0 on Lookup Date: a SaleDate missing from dim.Date
        # must fail the component, not silently null out
        tables = dict(sales_tables)
        tables["dim.Date"] = tables["dim.Date"].filter("DateKey <> 20240106")
        with pytest.raises(Exception, match="FailComponent"):
            frames, _ = run_package(
                spark, f"{PKG_DIR}/SalesFactETL.dtsx", tables=tables,
                param_bindings={
                    "Sales Source": ["User::StartDate", "User::EndDate"]
                },
            )

    def test_precedence_becomes_deps(self, spark, sales_tables):
        pkg = parse_dtsx(f"{PKG_DIR}/SalesFactETL.dtsx")
        pipe, _ = bind_package(
            spark, pkg, sales_tables,
            param_bindings={"Sales Source": ["User::StartDate", "User::EndDate"]},
        )
        assert pipe.models["Load Sales Facts"].deps == ["Pre-ETL Validation"]
        assert pipe.models["Update Aggregates"].deps == ["Load Sales Facts"]
        assert topo_order(pipe.models) == [
            "Pre-ETL Validation", "Load Sales Facts", "Update Aggregates"
        ]

    def test_sql_handler_reads_dataflow_view(self, spark, sales_tables):
        # a caller handler for the MERGE-style task can read the destination
        # temp view the dataflow registered ([fact].[Sales])
        def update_aggregates(frames, vars_):
            return spark.sql(
                "SELECT DateKey, SUM(Quantity) AS q FROM salesfactetl__fact_sales "
                "GROUP BY DateKey"
            )

        frames, report = run_package(
            spark, f"{PKG_DIR}/SalesFactETL.dtsx", tables=sales_tables,
            param_bindings={"Sales Source": ["User::StartDate", "User::EndDate"]},
            sql_handlers={"Update Aggregates": update_aggregates},
        )
        agg = {r["DateKey"]: r["q"] for r in frames["Update Aggregates"].collect()}
        assert agg == {20240105: 2, 20240106: 1, 20240107: 4}
        statuses = {b.name: b.status for b in report}
        assert statuses["Update Aggregates"] == "bound"

    def test_runnable_sql_task_single_row(self, spark):
        synclog = spark.createDataFrame(
            [
                (datetime(2024, 2, 1), "Inventory", "Success"),
                (datetime(2024, 3, 1), "Inventory", "Success"),
                (datetime(2024, 4, 1), "Inventory", "Failed"),
            ],
            "LastSyncTime timestamp, SyncType string, Status string",
        )
        stg = spark.createDataFrame(
            [("SKU-1", "W1", 50, 10, 40, datetime(2024, 1, 1).date(), 20, 100,
              Decimal("2.5000"), 0)],
            "ProductSKU string, WarehouseCode string, QuantityOnHand int,"
            "QuantityReserved int, QuantityAvailable int, LastCountDate date,"
            "ReorderPoint int, MaxStockLevel int, UnitCost decimal(18,4),"
            "ProcessedFlag int",
        )
        dim_product = spark.createDataFrame(
            [(900, "SKU-1", 1)], "ProductKey int, SKU string, IsActive int"
        )
        dim_wh = spark.createDataFrame(
            [(501, "W1")], "WarehouseKey int, WarehouseCode string"
        )
        frames, report = run_package(
            spark, f"{PKG_DIR}/InventorySync.dtsx",
            tables={
                "etl.SyncLog": synclog, "stg.InventoryAPI": stg,
                "dim.Product": dim_product, "dim.Warehouse": dim_wh,
            },
        )
        # TOP 1 ... ORDER BY DESC over Success rows only
        assert frames["Get Last Sync Time"].collect() == [
            (datetime(2024, 3, 1),)
        ]
        inv = frames["Load Inventory Updates"].first()
        assert inv["ProductKey"] == 900 and inv["WarehouseKey"] == 501
        assert inv["StockStatus"] == "In Stock"
        assert inv["DaysOfSupply"] == 60  # (40/20)*30
        assert float(inv["InventoryValue"]) == 125.0
        statuses = {b.name: b.status for b in report}
        assert statuses["Call Inventory API"] == "manual_review_required"
        assert statuses["Send Completion Email"] == "documented_only"

    def test_customer_load_derived_columns(self, spark):
        crm = spark.createDataFrame(
            [
                (1, "Ada", "Lovelace", "ada@analytical.org", "555",
                 datetime(2023, 1, 1), datetime(2024, 1, 20)),
                (2, "Old", "Row", "old@x.org", "555",
                 datetime(2023, 1, 1), datetime(2023, 6, 1)),
            ],
            "CustomerID int, FirstName string, LastName string, Email string,"
            "Phone string, CreatedDate timestamp, ModifiedDate timestamp",
        )
        frames, _ = run_package(
            spark, f"{PKG_DIR}/CustomerDataLoad.dtsx",
            tables={"crm.Customers": crm},
            param_bindings={"OLE DB Source": ["User::LoadDate"]},
        )
        rows = frames["Load Customer Data"].collect()
        assert len(rows) == 1  # LoadDate=2024-01-15 filters the stale row
        r = rows[0]
        assert r["FullName"] == "Ada Lovelace"
        assert r["EmailDomain"] == "analytical.org"
