from .readers import SourceRegistry, read_csv, read_excel, read_json, read_parquet, read_rest_api, testdata
from .writers import (
    append,
    audit_append,
    insert_into,
    overwrite,
    partition_overwrite,
    update_flag,
    write_csv,
    write_json,
)

__all__ = [
    "SourceRegistry",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_excel",
    "read_rest_api",
    "testdata",
    "append",
    "overwrite",
    "partition_overwrite",
    "insert_into",
    "audit_append",
    "update_flag",
    "write_csv",
    "write_json",
]
