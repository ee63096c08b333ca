from .parquet import read_table, snapshot_export

__all__ = ["read_table", "snapshot_export"]
