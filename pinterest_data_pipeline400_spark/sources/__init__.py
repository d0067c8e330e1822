from .readers import load_tables, read_json_topic, read_parquet_table

__all__ = ["load_tables", "read_json_topic", "read_parquet_table"]
