from sql_to_ibis_spark.sources.readers import read_parquet, read_table_dir

__all__ = ["read_parquet", "read_table_dir"]
