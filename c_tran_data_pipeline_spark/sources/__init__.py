from c_tran_data_pipeline_spark.sources.readers import load_table, load_tables, read_json_records

__all__ = ["load_table", "load_tables", "read_json_records"]
