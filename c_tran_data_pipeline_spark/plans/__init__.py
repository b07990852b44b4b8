from c_tran_data_pipeline_spark.plans.registry import QuerySpec, all_queries

__all__ = ["QuerySpec", "all_queries"]
