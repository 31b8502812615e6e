from trace_data_pipeline_spark.plans.catalog import Query, get_catalog, register

__all__ = ["Query", "get_catalog", "register"]
