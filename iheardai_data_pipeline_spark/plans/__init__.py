from iheardai_data_pipeline_spark.plans.catalog import CATALOG, QuerySpec, oracle_map, query_map  # noqa: F401
