from iheardai_data_pipeline_spark.sources.batch import TESTDATA_TABLES, load_table, load_tables  # noqa: F401
