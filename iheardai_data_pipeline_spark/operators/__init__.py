from iheardai_data_pipeline_spark.operators.sessionize import session_kpis, with_session_id  # noqa: F401
