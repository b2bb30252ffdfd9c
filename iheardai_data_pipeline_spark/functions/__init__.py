"""Scalar transform library (SURVEY.md §2.4, P1-P47).

Every function here builds a native Spark Column expression — JVM-side,
whole-stage-codegen'd, Catalyst-optimizable. No row-at-a-time Python
UDFs anywhere in this package.
"""

from iheardai_data_pipeline_spark.functions import common, frontend, marketo, text_agent  # noqa: F401
