"""Catalog queries for time-series regularization and entity matching
(operators/timeseries.py): gap-filled resampling with forward fill, and
prefix-blocked fuzzy (edit-distance) pair matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from iheardai_data_pipeline_spark.plans.catalog import register
from iheardai_data_pipeline_spark.sources.batch import load_table

_RESAMPLE_ORACLE = """
WITH in_range AS (
    SELECT event_type, ts, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
      AND ts <  TIMESTAMP '2024-01-01 02:00:00'
),
agg AS (
    SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(18,2))) AS sv
    FROM in_range GROUP BY 1, 2
),
spine AS (
    SELECT t.event_type, u.m AS bucket_ts
    FROM (SELECT DISTINCT event_type FROM events) t,
         unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-01 01:59:00',
                                INTERVAL 1 MINUTE)) AS u(m)
)
SELECT s.event_type,
       CAST(FLOOR(epoch(s.bucket_ts)) AS BIGINT) AS bucket_s,
       COALESCE(a.n_events, 0) AS n_events,
       COALESCE(CAST(last_value(a.sv IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.bucket_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 0.0) AS filled_value
FROM spine s LEFT JOIN agg a
  ON s.event_type = a.event_type AND s.bucket_ts = a.bucket_ts
ORDER BY s.event_type, bucket_s
"""


@register(
    "x_ts_resample_ffill",
    oracle=_RESAMPLE_ORACLE,
    tags=("extension", "timeseries", "window"),
    doc="Time-series regularization: per-type minute resample over a "
    "bounded 2h horizon with a dense generated spine (silent minutes "
    "become rows, n_events=0) and forward-filled values (last non-null "
    "sum per key, 0.0 before the first observation). The spine is "
    "row-locally generated and joins on the aggregate's own keys; the "
    "fill is a per-key ordered window, never a global sort.",
)
def x_ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from iheardai_data_pipeline_spark.operators.timeseries import resample_ffill

    return resample_ffill(load_table(spark, sf_dir, "events"))


_FUZZY_ORACLE = """
WITH n AS (SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk FROM customer)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS distance
FROM n a JOIN n b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY id_a, id_b
"""


@register(
    "x_fuzzy_match_blocked",
    oracle=_FUZZY_ORACLE,
    tags=("extension", "dedup", "join"),
    doc="Entity matching: near-identical customer names via 16-char "
    "prefix blocking (equi-join — candidate pairs bounded by block "
    "size squared, never all-pairs) + exact Levenshtein<=1 filter, "
    "mirror pairs excluded by id ordering. The string-similarity "
    "analog of the embedding block join (similarity.py).",
)
def x_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from iheardai_data_pipeline_spark.operators.timeseries import blocked_fuzzy_pairs

    cust = load_table(spark, sf_dir, "customer")
    return (
        blocked_fuzzy_pairs(cust, "c_custkey", "c_name", block_len=16, max_distance=1)
        .withColumn("distance", F.col("distance").cast("int"))
        .orderBy("id_a", "id_b")
    )


_JSON_STRUCT_ORACLE = """
WITH p AS (
    SELECT event_type,
           CASE WHEN event_id % 10 = 0
                THEN 'x' || props  -- leading garbage: corrupt for any parser
                ELSE props END AS pr
    FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN NOT json_valid(pr) THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN json_valid(pr)
                     THEN CAST(json_extract(pr, '$.k') AS INT) END) AS BIGINT) AS sum_k
FROM p
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "p_json_struct_parse",
    oracle=_JSON_STRUCT_ORACLE,
    tags=("transform", "json"),
    doc="Schema-declared JSON struct parsing with corrupt-record "
    "accounting: from_json against a declared schema returns NULL for "
    "malformed payloads (10% of rows get a deterministic leading-byte "
    "corruption — the reference's corrupt-message "
    "handling, S7's value-decode error path), counted per type "
    "alongside the parsed-field aggregate. Complements "
    "p_json_extract's path-extraction with typed struct parsing.",
)
def p_json_struct_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    pr = F.when(
        F.col("event_id") % 10 == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    # STRUCTURAL corruption detection: PERMISSIVE from_json routes the raw
    # text of a malformed record into the declared corrupt-record column.
    # Testing `j.k IS NULL` instead would mislabel valid JSON that merely
    # lacks k (or carries k:null) and NULL inputs — diverging from the
    # oracle's json_valid().
    parsed = F.from_json(
        pr, "k int, _corrupt string", {"columnNameOfCorruptRecord": "_corrupt"}
    )
    return (
        events.select("event_type", parsed.alias("j"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("j._corrupt").isNotNull(), 1).otherwise(0)
            ).alias("n_corrupt"),
            F.sum(F.col("j.k")).alias("sum_k"),
        )
        .orderBy("event_type")
    )
