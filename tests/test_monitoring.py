"""Tests for the pipeline observability surface (monitoring.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iheardai_data_pipeline_spark.monitoring import (
    AlertManager,
    AlertRule,
    HealthCheck,
    MetricsRegistry,
    SparkMetricsCollector,
    observe_frame,
    spark_session_check,
)


class TestRegistry:
    def test_counter_labels_and_value(self):
        r = MetricsRegistry()
        c = r.counter("rows_total", "rows")
        c.inc(5, stage="load")
        c.inc(3, stage="load")
        c.inc(1, stage="clean")
        assert c.value(stage="load") == 8
        assert c.value(stage="clean") == 1
        assert c.value(stage="absent") == 0

    def test_counter_rejects_negative(self):
        c = MetricsRegistry().counter("x")
        with pytest.raises(ValueError):
            c.inc(-1)

    def test_histogram_cumulative_buckets(self):
        r = MetricsRegistry()
        h = r.histogram("dur", "d", buckets=(1.0, 10.0, float("inf")))
        for v in (0.5, 2.0, 20.0):
            h.observe(v)
        assert h.count() == 3
        assert h.sum() == 22.5
        text = r.prometheus_text()
        assert 'dur_bucket{le="1"} 1' in text
        assert 'dur_bucket{le="10"} 2' in text
        assert 'dur_bucket{le="+Inf"} 3' in text

    def test_prometheus_text_format(self):
        r = MetricsRegistry()
        r.counter("a_total", "help a").inc(2, svc="s")
        r.gauge("b", "help b").set(7.5)
        text = r.prometheus_text()
        assert "# TYPE a_total counter" in text
        assert 'a_total{svc="s"} 2' in text
        assert "# TYPE b gauge" in text
        assert "b 7.5" in text

    def test_same_name_returns_same_metric(self):
        r = MetricsRegistry()
        assert r.counter("x") is r.counter("x")


class TestSparkCollection:
    def test_observe_frame_rides_the_job(self, spark):
        df = spark.range(100).withColumn(
            "bad", (F.col("id") % 10 == 0).cast("int")
        )
        out, obs = observe_frame(
            df, "batch1", {"n_bad": F.sum("bad"), "n_rows": F.count(F.lit(1))}
        )
        out.write.format("noop").mode("overwrite").save()
        coll = SparkMetricsCollector()
        got = coll.record_observation("load", obs)
        assert got["n_rows"] == 100
        assert got["n_bad"] == 10
        assert coll.rows_processed.value(stage="load", service="spark") == 100

    def test_time_operation_records_duration_and_errors(self):
        coll = SparkMetricsCollector()
        with coll.time_operation("write", sink="parquet"):
            pass
        assert (
            coll.operation_duration.count(
                operation="write", service="spark", sink="parquet"
            )
            == 1
        )
        with pytest.raises(RuntimeError):
            with coll.time_operation("write", sink="parquet"):
                raise RuntimeError("boom")
        assert (
            coll.processing_errors.value(
                error_type="RuntimeError", service="spark", sink="parquet"
            )
            == 1
        )

    def test_record_stream_progress(self):
        from iheardai_data_pipeline_spark.streaming.monitoring import BatchProgress

        coll = SparkMetricsCollector()
        coll.record_stream_progress(
            [
                BatchProgress("q1", 0, 500, 100.0, 2000),
                BatchProgress("q1", 1, 1500, 300.0, 3000),
            ]
        )
        assert coll.stream_input_rows.value(query_id="q1", service="spark") == 2000
        assert coll.stream_lag_rows.value(query_id="q1", service="spark") == 1500


class TestHealthCheck:
    def test_mixed_checks(self, spark):
        hc = HealthCheck("engine")
        hc.add_check("spark", spark_session_check(spark))
        hc.add_check("always_bad", lambda: False)
        hc.add_check("crashes", lambda: 1 / 0)
        out = hc.check_health()
        assert out["healthy"] is False
        assert out["checks"]["spark"]["healthy"] is True
        assert out["checks"]["always_bad"]["healthy"] is False
        assert "ZeroDivisionError" in out["checks"]["crashes"]["error"]

    def test_all_green(self, spark):
        hc = HealthCheck("engine")
        hc.add_check("spark", spark_session_check(spark))
        assert hc.check_health()["healthy"] is True


class TestAlerts:
    def test_threshold_alert_fires_through_transport(self):
        r = MetricsRegistry()
        sent: list[dict] = []
        am = AlertManager(r, transport=sent.append)
        am.add_rule(
            AlertRule(
                name="error_rate_high",
                metric="pipeline_processing_errors_total",
                threshold=10,
                severity="error",
                labels={"error_type": "ValueError", "service": "spark"},
            )
        )
        errors = r.counter("pipeline_processing_errors_total")
        errors.inc(5, error_type="ValueError", service="spark")
        assert am.evaluate() == []
        errors.inc(20, error_type="ValueError", service="spark")
        fired = am.evaluate()
        assert len(fired) == 1
        assert fired[0]["value"] == 25
        assert sent == fired
        assert am.history == fired

    def test_below_threshold_rule(self):
        r = MetricsRegistry()
        am = AlertManager(r)
        r.gauge("pipeline_service_healthy").set(0.0, service="kpi")
        am.add_rule(
            AlertRule(
                name="service_down",
                metric="pipeline_service_healthy",
                threshold=0.5,
                above=False,
                labels={"service": "kpi"},
            )
        )
        assert len(am.evaluate()) == 1

    def test_unknown_metric_is_skipped(self):
        am = AlertManager(MetricsRegistry())
        am.add_rule(AlertRule(name="x", metric="nope", threshold=1))
        assert am.evaluate() == []


class TestAlertEdgeCases:
    def test_below_rule_skips_never_recorded_labels(self):
        r = MetricsRegistry()
        am = AlertManager(r)
        r.gauge("pipeline_service_healthy")  # metric exists, labels never set
        am.add_rule(
            AlertRule(
                name="service_down",
                metric="pipeline_service_healthy",
                threshold=0.5,
                above=False,
                labels={"service": "never-seen"},
            )
        )
        # a series with no observations must not read as 0.0 and fire
        assert am.evaluate() == []

    def test_histogram_rule_fires_on_mean(self):
        r = MetricsRegistry()
        am = AlertManager(r)
        h = r.histogram("op_duration_seconds")
        am.add_rule(
            AlertRule(
                name="slow_ops",
                metric="op_duration_seconds",
                threshold=1.0,
                labels={"operation": "load"},
            )
        )
        assert am.evaluate() == []  # no observations yet: skip, not fire
        h.observe(3.0, operation="load")
        h.observe(5.0, operation="load")
        fired = am.evaluate()
        assert len(fired) == 1 and fired[0]["value"] == 4.0  # mean(3,5)

    def test_label_values_escaped_in_exposition(self):
        r = MetricsRegistry()
        c = r.counter("reqs")
        c.inc(1.0, path='a"b\\c\nd')
        line = [ln for ln in c.expose() if ln.startswith("reqs{")][0]
        assert '\\"' in line and "\\\\" in line and "\\n" in line
        assert "\n" not in line  # raw newline would split the sample line
