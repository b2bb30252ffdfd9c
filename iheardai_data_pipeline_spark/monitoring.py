"""Pipeline observability: metrics registry, Spark-native collection,
health checks, and threshold alerting.

Reference parity (re-expressed Spark-first, not ported):

- ``MetricsRegistry`` + ``Counter``/``Gauge``/``Histogram`` — the
  labelled metric model of the reference's PrometheusMetrics
  (src/utils/monitoring.py:65-191) without the prometheus_client
  dependency: a small in-process registry that renders the public
  Prometheus text exposition format, so any scraper can consume it.
- ``SparkMetricsCollector`` — the reference's MetricsCollector
  record_* surface (monitoring.py:194-299) with Spark-native sources:
  ``df.observe()`` / ``Observation`` for batch row metrics (the
  aggregates ride the job — NO extra pass over the data), streaming
  progress from ``ProgressMonitor`` (streaming/monitoring.py), and a
  ``time_operation`` context manager for sink/store calls.
- ``HealthCheck`` — named check callables -> status dict
  (monitoring.py:301-343).
- ``AlertManager`` — threshold rules over metric values with an
  injectable transport (monitoring.py:345-440 posts to webhook/Slack;
  here the transport is a callable so the rig stays offline — pass
  ``requests.post``-style senders in production).

Scale note: metrics are driver-side scalars. The only executor-touching
piece is ``observe()``, whose aggregates are computed inside the job's
existing plan (Spark's AggregatingAccumulator), so collection cost is
independent of data size — exactly what a 100 TB run needs; never
``df.count()`` for telemetry.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Mapping
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

# --- metric primitives -------------------------------------------------------------

_DEFAULT_BUCKETS = (0.005, 0.05, 0.5, 5.0, 30.0, 120.0, float("inf"))


def _label_key(labels: Mapping[str, str]) -> tuple[tuple[str, str], ...]:
    return tuple(sorted(labels.items()))


def _escape_label_value(v: str) -> str:
    """Prometheus text-exposition escaping for label values: backslash,
    double quote, and newline must be escaped or the whole scrape is
    rejected by the parser."""
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _render_labels(key: tuple[tuple[str, str], ...]) -> str:
    if not key:
        return ""
    inner = ",".join(f'{k}="{_escape_label_value(v)}"' for k, v in key)
    return "{" + inner + "}"


@dataclass
class Counter:
    name: str
    help: str
    _values: dict = field(default_factory=dict)

    def inc(self, amount: float = 1.0, **labels: str) -> None:
        if amount < 0:
            raise ValueError("counters only increase")
        k = _label_key(labels)
        self._values[k] = self._values.get(k, 0.0) + amount

    def value(self, **labels: str) -> float:
        return self._values.get(_label_key(labels), 0.0)

    def expose(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} counter"]
        for k, v in sorted(self._values.items()):
            lines.append(f"{self.name}{_render_labels(k)} {v:g}")
        return lines


@dataclass
class Gauge:
    name: str
    help: str
    _values: dict = field(default_factory=dict)

    def set(self, value: float, **labels: str) -> None:
        self._values[_label_key(labels)] = float(value)

    def value(self, **labels: str) -> float:
        return self._values.get(_label_key(labels), 0.0)

    def expose(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} gauge"]
        for k, v in sorted(self._values.items()):
            lines.append(f"{self.name}{_render_labels(k)} {v:g}")
        return lines


@dataclass
class Histogram:
    """Cumulative-bucket histogram (Prometheus semantics)."""

    name: str
    help: str
    buckets: tuple[float, ...] = _DEFAULT_BUCKETS
    _counts: dict = field(default_factory=dict)
    _sums: dict = field(default_factory=dict)

    def observe(self, value: float, **labels: str) -> None:
        k = _label_key(labels)
        counts = self._counts.setdefault(k, [0] * len(self.buckets))
        for i, bound in enumerate(self.buckets):
            if value <= bound:
                counts[i] += 1
        self._sums[k] = self._sums.get(k, 0.0) + value

    def count(self, **labels: str) -> int:
        c = self._counts.get(_label_key(labels))
        return c[-1] if c else 0

    def sum(self, **labels: str) -> float:
        return self._sums.get(_label_key(labels), 0.0)

    def expose(self) -> list[str]:
        lines = [f"# HELP {self.name} {self.help}", f"# TYPE {self.name} histogram"]
        for k, counts in sorted(self._counts.items()):
            for bound, c in zip(self.buckets, counts):
                le = "+Inf" if bound == float("inf") else f"{bound:g}"
                bk = k + (("le", le),)
                lines.append(f"{self.name}_bucket{_render_labels(bk)} {c}")
            lines.append(f"{self.name}_sum{_render_labels(k)} {self._sums[k]:g}")
            lines.append(f"{self.name}_count{_render_labels(k)} {counts[-1]}")
        return lines


class MetricsRegistry:
    """Holds metrics and renders the Prometheus text exposition format."""

    def __init__(self) -> None:
        self._metrics: dict[str, Counter | Gauge | Histogram] = {}

    def counter(self, name: str, help: str = "") -> Counter:
        return self._get_or_create(name, lambda: Counter(name, help))

    def gauge(self, name: str, help: str = "") -> Gauge:
        return self._get_or_create(name, lambda: Gauge(name, help))

    def histogram(
        self, name: str, help: str = "", buckets: tuple[float, ...] = _DEFAULT_BUCKETS
    ) -> Histogram:
        return self._get_or_create(name, lambda: Histogram(name, help, buckets))

    def _get_or_create(self, name: str, make: Callable):
        m = self._metrics.get(name)
        if m is None:
            m = make()
            self._metrics[name] = m
        return m

    def prometheus_text(self) -> str:
        lines: list[str] = []
        for name in sorted(self._metrics):
            lines.extend(self._metrics[name].expose())
        return "\n".join(lines) + "\n"


# --- Spark-native collection -------------------------------------------------------


def observe_frame(
    df: DataFrame, name: str, exprs: Mapping[str, Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach riding metrics to a DataFrame via ``df.observe``.

    The default expression set is the validation-guard trio the
    reference tracks per batch (monitoring.py:273-278 processing-error
    counter + config error-rate threshold): total rows plus any custom
    named aggregates. Metrics are computed by the SAME job that runs
    the query — zero extra scans; read them from the returned
    ``Observation`` after an action.
    """
    exprs = dict(exprs or {})
    exprs.setdefault("n_rows", F.count(F.lit(1)))
    obs = Observation(name)
    out = df.observe(obs, *[c.alias(k) for k, c in exprs.items()])
    return out, obs


class SparkMetricsCollector:
    """The reference MetricsCollector's record_* surface on Spark sources."""

    def __init__(self, registry: MetricsRegistry | None = None, service: str = "spark"):
        self.registry = registry or MetricsRegistry()
        self.service = service
        r = self.registry
        self.rows_processed = r.counter(
            "pipeline_rows_processed_total", "Rows processed per stage/sink"
        )
        self.processing_errors = r.counter(
            "pipeline_processing_errors_total", "Processing errors by type"
        )
        self.operation_duration = r.histogram(
            "pipeline_operation_duration_seconds", "Wall time per operation"
        )
        self.stream_input_rows = r.counter(
            "pipeline_stream_input_rows_total", "Streaming rows per query"
        )
        self.stream_lag_rows = r.gauge(
            "pipeline_stream_trigger_rows", "Rows in the latest trigger (lag gauge)"
        )
        self.service_health = r.gauge(
            "pipeline_service_healthy", "1 healthy / 0 unhealthy per service"
        )

    # -- batch -----------------------------------------------------------------
    def record_observation(self, stage: str, obs: Observation) -> dict:
        """Fold a finished Observation's riding aggregates into metrics."""
        got = obs.get
        self.rows_processed.inc(
            float(got.get("n_rows", 0)), stage=stage, service=self.service
        )
        for k, v in got.items():
            if k != "n_rows" and isinstance(v, (int, float)):
                self.registry.gauge(
                    f"pipeline_observed_{k}", f"observed metric {k}"
                ).set(float(v), stage=stage, service=self.service)
        return dict(got)

    @contextmanager
    def time_operation(self, operation: str, **labels: str):
        """Reference monitor_operation analog (monitoring.py:506-556):
        times the block, records duration + error type."""
        start = time.monotonic()
        try:
            yield
        except Exception as e:
            self.processing_errors.inc(
                1, error_type=type(e).__name__, service=self.service, **labels
            )
            raise
        finally:
            self.operation_duration.observe(
                time.monotonic() - start,
                operation=operation,
                service=self.service,
                **labels,
            )

    # -- streaming -------------------------------------------------------------
    def record_stream_progress(self, progress_records: Iterable) -> None:
        """Ingest BatchProgress records from streaming ProgressMonitor."""
        for rec in progress_records:
            self.stream_input_rows.inc(
                float(rec.num_input_rows),
                query_id=rec.query_id,
                service=self.service,
            )
            self.stream_lag_rows.set(
                float(rec.num_input_rows), query_id=rec.query_id, service=self.service
            )
            self.operation_duration.observe(
                rec.duration_ms / 1000.0,
                operation="stream_trigger",
                service=self.service,
            )

    def set_service_health(self, service: str, healthy: bool) -> None:
        self.service_health.set(1.0 if healthy else 0.0, service=service)


# --- health checks -----------------------------------------------------------------


class HealthCheck:
    """Named check callables -> status dict (reference monitoring.py:301-343)."""

    def __init__(self, service_name: str):
        self.service_name = service_name
        self._checks: dict[str, Callable[[], bool]] = {}

    def add_check(self, name: str, check_func: Callable[[], bool]) -> None:
        self._checks[name] = check_func

    def check_health(self) -> dict:
        results = {}
        healthy = True
        for name, fn in self._checks.items():
            start = time.monotonic()
            try:
                ok = bool(fn())
                err = None
            except Exception as e:  # failing check != crashing healthcheck
                ok, err = False, f"{type(e).__name__}: {e}"
            healthy &= ok
            results[name] = {
                "healthy": ok,
                "duration_ms": round((time.monotonic() - start) * 1000, 3),
                **({"error": err} if err else {}),
            }
        return {
            "service": self.service_name,
            "healthy": healthy,
            "checks": results,
        }


def spark_session_check(spark) -> Callable[[], bool]:
    """Standard check: the session's JVM answers and can plan a query."""

    def _check() -> bool:
        return spark.range(1).count() == 1

    return _check


# --- alerting ----------------------------------------------------------------------


@dataclass
class AlertRule:
    name: str
    metric: str
    threshold: float
    severity: str = "warning"
    labels: dict = field(default_factory=dict)
    above: bool = True  # fire when value > threshold (False: value < threshold)


class AlertManager:
    """Threshold alerts over registry values with an injectable transport.

    The reference posts JSON to webhook/Slack (monitoring.py:385-440);
    the transport here is any ``callable(alert_dict)`` so tests and the
    offline rig inject a list-appender, and production injects an HTTP
    poster. Evaluation is pull-based: call ``evaluate()`` after each
    batch / on a schedule.
    """

    def __init__(
        self,
        registry: MetricsRegistry,
        transport: Callable[[dict], None] | None = None,
    ):
        self.registry = registry
        self.rules: list[AlertRule] = []
        self.transport = transport
        self.history: list[dict] = []

    def add_rule(self, rule: AlertRule) -> None:
        self.rules.append(rule)

    def evaluate(self) -> list[dict]:
        fired = []
        for rule in self.rules:
            metric = self.registry._metrics.get(rule.metric)
            if metric is None:
                continue
            value = self._rule_value(metric, rule)
            if value is None:
                continue
            breach = value > rule.threshold if rule.above else value < rule.threshold
            if breach:
                alert = {
                    "type": rule.name,
                    "metric": rule.metric,
                    "value": value,
                    "threshold": rule.threshold,
                    "severity": rule.severity,
                    "labels": dict(rule.labels),
                }
                fired.append(alert)
                self.history.append(alert)
                if self.transport is not None:
                    self.transport(alert)
        return fired

    @staticmethod
    def _rule_value(metric, rule: "AlertRule") -> float | None:
        """Observed value a rule evaluates against, or None to skip.

        Never-recorded label sets return None instead of a 0.0 default —
        a `below`-threshold rule must not fire for a series that has no
        observations. Histogram rules evaluate the MEAN observation
        (sum/count) — the latency-alert shape; count==0 skips.
        """
        if isinstance(metric, Histogram):
            n = metric.count(**rule.labels)
            if n == 0:
                return None
            return metric.sum(**rule.labels) / n
        key = _label_key(rule.labels)
        if key not in metric._values:
            return None
        return metric.value(**rule.labels)
