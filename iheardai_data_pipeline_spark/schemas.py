"""Declared StructType registry (SURVEY.md §1.3-1.4).

The reference declares every schema three times (Pydantic at extract,
REQUIRED_FIELDS at transform, SQL DDL at load); here each source has ONE
authoritative StructType used by scans, `from_json`, and the streaming
readers. No schema inference in production paths.

Sources cited: reference `etl/extract/frontend_events_extractor.py:36-57`,
`etl/extract/text_agent_events_extractor.py:36-68`,
`etl/extract/marketo_extractor.py:29-51`, `sql/enhanced_schema.sql:12-171`,
`etl/transform/base_transformer.py:109-124` (envelope).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Envelope (wire format): {event_id, event_type, source, ts_ms, data, metadata}
# data is source-specific; lineage rides in metadata.transformation.
# ---------------------------------------------------------------------------

TRANSFORMATION_METADATA = T.StructType(
    [
        T.StructField("transformer", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("applied_at", T.StringType()),
    ]
)


def envelope_schema(data_schema: T.StructType) -> T.StructType:
    """Envelope struct parameterized by the payload schema."""
    return T.StructType(
        [
            T.StructField("event_id", T.StringType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("data", data_schema),
            T.StructField(
                "metadata",
                T.StructType([T.StructField("transformation", TRANSFORMATION_METADATA)]),
            ),
        ]
    )


# ---------------------------------------------------------------------------
# Source payloads (FIXTURES.md 1-5)
# ---------------------------------------------------------------------------

MARKETO_LEAD_RAW = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("email", T.StringType(), False),
        T.StructField("firstName", T.StringType()),
        T.StructField("lastName", T.StringType()),
        T.StructField("company", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("leadSource", T.StringType()),
        T.StructField("originalSourceType", T.StringType()),
        T.StructField("leadStatus", T.StringType()),
        T.StructField("createdAt", T.StringType()),
        T.StructField("updatedAt", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("timezone", T.StringType()),
    ]
)

MARKETO_ACTIVITY_RAW = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("leadId", T.LongType(), False),
        T.StructField("activityTypeId", T.IntegerType(), False),
        T.StructField("activityDate", T.StringType(), False),
        T.StructField("primaryAttributeValue", T.StringType()),
        T.StructField(
            "attributes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

FRONTEND_EVENT_RAW = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("interaction_type", T.StringType()),
        T.StructField("widget_id", T.StringType()),
        T.StructField("page_url", T.StringType()),
        T.StructField("page_title", T.StringType()),
        T.StructField("referrer", T.StringType()),
        T.StructField("user_agent", T.StringType()),
        T.StructField("screen_resolution", T.StringType()),
        T.StructField("viewport_size", T.StringType()),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("time_on_page", T.LongType()),
        T.StructField("load_time_ms", T.LongType()),
        T.StructField("time_since_last_event", T.LongType()),
        T.StructField("session_duration", T.LongType()),
        T.StructField("element_id", T.StringType()),
        T.StructField("element_class", T.StringType()),
        T.StructField("element_text", T.StringType()),
        T.StructField("click_coordinates", T.StringType()),
        T.StructField("scroll_depth", T.LongType()),
        T.StructField("scroll_direction", T.StringType()),
        T.StructField("max_scroll_depth", T.LongType()),
        T.StructField("form_id", T.StringType()),
        T.StructField("form_fields", T.StringType()),
        T.StructField("form_completion_time", T.LongType()),
        T.StructField("country", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("timezone", T.StringType()),
        T.StructField("ip_address", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

AGENT_TURN_RAW = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("turn_id", T.StringType(), False),
        T.StructField("user_id", T.StringType()),
        T.StructField("channel", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("tokens_in", T.IntegerType(), False),
        T.StructField("tokens_out", T.IntegerType(), False),
        T.StructField("latency_ms", T.DoubleType(), False),
        T.StructField("response_text", T.StringType()),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("tools_used", T.ArrayType(T.StringType())),
        T.StructField(
            "tool_results",
            T.MapType(
                T.StringType(),
                T.StructType([T.StructField("success", T.BooleanType())]),
            ),
        ),
        T.StructField("user_message", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

TOOL_INVOCATION_RAW = T.StructType(
    [
        T.StructField("session_id", T.StringType(), False),
        T.StructField("turn_id", T.StringType(), False),
        T.StructField("tool_name", T.StringType(), False),
        T.StructField("tool_input", T.MapType(T.StringType(), T.StringType()), False),
        T.StructField("tool_output", T.MapType(T.StringType(), T.StringType())),
        T.StructField("execution_time_ms", T.DoubleType(), False),
        T.StructField("success", T.BooleanType(), False),
        T.StructField("error_message", T.StringType()),
        T.StructField("timestamp", T.LongType(), False),
    ]
)

# Enum domains (F2 validation, reference frontend_events_extractor.py:48-57,
# text_agent_events_extractor.py:50-55)
FRONTEND_EVENT_TYPES = (
    "widget_load",
    "widget_open",
    "widget_close",
    "message_sent",
    "message_received",
    "voice_start",
    "voice_end",
    "page_view",
    "click",
    "form_submit",
    "error",
    "performance",
    "scroll",
    "hover",
    "focus",
    "blur",
    "purchase",
)
AGENT_CHANNELS = ("text", "voice", "api")

# Required-field lists (F1, reference base_transformer.py:34-41 + per-source)
REQUIRED_FIELDS = {
    "marketo": ("id", "email"),
    "marketo_activity": ("id", "leadId", "activityTypeId", "activityDate"),
    "frontend": ("event_type", "timestamp"),
    "text_agent": ("session_id", "turn_id", "tokens_in", "tokens_out", "latency_ms", "timestamp"),
}
