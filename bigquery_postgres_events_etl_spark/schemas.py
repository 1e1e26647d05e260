"""Explicit schemas — the reference hard-codes its schemas in SQL
strings and DDL (reference: extract_bq.py:103-108, 195-210); here they
are first-class StructType constants. Never ``inferSchema`` on the hot
path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference source contract: GA4-style raw event -----------------
# reference: extract_bq.py:103-108 (SELECT list), :159-164 (params use)
GA4_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_name", T.StringType(), True),
        # microseconds since epoch, kept raw end-to-end
        # (reference: flask_server.py:66,96 — /1_000_000 conversions)
        T.StructField("event_timestamp", T.LongType(), True),
        T.StructField("event_date", T.DateType(), True),
        T.StructField(
            "event_params",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), True),
                        T.StructField(
                            "value",
                            T.StructType(
                                [T.StructField("string_value", T.StringType(), True)]
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
    ]
)

# --- Reference sink contract: application_events ---------------------
# reference DDL: extract_bq.py:195-210 == flask_server.py:123-138
# (id SERIAL and created_at DEFAULT are sink-generated; dedup key is
#  UNIQUE(user_id, event_timestamp, event_name))
APPLICATION_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_date", T.DateType(), True),
        T.StructField("event_timestamp", T.LongType(), True),
        T.StructField("event_name", T.StringType(), True),
        T.StructField("event_id", T.StringType(), True),
        T.StructField("event_name_detail", T.StringType(), True),
    ]
)

APPLICATION_EVENTS_DEDUP_KEY = ["user_id", "event_timestamp", "event_name"]

# CSV export header order (reference: extract_bq.py:149)
CSV_EXPORT_COLUMNS = [
    "user_id",
    "event_date",
    "event_timestamp",
    "event_name",
    "event_id",
    "event_name_detail",
]

# Default tracked events of the reference (extract_bq.py:24-31); the
# fixture `events` table uses its own vocabulary.
REFERENCE_TRACKED_EVENTS = [
    "select_menu_category",
    "select_menu_item",
    "add_to_cart",
    "begin_checkout",
    "purchase",
    "view_item",
]

# Fixture-events vocabulary (TESTDATA.md / observed data)
FIXTURE_EVENT_TYPES = ["click", "purchase", "error", "signup", "view"]
FIXTURE_TRACKED_EVENTS = ["click", "purchase", "signup", "view"]  # drop 'error'

# --- Fixture tables (driver-generated parquet; FIXTURES.md §B) -------
FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

EMBEDDING_DIM = 64
