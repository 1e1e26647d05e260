"""Oracle-checked skew-mitigation query: the salted two-stage
aggregation must equal the plain GROUP BY bit-for-bit (the oracle IS
the unsalted query — correctness of the rewrite, not just shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from ..registry import register
from .skew import salted_group_count_sum


@register(
    "salted_aggregation",
    """
    SELECT user_id,
           count(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe per-user aggregation (16 salts). The exact
    DECIMAL partials make the two-stage sum equal the one-stage sum
    exactly — salting changes the schedule, never the answer."""
    e = load_table(spark, sf_dir, "events")
    return salted_group_count_sum(e, "user_id", "value", num_salts=16)
