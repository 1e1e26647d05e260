"""Higher-order functions, bag-semantics set ops, deterministic
sampling, ANSI-safe casts, and join-side salting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "higher_order_functions",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           coalesce(array_to_string(list_transform(toks[1:5], x -> upper(x)), ' '), '') AS first5_upper,
           coalesce(array_to_string(list_filter(toks, x -> length(x) > 5), ' '), '') AS long_tokens,
           len(list_filter(toks, x -> x = 'spark')) > 0 AS has_spark,
           len(list_filter(toks, x -> length(x) >= 1)) = len(toks) AS all_nonempty,
           list_reduce(list_transform(toks, x -> length(x)), (a, b) -> a + b) AS total_chars
    FROM t
    """,
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / exists / forall / aggregate — the lambda
    surface that replaces Python UDFs for array work (all codegen'd).
    list_reduce seeds with the first element; aggregate() mirrors that
    by folding from tokens[0]'s length.

    Array-valued outputs are flattened to space-joined strings so the
    row-oriented comparator (pandas cannot hash list cells) sees flat
    deterministic columns; the lambda semantics are unchanged."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform(F.slice(toks, 1, 5), lambda x: F.upper(x))
        ).alias("first5_upper"),
        F.concat_ws(" ", F.filter(toks, lambda x: F.length(x) > 5)).alias("long_tokens"),
        F.exists(toks, lambda x: x == "spark").alias("has_spark"),
        F.forall(toks, lambda x: F.length(x) >= 1).alias("all_nonempty"),
        F.aggregate(
            F.slice(toks, 2, 1_000_000),
            F.length(F.element_at(toks, 1)).cast("long"),
            lambda acc, x: acc + F.length(x),
        ).alias("total_chars"),
    )


@register(
    "set_intersect_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL (multiplicity = min of the two
    sides) — distinct from the set-semantics variant."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_totalprice") > 200000.0).select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL (multiplicity subtraction)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_totalprice") > 200000.0).select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


@register(
    "deterministic_sample",
    """
    SELECT event_id, user_id, event_type FROM events
    WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample via key-hash bucketing — the
    scale-correct replacement for rng-based TABLESAMPLE: stable across
    runs/engines/partitionings, and consistent for the same key (so
    joins between sampled tables stay aligned)."""
    e = load_table(spark, sf_dir, "events")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10).cast("long")
    return e.where(h % 100 < 10).select("event_id", "user_id", "event_type")


@register(
    "safe_casts",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           TRY_CAST(event_type AS INTEGER) AS type_as_int,
           TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_double,
           CASE WHEN value = 0 THEN NULL ELSE 100.0 / value END AS per_value
    FROM events
    """,
)
def safe_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe conversions: try_cast → NULL instead of error on
    malformed input, try_divide → NULL on zero denominators (the
    discipline that keeps a 100 TB batch from dying on one bad row)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.try_cast("int").alias("k_int"),
        F.col("event_type").try_cast("int").alias("type_as_int"),
        k.try_cast("double").alias("k_double"),
        F.try_divide(F.lit(100.0), F.col("value")).alias("per_value"),
    )


@register(
    "salted_join_aggregation",
    """
    SELECT n.n_name,
           count(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def salted_join_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-side salting: replicate the small side across N salt
    values and scatter the big side by a deterministic row-hash salt,
    so one hot nationkey spreads over N tasks. The oracle is the
    plain join+agg — the rewrite must be answer-preserving. (AQE
    skew-join does this adaptively for sort-merge; explicit salting
    is the portable form and works for aggregation-heavy joins.)"""
    n_salts = 8
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    salted_c = c.withColumn(
        "__salt", F.pmod(F.xxhash64("c_custkey"), F.lit(n_salts)).cast("int")
    )
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    salted_n = n.crossJoin(salts)
    joined = salted_c.join(
        salted_n,
        (salted_c.c_nationkey == salted_n.n_nationkey)
        & (salted_c["__salt"] == salted_n["__salt"]),
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(27,4)")).cast("double").alias("sum_bal"),
    )


@register(
    "unpivot_lineitem_metrics",
    """
    SELECT l_orderkey, l_linenumber, metric, value
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem)
    UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide numeric columns → (metric, value) rows —
    the inverse of pivot, one narrow projection with a 4× row
    expansion and no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@register(
    "null_safe_join",
    """
    SELECT e.event_id, e.user_id, m.marker
    FROM (SELECT event_id, nullif(user_id, 0) AS user_id FROM events) e
    JOIN (SELECT DISTINCT nullif(user_id, 0) AS user_id,
                 coalesce(CAST(nullif(user_id, 0) AS VARCHAR), 'anon') AS marker
          FROM events) m
      ON e.user_id IS NOT DISTINCT FROM m.user_id
    """,
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping — required when a sentinel
    (user 0 → anon) is modeled as NULL but rows must still pair up."""
    e = load_table(spark, sf_dir, "events")
    left = e.select("event_id", F.nullif("user_id", F.lit(0)).alias("user_id"))
    right = (
        e.select(F.nullif("user_id", F.lit(0)).alias("user_id"))
        .distinct()
        .withColumn("marker", F.coalesce(F.col("user_id").cast("string"), F.lit("anon")))
    )
    return left.join(
        right, left["user_id"].eqNullSafe(right["user_id"])
    ).select(left["event_id"], left["user_id"], right["marker"])


@register(
    "join_full_outer",
    """
    WITH rich AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000.0
    ),
    recent AS (
      SELECT o_custkey AS c_custkey, count(*) AS n_recent
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_custkey
    )
    SELECT coalesce(r.c_custkey, b.c_custkey) AS c_custkey,
           r.c_acctbal, b.n_recent
    FROM rich r FULL OUTER JOIN recent b ON r.c_custkey = b.c_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with nulls on BOTH sides populated (high-balance
    customers ⟗ recent buyers) — completes the §2.3 join-type surface.
    Scale note: full outer can't broadcast either side; it always
    plans as a shuffle join on the key, which is the right default."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rich = c.where(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_acctbal")
    recent = (
        o.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .groupBy(F.col("o_custkey").alias("r_custkey"))
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )
    return rich.join(
        recent, rich.c_custkey == recent.r_custkey, "full_outer"
    ).select(
        F.coalesce(rich.c_custkey, F.col("r_custkey")).alias("c_custkey"),
        "c_acctbal",
        "n_recent",
    )


@register(
    "fuzzy_name_pairs",
    """
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: near-identical part names (edit distance ≤ 2)
    inside each brand block. The brand equi-join is the blocking key —
    the same block-then-verify shape as the LSH tiers, with
    levenshtein as the verifier (identical DP algorithm in both
    engines). Unblocked all-pairs would be |part|² — never do that."""
    p = load_table(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand_b"),
    )
    return (
        a.join(b, (F.col("brand_a") == F.col("brand_b")) & (F.col("key_a") < F.col("key_b")))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .where(F.col("edit_dist") <= 2)
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


@register(
    "map_functions",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_distinct(toks)) AS BIGINT) AS map_size,
           CAST(len(list_filter(toks, t -> t = 'the')) AS BIGINT) AS n_the,
           CAST(len(list_filter(toks, t -> t = 'spark')) AS BIGINT) AS n_spark
    FROM t
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-doc token→count map built with
    map_from_entries over grouped counts, then map_size and
    element_at lookups. The oracle computes the same scalars without
    maps (DuckDB map extraction returns lists — value parity is
    checked on the lookups, which is what a map is for)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.col("doc_id"), F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    maps = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("tok", "cnt"))).alias("m")
    )
    return maps.select(
        "doc_id",
        F.size("m").cast("bigint").alias("map_size"),
        F.coalesce(F.element_at("m", "the"), F.lit(0)).cast("bigint").alias("n_the"),
        F.coalesce(F.element_at("m", "spark"), F.lit(0)).cast("bigint").alias("n_spark"),
    )


@register(
    "events_json_key_stats",
    """
    WITH keys AS (
      SELECT event_id, unnest(json_keys(props)) AS key FROM events
    ),
    per_key AS (
      SELECT key, count(*) AS n_events FROM keys GROUP BY key
    ),
    vals AS (
      SELECT key,
             count(DISTINCT json_extract_string(e.props, '$.' || key))
               AS n_distinct_values
      FROM per_key p, events e
      WHERE json_extract_string(e.props, '$.' || p.key) IS NOT NULL
      GROUP BY key
    )
    SELECT p.key, p.n_events,
           CAST(p.n_events AS DOUBLE)
             / (SELECT count(*) FROM events) AS coverage,
           v.n_distinct_values
    FROM per_key p JOIN vals v ON v.key = p.key
    """,
)
def events_json_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload profiling: which keys the JSON props
    column actually carries, their row coverage, and value
    cardinality — the schema-inference report run before promoting a
    raw JSON feed to typed columns (the reference trusts its payload
    shape blindly; a 100 TB feed can't). json_object_keys/
    get_json_object are codegen'd expressions; one explode + two
    small aggregations."""
    e = load_table(spark, sf_dir, "events")
    total = e.agg(F.count(F.lit(1)).alias("n_total"))
    keys = e.select(
        "event_id", "props", F.explode(F.json_object_keys("props")).alias("key")
    )
    per_key = keys.groupBy("key").agg(F.count(F.lit(1)).alias("n_events"))
    vals = (
        keys.withColumn(
            "val", F.expr("get_json_object(props, concat('$.', key))")
        )
        .where(F.col("val").isNotNull())
        .groupBy("key")
        .agg(F.countDistinct("val").alias("n_distinct_values"))
    )
    return (
        per_key.join(vals, "key")
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n_total")).alias("coverage"),
            "n_distinct_values",
        )
    )


@register(
    "join_cardinality_estimate",
    """
    WITH a AS (SELECT o_custkey AS k, count(*) AS n_a FROM orders GROUP BY 1),
    b AS (SELECT c_custkey AS k, count(*) AS n_b FROM customer GROUP BY 1)
    SELECT CAST(SUM(n_a * n_b) AS BIGINT) AS join_rows,
           CAST(SUM(n_a) AS BIGINT) AS left_rows,
           CAST(count(*) AS BIGINT) AS matched_keys,
           CAST(max(n_a * n_b) AS BIGINT) AS hottest_key_rows
    FROM a JOIN b USING (k)
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT join-output cardinality from per-key histograms —
    Σ n_A(k)·n_B(k) — without executing the join: the number a
    planner (or an engineer sizing a 100 TB shuffle) needs BEFORE
    committing to a strategy, plus the hottest key's contribution
    (the skew-join trigger). Cost: two key-count aggregations over
    narrow slivers + a count-level join — orders of magnitude
    cheaper than materializing the join it describes. All-integer
    arithmetic, so the 'estimate' is exact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("n_a"))
    b = c.groupBy(F.col("c_custkey").alias("k")).agg(F.count(F.lit(1)).alias("n_b"))
    return (
        a.join(b, "k")
        .agg(
            F.sum(F.col("n_a") * F.col("n_b")).cast("bigint").alias("join_rows"),
            F.sum("n_a").cast("bigint").alias("left_rows"),
            F.count(F.lit(1)).cast("bigint").alias("matched_keys"),
            F.max(F.col("n_a") * F.col("n_b")).cast("bigint").alias("hottest_key_rows"),
        )
    )


@register(
    "part_skyline",
    """
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of the part catalog — the classic
    multi-objective OLAP operator (Börzsönyi et al., ICDE'01): parts
    not DOMINATED on (price ↓ better, size ↑ better); a dominator is
    ≤ on price, ≥ on size, strict on at least one. Equal (price,
    size) twins dominate neither and both survive.

    The oracle is the quadratic NOT-EXISTS ground truth; the Spark
    side is the O(n log n) sort-based plan that scales: collapse to
    one row per price (per-price max size — same-price smaller rows
    are dominated), take the EXCLUSIVE global running max of size in
    price order via the two-pass ranking module (no unpartitioned
    window ever sees the data; ranking.with_global_running_max), and
    a price group survives iff its max size strictly exceeds every
    strictly-cheaper size seen (NULL at the cheapest price = survive).
    Joining survivors back to the catalog keeps exactly the
    size == per-price-max rows. One groupBy exchange + the bounded
    two-pass stats table — never the n² pair set."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    from .ranking import with_global_running_max

    groups = p.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    cm = with_global_running_max(
        groups, [("p_retailprice", "asc")], "gmax"
    )
    survivors = cm.where(
        F.col("run_max").isNull() | (F.col("gmax") > F.col("run_max"))
    ).select("p_retailprice", "gmax")
    return p.join(survivors, "p_retailprice").where(
        F.col("p_size") == F.col("gmax")
    ).select("p_partkey", "p_retailprice", "p_size")
