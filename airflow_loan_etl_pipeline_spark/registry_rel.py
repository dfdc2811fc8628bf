"""Registry entries: additional relational breadth — HAVING, CASE
bucketing, string/array scalar functions, grouping sets, correlated
aggregates, range join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_loan_etl_pipeline_spark.catalog import load_table, register_views
from airflow_loan_etl_pipeline_spark.operators import stats as ST
from airflow_loan_etl_pipeline_spark.registry import query


@query(
    "orders_having",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS loan_count
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    HAVING count(*) >= 500
    """,
)
def orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("loan_count"))
        .filter(F.col("loan_count") >= 500)
    )


@query(
    "price_buckets",
    oracle="""
    SELECT cast(floor(o_totalprice / 50000) AS bigint) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY 1
    """,
)
def price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram bucketing via floor-division (M1-style arithmetic)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / 50000))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@query(
    "customer_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_mktsegment, 'A', '_') AS seg_repl,
           concat(c_mktsegment, '#', cast(c_nationkey AS varchar)) AS seg_tag,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
    FROM customer
    """,
)
def customer_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR1-style scalar string surface (upper/length/substr/replace/
    concat/LIKE) — all codegen'd natives."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace(F.col("c_mktsegment"), "A", "_").alias("seg_repl"),
        F.concat_ws("", F.col("c_mktsegment"), F.lit("#"),
                    F.col("c_nationkey").cast("string")).alias("seg_tag"),
        F.when(F.col("c_name").like("%1%"), 1).otherwise(0).alias("has_one"),
    )


@query(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS loan_count,
           round(sum(o_totalprice), 2) AS total_amount
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the SQL surface (Catalyst expands to
    one Expand + single aggregate — not three scans)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(1) AS loan_count,
               round(sum(o_totalprice), 2) AS total_amount
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o.o_orderkey
    FROM orders o
    JOIN (SELECT o_custkey, avg(o_totalprice) AS avg_price
          FROM orders GROUP BY o_custkey) a
      ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_price * 1.5
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern (orders 50% above their customer's
    mean), decorrelated to groupBy + self-join — the shape Catalyst
    rewrites correlated scalar subqueries into anyway."""
    o = load_table(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_price") * 1.5)
        .select("o_orderkey")
    )


@query(
    "embedding_vector_stats",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(v, v)), 6) AS l2_norm,
           round(list_aggregate(v, 'sum') / len(v), 6) AS mean_elem,
           round(list_aggregate(v, 'max'), 6) AS max_elem,
           len(v) AS dim
    FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings)
    """,
)
def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface over the embedding column: norms, moments
    — pure projections over ArrayType, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.expr("transform(embedding, x -> cast(x AS double))")
    )
    dot = (
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 AS double), "
        "(acc, w) -> acc + w)"
    )
    return e.select(
        "vec_id",
        F.round(F.expr(f"sqrt({dot})"), 6).alias("l2_norm"),
        F.round(
            F.expr("aggregate(v, cast(0.0 AS double), (acc, x) -> acc + x)")
            / F.size("v"),
            6,
        ).alias("mean_elem"),
        F.round(F.array_max("v"), 6).alias("max_elem"),
        F.size("v").alias("dim"),
    )


@query(
    "events_range_join",
    oracle="""
    WITH ranges AS (
        SELECT * FROM (VALUES
            ('tiny',   0.0,   10.0),
            ('small', 10.0,   50.0),
            ('mid',   50.0,  200.0),
            ('large', 200.0, 1e9)
        ) AS t(tier, lo, hi)
    )
    SELECT r.tier, count(*) AS n_events, round(sum(e.value), 2) AS total_value
    FROM events e JOIN ranges r ON e.value >= r.lo AND e.value < r.hi
    GROUP BY r.tier
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join against a tier dimension. Small side broadcasts
    → BroadcastNestedLoopJoin with the band predicate; the 100 TB path
    for large range dims is bucketize-then-equi-join (see asof.py for
    the same reasoning applied to time)."""
    ev = load_table(spark, sf_dir, "events")
    ranges = ev.sparkSession.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 50.0),
         ("mid", 50.0, 200.0), ("large", 200.0, 1e9)],
        "tier string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(ranges),
        on=[F.col("value") >= F.col("lo"), F.col("value") < F.col("hi")],
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "status_multiset_ops",
    oracle="""
    SELECT o_orderstatus FROM orders WHERE o_totalprice > 150000
    INTERSECT ALL
    SELECT o_orderstatus FROM orders WHERE o_totalprice < 50000
    """,
)
def status_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set-op semantics: INTERSECT ALL keeps duplicate
    multiplicity min(l, r) — a different operator from the set-semantics
    intersect (nation_keys_intersect). Spark plans both as aggregates of
    per-side counts, no sort."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 150000).select("o_orderstatus")
    lo = o.filter(F.col("o_totalprice") < 50000).select("o_orderstatus")
    return hi.intersectAll(lo)


@query(
    "part_price_unpivot",
    oracle="""
    SELECT p_partkey, kind, amount FROM (
        SELECT p_partkey, p_retailprice,
               round(p_retailprice * 0.9, 2) AS discounted
        FROM part
    ) UNPIVOT (amount FOR kind IN (p_retailprice, discounted))
    """,
)
def part_price_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt (wide → long): the inverse of orders_pivot_status.
    Generator-style projection, no shuffle."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        F.round(F.col("p_retailprice") * 0.9, 2).alias("discounted"),
    )
    return p.unpivot(
        "p_partkey", ["p_retailprice", "discounted"], "kind", "amount"
    )


@query(
    "nation_extreme_customers",
    oracle="""
    SELECT c_nationkey,
           arg_max(c_name, c_acctbal) AS richest,
           arg_min(c_name, c_acctbal) AS poorest,
           round(max(c_acctbal), 2) AS max_bal
    FROM customer
    GROUP BY c_nationkey
    """,
)
def nation_extreme_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregates): one hash-agg pass instead of
    the window-rank-filter idiom — half the shuffles for 'row with the
    extreme value per group'. (Names are unique per acctbal extreme in
    the fixture, so the arg aggregates are deterministic.)"""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.expr("max_by(c_name, c_acctbal)").alias("richest"),
        F.expr("min_by(c_name, c_acctbal)").alias("poorest"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


@query(
    "lineitem_stats_aggs",
    oracle="""
    SELECT l_linestatus,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_discount, l_tax), 6) AS cov_disc_tax
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def lineitem_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate breadth: stddev/variance/correlation/
    covariance — all single-pass mergeable (partial+final) aggregates,
    the property that matters for 100 TB: no second pass over the data.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(ST.safe_corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_discount", "l_tax"), 6).alias("cov_disc_tax"),
    )


@query(
    "customer_regexp_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS cust_num,
           regexp_replace(c_name, '[0-9]+', '#') AS name_masked,
           regexp_matches(c_name, '^Customer#0*[0-9]{1,3}$') AS short_id
    FROM customer
    """,
)
def customer_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: extract / replace / match predicate. Patterns
    kept to the RE2 ∩ Java-regex common subset so both engines agree."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("cust_num"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.col("c_name").rlike("^Customer#0*[0-9]{1,3}$").alias("short_id"),
    )


@query(
    "orders_union_by_name",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority
    FROM (
        SELECT * FROM (SELECT o_orderkey, o_totalprice FROM orders
                       WHERE o_orderstatus = 'F')
        UNION ALL BY NAME
        SELECT * FROM (SELECT o_orderkey, o_orderpriority FROM orders
                       WHERE o_orderstatus = 'O')
    )
    """,
)
def orders_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (SET1 extension): two inputs with
    different column sets align BY NAME, absent columns null-filled —
    ``unionByName(allowMissingColumns=True)``, the semantics a
    multi-vintage file lake needs (the reference's glob scan silently
    requires identical schemas)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True)


_WINDOW_NAV_Q = """
SELECT o_orderkey, o_custkey,
       round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       row_number() OVER w AS rn,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

_WINDOW_FRAME_Q = """
SELECT o_orderkey, o_custkey,
       avg(round(o_totalprice * 100)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0 AS ma3,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
       count(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
           AS n_last_30d
FROM orders
"""


@query("orders_window_nav", oracle=_WINDOW_NAV_Q)
def orders_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation + ranking window functions (lag/lead/first_value/
    row_number/ntile/percent_rank) over one shared window — Spark
    evaluates all seven in a single Window exec after one shuffle+sort
    on the partition key."""
    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_NAV_Q)


@query("orders_window_frames", oracle=_WINDOW_FRAME_Q)
def orders_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec breadth: ROWS (moving avg, running sum) vs RANGE over
    an event-time interval (count in trailing 30 days) — the frame type
    changes the aggregation buffer, not the shuffle."""
    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_FRAME_Q)


@query(
    "orders_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               min(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    activity AS (
        SELECT DISTINCT o_custkey,
               date_trunc('month', o_orderdate) AS m
        FROM orders
    )
    SELECT CAST(f.cohort AS DATE) AS cohort_month,
           CAST(date_diff('month', f.cohort, a.m) AS INT) AS months_since,
           count(DISTINCT a.o_custkey) AS active_customers
    FROM activity a JOIN firsts f USING (o_custkey)
    GROUP BY 1, 2
    """,
)
def orders_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers bucketed by first-order month, then
    counted per months-elapsed — the product-analytics staple. Two
    aggregates over the same scan (first-order month, distinct active
    months) joined on the customer key; output cardinality is
    months², independent of fact size. months_between on month
    truncations is integral, so the cross-engine cast is exact."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    activity = orders.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).distinct()
    return (
        activity.join(firsts, "o_custkey")
        .select(
            F.col("cohort").cast("date").alias("cohort_month"),
            F.months_between("m", "cohort").cast("int").alias("months_since"),
            "o_custkey",
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


@query(
    "events_user_value_anomalies",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               avg(value) AS mu,
               stddev_samp(value) AS sigma,
               count(*) AS n
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id,
           round((e.value - s.mu) / s.sigma, 2) AS zscore
    FROM events e JOIN stats s USING (user_id)
    WHERE s.n >= 30 AND s.sigma > 0
      AND abs((e.value - s.mu) / s.sigma) > 3.0
    """,
)
def events_user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flagging — the monitoring query every
    metrics pipeline runs. Per-user moments are ONE hash aggregate
    (map-side partial); the fact table is then re-scanned once and
    joined to the tiny stats side (broadcast at any realistic user
    count). The z-score itself is rounded to 2 dp well away from
    cross-engine ulp drift; the >3 sigma cut uses the raw value on
    both engines identically."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "user_id")
        .filter((F.col("n") >= 30) & (F.col("sigma") > 0) & (F.abs(z) > 3.0))
        .select("user_id", "event_id", F.round(z, 2).alias("zscore"))
    )


@query(
    "orders_expectations",
    oracle="""
    SELECT r.rule,
           CASE r.rule
             WHEN 'totalprice_positive' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_totalprice > 0, FALSE))
             WHEN 'status_known' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE))
             WHEN 'custkey_present' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_custkey IS NOT NULL, FALSE))
             WHEN 'orderdate_in_range' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1992-01-01'
                      AND o_orderdate < TIMESTAMP '2000-01-01', FALSE))
           END AS n_violations,
           (SELECT count(*) FROM orders) AS n_rows,
           CASE r.rule
             WHEN 'totalprice_positive' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_totalprice > 0, FALSE)) = 0
             WHEN 'status_known' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)) = 0
             WHEN 'custkey_present' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_custkey IS NOT NULL, FALSE)) = 0
             WHEN 'orderdate_in_range' THEN
               (SELECT count(*) FROM orders
                WHERE NOT coalesce(o_orderdate >= TIMESTAMP '1992-01-01'
                      AND o_orderdate < TIMESTAMP '2000-01-01', FALSE)) = 0
           END AS passed
    FROM (SELECT unnest(['totalprice_positive', 'status_known',
                         'custkey_present', 'orderdate_in_range']) AS rule) r
    """,
)
def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations over orders — the reference's declared
    roadmap item (README.md:222) engine-side: every rule counted in ONE
    scan via conditional sums (no shuffle of data rows), NULL-as-
    violation semantics on both engines."""
    from airflow_loan_etl_pipeline_spark.operators.validate import (
        check_expectations,
    )

    o = load_table(spark, sf_dir, "orders")
    rules = [
        ("totalprice_positive", F.col("o_totalprice") > 0),
        ("status_known", F.col("o_orderstatus").isin("O", "F", "P")),
        ("custkey_present", F.col("o_custkey").isNotNull()),
        (
            "orderdate_in_range",
            (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")),
        ),
    ]
    return check_expectations(o, rules)


_FUZZY_Q = """
WITH names AS (SELECT DISTINCT p_name FROM part),
blocked AS (
    SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM names
)
SELECT l.p_name AS name_a, r.p_name AS name_b,
       levenshtein(l.p_name, r.p_name) AS dist
FROM blocked l
JOIN blocked r ON l.blk = r.blk AND l.p_name < r.p_name
WHERE levenshtein(l.p_name, r.p_name) <= 3
ORDER BY name_a, name_b
"""


@query("part_name_fuzzy_pairs", oracle=_FUZZY_Q)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching with BLOCKING — the typo-dedup
    pattern for entity names. Candidate pairs are restricted to names
    sharing a blocking key (the head noun) before the quadratic
    levenshtein verify, the same block-then-verify shape as the LSH
    dedup family: at 100 TB the cross join is bounded per block, never
    global. Distinct names first — 64 names, not 2000 parts, enter the
    pair stage."""
    register_views(spark, sf_dir)
    return spark.sql(_FUZZY_Q)


@query(
    "events_key_skew",
    oracle="""
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
    t AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys FROM c)
    SELECT user_id, cnt,
           round(cnt / (SELECT n_rows FROM t), 4) AS row_share,
           round(cnt / ((SELECT n_rows FROM t) / (SELECT n_keys FROM t)), 4)
               AS x_uniform
    FROM c ORDER BY cnt DESC, user_id ASC LIMIT 10
    """,
)
def events_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic on the events user_id — the pre-flight
    measurement that decides salting/AQE-skew handling before a 100 TB
    join discovers the straggler."""
    from airflow_loan_etl_pipeline_spark.operators.validate import key_skew_stats

    return key_skew_stats(load_table(spark, sf_dir, "events"), "user_id")


@query(
    "documents_checksum",
    oracle="""
    WITH h AS (SELECT ('0x' || substr(md5(
            concat_ws(chr(31),
                coalesce(doc_id::VARCHAR, chr(0)),
                coalesce(text, chr(0)),
                coalesce(lang, chr(0)),
                coalesce(source, chr(0)),
                coalesce(n_chars::VARCHAR, chr(0)))), 1, 15))::BIGINT AS hh
        FROM documents)
    SELECT count(*) AS n_rows,
           cast(sum(hh) % 2305843009213693952 AS BIGINT) AS checksum
    FROM h
    """,
)
def documents_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive corpus-release checksum over every documents
    column — partitioning/ordering independent by construction."""
    from airflow_loan_etl_pipeline_spark.operators.validate import table_checksum

    return table_checksum(load_table(spark, sf_dir, "documents"))


@query(
    "part_pareto_frontier",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """,
)
def part_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline over part (minimize retail price, maximize size):
    parts no other part beats on both axes. The oracle's quadratic
    NOT EXISTS is the semantics; the engine runs the O(n log n)
    distributed shape (distinct-price collapse -> distributed prefix
    max -> broadcast join back), never a self-join."""
    from airflow_loan_etl_pipeline_spark.operators.topk import pareto_frontier

    part = load_table(spark, sf_dir, "part")
    return pareto_frontier(
        part.select("p_partkey", "p_retailprice", "p_size"),
        min_col="p_retailprice",
        max_col="p_size",
    )


@query(
    "orders_cohort_ltv",
    oracle="""
    WITH f AS (SELECT o_custkey,
                      min(date_trunc('month', o_orderdate)) AS cohort
               FROM orders GROUP BY 1),
         r AS (SELECT f.cohort,
                      (year(o.o_orderdate) - year(f.cohort)) * 12
                        + (month(o.o_orderdate) - month(f.cohort))
                        AS months_elapsed,
                      CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
               FROM orders o JOIN f ON o.o_custkey = f.o_custkey),
         m AS (SELECT cohort::DATE AS cohort, months_elapsed,
                      CAST(sum(cents) AS BIGINT) AS rev_c
               FROM r GROUP BY 1, 2)
    SELECT cohort, months_elapsed,
           round(rev_c / 1e2, 2) AS revenue,
           round(CAST(sum(rev_c) OVER (PARTITION BY cohort
                                       ORDER BY months_elapsed
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 / 1e2, 2) AS cumulative_revenue
    FROM m
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: revenue and CUMULATIVE revenue per
    (first-order month, months elapsed) — the monetary companion to
    retention cohorts. Revenue accumulates in exact integer cents; the
    running sum's window runs over the bounded cohort x month grid,
    never the facts."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    r = orders.join(f, "o_custkey").select(
        F.to_date("cohort").alias("cohort"),
        (
            (F.year("o_orderdate") - F.year("cohort")) * 12
            + (F.month("o_orderdate") - F.month("cohort"))
        ).alias("months_elapsed"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = r.groupBy("cohort", "months_elapsed").agg(
        F.sum("cents").alias("rev_c")
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("cohort")
        .orderBy("months_elapsed")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return m.select(
        "cohort",
        "months_elapsed",
        F.round(F.col("rev_c") / 1e2, 2).alias("revenue"),
        F.round(F.sum("rev_c").over(w) / 1e2, 2).alias(
            "cumulative_revenue"
        ),
    )


@query(
    "nation_trade_balance",
    oracle="""
    WITH supply AS (
      SELECT s.s_nationkey AS nationkey,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                 * 100) AS BIGINT)) AS BIGINT) AS supply_c
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1),
    demand AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS demand_c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1)
    SELECT n.n_name AS nation,
           round(coalesce(supply_c, 0) / 1e2, 2) AS supply_revenue,
           round(coalesce(demand_c, 0) / 1e2, 2) AS demand_spend,
           round((coalesce(supply_c, 0) - coalesce(demand_c, 0)) / 1e2, 2)
             AS balance
    FROM nation n
    LEFT JOIN supply ON supply.nationkey = n.n_nationkey
    LEFT JOIN demand ON demand.nationkey = n.n_nationkey
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: revenue supplied (via supplier side)
    vs money spent (via customer side) and the net — both sides
    accumulate in exact integer cents with broadcast dims; the final
    combine joins two |nations|-row aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    supply = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("long")
            ).alias("supply_c")
        )
    )
    demand = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "demand_c"
            )
        )
    )
    return (
        nation.join(
            F.broadcast(supply), F.col("n_nationkey") == supply.nationkey, "left"
        )
        .join(
            F.broadcast(demand), F.col("n_nationkey") == demand.nationkey, "left"
        )
        .select(
            F.col("n_name").alias("nation"),
            F.round(F.coalesce(F.col("supply_c"), F.lit(0)) / 1e2, 2).alias(
                "supply_revenue"
            ),
            F.round(F.coalesce(F.col("demand_c"), F.lit(0)) / 1e2, 2).alias(
                "demand_spend"
            ),
            F.round(
                (
                    F.coalesce(F.col("supply_c"), F.lit(0))
                    - F.coalesce(F.col("demand_c"), F.lit(0))
                )
                / 1e2,
                2,
            ).alias("balance"),
        )
    )


@query(
    "orders_sla_breach_by_priority",
    oracle="""
    WITH first_ship AS (SELECT l_orderkey, min(l_shipdate) AS first_ship
                        FROM lineitem GROUP BY 1),
         j AS (SELECT o.o_orderpriority,
                      CASE WHEN date_diff('day', o.o_orderdate::DATE,
                                          f.first_ship::DATE) > 30
                           THEN 1 ELSE 0 END AS breach
               FROM orders o JOIN first_ship f
                 ON o.o_orderkey = f.l_orderkey)
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(breach) AS BIGINT) AS n_breached,
           floor(sum(breach) * 1e4 / count(*)) / 1e4 AS breach_share
    FROM j GROUP BY 1
    """,
)
def orders_sla_breach_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA: share of orders whose FIRST line shipped more
    than 30 days after ordering, by priority — the ops KPI behind the
    lead-time percentiles. min-ship per order is one key-partitioned
    aggregate; the date arithmetic is exact integer days."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    breach = F.when(
        F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate")) > 30, 1
    ).otherwise(0)
    return (
        orders.join(
            first_ship, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .select("o_orderpriority", breach.alias("_b"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("_b").alias("n_breached"),
            (
                F.floor(F.sum("_b") * 1e4 / F.count(F.lit(1))) / 1e4
            ).alias("breach_share"),
        )
    )


@query(
    "returns_rate_by_brand",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_lines,
           count(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS n_returned,
           floor(count(CASE WHEN l.l_returnflag = 'R' THEN 1 END) * 1e4
                 / count(*)) / 1e4 AS return_share,
           round(sum(CASE WHEN l.l_returnflag = 'R'
                          THEN l.l_extendedprice ELSE 0 END), 2)
             AS returned_value
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def returns_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate and returned value per brand — the retail quality
    KPI. Broadcast part dim, one conditional aggregate over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ret = F.when(F.col("l_returnflag") == "R", 1)
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(ret).alias("n_returned"),
            (
                F.floor(F.count(ret) * 1e4 / F.count(F.lit(1))) / 1e4
            ).alias("return_share"),
            F.round(
                F.sum(
                    F.when(
                        F.col("l_returnflag") == "R", F.col("l_extendedprice")
                    ).otherwise(0.0)
                ),
                2,
            ).alias("returned_value"),
        )
    )


@query(
    "parts_single_sourced",
    oracle="""
    WITH ps AS (SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
                FROM lineitem GROUP BY 1)
    SELECT count(*) AS n_parts_traded,
           count(CASE WHEN n_suppliers = 1 THEN 1 END) AS n_single_sourced,
           floor(count(CASE WHEN n_suppliers = 1 THEN 1 END) * 1e4
                 / count(*)) / 1e4 AS single_source_share,
           max(n_suppliers) AS max_suppliers
    FROM ps
    """,
)
def parts_single_sourced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-point-of-failure screen: parts whose entire traded volume
    comes from ONE supplier — the per-part complement of the HHI
    concentration index. One distinct-count aggregate keyed on part."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    single = F.col("n_suppliers") == 1
    return ps.agg(
        F.count(F.lit(1)).alias("n_parts_traded"),
        F.count(F.when(single, 1)).alias("n_single_sourced"),
        (
            F.floor(F.count(F.when(single, 1)) * 1e4 / F.count(F.lit(1)))
            / 1e4
        ).alias("single_source_share"),
        F.max("n_suppliers").alias("max_suppliers"),
    )
