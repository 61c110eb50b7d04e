"""Part B — relational core: scan / project / filter / join / agg / set ops.

SURVEY.md §2 Part B (b1-b22). All pure DataFrame API; Catalyst supplies
pushdown, pruning, partial/final aggregation and join-strategy selection
(verified by plan assertions in tests/test_plans.py).

Scale stance: filters and projections are expressed so they reach the
parquet scan; small dimension sides are explicitly ``F.broadcast``-ed in
the star join; everything else is left to AQE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join_first_later, asof_join_last_earlier
from ..functions.rounding import (
    cents,
    dec_sum,
    exact_mean6,
    exact_round_ratio,
    sql_cents,
    sql_exact_mean6,
    sql_exact_round_ratio,
)
from ..functions.casefold import guarded_upper, sql_guarded_upper
from ..registry import register
from ..sources import register_views
from .util import r2, r6, t


# --------------------------------------------------------------------------
@register(
    "b1_scan_project",
    # flag_u rides the r11 case-fold guard (functions/casefold.py):
    # l_returnflag is raw data, and upper() diverges across engines on
    # 172 probed codepoints — NULL outside the agreeing domain.
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS base_price,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price,
           {sql_guarded_upper('l_returnflag')} AS flag_u
    FROM lineitem
    """,
)
def b1_scan_project(spark, sf_dir):
    """Parquet scan with projection + computed/renamed columns."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("base_price"),
        r6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        guarded_upper("l_returnflag").alias("flag_u"),
    )


# --------------------------------------------------------------------------
@register(
    "b2_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 30
      AND l_returnflag IN ('A', 'R')
      AND (l_discount > 0.07 OR l_tax < 0.02)
      AND NOT l_linestatus = 'X'
      AND l_shipdate IS NOT NULL
      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    """,
)
def b2_filter_pred(spark, sf_dir):
    """Compound predicates: BETWEEN / IN / OR / NOT / null-check / range.

    All of these reach the parquet scan as PushedFilters (asserted in
    tests/test_plans.py) — at 100 TB this is row-group skipping.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 30)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") > 0.07) | (F.col("l_tax") < 0.02))
        & ~(F.col("l_linestatus") == "X")
        & F.col("l_shipdate").isNotNull()
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")


# --------------------------------------------------------------------------
@register(
    "b3_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           round(greatest(o_totalprice, 150000.0), 6) AS at_least,
           round(least(o_totalprice, 150000.0), 6) AS at_most
    FROM orders
    """,
)
def b3_case_when(spark, sf_dir):
    """Conditional projection: CASE WHEN, coalesce/nullif, greatest/least."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        r6(F.greatest("o_totalprice", F.lit(150000.0))).alias("at_least"),
        r6(F.least("o_totalprice", F.lit(150000.0))).alias("at_most"),
    )


# --------------------------------------------------------------------------
@register(
    "b4_agg_global",
    oracle=f"""
    SELECT round(sum(l_quantity), 2)       AS sum_qty,
           {sql_exact_round_ratio(
               'sum(CAST(round(l_extendedprice * 100) AS BIGINT))',
               '100 * count(*)', dp=2)}      AS avg_price,
           round(min(l_extendedprice), 6)  AS min_price,
           round(max(l_extendedprice), 6)  AS max_price,
           count(*)                        AS n_rows,
           count(DISTINCT l_orderkey)      AS n_orders
    FROM lineitem
    """,
)
def b4_agg_global(spark, sf_dir):
    """Global (no-group) aggregate: sum/avg/min/max/count/count-distinct."""
    li = t(spark, sf_dir, "lineitem")
    # avg_price: prices are exact 2dp multiples, so the mean is
    # computed on an exact cents sum (functions/rounding) — a float-sum
    # mean can land either side of an exact rational half, where the
    # engines' round() conventions split (the f47 class at 2dp).
    # Integerization is (x*100 + 0.5) cast bigint, valid because the
    # values are NON-NEGATIVE and x*100 sits within 1e-9 of its
    # integer — cheaper per row than Round-on-double, which goes
    # through BigDecimal (measured ~0.2 s over this scan at sf0.1).
    return (
        li.agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            dec_sum((F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")).alias("__sp"),
            r6(F.min("l_extendedprice")).alias("min_price"),
            r6(F.max("l_extendedprice")).alias("max_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .withColumn("avg_price", exact_round_ratio("__sp", "(100 * n_rows)", dp=2))
        .select(
            "sum_qty", "avg_price", "min_price", "max_price",
            "n_rows", "n_orders",
        )
    )


# --------------------------------------------------------------------------
@register(
    "b5_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           {sql_exact_round_ratio(
               f'sum({sql_cents("l_extendedprice")}'
               f'    * (100 - {sql_cents("l_discount")}))',
               '10000', dp=2)}             AS sum_disc_price,
           {sql_exact_round_ratio(
               f'sum({sql_cents("l_extendedprice")}'
               f'    * (100 - {sql_cents("l_discount")})'
               f'    * (100 + {sql_cents("l_tax")}))',
               '1000000', dp=2)}           AS sum_charge,
           {sql_exact_round_ratio(
               'sum(CAST(round(l_quantity * 100) AS BIGINT))',
               '100 * count(*)', dp=6)}    AS avg_qty,
           {sql_exact_round_ratio(
               'sum(CAST(round(l_extendedprice * 100) AS BIGINT))',
               '100 * count(*)', dp=2)}    AS avg_price,
           {sql_exact_round_ratio(
               'sum(CAST(round(l_discount * 100) AS BIGINT))',
               '100 * count(*)', dp=6)}    AS avg_disc,
           count(*)                       AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b5_agg_groupby(spark, sf_dir):
    """TPC-H Q1-shaped hash aggregate (the flagship query).

    Catalyst plans partial (map-side) + final HashAggregate around one
    shuffle on the 6-value grouping key — the shape that scales to 100 TB
    because the shuffle carries only 6 x n_partitions pre-aggregated rows.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            # sum of 2dp-multiple terms: true sum is a 2dp multiple,
            # never at a half-cent -> plain float sum is safe
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            # 4dp/6dp-multiple terms CAN sum to an exact half-cent ->
            # exact integer units (functions/rounding scope note; the
            # r8 storm-probe c1 catch). dec_sum: the charge accumulator
            # saturates a bigint near SF160 (ADVICE r8 high item) —
            # per-row terms stay bigint, the SUM is DECIMAL(38,0).
            dec_sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("__dp4"),
            dec_sum(
                cents("l_extendedprice")
                * (100 - cents("l_discount"))
                * (100 + cents("l_tax"))
            ).alias("__ch6"),
            # the three avgs average exact 2dp multiples -> exact cents
            # sums + integer rounding (functions/rounding; see b4)
            # quantity-cents (<=5e3/row) and discount-cents (<=1e2/row)
            # stay bigint: even at SF1e5 (~6e11 lineitem rows, 100 TB)
            # the worst-case sums are 3e15 / 6e13 — >=3000x int64
            # headroom, so the decimal lift would buy nothing and
            # decimal sums measure ~2x the agg cost. Price-cents
            # (<=1e7/row -> 6e18, 1.5x headroom) keeps the lift.
            F.sum((F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")).alias("__sq"),
            dec_sum((F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")).alias("__sp"),
            F.sum((F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint")).alias("__sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("sum_disc_price", exact_round_ratio("__dp4", "10000", dp=2))
        .withColumn("sum_charge", exact_round_ratio("__ch6", "1000000", dp=2))
        .withColumn("avg_qty", exact_round_ratio("__sq", "(100 * count_order)", dp=6))
        .withColumn("avg_price", exact_round_ratio("__sp", "(100 * count_order)", dp=2))
        .withColumn("avg_disc", exact_round_ratio("__sd", "(100 * count_order)", dp=6))
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
            "avg_disc", "count_order",
        )
    )


# --------------------------------------------------------------------------
@register(
    "b6_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)        AS n_users,
           round(sum(DISTINCT value), 2)  AS sum_distinct_value,
           count(*)                       AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def b6_count_distinct(spark, sf_dir):
    """Distinct aggregation: exact count(DISTINCT) and sum(DISTINCT)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        r2(F.sum_distinct(F.col("value"))).alias("sum_distinct_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
@register(
    "b7_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) > 12
    """,
)
def b7_having(spark, sf_dir):
    """Post-aggregation filter (HAVING)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r2(F.sum("o_totalprice")).alias("spend"),
        )
        .filter(F.col("n_orders") > 12)
    )


# --------------------------------------------------------------------------
@register(
    "b8_join_inner_eq",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def b8_join_inner_eq(spark, sf_dir):
    """Inner equi-join; AQE broadcasts the customer side when it is small."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


# --------------------------------------------------------------------------
@register(
    "b9_join_multiway_star",
    oracle=f"""
    SELECT n.n_name,
           {sql_exact_round_ratio(
               f'sum({sql_cents("l.l_extendedprice")}'
               f'    * (100 - {sql_cents("l.l_discount")}))',
               '10000', dp=2)} AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def b9_join_multiway_star(spark, sf_dir):
    """TPC-H Q5-shaped star join: fact ⋈ 4 dims, dims broadcast.

    Explicit ``F.broadcast`` on nation/region (always tiny) keeps the big
    fact table shuffle-free on those edges at any scale; customer is left
    to AQE (small here, shuffle-hash at 100 TB).
    """
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            # exact integer disc-price sum (4dp-multiple terms; see
            # functions/rounding scope note — the r8 storm-probe class;
            # dec_sum for the 100-TB accumulator bound, r9)
            dec_sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("__r4"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .withColumn("revenue", exact_round_ratio("__r4", "10000", dp=2))
        .select("n_name", "revenue", "n_lineitems")
    )


# --------------------------------------------------------------------------
@register(
    "b10_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c.c_custkey = o.o_custkey
    """,
)
def b10_join_outer(spark, sf_dir):
    """Left outer join with null extension (customers w/o 'P' orders)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


# --------------------------------------------------------------------------
@register(
    "b11_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def b11_join_semi(spark, sf_dir):
    """Left semi join: customers with ≥1 pending order, no right columns."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
@register(
    "b12_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
)
def b12_join_anti(spark, sf_dir):
    """Left anti join: customers with no order above 400k (Q22-shaped)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
@register(
    "b13_join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def b13_join_cross(spark, sf_dir):
    """Cross product of two small inputs (5 regions x 3 statuses)."""
    r = t(spark, sf_dir, "region").select("r_name")
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


# --------------------------------------------------------------------------
@register(
    "b14_join_theta_range",
    oracle="""
    SELECT p.p_partkey, l.l_orderkey, l.l_linenumber,
           p.p_retailprice, l.l_extendedprice
    FROM (SELECT * FROM part WHERE p_size = 1) p
    JOIN (SELECT * FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00') l
      ON l.l_extendedprice BETWEEN p.p_retailprice * 0.9
                               AND p.p_retailprice * 1.1
    """,
)
def b14_join_theta_range(spark, sf_dir):
    """Pure theta (range-predicate) join on bounded inputs.

    Spark plans BroadcastNestedLoopJoin with the filtered part side
    broadcast. Scale note: at 100 TB you bound one side (as here) or
    bucketize the range key into an equi-join prefilter (the approach the
    as-of composite in operators/asof.py uses).
    """
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 1)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    cond = F.col("l_extendedprice").between(
        F.col("p_retailprice") * 0.9, F.col("p_retailprice") * 1.1
    )
    return F.broadcast(p).join(li, cond).select(
        "p_partkey", "l_orderkey", "l_linenumber", "p_retailprice", "l_extendedprice"
    )


# --------------------------------------------------------------------------
@register(
    "b15_join_asof",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id AS purchase_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, round(p.value, 6) AS purchase_value,
           c.click_id AS last_click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def b15_join_asof(spark, sf_dir):
    """As-of join: each purchase matched to the user's latest click at-or-
    before it. Spark has no native ASOF — composed in operators/asof.py
    via the union + last_value(ignoreNulls) window trick (single shuffle,
    no range explosion). Clicks are pre-deduped to one per (user, ts) so
    the DuckDB ASOF tie behavior is deterministic.
    """
    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        r6(F.col("value")).alias("purchase_value"),
    )
    return asof_join_last_earlier(
        left=purchases,
        right=clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value="click_id",
        out_value="last_click_id",
    ).select("purchase_id", "user_id", "purchase_value", "last_click_id")


# --------------------------------------------------------------------------
_B16_ORACLE_SLICES = """
    (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
     WHERE year(o_orderdate) = 1995)
    {op}
    (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
     WHERE o_totalprice > 450000)
"""


@register(
    "b16_union_all",
    oracle="SELECT * FROM (" + _B16_ORACLE_SLICES.format(op="UNION ALL") + ")",
)
def b16_union_all(spark, sf_dir):
    """UNION ALL of two overlapping order slices (duplicates preserved)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b = o.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return a.unionByName(b)


@register(
    "b17_union_distinct",
    oracle="SELECT * FROM (" + _B16_ORACLE_SLICES.format(op="UNION") + ")",
)
def b17_union_distinct(spark, sf_dir):
    """UNION (distinct) of the same two slices."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    b = o.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return a.unionByName(b).distinct()


@register(
    "b18_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def b18_intersect(spark, sf_dir):
    """INTERSECT (distinct): customers ordering in both 1995 and 1996."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b)


@register(
    "b19_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def b19_except(spark, sf_dir):
    """EXCEPT (distinct): 1995 customers who did not order in 1996."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.subtract(b)


# --------------------------------------------------------------------------
@register(
    "b20_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_totalprice, status_nullable,
           row_number() OVER (
             ORDER BY o_totalprice DESC,
                      status_nullable ASC NULLS FIRST,
                      o_orderkey ASC) AS sort_pos
    FROM (SELECT o_orderkey, o_totalprice,
                 nullif(o_orderstatus, 'P') AS status_nullable
          FROM orders)
    """,
)
def b20_sort_multikey(spark, sf_dir):
    """Multi-key sort with mixed direction + explicit null placement.

    The t2 hash is order-insensitive, so the sort is PROVEN by
    materializing the global position as ``sort_pos`` — computed with
    the two-phase distributed rank (range partition → local row_number
    → broadcast prefix offsets, ``operators/rank.py``), NOT an
    unpartitioned window: same numbers, no single-reducer sort, so the
    shape survives 100×. orderBy itself is also applied so the physical
    plan contains the (sampled, parallel) global Sort.
    """
    from ..operators.rank import with_global_row_number

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.nullif("o_orderstatus", F.lit("P")).alias("status_nullable"),
    )
    order = [
        F.col("o_totalprice").desc(),
        F.col("status_nullable").asc_nulls_first(),
        F.col("o_orderkey").asc(),
    ]
    # local_checkpoint: single-JVM sandbox, where executor loss is job
    # loss anyway — a real cluster deployment passes "persist"
    return with_global_row_number(
        o, order, "sort_pos", materialize="local_checkpoint"
    ).orderBy(*order)


# --------------------------------------------------------------------------
@register(
    "b21_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def b21_limit_topk(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    top-k then merge — no global sort, the 100-TB-safe shape)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
@register(
    "b22_distinct_rows",
    oracle="SELECT DISTINCT event_type, user_id FROM events",
)
def b22_distinct_rows(spark, sf_dir):
    """Row dedup via DISTINCT (hash aggregate on all columns)."""
    ev = t(spark, sf_dir, "events")
    return ev.select("event_type", "user_id").distinct()


# --------------------------------------------------------------------------
@register(
    "b23_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
    """,
)
def b23_exists_subquery(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS via the SQL entry point — Catalyst
    decorrelates both into semi/anti joins (RewriteCorrelatedSubquery),
    so the SQL surface and the join-API surface (b11/b12) share one
    physical shape. Same text runs on both engines."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
        """
    )


# --------------------------------------------------------------------------
@register(
    "b24_salted_agg",
    oracle="""
    SELECT event_type, round(sum(value), 2) AS sum_value, count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def b24_salted_agg(spark, sf_dir):
    """Salted two-phase aggregation (explicit skew mitigation,
    operators/skew.py): identical results to a plain groupBy — the
    oracle IS the plain form — with the heavy phase spread over
    (key, salt). The unsalted twin equality is also pytest-asserted."""
    from ..operators.skew import salted_sum_count

    ev = t(spark, sf_dir, "events")
    out = salted_sum_count(ev, "event_type", "value", n_salts=8)
    return out.select("event_type", r2(F.col("sum_value")).alias("sum_value"), "n")


# --------------------------------------------------------------------------
@register(
    "b25_tpch_q3_shaped",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_exact_round_ratio(
               f'sum({sql_cents("l.l_extendedprice")}'
               f'    * (100 - {sql_cents("l.l_discount")}))',
               '10000', dp=2)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def b25_tpch_q3_shaped(spark, sf_dir):
    """TPC-H Q3-shaped: segment-filtered 3-way join → revenue per
    unshipped order → top-10. Customer filter pushes to its scan;
    customer side broadcasts; the orders⋈lineitem join shuffles once."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            # exact integer disc-price sum — doubly load-bearing here:
            # revenue is also the top-10 SORT KEY, so a half-cent flip
            # would swap rows across the cut line (dec_sum: r9 bound)
            dec_sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("__r4")
        )
        .withColumn("revenue", exact_round_ratio("__r4", "10000", dp=2))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# --------------------------------------------------------------------------
@register(
    "b26_tpch_q10_shaped",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_exact_round_ratio(
               f'sum({sql_cents("l.l_extendedprice")}'
               f'    * (100 - {sql_cents("l.l_discount")}))',
               '10000', dp=2)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def b26_tpch_q10_shaped(spark, sf_dir):
    """TPC-H Q10-shaped returned-item report: year of orders x returned
    lineitems x customer x nation → top-20 customers by lost revenue."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            # exact integer disc-price sum; revenue is also the top-20
            # sort key (see b25; dec_sum: r9 bound)
            dec_sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("__r4")
        )
        .withColumn("revenue", exact_round_ratio("__r4", "10000", dp=2))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


# --------------------------------------------------------------------------
@register(
    "b15b_asof_pandas_api",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id AS purchase_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, round(p.value, 6) AS purchase_value,
           c.click_id AS last_click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def b15b_asof_pandas_api(spark, sf_dir):
    """Same as-of semantics as b15 through the pandas-on-Spark API
    (``ps.merge_asof`` — the third API surface next to DataFrame and
    SQL). Hash-matching b15's oracle proves the two implementations and
    DuckDB's native ASOF all agree.

    SCALE LAW (measured r4, made executable r12): ``ps.merge_asof``
    delegates to Spark's ``_joinAsOf``, whose ``RewriteAsOfJoin`` plans
    a BroadcastNestedLoopJoin on the range predicate over DISTINCT LEFT
    TIMESTAMPS x right rows — the ``by`` equality does NOT constrain
    that inner stage, so the pair space is quadratic in the time-key
    cardinality: ~6M pairs at sf0.01 (≈6 s), ~625M at sf0.1 (>240 s —
    measured cliff), unusable beyond. Since r12 the query rides
    ``operators.asof.guarded_merge_asof``, which ESTIMATES that pair
    space and RAISES past the documented 50M bound, naming the linear
    operator (the b31 keyset-twin treatment — the cliff is now a
    contract, not prose). This query exists to hash-check the API
    surface at the correctness-gate SF; the production as-of join is
    b15 (operators/asof.py: union + per-key window — linear, one
    shuffle)."""
    from ..operators.asof import guarded_merge_asof

    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        r6(F.col("value")).alias("purchase_value"),
    )
    merged = guarded_merge_asof(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        direction="backward",
    )
    return merged.to_spark().select(
        "purchase_id",
        "user_id",
        "purchase_value",
        F.col("click_id").alias("last_click_id"),
    )


# --------------------------------------------------------------------------
@register(
    "b27_scalar_subquery",
    oracle="""
    SELECT l.l_partkey,
           count(*) AS n_small,
           round(sum(l.l_extendedprice), 2) AS small_revenue
    FROM lineitem l
    WHERE l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """,
)
def b27_scalar_subquery(spark, sf_dir):
    """Correlated SCALAR subquery (TPC-H Q17 shape): lineitems below
    half their part's average quantity. Spark SQL decorrelates the
    per-row subquery into one aggregate + one equi-join — plan-asserted
    in tests/test_plans.py (no per-row subquery execution survives;
    that rewrite is what makes the query a two-shuffle job instead of
    n_rows subquery executions at 100 TB)."""
    ev = t(spark, sf_dir, "lineitem")
    ev.createOrReplaceTempView("b27_lineitem")
    return spark.sql("""
        SELECT l.l_partkey,
               count(*) AS n_small,
               round(sum(l.l_extendedprice), 2) AS small_revenue
        FROM b27_lineitem l
        WHERE l.l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity)
            FROM b27_lineitem l2
            WHERE l2.l_partkey = l.l_partkey)
        GROUP BY l.l_partkey
    """)


# --------------------------------------------------------------------------
@register(
    "b14b_range_join_banded",
    oracle="""
    SELECT p.p_partkey, l.l_orderkey, l.l_linenumber,
           p.p_retailprice, l.l_extendedprice
    FROM (SELECT * FROM part WHERE p_size = 1) p
    JOIN (SELECT * FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00') l
      ON l.l_extendedprice BETWEEN p.p_retailprice * 0.9
                               AND p.p_retailprice * 1.1
    """,
)
def b14b_range_join_banded(spark, sf_dir):
    """b14's range join as a BANDED EQUI-JOIN
    (``operators/rangejoin.py``): quantize the price axis, replicate
    each part's [0.9·rp, 1.1·rp] interval to its overlapping bands,
    equi-join on band + residual BETWEEN — a shuffle hash join that
    needs NEITHER side broadcastable (the 100-TB form of b14; identical
    oracle, plan asserted free of CartesianProduct/BNLJ)."""
    from ..operators.rangejoin import banded_range_join

    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 1).select(
        "p_partkey", "p_retailprice"
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
    joined = banded_range_join(
        li,
        p,
        F.col("l_extendedprice"),
        F.col("p_retailprice") * 0.9,
        F.col("p_retailprice") * 1.1,
        band_width=256.0,
    )
    return joined.select(
        "p_partkey", "l_orderkey", "l_linenumber", "p_retailprice", "l_extendedprice"
    )


# --------------------------------------------------------------------------
@register(
    "b28_join_disjunctive",
    oracle="""
    WITH d AS (SELECT doc_id, lang, source, n_chars FROM documents),
    by_block AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             TRUE AS same_block, FALSE AS same_len
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id),
    by_len AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             FALSE AS same_block, TRUE AS same_len
      FROM d a JOIN d b
        ON a.n_chars = b.n_chars AND a.doc_id < b.doc_id),
    u AS (SELECT * FROM by_block UNION ALL SELECT * FROM by_len)
    SELECT doc_a, doc_b,
           bool_or(same_block) AS same_block,
           bool_or(same_len) AS same_len
    FROM u GROUP BY doc_a, doc_b
    """,
)
def b28_join_disjunctive(spark, sf_dir):
    """Disjunctive (OR-predicate) join, decomposed: candidate doc pairs
    matching on (lang, source) OR equal n_chars — the multi-blocking-
    key union of entity resolution. A literal OR join would plan as a
    BroadcastNestedLoop/cartesian scan (O(n²) compares); the rewrite
    runs one shuffle EQUI-join per disjunct and merges with a
    groupBy(pair) bool_or — each disjunct hash-partitionable, total
    work ∝ Σ block², the shape that survives 100 TB."""
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")

    def pairs(on_cols, flags):
        a = d.select(
            F.col("doc_id").alias("doc_a"),
            *[F.col(c).alias(f"a_{c}") for c in on_cols],
        )
        b = d.select(
            F.col("doc_id").alias("doc_b"),
            *[F.col(c).alias(f"b_{c}") for c in on_cols],
        )
        cond = [F.col(f"a_{c}") == F.col(f"b_{c}") for c in on_cols]
        return (
            a.join(b, cond)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a",
                "doc_b",
                F.lit(flags[0]).alias("same_block"),
                F.lit(flags[1]).alias("same_len"),
            )
        )

    u = pairs(["lang", "source"], (True, False)).unionByName(
        pairs(["n_chars"], (False, True))
    )
    return u.groupBy("doc_a", "doc_b").agg(
        F.bool_or("same_block").alias("same_block"),
        F.bool_or("same_len").alias("same_len"),
    )


# --------------------------------------------------------------------------
_B29_SQL = """
SELECT r.n_regionkey, t.n_name, t.n_cust
FROM (SELECT DISTINCT n_regionkey FROM nation) r,
LATERAL (
  SELECT n.n_name, count(c.c_custkey) AS n_cust
  FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.n_regionkey
  GROUP BY n.n_name
  ORDER BY n_cust DESC, n.n_name
  LIMIT 2
) t
"""


@register("b29_lateral_join", oracle=_B29_SQL)
def b29_lateral_join(spark, sf_dir):
    """Correlated LATERAL subquery join (SQL entry point): per region,
    the top-2 nations by customer count — the per-row-subquery idiom
    Catalyst decorrelates into joins + per-group limits rather than
    executing once per outer row (n subquery runs would be the scale
    killer; the identical text runs on DuckDB, whose planner does the
    same rewrite — the strongest cross-engine check of decorrelation
    semantics)."""
    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(_B29_SQL)


# --------------------------------------------------------------------------
_B30_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_totalprice > 300000)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'P'
                          AND o_custkey IS NOT NULL)
"""


@register("b30_in_subquery", oracle=_B30_SQL)
def b30_in_subquery(spark, sf_dir):
    """IN / NOT IN subqueries (the membership-predicate surface next to
    b23's EXISTS): big-spender customers with no pending orders.
    NOT IN is the classic NULL trap — one NULL in the subquery result
    makes NOT IN return no rows under three-valued logic — so the
    subquery carries the explicit IS NOT NULL guard that production SQL
    must have; Catalyst plans the guarded form as a plain (not
    null-aware) anti join, IN as a semi join — both hash-partitionable
    at scale. Identical text runs on DuckDB."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_B30_SQL)


# --------------------------------------------------------------------------
@register(
    "b31_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 20
    """,
)
def b31_limit_offset(spark, sf_dir):
    """Pagination: ORDER BY ... LIMIT k OFFSET n via DataFrame
    ``offset()`` (Spark 3.4+). Page boundaries are deterministic only
    under a total order — hence the orderkey tie-break (§5.4). At
    scale, OFFSET still computes the first n+k rows (TakeOrdered over
    n+k per partition); deep pagination should keyset-paginate
    (WHERE key > last_seen) instead — shipped as the executable twin
    ``operators/rank.py::keyset_page`` (seek predicate pushed to the
    parquet scan, page-for-page equality with LIMIT/OFFSET asserted in
    tests/test_operators.py; plan proof in tests/test_plans.py)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(20)
        .limit(10)
    )


# --------------------------------------------------------------------------
_B32_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ALL
"""


@register("b32_group_by_all", oracle=_B32_SQL)
def b32_group_by_all(spark, sf_dir):
    """GROUP BY ALL (Spark 4 / DuckDB shared syntax): every
    non-aggregate select item becomes a grouping key — identical text
    on both engines; the analyzer-sugar surface of b5's hash
    aggregate."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_B32_SQL)


# --------------------------------------------------------------------------
@register(
    "b33_union_evolved",
    oracle="""
    SELECT n_nationkey, n_name, CAST(NULL AS BIGINT) AS n_name_len
    FROM nation WHERE n_nationkey < 12
    UNION ALL
    SELECT n_nationkey, n_name, CAST(length(n_name) AS BIGINT)
    FROM nation WHERE n_nationkey >= 12
    """,
)
def b33_union_evolved(spark, sf_dir):
    """Schema-evolved union: ``unionByName(allowMissingColumns=True)``
    aligns by NAME and null-fills columns one side lacks — the safe
    union for frames from different pipeline versions (positional
    unionAll would silently misalign). The DataFrame-level twin of
    a12's storage-level mergeSchema."""
    nation = t(spark, sf_dir, "nation")
    old = nation.filter(F.col("n_nationkey") < 12).select(
        "n_nationkey", "n_name"
    )
    new = nation.filter(F.col("n_nationkey") >= 12).select(
        "n_nationkey",
        "n_name",
        F.length("n_name").cast("bigint").alias("n_name_len"),
    )
    return old.unionByName(new, allowMissingColumns=True)


# --------------------------------------------------------------------------
@register(
    "b34_bloom_semi_reduction",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_round_ratio(
               f'sum({sql_cents("l_extendedprice")}'
               f'    * (100 - {sql_cents("l_discount")}))',
               '10000', dp=2)} AS net_rev,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                         WHERE o_orderpriority = '1-URGENT')
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b34_bloom_semi_reduction(spark, sf_dir):
    """Semi-join reduction: aggregate only the fact rows whose key
    survives a selective dimension predicate — expressed as a plain
    ``left_semi`` join so Catalyst's ``InjectRuntimeFilter`` rule can
    build a bloom filter on the build side (``bloom_filter_agg`` over
    the ~20% URGENT orderkeys) and pre-filter the fact scan map-side
    with ``might_contain`` BEFORE the shuffle. At 100 TB that is the
    difference between shuffling the full fact table and shuffling
    ~20% of it; false positives cost nothing because the exact semi
    join still runs on the survivors. The injection fires when the
    production size thresholds are met (build side under
    ``runtime.bloomFilter.creationSideThreshold``, fact scan over
    ``applicationSideScanSizeThreshold``) — plan-asserted with those
    thresholds tuned to smoke scale in tests/test_plans.py; the query
    itself stays threshold-agnostic and exactly correct either way."""
    li = t(spark, sf_dir, "lineitem")
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact integer disc-price sum (see functions/rounding;
            # dec_sum: r9 bound)
            dec_sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("__r4"),
            F.count(F.lit(1)).alias("n"),
        )
        .withColumn("net_rev", exact_round_ratio("__r4", "10000", dp=2))
        .select("l_returnflag", "l_linestatus", "net_rev", "n")
    )


# --------------------------------------------------------------------------
@register(
    "b35_salted_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def b35_salted_join(spark, sf_dir):
    """Skew-safe fact⋈dim join by explicit key salting
    (operators/skew.py::salted_join): the fact side gets a
    pmod(xxhash64)-derived salt, the dim side is exploded n_salts×,
    and the join key becomes (key, salt) — a hot key's rows spread
    over n_salts shuffle partitions instead of one straggler. The
    hash-match against the plain-join oracle proves row-identity of
    the rewrite (b24 is the aggregation twin; this is the join twin —
    together they cover both halves of the manual skew playbook, with
    AQE's runtime skew split as the automatic fallback)."""
    from ..operators.skew import salted_join

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        n_salts=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        r2(F.sum("o_totalprice")).alias("sum_total"),
    )


# --------------------------------------------------------------------------
@register(
    "b36_skew_profile",
    oracle=f"""
    WITH per_key AS (
      SELECT l_orderkey AS key, count(*) AS n
      FROM lineitem GROUP BY l_orderkey),
    stats AS (
      SELECT count(*) AS n_keys,
             CAST(sum(n) AS BIGINT) AS n_rows,
             max(n) AS max_n,
             {sql_exact_mean6('sum(n)', 'count(*)')} AS avg_n,
             {sql_exact_mean6('CAST(max(n) AS HUGEINT) * count(*)', 'sum(n)')} AS skew_ratio
      FROM per_key),
    topk AS (
      SELECT key, n FROM per_key
      ORDER BY n DESC, key LIMIT 5)
    SELECT s.n_keys, s.n_rows, s.max_n, s.avg_n, s.skew_ratio,
           t.key AS hot_key, CAST(t.n AS BIGINT) AS hot_n
    FROM stats s CROSS JOIN topk t
    """,
)
def b36_skew_profile(spark, sf_dir):
    """Join/agg-key skew diagnosis — the measurement that decides
    whether b24/b35's salting (or AQE's runtime split) is needed and
    what n_salts to use: per-key cardinality profile reduced to
    (distinct keys, rows, max, avg, max/avg skew ratio) plus the top-5
    hottest keys. One partial-aggregated groupBy on the key, an O(keys)
    scalar reduction, and a TakeOrderedAndProject top-k — the profile
    costs one shuffle, far less than one bad skewed join. At scale you
    run it on a sample or reuse the shuffle statistics AQE already
    collects; n_salts ≈ ceil(max_n / target-partition-rows)."""
    li = t(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # avg_n and skew_ratio are exact integer ratios -> exact integer
    # mean (functions/rounding): skew = max/avg = max*n_keys/n_rows
    stats = (
        per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_n"),
        )
        .withColumn("avg_n", exact_mean6("n_rows", "n_keys"))
        # the max_n*n_keys PRODUCT (not just the downstream algebra)
        # can pass 2^63 at extreme row counts -> lift one factor
        .withColumn(
            "skew_ratio",
            exact_mean6("(CAST(max_n AS DECIMAL(38,0)) * n_keys)", "n_rows"),
        )
    )
    topk = per_key.orderBy(F.desc("n"), "key").limit(5).select(
        F.col("key").alias("hot_key"), F.col("n").cast("bigint").alias("hot_n")
    )
    return stats.crossJoin(F.broadcast(topk))


# --------------------------------------------------------------------------
@register(
    "b37_join_asof_forward",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, max(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    clicks AS (
        SELECT event_id AS click_id, user_id, ts
        FROM events WHERE event_type = 'click'
    )
    SELECT c.click_id, c.user_id,
           (SELECT p.purchase_id FROM purchases p
            WHERE p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.ts LIMIT 1) AS next_purchase_id
    FROM clicks c
    """,
)
def b37_join_asof_forward(spark, sf_dir):
    """FORWARD as-of join: each click matched to the user's NEXT
    purchase at-or-after it (the conversion-attribution direction;
    b15 is the backward twin). Composed via the reversed union +
    ignoreNulls-carry window (operators/asof.py::asof_join_first_later
    — one shuffle, no range explosion). Purchases pre-deduped to one
    per (user, ts) for deterministic ties; the oracle uses the
    correlated ORDER BY ... LIMIT 1 rewrite."""
    ev = t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    return asof_join_first_later(
        clicks, purchases, "user_id", "ts", "ts", "purchase_id",
        "next_purchase_id",
    ).select("click_id", "user_id", "next_purchase_id")
