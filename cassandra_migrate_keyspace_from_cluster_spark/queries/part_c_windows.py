"""Part C — advanced aggregation (rollup/cube/grouping sets, stats,
percentiles, pivot, collect) and window functions (ranking, analytic
offsets, frames). SURVEY.md §2 Part C (c1-c19) + r2 additions
(c20 unpivot, c21 gap-fill, c22 windowed distinct, c23 listagg).

Engine-alignment notes baked in here:
  - Spark's skewness/kurtosis are POPULATION moments; DuckDB's built-ins
    are sample-corrected → the c4 oracle computes the population
    formulas explicitly.
  - Spark range frames are numeric → c14 orders by floor-second epoch;
    the oracle orders by date_trunc('second', ts) with an INTERVAL frame
    (identical frame sets).
  - Every window ordering carries a unique tie-break (§5.4).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import text as tx
from ..functions.finite import in_domain
from ..functions.rounding import (
    cents,
    dec_sum,
    exact_round_ratio,
    sql_cents,
    sql_exact_round_ratio,
)
from ..registry import register
from ..sources import register_views
from .util import r2, r6, t


# --------------------------------------------------------------------------
@register(
    "c1_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_exact_round_ratio(
               f'sum({sql_cents("l_extendedprice")}'
               f'    * (100 - {sql_cents("l_discount")}))',
               '10000', dp=2)} AS revenue,
           count(*) AS n,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def c1_rollup(spark, sf_dir):
    """ROLLUP: (flag,status) + per-flag subtotals + grand total, with
    grouping() flags disambiguating subtotal NULLs from data NULLs.
    Revenue is the exact-integer disc-price sum (4dp-multiple terms
    CAN sum to an exact half-cent — functions/rounding scope note,
    the r8 storm-probe catch)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            # dec_sum: 100-TB accumulator bound (r9; ADVICE high item)
            dec_sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("__r4"),
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .withColumn("revenue", exact_round_ratio("__r4", "10000", dp=2))
        .select(
            "l_returnflag", "l_linestatus", "revenue", "n",
            "g_flag", "g_status",
        )
    )


@register(
    "c2_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def c2_cube(spark, sf_dir):
    """CUBE: all 2^2 subtotal combinations."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


@register(
    "c3_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def c3_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS list: per-flag, per-status, grand total."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        r2(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
@register(
    "c4_stats_agg",
    oracle="""
    -- metric-domain law (functions/finite.py): moment statistics run
    -- over the IN-DOMAIN measurements (finite AND |v| <= 1e7). DuckDB
    -- RAISES on non-finite stddev input while Spark yields NaN, and a
    -- finite-but-huge glitch pushes the DISPLAYED moments to a scale
    -- where engine summation-order noise survives 6dp rounding — the
    -- gate is the only portable semantics. count stays raw.
    -- uid rides the SAME domain gate: corr/covar against the user
    -- DIMENSION is a moment statistic OF user_id-as-numeric, and a
    -- huge-magnitude id (snowflake ids >= 2^32 — idspace probe) pushes
    -- the co-moment sums to scales where engine summation-order ulps
    -- survive 6dp rounding, exactly the class the metric-domain law
    -- exists for. No-op on dense small-int fixture ids.
    -- corr is the manual co-moment quotient, NOT the corr() builtin:
    -- ANSI Spark's corr RAISES DIVIDE_BY_ZERO on a zero-variance pair
    -- set (idspace: a group whose only in-domain uid is constant)
    -- while DuckDB yields NULL, and the divide sits INSIDE the
    -- aggregate where no outer gate can stop it. Both engines spell
    -- covar_pop/(sd_pop*sd_pop) over the PAIRWISE-valid columns
    -- (pv/pu: null unless both inputs are in-domain), gated by the
    -- exact-degeneracy comparison (min < max on each side, §5.4).
    WITH ev AS (SELECT event_type,
                       CASE WHEN abs(user_id) <= 10000000.0
                            THEN CAST(user_id AS DOUBLE) END AS uid,
                       CASE WHEN abs(value) <= 10000000.0 THEN value END
                         AS value
                FROM events),
    ev2 AS (SELECT event_type, value, uid,
                   CASE WHEN uid IS NOT NULL THEN value END AS pv,
                   CASE WHEN value IS NOT NULL THEN uid END AS pu
            FROM ev),
    mu AS (SELECT event_type, avg(value) AS m FROM ev2 GROUP BY 1)
    SELECT e.event_type,
           round(stddev_samp(e.value), 6) AS sd_samp,
           round(var_pop(e.value), 6)     AS var_p,
           round(CASE WHEN min(e.pv) < max(e.pv) AND min(e.pu) < max(e.pu)
                      THEN covar_pop(e.pv, e.pu)
                           / (stddev_pop(e.pv) * stddev_pop(e.pu))
                 END, 6) AS corr_vu,
           -- covar at 6dp, NOT 4: over 2dp-multiple data this
           -- avg-derived statistic takes exact 5-decimal rational
           -- values, which sit ON the 4dp rounding boundary (storm
           -- probe: -0.99405 split the engines by +-3e-15 noise) but
           -- are REPRESENTABLE POINTS at 6dp; a 7th-digit half needs
           -- n | 10^k, unreachable for real group sizes
           round(covar_pop(e.value, e.uid), 6) AS covar_vu,
           round(avg(pow(e.value - mu.m, 3))
                 / pow(avg(pow(e.value - mu.m, 2)), 1.5), 6)       AS skew,
           round(avg(pow(e.value - mu.m, 4))
                 / pow(avg(pow(e.value - mu.m, 2)), 2) - 3, 6)     AS kurt
    -- null-safe join: groupBy keeps a NULL event_type group, so the
    -- centered-moment helper join must not drop it (NULL != NULL)
    FROM ev2 e JOIN mu ON e.event_type IS NOT DISTINCT FROM mu.event_type
    GROUP BY e.event_type
    """,
)
def c4_stats_agg(spark, sf_dir):
    """Statistical aggregates. Spark's skewness/kurtosis are population
    (excess) moments, so the oracle computes those formulas explicitly
    (DuckDB's built-ins are sample-corrected and would mismatch).
    All moments ride the metric-domain law (functions/finite.py)."""
    ev = t(spark, sf_dir, "events")
    # the id-as-numeric co-moment input rides the metric-domain gate
    # too (idspace probe — see the oracle note)
    uid = in_domain(F.col("user_id").cast("double"))
    v = in_domain("value")
    # pairwise-valid projections + manual co-moment corr: ANSI corr()
    # raises DIVIDE_BY_ZERO on a zero-variance pair set (the divide is
    # inside the aggregate) — see the oracle note
    pv = F.when(uid.isNotNull(), v)
    pu = F.when(v.isNotNull(), uid)
    corr_gated = F.when(
        (F.min(pv) < F.max(pv)) & (F.min(pu) < F.max(pu)),
        F.covar_pop(pv, pu) / (F.stddev_pop(pv) * F.stddev_pop(pu)),
    )
    return ev.groupBy("event_type").agg(
        r6(F.stddev_samp(v)).alias("sd_samp"),
        r6(F.var_pop(v)).alias("var_p"),
        r6(corr_gated).alias("corr_vu"),
        # 6dp, not 4: see the oracle note (exact 5-decimal rationals
        # sit on the 4dp boundary; they are representable at 6dp)
        r6(F.covar_pop(v, uid)).alias("covar_vu"),
        r6(F.skewness(v)).alias("skew"),
        r6(F.kurtosis(v)).alias("kurt"),
    )


@register(
    "c5_percentiles",
    oracle="""
    -- metric-domain law (functions/finite.py): order statistics over
    -- the IN-DOMAIN measurements (an Inf endpoint makes every
    -- interpolation NaN-or-Inf with engine-specific placement, and a
    -- huge glitch endpoint de-absorbs the 6dp interpolation display);
    -- count(*) stays a raw event count
    SELECT event_type,
           round(median(CASE WHEN abs(value) <= 10000000.0 THEN value END),
                 6) AS med,
           round(quantile_cont(CASE WHEN abs(value) <= 10000000.0
                                    THEN value END,
                               0.9), 6) AS p90,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def c5_percentiles(spark, sf_dir):
    """Exact median + p90 per event type (linear interpolation both),
    over the in-domain measurements (functions/finite.py law)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        r6(F.median(in_domain("value"))).alias("med"),
        r6(F.percentile(in_domain("value"), 0.9)).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "c5b_mode",
    oracle="""
    SELECT (SELECT event_type
            FROM (SELECT event_type, count(*) AS c
                  -- NOT NULL: mode() ignores NULLs in both engines;
                  -- the count+top-1 rewrite must keep that contract
                  -- (and the tie-break must never see a NULL, whose
                  -- placement differs per engine under ASC)
                  FROM events WHERE event_type IS NOT NULL
                  GROUP BY event_type)
            -- encode(): DuckDB 1.0.0's string sort-key path misorders
            -- non-ASCII (signed-byte radix, inconsistent with its own
            -- '<'); BLOB sort keys are correct and equal Spark's
            -- UTF-8-bytewise string order (SURVEY.md §5.4 textedge law)
            ORDER BY c DESC, encode(event_type) LIMIT 1) AS modal_type,
           count(*) AS n
    FROM events
    """,
)
def c5b_mode(spark, sf_dir):
    """Global modal event_type. Computed as an explicit count + top-1
    with a VALUE tie-break rather than the engines' mode() aggregate:
    both Spark's and DuckDB's mode() document ARBITRARY tie choice, so
    the moment two types tie (the head3 data-shift probe: 3 rows, all
    counts 1) the native function is unportable. count+top-1 is the
    same two-phase partial-agg shape mode() plans anyway; the returned
    row keeps mode()'s NULL-on-empty contract via the left anchor.
    The candidate set filters NULLs — mode() ignores them in both
    engines, and the value tie-break must never see one (engine-
    opposite ASC placement)."""
    ev = t(spark, sf_dir, "events")
    best = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("event_type"))
        .limit(1)
        .select(F.col("event_type").alias("modal_type"))
    )
    n = ev.agg(F.count(F.lit(1)).alias("n"))
    return n.join(best, F.lit(True), "left").select("modal_type", "n")


@register("c6_approx_quantile", oracle=None)  # sketch values are engine-specific
def c6_approx_quantile(spark, sf_dir):
    """Approximate percentile (rows-only: sketch values differ across
    engines by design; accuracy vs exact twin asserted in pytest)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5).alias("p50_approx"),
        F.percentile_approx("value", 0.9).alias("p90_approx"),
    )


@register("c7_approx_cd", oracle=None)  # HLL++ values are engine-specific
def c7_approx_cd(spark, sf_dir):
    """Approx count-distinct (rows-only; rtol vs exact twin in pytest)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("n_users_approx")
    )


@register(
    "c8_collect",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users_csv,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def c8_collect(spark, sf_dir):
    """Collect-to-array, deterministic: sorted distinct list, emitted as
    CSV string (cross-engine array formatting is not comparable)."""
    ev = t(spark, sf_dir, "events")
    arr = F.sort_array(F.collect_set("user_id"))
    return ev.groupBy("event_type").agg(
        F.array_join(F.transform(arr, lambda x: x.cast("string")), ",").alias(
            "users_csv"
        ),
        F.countDistinct("user_id").alias("n_users"),
    )


_EVENT_TYPES = ["signup", "click", "view", "purchase", "error"]


@register(
    "c9_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY 1
    """,
)
def c9_pivot(spark, sf_dir):
    """Pivot with an EXPLICIT value list (determinism + single job —
    implicit pivot would first scan for distinct values)."""
    ev = t(spark, sf_dir, "events")
    piv = (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "user_bucket",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in _EVENT_TYPES],
    )


# --------------------------------------------------------------------------
@register(
    "c10_row_number",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           rank()       OVER (PARTITION BY o_custkey
                              ORDER BY year(o_orderdate) DESC) AS rnk,
           dense_rank() OVER (PARTITION BY o_custkey
                              ORDER BY year(o_orderdate) DESC) AS drnk
    FROM orders
    """,
)
def c10_row_number(spark, sf_dir):
    """row_number (unique ordering) + rank/dense_rank (tie-prone ordering
    — rank values are set-determined, so ties are still deterministic)."""
    o = t(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_ties = Window.partitionBy("o_custkey").orderBy(F.year("o_orderdate").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
    )


@register(
    "c11_topk_per_group",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
    QUALIFY rn <= 3
    """,
)
def c11_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer: the canonical window+filter composite.
    Scale: partition-local sort per customer key — no global sort."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderkey", "o_custkey", "o_totalprice", "rn")
    )


@register(
    "c12_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 6) AS delta_value,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def c12_lag_lead(spark, sf_dir):
    """Analytic offsets: per-user value delta (lag) and gap to next
    event in exact microseconds (lead)."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        r6(F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias(
            "gap_us"
        ),
    )


@register(
    "c13_frame_rows",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_orderstatus ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS price_3row
    FROM orders
    """,
)
def c13_frame_rows(spark, sf_dir):
    """ROWS frame: 3-row moving sum per order status.

    Runs on orders, not lineitem: lineitem has NO unique key (duplicate
    (l_orderkey, l_linenumber) pairs exist in the generated data), so no
    deterministic total ordering exists there — a ROWS frame would be
    engine-dependent. o_orderkey is unique.
    """
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        r2(F.sum("o_totalprice").over(w)).alias("price_3row"),
    )


@register(
    "c14_frame_range",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER w, 6) AS avg_1h,
           count(*) OVER w AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY date_trunc('second', ts)
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def c14_frame_range(spark, sf_dir):
    """RANGE (interval) frame: 1-hour trailing average per user.

    Spark range frames are numeric, so we order by floor-second epoch:
    date_trunc('second') FIRST (wall-clock truncation = epoch floor at
    any sign), then unix_timestamp of the whole second — bare
    unix_timestamp truncates toward zero and lands pre-1970 fractional
    ts one second late (tsedge probe). The oracle orders by
    date_trunc('second', ts) with an INTERVAL bound — identical frame
    sets, peers included both sides.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp(F.date_trunc("second", "ts")))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        r6(F.avg("value").over(w)).alias("avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


@register(
    "c15_running_total",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             -- NULLS FIRST pins the engines' opposite ASC defaults
             -- (Spark: nulls first, DuckDB: nulls last) when the sort
             -- column is nullable
             PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
    FROM orders
    """,
)
def c15_running_total(spark, sf_dir):
    """Unbounded-preceding frame: cumulative spend per customer."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        r2(F.sum("o_totalprice").over(w)).alias("cum_spend"),
    )


@register(
    "c16_ntile_pctrank",
    oracle=f"""
    -- exact integer rounding, not round(percent_rank(),6):
    -- (rank-1)/(N-1) and peers/N are exact rationals, and a data
    -- shift that lands N-1 on a 2^a*5^b-rich value (skewkey at
    -- sf0.01: +40 replicated orders) puts them exactly ON 6dp halves,
    -- where the engines' float rounds split (functions/rounding).
    -- rank() is the tie-aware minimum position; the RANGE peer count
    -- is the tie-aware cume_dist numerator.
    WITH ranked AS (
      SELECT o_orderkey,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             rank() OVER w AS rank_min,
             count(*) OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey
                            RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS rn_max,
             count(*) OVER () AS n_total
      FROM orders
      -- NULLS FIRST: see c15 (nullable sort column, opposite defaults)
      WINDOW w AS (ORDER BY o_totalprice NULLS FIRST, o_orderkey))
    SELECT o_orderkey, quartile,
           CASE WHEN n_total = 1 THEN 0.0
                ELSE {sql_exact_round_ratio('rank_min - 1',
                                            'n_total - 1', dp=6)}
           END AS pct_rank,
           {sql_exact_round_ratio('rn_max', 'n_total', dp=6)} AS cume_d
    FROM ranked
    """,
)
def c16_ntile_pctrank(spark, sf_dir):
    """Distribution functions over a unique global ordering.

    ntile/percent_rank/cume_dist are closed-form over (row_number, N)
    when the ordering is total, so instead of the textbook
    single-reducer unpartitioned window this uses the two-phase
    distributed rank (``operators/rank.py``) and derives all three
    functions arithmetically — identical values, every stage parallel.

    Tie-awareness: the fixtures' (o_totalprice, o_orderkey) ordering is
    total, but replicated rows (at-least-once replay — the data_shift
    dup2 probe) introduce ties, where SQL's percent_rank/cume_dist are
    TIE-AWARE ((rank-1)/(N-1) with rank = min rn of the tie group;
    cume_dist = max rn of the group / N) while the raw rn closed form
    is positional. min/max rn over a window PARTITIONED BY the full
    sort key (parallel — key groups, not a global window) restores the
    SQL semantics; on unique keys both equal rn and the values are
    unchanged. ntile is positional BY DEFINITION in the standard, so it
    keeps the raw rn (identical rows swap bucket labels
    interchangeably — the output multiset is still deterministic).
    """
    from ..operators.rank import ntile_from_rn, with_global_row_number

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # local_checkpoint: single-JVM sandbox, where executor loss is job
    # loss anyway — a real cluster deployment passes "persist"
    ranked = with_global_row_number(
        o,
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        "rn",
        total_col="n_total",
        materialize="local_checkpoint",
    )
    rn, n = F.col("rn"), F.col("n_total")
    w_tie = Window.partitionBy("o_totalprice", "o_orderkey")
    # exact integer 6dp rounding of the two exact rationals — float
    # round splits the engines when a shift lands them on 6dp halves
    # (see the oracle note)
    ranked = ranked.withColumn("rank_min", F.min(rn).over(w_tie)).withColumn(
        "rn_max", F.max(rn).over(w_tie)
    )
    return ranked.select(
        "o_orderkey",
        ntile_from_rn(rn, n, 4).alias("quartile"),
        F.when(n == 1, F.lit(0.0))
        .otherwise(exact_round_ratio("(rank_min - 1)", "(n_total - 1)", dp=6))
        .alias("pct_rank"),
        exact_round_ratio("rn_max", "n_total", dp=6).alias("cume_d"),
    )


@register(
    "c17_first_last",
    oracle="""
    SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           first_value(value) OVER w AS first_v,
           last_value(value)  OVER w AS last_v,
           count(*) OVER w AS n_day
    FROM events
    WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def c17_first_last(spark, sf_dir):
    """first/last value per user-day over an explicit full-partition
    frame with deterministic ordering. The day column is a day-truncated
    TIMESTAMP (not DATE) on both sides — cross-engine DATE values reach
    pandas as different dtypes and would defeat the value hash."""
    ev = t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    w = (
        Window.partitionBy("user_id", F.date_trunc("day", F.col("ts")))
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        day,
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w).alias("last_v"),
        F.count(F.lit(1)).over(w).alias("n_day"),
    ).distinct()


# --------------------------------------------------------------------------
@register(
    "c18_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value
    FROM events
    """,
)
def c18_forward_fill(spark, sf_dir):
    """Forward fill (LOCF): error events' values are nulled then carried
    forward from the last valid observation per user — the classic
    time-series gap-fill, via last(ignorenulls=True) over a running
    frame (DuckDB: last_value(... IGNORE NULLS))."""
    ev = t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("filled_value"),
    )


# --------------------------------------------------------------------------
@register(
    "c19_filtered_agg",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 2)
             AS purchase_value,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           count(*) AS n_total
    FROM events
    GROUP BY user_id
    """,
)
def c19_filtered_agg(spark, sf_dir):
    """Conditional aggregation with FILTER clauses (ANSI form) through
    the SQL entry point — one pass computing several differently-
    filtered aggregates (the idiom behind c9's pivot)."""
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT user_id,
               count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               round(sum(value) FILTER (WHERE event_type = 'purchase'), 2)
                 AS purchase_value,
               count(*) FILTER (WHERE event_type = 'error') AS n_errors,
               count(*) AS n_total
        FROM events
        GROUP BY user_id
        """
    )


# --------------------------------------------------------------------------
@register(
    "c20_unpivot",
    oracle=f"""
    WITH w AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             {sql_exact_round_ratio(
                 'sum(CAST(round(l_discount * 100) AS BIGINT))',
                 '100 * count(*)', dp=6)} AS avg_disc
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
    UNION ALL
    SELECT l_returnflag, 'sum_base_price', sum_base_price FROM w
    UNION ALL
    SELECT l_returnflag, 'avg_disc', avg_disc FROM w
    """,
)
def c20_unpivot(spark, sf_dir):
    """Unpivot / melt (wide → long): per-returnflag aggregate columns
    melted into (measure, value) rows via ``DataFrame.unpivot`` — the
    inverse of c9's pivot. Narrow op (each input row emits k rows
    in-place, no shuffle beyond the upstream agg); the oracle is the
    equivalent UNION ALL since melt is syntactic sugar over it."""
    li = t(spark, sf_dir, "lineitem")
    # avg_disc averages exact 2dp multiples -> exact cents sum +
    # integer rounding (functions/rounding; see b4's rationale)
    wide = (
        li.groupBy("l_returnflag")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            # discount-cents <=1e2/row -> <=6e13 even at SF1e5: >=1e5x
            # int64 headroom, no decimal lift needed (b5 bound note)
            F.sum((F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint")).alias("__sd"),
            F.count(F.lit(1)).alias("__n"),
        )
        .withColumn("avg_disc", exact_round_ratio("__sd", "(100 * __n)", dp=6))
        .select("l_returnflag", "sum_qty", "sum_base_price", "avg_disc")
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_base_price", "avg_disc"],
        "measure",
        "value",
    )


# --------------------------------------------------------------------------
@register(
    "c21_date_spine_gapfill",
    oracle="""
    WITH daily AS (
      SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
             count(*) AS n_orders,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, CAST(o.o_orderdate AS DATE)),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    spine AS (
      SELECT n.n_name, CAST(g.day AS DATE) AS day
      FROM nation n, bounds b,
           LATERAL (SELECT unnest(generate_series(b.lo, b.hi,
                                  INTERVAL 1 DAY)) AS day) g)
    SELECT s.n_name, CAST(s.day AS VARCHAR) AS day,
           coalesce(d.n_orders, 0) AS n_orders,
           last_value(d.revenue IGNORE NULLS)
             OVER (PARTITION BY s.n_name ORDER BY s.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS revenue_filled,
           (d.n_orders IS NULL) AS is_gap
    FROM spine s LEFT JOIN daily d
      ON d.n_name = s.n_name AND d.day = s.day
    """,
)
def c21_date_spine_gapfill(spark, sf_dir):
    """Date-spine gap-fill (the time-series densification composite):
    build a complete per-nation daily calendar with
    ``sequence(min,max)`` + explode, left-join the real daily order
    aggregate, zero-fill counts and LOCF the revenue per nation.
    Scale shape: the spine is |dims| x |days| (tiny vs the fact table,
    built from a broadcast 1-row bounds agg), the join shuffles on
    (nation, day), and the fill window is PARTITIONED by nation — no
    global single-reducer window anywhere (series count scales out)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r2(F.sum("o_totalprice")).alias("revenue"),
        )
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = (
        nation.select("n_name")
        .crossJoin(F.broadcast(bounds))
        .select(
            "n_name",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["n_name", "day"], "left")
        .select(
            "n_name",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_filled"),
            F.col("n_orders").isNull().alias("is_gap"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "c22_window_count_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events)
    SELECT event_id, user_id,
           -- RANGE, not ROWS: the two-pass tie law (SURVEY.md §5.4).
           -- Pass 1 attaches first_seen=1 to an ARBITRARY copy among
           -- exact-duplicate (ts, event_id) rows; a ROWS pass-2 then
           -- gives the two copies DIFFERENT running counts depending
           -- on which copy sorted first (sf0.01 dup2 catch). RANGE
           -- sums the whole peer group: both copies carry the same
           -- count, identically in both engines, byte-identical to
           -- ROWS on tie-free data.
           CAST(sum(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_types_so_far
    FROM flagged
    """,
)
def c22_window_count_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) over a window — an aggregate Spark (and
    most engines) refuse directly (`count(distinct) OVER` is
    unsupported) — via the standard rewrite: flag each (user, type)'s
    FIRST occurrence with a per-(user,type) row_number, then running-sum
    the flags per user. Two partitioned windows, both keyed on
    user-grained keys → scales out with user cardinality; no
    collect_set state accumulation (whose per-row set copy is O(k²))."""
    ev = t(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # RANGE (peer-inclusive), not ROWS: the two-pass tie law — exact-
    # duplicate rows must carry identical running counts (see oracle)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


# --------------------------------------------------------------------------
@register(
    "c23_listagg",
    oracle="""
    WITH st AS (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem),
    ln AS (SELECT DISTINCT l_returnflag,
                  CAST(l_linenumber AS VARCHAR) AS lnum FROM lineitem),
    a AS (SELECT l_returnflag,
                 string_agg(l_linestatus, ',' ORDER BY l_linestatus) AS statuses
          FROM st GROUP BY l_returnflag),
    b AS (SELECT l_returnflag,
                 string_agg(lnum, '|' ORDER BY lnum) AS line_nums
          FROM ln GROUP BY l_returnflag),
    c AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag)
    SELECT a.l_returnflag, a.statuses, b.line_nums, c.n
    FROM a JOIN b ON b.l_returnflag = a.l_returnflag
           JOIN c ON c.l_returnflag = a.l_returnflag
    """,
)
def c23_listagg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG WITHIN GROUP, new in Spark
    4): distinct values concatenated under an explicit ordering — the
    only deterministic form (unordered listagg is engine-order
    dependent and would never hash-match). Each list is deduped with a
    DISTINCT pre-aggregate BEFORE the listagg rather than listagg
    (DISTINCT ...): dedup-first is the scale shape (combine happens
    map-side on small distinct sets) and it sidesteps a Spark 4
    RewriteDistinctAggregates crash when two multi-column DISTINCT
    ListAggs share one Aggregate (ClassCastException SortOrder)."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        WITH st AS (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem),
        ln AS (SELECT DISTINCT l_returnflag,
                      CAST(l_linenumber AS STRING) AS lnum FROM lineitem),
        a AS (SELECT l_returnflag,
                     listagg(l_linestatus, ',')
                       WITHIN GROUP (ORDER BY l_linestatus) AS statuses
              FROM st GROUP BY l_returnflag),
        b AS (SELECT l_returnflag,
                     listagg(lnum, '|') WITHIN GROUP (ORDER BY lnum)
                       AS line_nums
              FROM ln GROUP BY l_returnflag),
        c AS (SELECT l_returnflag, count(*) AS n
              FROM lineitem GROUP BY l_returnflag)
        SELECT a.l_returnflag, a.statuses, b.line_nums, c.n
        FROM a JOIN b ON b.l_returnflag = a.l_returnflag
               JOIN c ON c.l_returnflag = a.l_returnflag
        """
    )


# --------------------------------------------------------------------------
@register("c24_hll_mergeable", oracle=None)  # datasketches binary, engine-specific
def c24_hll_mergeable(spark, sf_dir):
    """MERGEABLE distinct-count sketches (Spark 4 datasketches HLL):
    one HLL sketch per day (pre-aggregation), then ``hll_union_agg``
    rolls daily sketches into the monthly estimate WITHOUT re-reading
    events — the scale pattern for distinct counting (store tiny
    sketches per partition/day; any rollup window is a merge, not a
    rescan). Rows-only (sketch binaries are engine-specific);
    merge-consistency and accuracy laws are pytest-asserted
    (tests/test_operators.py)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_dau"),
    )
    return (
        daily.groupBy(F.date_format("day", "yyyy-MM").alias("month"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_mau"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("month", "approx_mau", "n_days")
    )


# --------------------------------------------------------------------------
@register(
    "c25_count_min",
    oracle="""
    WITH tk AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    tok AS (SELECT token FROM tk WHERE token <> ''),
    rows_ AS (SELECT unnest([0, 1, 2, 3]) AS r),
    cms AS (
      SELECT r,
             CAST(('0x' || substr(md5(token || ':' || CAST(r AS VARCHAR)), 1, 15))
                  AS BIGINT) % 512 AS cell,
             CAST(count(*) AS BIGINT) AS n_cell
      FROM tok CROSS JOIN rows_
      GROUP BY 1, 2),
    exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_n
      FROM tok GROUP BY token),
    top20 AS (
      SELECT token, exact_n FROM (
        SELECT token, exact_n,
               -- encode(): see c5b (DuckDB non-ASCII sort-key hazard)
               row_number() OVER (ORDER BY exact_n DESC, encode(token)) AS rn
        FROM exact) WHERE rn <= 20),
    probe AS (
      SELECT t.token, t.exact_n, r.r,
             CAST(('0x' || substr(md5(t.token || ':' || CAST(r.r AS VARCHAR)), 1, 15))
                  AS BIGINT) % 512 AS cell
      FROM top20 t CROSS JOIN rows_ r)
    SELECT p.token, p.exact_n,
           min(c.n_cell) AS cms_est,
           min(c.n_cell) - p.exact_n AS overcount
    FROM probe p JOIN cms c ON p.r = c.r AND p.cell = c.cell
    GROUP BY p.token, p.exact_n
    """,
)
def c25_count_min(spark, sf_dir):
    """MERGEABLE approximate frequency sketch (count-min) with PINNED
    md5 hashes, so unlike c24's engine-specific HLL binaries the whole
    sketch AND its point estimates hash-match the oracle. Builds the
    depth=4 x width=512 sketch over all document tokens, then probes
    it for the exact top-20 tokens, reporting estimate and overcount
    (CMS never undercounts; the overcount column makes the eps*N error
    bound auditable). Scale shape: the sketch is O(4*512) rows built
    by one partial-aggregated groupBy over a x4-exploded token stream;
    slice sketches add cell-wise (pytest-asserted merge law), so
    per-day/per-shard sketches roll up without rescans; the probe join
    broadcasts the 2048-row sketch. Top-20 selection is
    TakeOrderedAndProject (orderBy+limit with token tie-break), not a
    global window."""
    docs = t(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    cms = tx.count_min_sketch(tok, depth=4, width=512)
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    top20 = exact.orderBy(F.desc("exact_n"), "token").limit(20)
    rows_ = F.array(*[F.lit(i) for i in range(4)])
    probe = top20.select(
        "token", "exact_n", F.explode(rows_).alias("r")
    ).withColumn("cell", tx.cms_cell(F.col("token"), F.col("r"), 512))
    return (
        probe.join(F.broadcast(cms), ["r", "cell"])
        .groupBy("token", "exact_n")
        .agg(F.min("n_cell").alias("cms_est"))
        .withColumn("overcount", F.col("cms_est") - F.col("exact_n"))
    )
