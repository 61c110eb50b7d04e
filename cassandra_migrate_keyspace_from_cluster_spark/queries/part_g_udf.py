"""Part G — UDF / UDAF / UDTF surface (SURVEY.md §2 g1-g10).

Demonstrates every Python-extension execution path Spark offers, each
hash-checked against a pure-SQL DuckDB twin so the Python path provably
computes the same thing the declarative path would:

  g1  row-at-a-time Python UDF          (the slow path — baseline)
  g2  Arrow-vectorized pandas UDF        (Series→Series, ~10-100x g1)
  g3  grouped-agg pandas UDAF            (Series→scalar in groupBy().agg)
  g4  applyInPandas grouped map          (split-apply-combine)
  g5  mapInPandas partition-wise map     (batched generator transform)
  g6  Python UDTF                        (one row in → many rows out)
  g7  mapInArrow zero-copy batch map     (no pandas materialization)
  g8  iterator pandas UDF                (amortized per-worker init)
  g9  cogrouped map                      (two-sided applyInPandas merge)
  g10 arrow-optimized row UDF            (useArrow=True drop-in for g1)

Scale notes: every op here crosses JVM→Python over Arrow batches —
that boundary is the cost, so at 100 TB these run ONLY where built-in
functions genuinely can't express the logic (SURVEY.md §4). The twins
(same logic as column expressions / SQL) are what the relational parts
use; Part G exists to prove the extension surface works and agrees.
Worker parallelism is per-partition: Python workers scale out with
executors, no driver-side collect anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..functions.rounding import sql_exact_round_ratio
from ..registry import register
from .util import r6, t

# Shared price-tier thresholds (exact comparisons on doubles — identical
# in both engines).
# The explicit NULL arm keeps the map null-propagating: without it SQL
# CASE falls through NULL comparisons to the ELSE branch ('high'), and
# the Python twin would crash on None — a null price has no tier.
_TIER_SQL = """
    CASE WHEN o_totalprice IS NULL THEN NULL
         WHEN o_totalprice < 50000 THEN 'low'
         WHEN o_totalprice < 150000 THEN 'mid'
         ELSE 'high' END
"""


def _tier(p: float) -> str | None:
    if p is None:
        return None
    if p < 50000:
        return "low"
    if p < 150000:
        return "mid"
    return "high"


@register(
    "g1_python_udf",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, {_TIER_SQL} AS price_tier
    FROM orders
    """,
)
def g1_python_udf(spark, sf_dir):
    """Row-at-a-time Python UDF: custom price-tier bucketing. The
    baseline extension path — g2 is the same logic vectorized."""
    tier_udf = F.udf(_tier, T.StringType())
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", tier_udf("o_totalprice").alias("price_tier")
    )


@register(
    "g2_pandas_udf_scalar",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, {_TIER_SQL} AS price_tier
    FROM orders
    """,
)
def g2_pandas_udf_scalar(spark, sf_dir):
    """Arrow-vectorized scalar pandas UDF (Series→Series): same tiering
    as g1 but batched through Arrow — the preferred Python path."""

    @pandas_udf("string")
    def tier_vec(p: pd.Series) -> pd.Series:
        out = pd.Series("high", index=p.index, dtype=object)
        out[p < 150000] = "mid"
        out[p < 50000] = "low"
        out[p.isna()] = None  # null price has no tier (see _TIER_SQL)
        return out

    return t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", tier_vec("o_totalprice").alias("price_tier")
    )


@register(
    "g3_grouped_agg_udaf",
    oracle=f"""
    SELECT l_returnflag,
           {sql_exact_round_ratio(
               'sum(CAST(round(l_extendedprice * 100) AS BIGINT)'
               '    * CAST(round(l_discount * 100) AS BIGINT))',
               '100 * sum(CAST(round(l_discount * 100) AS BIGINT))'
               ' FILTER (WHERE l_extendedprice IS NOT NULL)',
               dp=2)}
             AS discount_weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def g3_grouped_agg_udaf(spark, sf_dir):
    """Grouped-agg pandas UDAF: discount-weighted mean price per
    returnflag, computed in pandas, checked against the SQL formula.
    The UDAF does its arithmetic in exact integers (prices/discounts
    are exact 2dp multiples, so the 4dp-unit product sum is an exact
    int) and rounds half-away by integer division — the same
    functions/rounding form the oracle uses, so a weighted mean
    landing on an exact rational half cannot split the engines. The
    pandas-UDAF SURFACE (Arrow series in, scalar out per group) is
    unchanged — that surface is what g3 exists to prove."""

    @pandas_udf("double")
    def wmean(p: pd.Series, w: pd.Series) -> float:
        # pairwise null mask: a weighted mean uses only rows where BOTH
        # price and weight exist (mirrored by the oracle's FILTER) —
        # mixing a null price with a live discount would put the weight
        # in the denominator with nothing in the numerator
        ok = p.notna() & w.notna()
        if not ok.any():
            return None
        pi = (p[ok] * 100).round().astype("int64")
        wi = (w[ok] * 100).round().astype("int64")
        # per-element 4dp products fit int64 (~1e10); the group SUM
        # rides Python-int (object) precision — a numpy int64
        # accumulator would wrap silently near SF1000 group sums,
        # the same class as the r9 dec_sum lift (functions/rounding)
        s4 = int((pi * wi).astype(object).sum())
        m = 100 * int(wi.astype(object).sum())
        # all-zero weights -> no weighted mean; mirror the oracle's
        # CASE WHEN m = 0 THEN NULL (ADVICE r8 medium item: the r8
        # diff guarded only the DuckDB side of the pair)
        if m == 0:
            return None
        q = (2 * abs(s4) * 100 + m) // (2 * m)
        return (q if s4 >= 0 else -q) / 100.0

    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        # 2dp, not 6: the ratio is O(5e4) and its inputs are >=1e5-row
        # sums, where engine summation order alone perturbs the 6th
        # decimal (measured: 1-ulp flip at sf0.1) — SURVEY 5.4's
        # coarse-rounding law for large-magnitude aggregates
        .agg(
            F.round(wmean("l_extendedprice", "l_discount"), 2).alias(
                "discount_weighted_price"
            )
        )
    )


@register(
    "g4_grouped_map",
    oracle="""
    -- exact degeneracy gate (see e11): a constant group's COMPUTED
    -- stddev is an engine-specific float epsilon (summation-order
    -- noise), so gating on the exact min<max comparison is the only
    -- portable "is the z-score defined" test.
    -- metric-domain law (functions/finite.py): the group moments run
    -- over IN-DOMAIN values (DuckDB raises on non-finite stddev input;
    -- finite-but-huge glitches poison the scale), and an out-of-domain
    -- value has no z-score (NULL).
    WITH f AS (SELECT event_id, event_type, value,
                      CASE WHEN abs(value) <= 10000000.0 THEN value END AS vf
               FROM events)
    SELECT event_id, event_type,
           CASE WHEN max(vf) OVER (PARTITION BY event_type)
                  > min(vf) OVER (PARTITION BY event_type)
                 AND abs(value) <= 10000000.0
                THEN round((value - avg(vf) OVER (PARTITION BY event_type))
                           / stddev_samp(vf) OVER (PARTITION BY event_type),
                           6) END
             AS zscore
    FROM f
    """,
)
def g4_grouped_map(spark, sf_dir):
    """applyInPandas grouped map: per-event-type z-score normalization
    (ddof=1 to match stddev_samp — SURVEY.md §2 g4). Degenerate
    (constant or 1-row) groups emit NULL z-scores through the exact
    min<max gate — identical across the pandas, Spark-SQL, and DuckDB
    formulations, unlike any float sd>0 test (see e11)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        # metric-domain law (functions/finite.py): moments over the
        # in-domain values; out-of-domain rows get NULL (None through an
        # object column — a float NaN would round-trip as a NaN VALUE,
        # not SQL NULL), mirroring the oracle's abs(v) <= 1e7 gates.
        raw = v.to_numpy()
        fin = np.isfinite(raw) & (np.abs(raw) <= 1.0e7)
        vf = v[fin]
        m = vf.mean()
        s = vf.std(ddof=1)
        defined = len(vf) > 0 and vf.max() > vf.min()
        if defined:
            z = ((v - m) / s).round(6).astype(object).where(fin, None)
        else:
            z = None
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": z,
            }
        )

    return (
        t(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(normalize, "event_id bigint, event_type string, zscore double")
    )


@register(
    "g5_map_in_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
             AS net_price
    FROM lineitem
    """,
)
def g5_map_in_pandas(spark, sf_dir):
    """mapInPandas partition-wise map: batched net-price computation
    (generator over Arrow batches — the streaming-friendly shape)."""

    def net(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "net_price": (
                        pdf["l_extendedprice"]
                        * (1 - pdf["l_discount"])
                        * (1 + pdf["l_tax"])
                    ).round(6),
                }
            )

    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
        .mapInPandas(net, "l_orderkey bigint, l_linenumber int, net_price double")
    )


@register(
    "g6_python_udtf",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    SELECT doc_id, CAST(g.i AS INT) AS chunk_idx,
           array_to_string(list_slice(tk, CAST(g.i*8+1 AS INT),
                                      CAST(g.i*8+8 AS INT)), ' ') AS chunk
    FROM d, LATERAL (SELECT unnest(generate_series(0,
             CAST(ceil(len(tk) / 8.0) AS BIGINT) - 1)) AS i) g
    """,
)
def g6_python_udtf(spark, sf_dir):
    """Python UDTF: explode each document into fixed 8-token chunks
    (one row in → many rows out) via LATERAL correlation."""

    @udtf(returnType="doc_id: bigint, chunk_idx: int, chunk: string")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):
            if text is None:  # null text explodes to no chunks
                return
            toks = text.split(" ")
            for i in range(0, len(toks), 8):
                yield doc_id, i // 8, " ".join(toks[i : i + 8])

    spark.udtf.register("g6_chunk_doc", ChunkDoc)
    t(spark, sf_dir, "documents").createOrReplaceTempView("g6_documents")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk
        FROM g6_documents, LATERAL g6_chunk_doc(doc_id, text) c
        """
    )


@register(
    "g7_map_in_arrow",
    oracle="""
    SELECT o_orderkey, o_totalprice * 1.1 AS uplifted
    FROM orders
    """,
)
def g7_map_in_arrow(spark, sf_dir):
    """mapInArrow partition-wise map: the zero-copy Arrow RecordBatch
    path (no pandas materialization — lowest-overhead Python extension
    point; useful when the Python side is itself Arrow-native)."""
    import pyarrow as pa

    def uplift(batches):
        for batch in batches:
            t_ = pa.table(
                {
                    "o_orderkey": batch.column("o_orderkey"),
                    "uplifted": pa.compute.multiply(
                        batch.column("o_totalprice"), pa.scalar(1.1)
                    ),
                }
            )
            yield from t_.to_batches()

    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .mapInArrow(uplift, "o_orderkey bigint, uplifted double")
    )


@register(
    "g8_pandas_udf_iter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_quantity * l_extendedprice / 100.0, 6) AS qty_weighted
    FROM lineitem
    """,
)
def g8_pandas_udf_iter(spark, sf_dir):
    """Iterator-form pandas UDF (Iterator[Series] -> Iterator[Series]):
    amortizes per-batch setup (model load, connection) across all of a
    partition's Arrow batches — the shape for expensive-init UDFs."""

    @pandas_udf("double")
    def qty_weighted(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        scale = 100.0  # stands in for once-per-worker expensive setup
        for s in batches:
            yield (s / scale).round(6)

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        qty_weighted(F.col("l_quantity") * F.col("l_extendedprice")).alias(
            "qty_weighted"
        ),
    )


@register(
    "g9_cogrouped_map",
    oracle="""
    WITH o AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS ordered_cents
      FROM orders GROUP BY 1),
    l AS (
      SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
             count(*) AS n_lines,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                  AS BIGINT) AS shipped_x10k
      FROM lineitem GROUP BY 1)
    SELECT coalesce(o.month, l.month) AS month,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(o.ordered_cents, 0) AS BIGINT) AS ordered_cents,
           CAST(coalesce(l.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(coalesce(l.shipped_x10k, 0) AS BIGINT) AS shipped_x10k
    -- null-safe join: cogroup puts NULL-month rows of both sides in
    -- ONE group; a NULL-unequal full join would emit two half rows
    FROM o FULL JOIN l ON l.month IS NOT DISTINCT FROM o.month
    """,
)
def g9_cogrouped_map(spark, sf_dir):
    """Cogrouped map (``groupBy().cogroup().applyInPandas``): both
    relations are co-shuffled on the key and each key's two pandas
    frames land in ONE Python call — the two-sided split-apply-combine
    surface. Here: monthly bookkeeping reconciliation — ordered value
    (orders by order month) vs shipped net revenue (lineitem by ship
    month) — checked against the FULL JOIN of the two aggregates.
    Money is summed in integer cent units (2dp inputs are exact there)
    — float sums land on half-cent boundaries where cross-engine
    decimal rounding diverges; integers never do.
    Scale shape: cogroup dispatches ONE Python call PER KEY, so the
    key must be bounded-cardinality with large frames (months: ~84
    calls over ~7k-row frames, vectorized inside) — cogrouping on a
    per-row key like orderkey would mean millions of 5-row pandas
    round-trips, the classic cogroup anti-pattern (measured 10x slower
    at sf0.1 before this recast)."""

    def reconcile(key, o: pd.DataFrame, l: pd.DataFrame) -> pd.DataFrame:
        # null masks mirror SQL sum semantics: rows with a NULL money
        # cell drop out of the sums (pairwise for the product), while
        # n_orders/n_lines stay count(*) over ALL rows
        op = o["o_totalprice"].dropna()
        ordered = int((op * 100).round().astype("int64").sum()) if len(op) else 0
        lok = l["l_extendedprice"].notna() & l["l_discount"].notna()
        if lok.any():
            cents = (l.loc[lok, "l_extendedprice"] * 100).round().astype("int64")
            disc = (l.loc[lok, "l_discount"] * 100).round().astype("int64")
            shipped = int((cents * (100 - disc)).sum())
        else:
            shipped = 0
        return pd.DataFrame(
            {
                "month": [key[0]],
                "n_orders": [len(o)],
                "ordered_cents": [ordered],
                "n_lines": [len(l)],
                "shipped_x10k": [shipped],
            }
        )

    month = lambda c: F.date_format(F.date_trunc("month", F.col(c)), "yyyy-MM")  # noqa: E731
    orders = t(spark, sf_dir, "orders").select(
        month("o_orderdate").alias("month"), "o_totalprice"
    )
    li = t(spark, sf_dir, "lineitem").select(
        month("l_shipdate").alias("month"), "l_extendedprice", "l_discount"
    )
    return (
        orders.groupBy("month")
        .cogroup(li.groupBy("month"))
        .applyInPandas(
            reconcile,
            "month string, n_orders bigint, ordered_cents bigint, "
            "n_lines bigint, shipped_x10k bigint",
        )
    )


@register(
    "g10_arrow_python_udf",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, {_TIER_SQL} AS price_tier
    FROM orders
    """,
)
def g10_arrow_python_udf(spark, sf_dir):
    """Arrow-OPTIMIZED Python UDF (``F.udf(..., useArrow=True)``, Spark
    3.5+): same row-wise function as g1, but batched over Arrow instead
    of pickled row-by-row — the drop-in accelerator for legacy row UDFs
    that can't be vectorized (g2 remains the preferred fully-vectorized
    form). Completes the extension-path matrix: g1 pickle/row, g10
    arrow/row, g2 arrow/vectorized."""
    tier_udf = F.udf(_tier, T.StringType(), useArrow=True)
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", tier_udf("o_totalprice").alias("price_tier")
    )


# --------------------------------------------------------------------------
@register(
    "g11_apply_in_arrow",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
             AS sum_total
    FROM orders
    GROUP BY 1
    """,
)
def g11_apply_in_arrow(spark, sf_dir):
    """Grouped map on the ARROW-NATIVE path
    (``groupBy().applyInArrow``): the per-group function receives a
    ``pyarrow.Table`` and returns one — no pandas materialization at
    all, the zero-copy end of the Python extension spectrum (g4 is the
    pandas twin; g7 the ungrouped arrow map). Monthly order rollup on
    g9's bounded month key (one Python call per month, vectorized
    arrow compute inside); money sums in integer cents for exact
    cross-engine totals."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def rollup(table: pa.Table) -> pa.Table:
        month = table["month"][0].as_py()
        cents = pc.round(pc.multiply(table["o_totalprice"], 100.0))
        total = int(pc.sum(pc.cast(cents, pa.int64())).as_py() or 0)
        return pa.table(
            {
                "month": pa.array([month], pa.string()),
                "n_orders": pa.array([table.num_rows], pa.int64()),
                "sum_total": pa.array([round(total / 100.0, 2)], pa.float64()),
            }
        )

    orders = t(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"), "o_totalprice"
    )
    return orders.groupBy("month").applyInArrow(
        rollup, schema="month string, n_orders bigint, sum_total double"
    )
