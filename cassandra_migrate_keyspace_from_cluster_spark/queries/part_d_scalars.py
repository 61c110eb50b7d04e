"""Part D — scalar function surface, one composite query per family.

SURVEY.md §2 Part D (d1-d10). Cross-engine alignment decisions (probed
against DuckDB 1.0, SURVEY §5.4):
  - integer-returning string/date fns: Spark→int vs DuckDB→bigint —
    cast BOTH to bigint;
  - ``round(x, k)`` half-cases: Spark rounds the shortest decimal repr
    (BigDecimal), DuckDB the binary double — NEVER round a value whose
    true decimal expansion can sit exactly on the half boundary at k
    digits (e.g. 2-decimal money at k=1). Rounding after division or at
    6dp is safe;
  - cast double→int: DuckDB ROUNDS, Spark TRUNCATES — always floor/ceil
    explicitly before casting;
  - DuckDB ``%`` keeps the dividend sign; pmod ≡ ``((a % b) + b) % b``;
  - ``list_distinct`` does not preserve order — always sort after;
  - initcap / soundex / crc32 / format_number have no DuckDB 1.0
    equivalent → excluded from oracle-checked output (format_string ↔
    printf covers formatting).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.casefold import (
    LOWER_DIVERGENT_CLASS,
    UPPER_DIVERGENT_CLASS,
    _sql_quote_class,
    guarded_lower,
    guarded_reverse,
    guarded_upper,
    sql_guarded_lower,
    sql_guarded_reverse,
    sql_guarded_upper,
)
from ..functions.finite import is_finite
from ..registry import register
from .util import r6, t


# --------------------------------------------------------------------------
@register(
    "d1_string_basic",
    oracle=f"""
    SELECT c_custkey,
           -- || not concat(): DuckDB's concat() SKIPS null arguments
           -- while Spark's concat() is null-propagating; || propagates
           -- NULL in both engines (identical on non-null data — the
           -- nulls data-shift probe pins the agreement)
           c_name || '|' || c_mktsegment               AS joined,
           concat_ws('-', c_name, c_mktsegment)        AS joined_ws,
           -- case-fold law (functions/casefold.py): upper/lower are
           -- declared on the cross-engine-agreeing domain (Java full
           -- case mapping vs utf8proc simple mapping + Unicode-version
           -- skew: 172/71 probed codepoints diverge); reverse is
           -- declared on the grapheme-safe domain (Spark reverses
           -- codepoints, DuckDB grapheme clusters). NULL outside.
           {sql_guarded_upper('c_name')}               AS up,
           {sql_guarded_lower('c_name')}               AS lo,
           -- trim(x, ' ') not trim(x): DuckDB's bare trim strips
           -- UNICODE whitespace (NBSP etc.), Spark's ASCII space only
           trim('  ' || c_name || '  ', ' ')           AS trimmed,
           ltrim('  ' || c_name, ' ')                  AS ltrimmed,
           rtrim(c_name || '  ', ' ')                  AS rtrimmed,
           substring(c_name, 10, 5)                    AS sub,
           CAST(length(c_name) AS BIGINT)              AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')   AS key_pad,
           rpad(c_mktsegment, 12, '*')                 AS seg_pad,
           CAST(instr(c_name, '#') AS BIGINT)          AS hash_pos,
           translate(c_name, '0#', 'X_')               AS translated,
           repeat(c_mktsegment, 2)                     AS seg2,
           {sql_guarded_reverse('c_name')}             AS rev,
           replace(c_name, 'Customer', 'Cust')         AS repl
    FROM customer
    """,
)
def d1_string_basic(spark, sf_dir):
    """String basics: concat/case/trim/pad/substr/instr/translate/
    repeat/reverse/replace. (initcap excluded: absent in DuckDB 1.0.)
    up/lo/rev ride the r11 case-fold guarded-extraction law
    (functions/casefold.py — probe-derived divergence sets; battery in
    tests/test_properties.py::CASE_NAME_BATTERY)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat("c_name", F.lit("|"), "c_mktsegment").alias("joined"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("joined_ws"),
        guarded_upper("c_name").alias("up"),
        guarded_lower("c_name").alias("lo"),
        F.trim(F.concat(F.lit("  "), "c_name", F.lit("  "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), "c_name")).alias("ltrimmed"),
        F.rtrim(F.concat("c_name", F.lit("  "))).alias("rtrimmed"),
        F.substring("c_name", 10, 5).alias("sub"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.rpad("c_mktsegment", 12, "*").alias("seg_pad"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.translate("c_name", "0#", "X_").alias("translated"),
        F.repeat("c_mktsegment", 2).alias("seg2"),
        guarded_reverse("c_name").alias("rev"),
        F.replace("c_name", F.lit("Customer"), F.lit("Cust")).alias("repl"),
    )


# --------------------------------------------------------------------------
@register(
    "d2_string_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, 'Customer#(\\d+)', 1)         AS digits,
           -- TRY_CAST: a name with no digits extracts '' and a plain
           -- CAST('') throws in BOTH engines (ANSI Spark and DuckDB) —
           -- declared semantics are no-digits -> NULL
           TRY_CAST(regexp_extract(c_name, '(\\d+)', 1) AS BIGINT) AS digits_int,
           regexp_replace(c_name, '0+', '#', 'g')               AS squashed,
           CAST(regexp_matches(c_name, '00[1-9]') AS BIGINT)    AS has_pad,
           array_to_string(string_split_regex(c_name, '[#0]+'), ',') AS parts
    FROM customer
    """,
)
def d2_string_regex(spark, sf_dir):
    """Regex family: extract (group), replace, match-test, split.
    Oracle needs the 'g' flag: DuckDB regexp_replace is first-match-only
    by default while Spark's is global."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("digits"),
        # try_cast: no-digits extracts '' — plain cast throws under ANSI
        F.regexp_extract("c_name", r"(\d+)", 1)
        .try_cast("bigint")
        .alias("digits_int"),
        F.regexp_replace("c_name", "0+", "#").alias("squashed"),
        # BIGINT not BOOLEAN: a NULL boolean reaches pandas as None from
        # Spark but NaN-float from DuckDB — same SQL value, different
        # carrier; nullable ints normalize identically on both engines
        F.col("c_name").rlike("00[1-9]").cast("bigint").alias("has_pad"),
        F.array_join(F.split("c_name", "[#0]+"), ",").alias("parts"),
    )


# --------------------------------------------------------------------------
@register(
    "d3_string_distance",
    oracle="""
    SELECT c_custkey,
           CAST(levenshtein(c_name, replace(c_name, '0', '1')) AS BIGINT)
             AS dist_zeros,
           CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS dist_seg
    FROM customer
    """,
)
def d3_string_distance(spark, sf_dir):
    """String-distance scalars: levenshtein (soundex excluded: absent in
    DuckDB 1.0)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.replace("c_name", F.lit("0"), F.lit("1")))
        .cast("bigint")
        .alias("dist_zeros"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("bigint").alias(
            "dist_seg"
        ),
    )


# --------------------------------------------------------------------------
@register(
    "d4_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)        AS y,
           CAST(month(o_orderdate) AS INT)       AS m,
           CAST(day(o_orderdate) AS INT)         AS d,
           CAST(isodow(o_orderdate) AS INT)      AS iso_dow,
           date_trunc('month', o_orderdate)      AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 5 AS TIMESTAMP) AS plus5d,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT)                          AS days_since_95,
           CAST(date_diff('month', DATE '1995-01-01',
                date_trunc('month', o_orderdate)) AS INT) AS months_since_95,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
           CAST(make_date(2024, CAST(month(o_orderdate) AS INT), 1)
                AS TIMESTAMP)                    AS md,
           strftime(o_orderdate, '%Y-%m-%d')     AS iso_str,
           CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS TIMESTAMP)
                                                 AS roundtrip
    FROM orders
    """,
)
def d4_datetime(spark, sf_dir):
    """Date/time family. ISO day-of-week derived explicitly on the Spark
    side (Spark dayofweek is 1=Sunday, DuckDB's 0=Sunday — never compare
    raw); date-typed results emitted as timestamps (dtype stability).

    epoch_s is the epoch of the NAIVE wall-clock (DuckDB's epoch() of a
    naive timestamp) built from naive components — days-since-1970 ×
    86400 + seconds-into-day — not unix_timestamp, whose raw internal
    epoch is the one timestamp reading that shifts with
    spark.sql.session.timeZone (every other column here is rendered
    through the session zone symmetrically). The engine pins UTC, where
    both forms agree; this form stays correct even when that pin is
    bypassed (tools/conf_invariance.py tz_utc_plus8)."""
    o = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    naive_epoch_s = (
        F.datediff(F.to_date(od), F.lit("1970-01-01").cast("date")).cast("long")
        * 86400
        + F.hour(od).cast("long") * 3600
        + F.minute(od).cast("long") * 60
        + F.second(od).cast("long")
    )
    return o.select(
        "o_orderkey",
        F.year(od).cast("int").alias("y"),
        F.month(od).cast("int").alias("m"),
        F.dayofmonth(od).cast("int").alias("d"),
        (((F.dayofweek(od) + 5) % 7) + 1).cast("int").alias("iso_dow"),
        F.date_trunc("month", od).alias("month_start"),
        F.date_add(F.to_date(od), 5).cast("timestamp").alias("plus5d"),
        F.datediff(F.to_date(od), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.months_between(F.date_trunc("month", od), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("months_since_95"),
        naive_epoch_s.alias("epoch_s"),
        F.make_date(F.lit(2024), F.month(od), F.lit(1))
        .cast("timestamp")
        .alias("md"),
        F.date_format(od, "yyyy-MM-dd").alias("iso_str"),
        F.to_date(F.date_format(od, "yyyy-MM-dd")).cast("timestamp").alias("roundtrip"),
    )


# --------------------------------------------------------------------------
@register(
    "d5_math",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice / 7, 2)            AS div7,
           CAST(ceil(l_discount * 100) AS BIGINT)   AS ce,
           CAST(floor(l_discount * 100) AS BIGINT)  AS fl,
           round(abs(l_discount - 0.05), 6)         AS ab,
           round(exp(l_discount), 6)                AS ex,
           round(ln(l_quantity + 1), 6)             AS lnv,
           round(log10(l_quantity + 1), 6)          AS lg,
           round(pow(l_quantity, 2), 2)             AS pw,
           round(sqrt(l_quantity), 6)               AS sq,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS pm,
           CAST(sign(l_discount - 0.05) AS INT)     AS sg,
           round(radians(l_quantity), 6)            AS rad,
           round(degrees(l_discount), 6)            AS deg
    FROM lineitem
    """,
)
def d5_math(spark, sf_dir):
    """Math family. round() applied only post-division / at 6dp (see
    module docstring for the half-case hazard); pmod spelled explicitly
    in the oracle because DuckDB % keeps the dividend sign."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_extendedprice") / 7, 2).alias("div7"),
        F.ceil(F.col("l_discount") * 100).cast("bigint").alias("ce"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("fl"),
        r6(F.abs(F.col("l_discount") - 0.05)).alias("ab"),
        r6(F.exp("l_discount")).alias("ex"),
        r6(F.log(F.col("l_quantity") + 1)).alias("lnv"),
        r6(F.log10(F.col("l_quantity") + 1)).alias("lg"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("pw"),
        r6(F.sqrt("l_quantity")).alias("sq"),
        F.pmod("l_orderkey", F.lit(7)).cast("bigint").alias("pm"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sg"),
        r6(F.radians("l_quantity")).alias("rad"),
        r6(F.degrees("l_discount")).alias("deg"),
    )


# --------------------------------------------------------------------------
@register(
    "d6_array",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                       AS n_toks,
           array_to_string(list_slice(toks, 1, 5), ' ')    AS first5,
           CAST(list_contains(toks, 'join') AS BIGINT)     AS has_join,
           CAST(len(list_distinct(toks)) AS BIGINT)        AS n_uniq,
           array_to_string(list_sort(list_distinct(toks)), ',') AS uniq_csv,
           -- case-fold guard (r11, coarse on the whole text — see
           -- casefold.py): upper() diverges cross-engine on 172 cps
           CASE WHEN NOT regexp_matches(text,
                  '{_sql_quote_class(UPPER_DIVERGENT_CLASS)}')
                THEN array_to_string(list_transform(list_slice(toks, 1, 3),
                                     x -> upper(x)), ',') END AS upper3,
           CAST(len(list_filter(toks, x -> length(x) > 4)) AS BIGINT)
                                                           AS n_long,
           CAST(list_reduce(list_transform(toks, x -> length(x)),
                            (a, b) -> a + b) AS BIGINT)    AS tot_len
    FROM d
    """,
)
def d6_array(spark, sf_dir):
    """Array family incl. higher-order transform/filter/aggregate.
    Arrays emitted as joined strings (cross-engine array dtype parity);
    distinct always sorted (DuckDB list_distinct is unordered)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split("text", " ").alias("toks")
    )
    toks = F.col("toks")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("first5"),
        # BIGINT: nullable-boolean pandas carrier differs per engine
        F.array_contains(toks, "join").cast("bigint").alias("has_join"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("uniq_csv"),
        F.when(
            ~F.col("text").rlike(UPPER_DIVERGENT_CLASS),
            F.array_join(
                F.transform(F.slice(toks, 1, 3), lambda x: F.upper(x)), ","
            ),
        ).alias("upper3"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4))
        .cast("bigint")
        .alias("n_long"),
        F.aggregate(
            toks,
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.length(x).cast("bigint"),
        ).alias("tot_len"),
    )


# --------------------------------------------------------------------------
@register(
    "d7_map_json",
    oracle="""
    -- Guarded-extraction law (r10, found by the adversarial-props
    -- probe): a raw CAST of an extracted JSON value crashes the whole
    -- job under ANSI on any non-integral payload (one weird row in
    -- 1e12 kills a 100-TB scan), and engines disagree on coercions
    -- (DuckDB rounds '1.5'->2, Spark ANSI throws). Pinned law:
    --   * malformed JSON (json_valid false / parser reject) -> NULL;
    --   * k_str = the extracted text ONLY where both engines provably
    --     render it identically: a pure integral literal of <= 18
    --     digits, or a scalar that neither starts numeric nor is an
    --     Infinity/NaN rendering (engines re-serialize floats and
    --     out-of-range numbers in engine-specific text: Spark Jackson
    --     gives '"Infinity"' for 1e309 where DuckDB gives 'Infinity',
    --     and 2e19 stays integral in Spark but becomes '1e20'-double
    --     text in DuckDB), and non-scalars (starting '[' or '{') are
    --     NULL;
    --   * k = int ONLY when the extracted text is a pure integral
    --     literal (\\A-?[0-9]+\\z) in int32 range, else NULL (TRY_CAST
    --     both sides — no rounding, no crash). \\A..\\z, not ^..$
    --     (r13 regex-law sweep): Java's $ matches BEFORE a final line
    --     terminator while RE2's does not, so a payload like
    --     {"k": "123\\n"} would pass the Spark guard (k=123, string
    --     cast trims the newline) and fail the DuckDB one (NULL) —
    --     the d18 lang-guard law generalized to every full-string
    --     data guard (the r13 PROPS_BATTERY rows pin the shape).
    -- Out of contract (parser-leniency gray zone, probed r10):
    -- duplicate keys (Jackson's from_json is last-wins where
    -- get_json_object and DuckDB are first-wins), trailing commas
    -- (DuckDB accepts, Jackson rejects), single-quoted JSON (Jackson's
    -- get_json_object accepts, DuckDB rejects) — spec-undefined or
    -- invalid inputs where engine leniency differs textually
    -- undetectably; strict-JSON and cleanly-malformed payloads (the
    -- PROPS_BATTERY domain) are the declared contract.
    WITH e AS (
      SELECT event_id,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS s,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.missing') END AS sm
      FROM events),
    g AS (
      SELECT event_id,
             CASE WHEN regexp_matches(s, '\\A-?[0-9]{1,18}\\z')
                    OR (NOT regexp_matches(s, '\\A[-+.0-9\\[{]')
                        AND NOT regexp_matches(s, 'Infinity|NaN'))
                  THEN s END AS k_str,
             CASE WHEN regexp_matches(s, '\\A-?[0-9]+\\z')
                  THEN TRY_CAST(s AS INT) END AS k,
             CASE WHEN regexp_matches(sm, '\\A-?[0-9]+\\z')
                  THEN TRY_CAST(sm AS INT) END AS k_missing
      FROM e)
    -- k2 and the map values multiply in BIGINT: k at int32 min/max
    -- times 2 overflows int32 — an ANSI whole-job crash on Spark
    -- (exotic-battery find, r10), so the law widens before the product
    SELECT event_id, k, k_str, CAST(k AS BIGINT) * 2 AS k2, k_missing,
           array_to_string(map_keys(
             MAP {'a': CAST(k AS BIGINT), 'b': CAST(k AS BIGINT) * 2}), ',')
             AS mkeys,
           CAST(list_reduce(map_values(
             MAP {'a': CAST(k AS BIGINT), 'b': CAST(k AS BIGINT) * 2}),
             (x, y) -> x + y) AS BIGINT)                 AS mval_sum
    FROM g
    """,
)
def d7_map_json(spark, sf_dir):
    """Map & JSON: get_json_object/from_json extraction + map
    construction/keys/values — under the r10 guarded-extraction law
    (see the oracle text): non-integral, non-scalar, overflowing, or
    malformed payloads yield NULL on BOTH engines instead of an ANSI
    cast crash (Spark) or a rounding coercion (DuckDB). ``k2`` rides
    the from_json(schema) path, consulted only on the guarded domain
    where its Jackson coercions provably agree with the textual law
    (tests/test_properties.py::props battery)."""
    ev = t(spark, sf_dir, "events")
    s = F.get_json_object("props", "$.k")
    sm = F.get_json_object("props", "$.missing")
    integral = s.rlike(r"\A-?[0-9]+\z")
    k = F.when(integral, F.expr(
        "try_cast(get_json_object(props, '$.k') AS INT)"))
    k_missing = F.when(sm.rlike(r"\A-?[0-9]+\z"), F.expr(
        "try_cast(get_json_object(props, '$.missing') AS INT)"))
    # from_json (PERMISSIVE) demo: consulted only on the guarded
    # integral domain, where a non-null parse provably equals k
    # (Jackson nulls — never wraps — on int32 overflow, and nulls
    # quoted numerals, where the coalesce falls back to k*2), so the
    # schema path stays in the plan without importing Jackson's
    # coercion quirks into the law. All products run in BIGINT: k at
    # int32 min/max times 2 overflows int32 — an ANSI whole-job crash
    # (exotic-battery find, r10)
    k_l = k.cast("bigint")
    k2 = F.when(
        integral,
        F.coalesce(
            F.from_json("props", "k INT").getField("k").cast("bigint") * 2,
            k_l * 2,
        ),
    )
    m = F.create_map(F.lit("a"), k_l, F.lit("b"), k_l * 2)
    k_str = F.when(
        s.rlike(r"\A-?[0-9]{1,18}\z")
        | (~s.rlike(r"\A[-+.0-9\[{]") & ~s.rlike("Infinity|NaN")),
        s,
    )
    return ev.select(
        "event_id",
        k.alias("k"),
        k_str.alias("k_str"),
        k2.alias("k2"),
        k_missing.alias("k_missing"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("mval_sum"),
    )


# --------------------------------------------------------------------------
@register(
    "d8_hash",
    oracle="""
    SELECT o_orderkey,
           md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus))
             AS row_md5,
           sha256(CAST(o_orderkey AS VARCHAR)) AS key_sha256
    FROM orders
    """,
)
def d8_hash(spark, sf_dir):
    """Hash family: md5 / sha2-256 (standardized → identical across
    engines). xxhash64/crc32 are Spark-specific: used internally by the
    migration checksum (a8) but excluded from oracle output."""
    o = t(spark, sf_dir, "orders")
    key_str = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.md5(F.concat_ws("|", key_str, "o_orderstatus")).alias("row_md5"),
        F.sha2(key_str, 256).alias("key_sha256"),
    )


# --------------------------------------------------------------------------
@register(
    "d9_conditional_null",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P')                      AS sn,
           coalesce(nullif(o_orderstatus, 'P'), 'PEND')    AS co,
           coalesce(nullif(o_orderstatus, 'P'), 'NA')      AS nv,
           (nullif(o_orderstatus, 'P') IS NULL)            AS is_pending,
           CASE WHEN isnan('NaN'::DOUBLE) THEN o_totalprice
                ELSE 'NaN'::DOUBLE END                     AS nan_fixed,
           (o_orderstatus IS NOT DISTINCT FROM 'P')        AS nse_p,
           (nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL) AS nse_null
    FROM orders
    """,
)
def d9_conditional_null(spark, sf_dir):
    """Null handling: nullif/coalesce/nvl/isnull/nanvl and null-safe
    equality (<=> ↔ IS NOT DISTINCT FROM)."""
    o = t(spark, sf_dir, "orders")
    sn = F.nullif("o_orderstatus", F.lit("P"))
    return o.select(
        "o_orderkey",
        sn.alias("sn"),
        F.coalesce(sn, F.lit("PEND")).alias("co"),
        F.nvl(sn, F.lit("NA")).alias("nv"),
        F.isnull(sn).alias("is_pending"),
        F.nanvl(F.lit(float("nan")), F.col("o_totalprice")).alias("nan_fixed"),
        F.col("o_orderstatus").eqNullSafe(F.lit("P")).alias("nse_p"),
        sn.eqNullSafe(F.lit(None).cast("string")).alias("nse_null"),
    )


# --------------------------------------------------------------------------
@register(
    "d10_cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                 AS key_str,
           -- BIGINT round-trip, not INT: the key column IS 64-bit, and
           -- snowflake-scale ids (idspace probe) overflow an INT cast
           -- into an ANSI error in both engines
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_back,
           -- explicit domain guard (r12b, found by FLOAT_FMT_BATTERY):
           -- an out-of-int64 price (1e308, ±inf; NaN floors to NaN)
           -- makes the bare ANSI cast a whole-job crash on BOTH
           -- engines — the d13/d18 one-bad-row-aborts-the-scan class —
           -- and TRY_CAST is NOT the fix: Spark's try_cast SATURATES
           -- to ±int64-max under ANSI-off (conf-VARIANT, caught by
           -- the battery under the suite session). The guard NULLs
           -- out-of-domain rows identically on both engines under
           -- every conf axis.
           CASE WHEN isnan(o_totalprice)
                     OR NOT (abs(o_totalprice) < 9.2e18) THEN NULL
                ELSE CAST(floor(o_totalprice) AS BIGINT) END
                                                       AS price_floor,
           date_trunc('day', o_orderdate)              AS order_day,
           -- guarded exact-cents formatting (r12): %.2f ON A DOUBLE
           -- is engine-ambiguous — Java's Formatter rounds HALF_UP on
           -- the SHORTEST DECIMAL REPR (printf('%.2f', 2.675) ->
           -- '2.68') while DuckDB's printf rounds the BINARY value
           -- (-> '2.67'), and at extreme magnitudes the two also
           -- render different digit strings (shortest repr vs exact
           -- binary expansion of 1e308). The law: format the exact
           -- integer cents of |x| on the DECLARED domain |x| < 1e13
           -- (there CAST(|x|*100+0.5 AS BIGINT) == round(|x|*100)
           -- provably — |x|*100 < 2^53·0.11 keeps +0.5 exact and
           -- truncation == half-away — and the bigint cannot
           -- overflow), NULL outside it (non-finite, non-money
           -- magnitudes — the guarded-extraction device). Probed:
           -- 0 diffs across 5027 adversarial values incl. negatives,
           -- ±inf, NaN, 1e308, the 1e13 boundary.
           CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice)
                     OR NOT (abs(o_totalprice) < 1e13) THEN NULL
                ELSE concat(
                  CASE WHEN o_totalprice < 0
                        AND CAST(round(abs(o_totalprice)*100) AS BIGINT) > 0
                       THEN '-' ELSE '' END,
                  printf('%d.%02d',
                         CAST(round(abs(o_totalprice)*100) AS BIGINT) // 100,
                         CAST(round(abs(o_totalprice)*100) AS BIGINT) % 100))
                END                                    AS price_fmt,
           -- isnan guard (r12c, found by the money_fmt hunt): DuckDB
           -- 1.0.0 constant-folds a comparison to FALSE for a whole
           -- parquet row group whenever the zonemap max < the literal
           -- — and parquet stats EXCLUDE NaN, so 'NaN > 250000'
           -- silently evaluates False in a [0.0, NaN] file but True
           -- (total order, matching Spark) in a [3e5, NaN] file: the
           -- answer depends on the NEIGHBORING rows. The guard pins
           -- NaN comparisons to NULL identically on both engines
           -- before the fold can bite (isnan itself is not folded).
           CASE WHEN isnan(o_totalprice) THEN NULL
                ELSE CAST(o_totalprice > 250000 AS VARCHAR) END
                                                       AS is_big_str
    FROM orders
    """,
)
def d10_cast_types(spark, sf_dir):
    """Casts & formatting. Explicit floor before int cast (DuckDB cast
    rounds, Spark truncates). price_fmt formats the EXACT INTEGER
    CENTS of |x| on the guarded domain |x| < 1e13, NULL outside (the
    guarded-extraction device): %.2f on a double diverges across
    engines on half-boundary shapes — Java Formatter HALF_UPs the
    shortest decimal repr, DuckDB printf rounds the binary value — and
    at extreme magnitudes renders different digit strings outright
    (r12 probe, 0 diffs over 5027 adversarial values under this law;
    pinned in FLOAT_FMT_BATTERY). Within the domain the cents cast is
    provably engine-identical and overflow-free; a signed concat keeps
    negatives exact (the naive signed div/mod is garbage on both
    engines). format_number is excluded separately (locale
    separators)."""
    o = t(spark, sf_dir, "orders")
    cents_abs = "CAST(abs(o_totalprice)*100+0.5 AS BIGINT)"
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        # bigint round-trip — see the oracle note (idspace)
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_back"),
        # explicit domain guard — see the oracle note (one huge or
        # non-finite price must not abort the scan under ANSI, and
        # try_cast saturates under ANSI-off: conf-variant)
        F.when(
            F.isnan("o_totalprice")
            | ~(F.abs(F.col("o_totalprice")) < 9.2e18),
            F.lit(None).cast("long"),
        ).otherwise(F.floor("o_totalprice").cast("bigint"))
        .alias("price_floor"),
        F.date_trunc("day", "o_orderdate").alias("order_day"),
        # format_string renders a NULL arg as the STRING "null", so the
        # guard also owns null propagation (like DuckDB's printf)
        F.when(
            F.col("o_totalprice").isNull() | F.isnan("o_totalprice")
            | ~(F.abs(F.col("o_totalprice")) < 1e13),
            F.lit(None).cast("string"),
        ).otherwise(
            F.concat(
                F.when(
                    (F.col("o_totalprice") < 0) & (F.expr(cents_abs) > 0),
                    F.lit("-"),
                ).otherwise(F.lit("")),
                F.format_string(
                    "%d.%02d",
                    F.expr(cents_abs + " div 100"),
                    F.expr(cents_abs + " % 100"),
                ),
            )
        ).alias("price_fmt"),
        # isnan guard — see the oracle note (DuckDB zonemap folding
        # makes unguarded NaN comparisons layout-dependent)
        F.when(F.isnan("o_totalprice"), F.lit(None).cast("string"))
        .otherwise((F.col("o_totalprice") > 250000).cast("string"))
        .alias("is_big_str"),
    )


# --------------------------------------------------------------------------
@register(
    "d11_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS b_and,
           event_id | 16 AS b_or,
           xor(event_id, 255) AS b_xor,
           -- left shift is the ONE bitwise op the engines disagree on
           -- beyond the friendly corner (idspace probe): DuckDB RAISES
           -- on a negative LHS and on overflow, Spark wraps silently
           -- (Java <<). Domain-gate it: defined for 0 <= x <= 2^61-1
           -- (where x << 2 fits int64 and both engines agree), NULL
           -- outside. and/or/xor/>>/bit_count are two's-complement
           -- identical at ANY int64 in both engines (probe-pinned).
           CASE WHEN event_id BETWEEN 0 AND 2305843009213693951
                THEN event_id << 2 END AS b_shl,
           event_id >> 1 AS b_shr,
           CAST(bit_count(event_id) AS INT) AS b_cnt
    FROM events
    """,
)
def d11_bitwise(spark, sf_dir):
    """Bitwise function family: and/or/xor, shifts, popcount — exact
    integer ops, identical across engines at any int64 EXCEPT left
    shift (domain-gated, see the oracle note)."""
    ev = t(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("b_and"),
        e.bitwiseOR(F.lit(16)).alias("b_or"),
        e.bitwiseXOR(F.lit(255)).alias("b_xor"),
        F.when(
            e.between(0, 2305843009213693951), F.shiftleft(e, 2)
        ).alias("b_shl"),
        F.shiftright(e, 1).alias("b_shr"),
        F.bit_count(e).alias("b_cnt"),
    )


# --------------------------------------------------------------------------
@register(
    "d12_string_parts",
    oracle="""
    SELECT o_orderkey,
           -- CASE guard: DuckDB split_part maps NULL input to ''
           -- while Spark's is null-propagating
           CASE WHEN o_orderpriority IS NULL THEN NULL
                ELSE split_part(o_orderpriority, '-', 1) END AS pri_num,
           CASE WHEN o_orderpriority IS NULL THEN NULL
                ELSE split_part(o_orderpriority, '-', 2) END AS pri_word,
           left(o_orderpriority, 3) AS l3,
           right(o_orderpriority, 3) AS r3,
           ascii(o_orderpriority) AS first_code,
           chr(65 + CAST(o_orderkey % 26 AS INT)) AS cycle_chr
    FROM orders
    """,
)
def d12_string_parts(spark, sf_dir):
    """String parts family: split_part, left/right, ascii, chr."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.split_part("o_orderpriority", F.lit("-"), F.lit(1)).alias("pri_num"),
        F.split_part("o_orderpriority", F.lit("-"), F.lit(2)).alias("pri_word"),
        F.left("o_orderpriority", F.lit(3)).alias("l3"),
        F.right("o_orderpriority", F.lit(3)).alias("r3"),
        F.ascii("o_orderpriority").alias("first_code"),
        F.char(F.lit(65) + (F.col("o_orderkey") % 26).cast("int")).alias("cycle_chr"),
    )


@register(
    "d13_regex_array",
    oracle=f"""
    SELECT event_id,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_nums,
           -- TRY_CAST (r10): a digit run longer than int64 (20+ chars
           -- in a log line) must yield NULL, not abort the scan — the
           -- raw ANSI cast was a whole-job crash on one bad row
           TRY_CAST(regexp_extract_all(props, '[0-9]+')[1] AS BIGINT)
             AS first_num,
           -- COALESCE (r10): DuckDB renders a zero-match extract list
           -- as NULL through array_to_string where Spark's array_join
           -- gives '' — same empty-match row, two spellings
           CASE WHEN props IS NULL THEN NULL
                ELSE coalesce(
                  array_to_string(regexp_extract_all(props, '[0-9]+'), ','),
                  '') END AS nums_csv,
           -- case-fold guard (r11): lower() diverges across engines
           -- on 71 probed codepoints (casefold.py) — İ in a payload
           -- would split the [a-z]+ runs differently per engine
           CASE WHEN NOT regexp_matches(props,
                  '{_sql_quote_class(LOWER_DIVERGENT_CLASS)}')
                THEN regexp_extract_all(lower(props), '[a-z]+')[1]
                END AS first_word
    FROM events
    """,
)
def d13_regex_array(spark, sf_dir):
    """Array-returning regex family: regexp_extract_all + element_at /
    size / array_join over the extracted arrays (the pattern behind
    log-field and entity extraction). Pure codegen exprs; arrays are
    emitted as CSV (array cells are not portably hashable across the
    comparison harness). first_num/first_word ride try_element_at +
    try_cast (r10, both found by the adversarial-props probe): under
    ANSI, element_at on a zero-match array and CAST of an over-int64
    digit run are each whole-job crashes — one digitless or 20-digit
    payload in 1e12 rows would abort a 100-TB scan. DuckDB's []-index
    already NULLs out of bounds, so only the cast needs TRY there."""
    ev = t(spark, sf_dir, "events")
    nums = F.regexp_extract_all("props", F.lit("[0-9]+"), 0)
    words = F.regexp_extract_all(F.lower("props"), F.lit("[a-z]+"), 0)
    return ev.select(
        "event_id",
        F.size(nums).alias("n_nums"),
        F.expr(
            "try_cast(try_element_at(regexp_extract_all(props, '[0-9]+', 0),"
            " 1) AS BIGINT)"
        ).alias("first_num"),
        F.array_join(nums, ",").alias("nums_csv"),
        F.when(
            ~F.col("props").rlike(LOWER_DIVERGENT_CLASS),
            F.try_element_at(words, F.lit(1)),
        ).alias("first_word"),
    )


@register(
    "d14_timestamp_arith",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('second', ts) + INTERVAL 90 MINUTE AS VARCHAR) AS plus_90m,
           CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_floor,
           -- wall-clock components, not date_diff: DuckDB partitions
           -- date_diff endpoints by truncation toward zero, so a
           -- pre-1970 ts with fractional sub-minute lands one minute
           -- off vs Spark's subtract-first timestampdiff (tsedge
           -- probe). hour*60+minute is the declared semantics and is
           -- epoch-sign-proof in both engines.
           CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS mins_into_day,
           CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE))
                AS BIGINT) AS days_since_epoch_start,
           CAST(make_timestamp(1995, 1, 1, 12, 0, 0) AS VARCHAR) AS anchor
    FROM events
    """,
)
def d14_timestamp_arith(spark, sf_dir):
    """Timestamp-arithmetic family: interval add, trunc, timestampdiff
    at two grains, make_timestamp — emitted as ISO strings (timestamp
    cell formatting is normalized identically that way in both
    engines). Spark's timestampdiff(MINUTE,...) and DuckDB's
    date_diff('minute',...) both count whole-unit boundaries."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format(
            F.col("ts") + F.expr("INTERVAL 90 MINUTES"), "yyyy-MM-dd HH:mm:ss"
        ).alias("plus_90m"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_floor"
        ),
        # components, not timestampdiff — see the oracle note
        (F.hour("ts") * 60 + F.minute("ts")).cast("long").alias("mins_into_day"),
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format(
            F.make_timestamp(
                F.lit(1995), F.lit(1), F.lit(1), F.lit(12), F.lit(0), F.lit(0)
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("anchor"),
    )


@register(
    "d15_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big' ELSE 'small' END
             AS size_if,
           CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL
                THEN 'settled' ELSE 'pending' END AS nvl2_demo,
           coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'default-pri')
             AS ifnull_demo,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                WHEN 'P' THEN 'pending' END AS status_decoded
    FROM orders
    """,
)
def d15_conditional(spark, sf_dir):
    """Conditional/branching family: if(), nvl2, ifnull+nullif, and
    decode-style code→label translation via a MAP LITERAL lookup
    (``element_at(map(...), col)`` — the idiomatic Spark form of
    Oracle DECODE; the oracle proves it equals simple CASE). All
    codegen expressions."""
    o = t(spark, sf_dir, "orders")
    status_map = F.create_map(
        F.lit("O"), F.lit("open"),
        F.lit("F"), F.lit("finished"),
        F.lit("P"), F.lit("pending"),
    )
    return o.select(
        "o_orderkey",
        F.expr("if(o_totalprice > 150000, 'big', 'small')").alias("size_if"),
        F.expr("nvl2(nullif(o_orderstatus, 'P'), 'settled', 'pending')").alias(
            "nvl2_demo"
        ),
        F.expr("ifnull(nullif(o_orderpriority, '3-MEDIUM'), 'default-pri')").alias(
            "ifnull_demo"
        ),
        F.element_at(status_map, F.col("o_orderstatus")).alias("status_decoded"),
    )


@register(
    "d16_encoding",
    oracle="""
    SELECT o_orderkey,
           base64(encode(o_orderpriority)) AS pri_b64,
           lower(hex(o_orderpriority)) AS pri_hex,
           decode(unhex(lower(hex(o_orderpriority)))) AS pri_roundtrip
    FROM orders
    """,
)
def d16_encoding(spark, sf_dir):
    """Binary-encoding family: base64, hex, and the unhex round trip
    (string → bytes → hex → bytes → string). Spark's hex() uppercases
    and DuckDB's lowercases → normalized to lower on both sides.
    Spark's base64 is MIME-chunked (a CRLF every 76 chars — invisible
    on short fixtures, divergent on any payload over 57 bytes); the
    declared contract is RFC 4648 unwrapped, so the wraps are stripped.
    Pure codegen exprs."""
    o = t(spark, sf_dir, "orders")
    pri = F.col("o_orderpriority")
    hexed = F.lower(F.hex(pri.cast("binary")))
    return o.select(
        "o_orderkey",
        F.replace(
            F.base64(pri.cast("binary")), F.lit("\r\n"), F.lit("")
        ).alias("pri_b64"),
        hexed.alias("pri_hex"),
        F.decode(F.unhex(hexed), "UTF-8").alias("pri_roundtrip"),
    )


@register(
    "d17_trig",
    oracle="""
    -- finite-measurement law (functions/finite.py): the libm surface
    -- is declared over FINITE inputs — DuckDB RAISES 'out of range'
    -- on sin(Inf) where Spark yields NaN, so non-finite in -> NULL
    -- out, explicitly on both engines.
    SELECT event_id,
           CASE WHEN isfinite(value) THEN round(sin(value), 6) END AS sin_v,
           CASE WHEN isfinite(value) THEN round(cos(value), 6) END AS cos_v,
           CASE WHEN isfinite(value)
                THEN round(atan2(value, 10.0), 6) END AS atan2_v,
           CASE WHEN isfinite(value)
                THEN round(degrees(atan(value / 100.0)), 6) END AS angle_deg,
           CASE WHEN isfinite(value)
                THEN round((exp(value / 100.0) - exp(-value / 100.0)) / 2, 6)
                END AS sinh_v,
           -- tanh via the overflow-STABLE identity sign(x)*(1-2/(e^2|x|+1)):
           -- the textbook (e^2x-1)/(e^2x+1) hits inf/inf = NaN the moment
           -- e^2x overflows (finite x > ~35k here), where a native tanh
           -- saturates to 1.0 — the stable form saturates identically
           CASE WHEN isfinite(value)
                THEN round(sign(value)
                           * (1 - 2 / (exp(abs(value) / 50.0) + 1)), 6)
                END AS tanh_v
    FROM events
    """,
)
def d17_trig(spark, sf_dir):
    """Trigonometric / hyperbolic family: sin, cos, atan2, degrees ∘
    atan, sinh, tanh — IEEE libm functions are bit-identical across
    engines, 6dp rounding absorbs the last-ulp libm variation (DuckDB
    1.0 lacks sinh/tanh → its oracle uses exp() identities, equal at
    6dp; tanh uses the overflow-stable sign form). All columns ride
    the finite-measurement law: non-finite value -> NULL row outputs
    (DuckDB raises on sin(Inf); Spark would yield NaN — the engines
    don't agree on the failure, so the law gates both)."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value")
    fin = is_finite("value")
    return ev.select(
        "event_id",
        F.when(fin, r6(F.sin(v))).alias("sin_v"),
        F.when(fin, r6(F.cos(v))).alias("cos_v"),
        F.when(fin, r6(F.atan2(v, F.lit(10.0)))).alias("atan2_v"),
        F.when(fin, r6(F.degrees(F.atan(v / 100.0)))).alias("angle_deg"),
        F.when(fin, r6(F.sinh(v / 100.0))).alias("sinh_v"),
        F.when(fin, r6(F.tanh(v / 100.0))).alias("tanh_v"),
    )


# --------------------------------------------------------------------------
@register(
    "d18_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             regexp_matches(lang, '\\A[A-Za-z0-9._~-]*\\z') AS lang_ok,
             'https://site-' || CAST(doc_id % 13 AS VARCHAR)
               || '.example.org/p/' || CAST(doc_id % 7 AS VARCHAR)
               || '/page?q=' || CAST(doc_id % 5 AS VARCHAR)
               || '&lang=' || lang AS url
      FROM documents)
    SELECT doc_id,
           CASE WHEN lang_ok
                THEN regexp_extract(url, 'https?://([^/]+)', 1) END AS host,
           CASE WHEN lang_ok
                THEN regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1)
                END AS path,
           CASE WHEN lang_ok
                THEN regexp_extract(url, '\\?(.*)$', 1) END AS query,
           CASE WHEN lang_ok
                THEN regexp_extract(url, '[?&]q=([^&]*)', 1) END AS q_param
    FROM u
    """,
)
def d18_url_parse(spark, sf_dir):
    """URL decomposition via Spark's codegen URL parser (HOST, PATH,
    QUERY, and keyed QUERY parameter) over synthetic URLs carrying the
    raw ``lang`` column as a query value — the scalar family behind
    f37's domain rollups. DuckDB 1.0 has no parse_url, so the oracle
    replays RFC-shaped regexes; the hash-match pins Spark's parser to
    the regex semantics for these URL shapes.

    Guarded-extraction law (r11, the URL twin of d7/d13's r10 law):
    ``lang`` is raw data, and under ANSI mode ``parse_url`` RAISES
    java.net.URISyntaxException on any URL it makes illegal — probed:
    a single row whose lang holds a space aborts the whole job, i.e.
    one weird payload in 1e12 rows kills a 100-TB scan. The pinned
    law: lang must be RFC-3986 unreserved ([A-Za-z0-9._~-]*, full-
    string via \\A..\\z — $ would diverge across engines on a trailing
    newline, Java matches before a final line terminator, RE2 does
    not); out-of-guard rows keep doc_id and NULL all four extractions,
    identically on both engines. ``try_parse_url`` backs the guard as
    defense-in-depth so any residual parser-reject degrades to NULL
    instead of aborting the scan. Battery: tests/test_properties.py::
    URL_BATTERY."""
    docs = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://site-"), (F.col("doc_id") % 13).cast("string"),
        F.lit(".example.org/p/"), (F.col("doc_id") % 7).cast("string"),
        F.lit("/page?q="), (F.col("doc_id") % 5).cast("string"),
        F.lit("&lang="), F.col("lang"),
    )
    lang_ok = F.col("lang").rlike(r"\A[A-Za-z0-9._~-]*\z")
    u = docs.select("doc_id", lang_ok.alias("lang_ok"), url.alias("url"))

    def part(kind, extra=None):
        args = ["url", F.lit(kind)] + ([F.lit(extra)] if extra else [])
        return F.when(F.col("lang_ok"), F.try_parse_url(*args))

    return u.select(
        "doc_id",
        part("HOST").alias("host"),
        part("PATH").alias("path"),
        part("QUERY").alias("query"),
        part("QUERY", "q").alias("q_param"),
    )
