"""Cross-engine-exact 6dp means.

``round(avg(x), 6)`` is NOT cross-engine deterministic even when both
engines hold bit-identical doubles: Spark's ``round`` goes through
``BigDecimal.valueOf`` (the double's SHORTEST decimal repr, HALF_UP),
DuckDB rounds the binary value — measured 74/5000 disagreements on
doubles whose shortest repr is an exact 7th-digit half (r6 probe; the
f47 sf0.001 parity catch was this class in the wild). For integer
inputs the hazard is structural, not measure-zero: a group of n = 2^7·k
rows with an odd reduced sum makes s/n a dyadic rational that IS an
exact 7-digit half (1/128 = 0.0078125), so any fixture regeneration can
flip such a query between engines.

Fix: compute the mean in exact integer arithmetic — no float summation,
no engine ``round`` at all. For integer s = sum(x), n = count:

    round6(s/n) = sign(s) * ((2*|s|*1e6 + n) div (2*n)) / 1e6

which is round-half-AWAY-FROM-ZERO (both engines' documented convention)
of the true rational, and every operand of the integer division is
positive — where Spark's ``div`` (truncate) and DuckDB's ``//`` (floor)
agree. The final ``/1e6`` divides identical integers into identical
doubles on any engine.

``pre_scaled=True`` is the f47/f41 variant: the inputs were ALREADY
6dp-rounded and summed in micro-units (s = sum(round(x*1e6))), so the
1e6 factor is omitted.

Scope boundary — which rounds do NOT need this treatment:
  - single-division integer ratios (jaccard i/u, tf cnt/len, e12's
    ooo_rate, f38's shared_frac): both engines derive the IDENTICAL
    double from exact integers, and at an exact dyadic half (e.g.
    i/128) both round it up (Spark's shortest-repr HALF_UP and
    DuckDB's binary half-away agree there — the measured 74/5000
    disagreements need a double within half-an-ulp of a 7-digit half
    WITHOUT equality, which requires denominators ~1e9+). Safe for
    any registered ratio; convert only if a denominator can reach
    that scale.
  - irrational-derived rounds (sqrt, ln): shortest reprs practically
    never terminate at 7 digits; measure-zero risk, left alone.
  - arbitrary-double sums (events.value): the true sum is an arbitrary
    real; an exact decimal half is measure-zero. Left alone.
  - ``round(sum(2dp-multiple terms), 2)`` (sum of o_totalprice /
    l_extendedprice alone): the TRUE sum is itself a 2dp multiple —
    never at a half-cent — so the 0.005 margin dwarfs any float-sum
    noise. Safe without conversion.
  - BUT ``round(sum(k-dp-multiple terms), 2)`` with k > 2 (disc_price
    terms are 4dp multiples, charge terms 6dp): the true sum CAN land
    on an exact half-cent, where summation-order noise flips the 2dp
    round between engines — the r8 storm-probe c1 catch (74485208.415
    → .41 vs .42). ALWAYS convert: s = sum(cents(price) *
    (100 - cents(disc)) [* (100 + cents(tax))]), then
    exact_round_ratio(s, 10^4 [or 10^6], dp=2). Converted sites: b5
    (sum_disc_price, sum_charge), b9, b25, b26, b34, c1.
  - float-SUM-derived means (the f47 catch) and Python/numpy-side
    rounds (half-EVEN — disagrees with both engines at every exact
    dyadic half; the f17 pixel/sample means were structurally
    exposed): ALWAYS convert.

Overflow bound (r9 hardening — the ADVICE.md high item): the rounding
algebra no longer has a bigint bound of its own. ``exact_round_ratio``
and ``exact_mean6`` lift ``s`` to DECIMAL(38,0) (HUGEINT in the DuckDB
mirror) before the ``2*|s|*p`` blow-up, so the intermediate product is
exact up to 1e38 regardless of dp; Spark's ``div`` accepts decimal
operands and returns BIGINT (verified: IntegralDivide supports
DecimalType in PySpark 4.1.2, bit-identical to DuckDB's HUGEINT ``//``
at 5.7e16-unit sums where the old bigint path raised
ARITHMETIC_OVERFLOW under ANSI). Remaining bounds, both documented per
site:
  - the RESULT integer round(s/m * 10^dp) must fit int64 (div's return
    type) — for dp=2 money that is |dollars| < 9.2e16, unreachable;
  - the SUM feeding ``s`` must itself be exact BEFORE it reaches the
    helper: a bigint sum of micro-dollar charge terms saturates int64
    near TPC-H SF160 (~$9.2e12 per group), so every sum whose magnitude
    grows with data is accumulated via :func:`dec_sum` —
    ``sum(CAST(term AS DECIMAL(38,0)))`` — per-row terms stay bigint
    (bounded by row content), only the accumulator is 128-bit-exact.
    The DuckDB mirrors need no change: ``sum(BIGINT)`` is HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str) -> Column:
    """Exact integer hundredths of a NON-NEGATIVE 2dp-multiple double
    column (the price/discount/tax domains): ``floor(x*100 + 0.5)`` as
    bigint. Building block for the k-dp-multiple SUM class below."""
    return (F.col(col) * 100 + F.lit(0.5)).cast("bigint")


def sql_cents(c: str) -> str:
    """DuckDB SQL text of :func:`cents` (for oracle strings)."""
    return f"CAST(round({c} * 100) AS BIGINT)"


def dec_sum(term: Column) -> Column:
    """Overflow-proof exact integer SUM: lift each bigint term to
    DECIMAL(38,0) so the accumulator is 128-bit-exact (Spark keeps
    sum(decimal(38,0)) at decimal(38,0)). Use for every exact-unit sum
    whose magnitude grows with data volume — a bigint accumulator of
    micro-dollar charge terms saturates int64 near TPC-H SF160. The
    DuckDB mirror is a plain ``sum``: HUGEINT by default.

    Accumulator-bound rule (r9): the lift costs ~2x on the agg
    operator (measured at sf0.1), so apply it per SITE by worst-case
    sum at the declared design point (SF1e5 ~ 100 TB ~ 6e11 lineitem
    rows, single-group worst case): price-involving terms (>=1e7
    units/row -> sums cross 6e18) lift; quantity-cents (<=5e3/row ->
    3e15) and discount/tax-cents (<=1e2/row -> 6e13) keep plain
    bigint ``F.sum`` with >=3000x headroom — downstream rounding is
    safe either way because :func:`exact_round_ratio` lifts ``s``
    itself before its blow-up."""
    return F.sum(term.cast("decimal(38,0)"))


def _dec_intdiv(n_expr: str, d_expr: str) -> str:
    """Exact integral division of a DECIMAL(38,0) numerator by a
    positive bigint denominator, STAYING decimal end to end.

    Spark's ``div`` always returns BIGINT, and on decimal operands the
    decimal->long conversion of the quotient silently WRAPS past int64
    (hypothesis counterexample, r9: s=923127972428176, m=1, dp=4 ->
    the sign-flipped -921546434942779.1; DuckDB's HUGEINT ``//`` is
    exact on the same inputs). So the numerator lift alone (r8 advice
    closure) was not sufficient — the QUOTIENT must also stay 128-bit.
    ``(n - n % d) / d`` is exact here: n % d is exact decimal pmod
    (n >= 0, d > 0 at every call site — the CASE guards m = 0), the
    difference is an exact multiple of d, and the decimal division of
    an integral-valued quotient <= 1e32 is representable well inside
    DECIMAL(38,6), so Spark's BigDecimal divide introduces no
    rounding. The final CAST back to DECIMAL(38,0) is integral."""
    return (
        f"CAST((({n_expr}) - ({n_expr}) % ({d_expr})) / ({d_expr})"
        f" AS DECIMAL(38,0))"
    )


def exact_round_ratio(s_name: str, m_name: str, dp: int = 6) -> Column:
    """Spark column: exact ``round(s/m, dp)`` (half-away) from
    integer-typed column NAMES / SQL expressions (names, not Columns —
    the integer division must go through SQL ``div``, which has no
    Column-API operator). The general form behind exact_mean6; use it
    directly for means of k-dp-multiple doubles after integerizing
    (s = sum(round(x*10^k)), m = 10^k * n).

    ``s`` is lifted to DECIMAL(38,0) before the ``2*|s|*p`` blow-up so
    the algebra cannot overflow int64 (module docstring, r9 bound
    note); a no-op when the site already sums via :func:`dec_sum`."""
    p = 10 ** dp
    s128 = f"CAST({s_name} AS DECIMAL(38,0))"
    q = _dec_intdiv(f"2 * abs({s128}) * {p} + {m_name}", f"2 * ({m_name})")
    # m = 0 (empty input / empty group) → NULL, not an ANSI
    # DIVIDE_BY_ZERO: CASE short-circuits, so the division never
    # evaluates. The quotient stays DECIMAL (see _dec_intdiv) and is
    # cast to DOUBLE only at the end — the same exact-integer-then-
    # double-round path DuckDB's HUGEINT mirror takes.
    return (
        F.expr(
            f"CAST(CASE WHEN {m_name} = 0 THEN NULL"
            f" WHEN {s_name} < 0 THEN -({q})"
            f" ELSE ({q}) END AS DOUBLE)"
        )
        / F.lit(float(p))
    )


def sql_exact_round_ratio(s: str, m: str, dp: int = 6) -> str:
    """DuckDB SQL text of ``exact_round_ratio`` (for oracle strings).
    The HUGEINT lift mirrors the Spark DECIMAL(38,0) lift — a no-op
    for sums (DuckDB sum(BIGINT) is already HUGEINT) but real for
    count-expression inputs, which stay BIGINT and would otherwise
    overflow ``2*|s|*1e6`` beyond ~4.6e12 rows.

    The quotient→DOUBLE cast goes through VARCHAR (r14): DuckDB's
    direct HUGEINT→DOUBLE cast is NOT correctly rounded once the
    value exceeds 2^64 (it splits into upper*2^64 + lower and rounds
    twice — ~1.4% of random 65-88-bit integers land 1 ulp off, pinned
    in tests/test_properties.py::test_hugeint_double_cast_pins),
    while Spark's DECIMAL→DOUBLE goes through BigDecimal/parseDouble
    and is exact-to-nearest. VARCHAR→DOUBLE parsing is correctly
    rounded, so both engines produce the bit-identical double."""
    p = 10 ** dp
    s128 = f"CAST({s} AS HUGEINT)"
    return (
        f"CAST(CAST(CASE WHEN ({m}) = 0 THEN NULL"
        f" WHEN ({s}) < 0 THEN"
        f" -((2 * abs({s128}) * {p} + ({m})) // (2 * ({m})))"
        f" ELSE ((2 * abs({s128}) * {p} + ({m})) // (2 * ({m})))"
        f" END AS VARCHAR) AS DOUBLE)"
        f" / {float(p)}"
    )


def exact_mean6(sum_name: str, n_name: str, pre_scaled: bool = False) -> Column:
    """Spark column: exact ``round(s/n, 6)`` from integer-typed column
    NAMES (names, not Columns). ``s`` rides the same DECIMAL(38,0)
    lift — and the same decimal-exact quotient (:func:`_dec_intdiv`)
    — as :func:`exact_round_ratio`."""
    mult = "" if pre_scaled else " * 1000000"
    s128 = f"CAST({sum_name} AS DECIMAL(38,0))"
    q = _dec_intdiv(f"2 * abs({s128}){mult} + {n_name}", f"2 * ({n_name})")
    # n = 0 → NULL (see exact_round_ratio).
    return (
        F.expr(
            f"CAST(CASE WHEN {n_name} = 0 THEN NULL"
            f" WHEN {sum_name} < 0 THEN -({q})"
            f" ELSE ({q}) END AS DOUBLE)"
        )
        / F.lit(1e6)
    )


def sql_exact_mean6(s: str, n: str, pre_scaled: bool = False) -> str:
    """DuckDB SQL text of the same exact mean (for oracle strings);
    HUGEINT lift and VARCHAR-mediated double cast as in
    :func:`sql_exact_round_ratio` (the direct HUGEINT→DOUBLE cast
    double-rounds past 2^64)."""
    mult = "" if pre_scaled else " * 1000000"
    s128 = f"CAST({s} AS HUGEINT)"
    return (
        f"CAST(CAST(CASE WHEN ({n}) = 0 THEN NULL"
        f" WHEN ({s}) < 0 THEN"
        f" -((2 * abs({s128}){mult} + ({n})) // (2 * ({n})))"
        f" ELSE ((2 * abs({s128}){mult} + ({n})) // (2 * ({n})))"
        f" END AS VARCHAR) AS DOUBLE)"
        f" / 1e6"
    )


def sql_pmod(x: str, k: int) -> str:
    """DuckDB SQL text of the NON-NEGATIVE (floored) modulus.

    SQL ``%`` is truncated (sign of the dividend) in both engines,
    but the Python/numpy generators that synthesize multimodal
    payloads use Python ``%`` (sign of the divisor — always
    non-negative for positive k). The two agree on non-negative
    dividends, so pristine fixtures never see the difference — a
    negative id (idspace probe) splits every derived parameter.
    Oracles that REPLAY a Python generative formula must spell the
    modulus in this portable form.
    """
    return f"((({x}) % {k}) + {k}) % {k}"
