"""Exact integer-space rounding for ratio-of-integers outputs.

The cross-engine trap this closes (found by the round-5 extended-seed
differential sweep, `lm_score_bigram` diverging 2.5108 vs 2.5107):
``round(DOUBLE, k)`` disagrees between engines ON EXACT HALVES.  Spark
routes doubles through ``BigDecimal.valueOf`` — the SHORTEST DECIMAL
REPRESENTATION — and rounds HALF_UP, so the double nearest to 2.51075
(binary value 2.5107499999999998…) prints as "2.51075" and rounds to
2.5108.  DuckDB (and Python) round the BINARY value, which sits below
the half, and emit 2.5107.  The two agree on almost every float, but a
RATIO OF INTEGERS a/b can land exactly on a (k+1)-decimal half whenever
the reduced denominator contains a factor 5 (so the rational is a
terminating k+1-digit decimal that is NOT binary-representable) — and
the repo's micro-quantized integer sums (lm_score*, text_entropy) plus
small-denominator count ratios make that event common on adversarial
corpora, not measure-zero.

Fix: perform the rounding BEFORE any double is produced, in pure
int64 arithmetic identical on both engines:

    round_half_up(a / b, 4 dp)  =  (a*20000 + b) intdiv (2*b) / 1e4

for a >= 0, b > 0.  The final division by 1e4 maps an exact 4-decimal
integer to its nearest double — the same double on every engine.
Overflow bound: a*20000 must stay under 2^63, i.e. a < 4.6e14 —
documented at each call site.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round4_ratio(a: Column, b: Column) -> Column:
    """round(a/b, 4) with exact half-up semantics for integer columns
    a >= 0, b > 0 — engine-independent (no double is formed until the
    final exact /1e4).  Returns DOUBLE; NULL if b is 0/NULL (matching
    DuckDB's NULL-on-/0).  The quotient is computed as
    (num - pmod(num, den)) / den — exactly divisible, so the one IEEE
    division is exact; a plain try_divide+floor could misround a
    quotient sitting one ulp under an integer."""
    num = a.cast("long") * 20000 + b.cast("long")
    den = 2 * b.cast("long")
    # when() evaluates the branch only on matching rows, so the pmod
    # never sees den = 0 under ANSI mode.  The exactly-divisible
    # quotient divides in DECIMAL(38,0) space, NOT long/long (which is
    # IEEE double division: for num > 2^53 the numerator's conversion
    # is lossy and truncating the quotient returns q-1 — found by the
    # round-5 follow-up review, counterexample pinned in
    # tests/test_oracle.py); decimal division of an exact integer
    # quotient is exact at any result scale.
    return F.when(den != 0,
                  ((num - F.pmod(num, den)).cast("decimal(38,0)")
                   / den.cast("decimal(38,0)"))
                  .cast("long") / 1e4)


def round4_ratio_sql(a: str, b: str) -> str:
    """The DuckDB mirror of round4_ratio: same integer arithmetic,
    DuckDB's ``//`` integer division (floor-div; operands here are
    non-negative so it equals truncation).  NULL when b = 0, matching
    the Spark side's guard."""
    return (f"(CASE WHEN ({b}) = 0 THEN NULL ELSE "
            f"(CAST(({a}) * 20000 + ({b}) AS BIGINT)"
            f" // (2 * CAST({b} AS BIGINT))) / 1e4 END)")


def round4_ratio_dec(a: Column, b: Column) -> Column:
    """round(a/b, 4) with exact half-up-toward-+inf semantics in
    DECIMAL(38,0) space — the wide-operand sibling of round4_ratio for
    integer-valued numerators beyond the int64*20000 overflow bound
    (gini's rank-weighted cent sums reach ~2.7e14 at sf0.1 and grow
    with n² per nation; ADVICE r5).  Contract: ``a`` integer-valued
    decimal of ANY sign, ``b`` integer-valued decimal > 0 — callers
    guard non-positive denominators to NULL themselves (a Gini over a
    non-positive total is undefined, not a division).  floor((a*20000
    + b) / (2b)) is computed with Spark's pmod (floor semantics for
    negative numerators); the SQL mirror uses a sign-safe mod because
    DuckDB's ``//`` truncates toward zero on negatives."""
    num = a.cast("decimal(38,0)") * 20000 + b.cast("decimal(38,0)")
    den = b.cast("decimal(38,0)") * 2
    return F.when(b > 0,
                  ((num - F.pmod(num, den)) / den).cast("long") / 1e4)


def round4_ratio_dec_sql(a: str, b: str) -> str:
    """DuckDB mirror of round4_ratio_dec: HUGEINT arithmetic (exact to
    2^127) with sign-safe floor mod, NULL unless b > 0."""
    num = f"(CAST(({a}) AS HUGEINT) * 20000 + CAST(({b}) AS HUGEINT))"
    den = f"(2 * CAST(({b}) AS HUGEINT))"
    # `//` (not `/`, which is DOUBLE division in DuckDB and lossy past
    # 2^53): the numerator is exactly divisible after the mod
    # subtraction, and truncation == floor on exact quotients
    return (f"(CASE WHEN ({b}) > 0 THEN "
            f"CAST(({num} - ((({num} % {den}) + {den}) % {den})) // {den} "
            f"AS BIGINT) / 1e4 ELSE NULL END)")


def finite_or_null(c) -> Column:
    """TRUE iff the double column is NULL or a finite number — the
    measure-hygiene predicate for statistic/quantile/rollup operators
    (r11 extreme-doubles sweep): a ±inf/NaN measure is corrupt data
    that silently poisons means/variances/cumulative sums on one
    engine and LOUDLY kills exact-integer casts on the other (six
    Spark-side ANSI CAST/overflow crashes, five DuckDB refusals).
    NULLs pass through so each operator's existing NULL semantics
    (aggregate-skip, join-miss) stay exactly as tested by the
    null_mixed tier; only non-finite values are excluded.  SQL mirror:
    finite_or_null_sql."""
    c = F.col(c) if isinstance(c, str) else c
    return c.isNull() | (~F.isnan(c) & (F.abs(c) != float("inf")))


def finite_or_null_sql(c: str) -> str:
    """DuckDB mirror of finite_or_null (isfinite is NULL on NULL, so
    the NULL arm is explicit)."""
    return f"(({c}) IS NULL OR isfinite({c}))"


#: measure-sanity magnitude bound for the DECIMAL(18,2) money paths:
#: DECIMAL(18,2) holds |v| < 1e16, and cents-quantized BIGINTs hold
#: |v|·100 < 2^63.  A FINITE measure at or past this bound is as
#: corrupt as ±inf (no fixture money value comes within 10 orders of
#: it) — and unlike the old double sums, which degraded gracefully, a
#: DECIMAL cast of 9e18 is a job-killing overflow on BOTH engines
#: (r12 review finding).  money_ok = NULL, or finite AND inside the
#: bound; excluded values behave exactly like NULLs downstream.
MONEY_ABS_MAX = 1e16


def money_ok(c) -> Column:
    """TRUE iff the measure is NULL or a finite value inside
    MONEY_ABS_MAX — the guard every DECIMAL(18,2)/cents cast needs.
    SQL mirrors: money_ok_sql (DuckDB), money_ok_portable_sql."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNull() | (~F.isnan(col)
                           & (F.abs(col) < F.lit(MONEY_ABS_MAX)))


def money_ok_sql(c: str) -> str:
    """DuckDB mirror of money_ok (isfinite subsumes the NaN/inf arms;
    abs(NaN) comparisons are false anyway, but isfinite is clearer)."""
    return (f"(({c}) IS NULL OR (isfinite({c}) "
            f"AND abs({c}) < {MONEY_ABS_MAX:.0e}))")


def money_ok_portable_sql(c: str) -> str:
    """money_ok as SQL text that parses identically on Spark SQL and
    DuckDB (no isfinite on Spark — the tpch._fin spelling plus the
    magnitude bound)."""
    return (f"({c} IS NULL OR (NOT isnan({c}) "
            f"AND abs({c}) < {MONEY_ABS_MAX:.0e}))")


#: double-moment statistics domain bound (the seasonal_envelope 9e14
#: precedent, promoted to a shared constant by the r12 finite-huge
#: arm): once a measure dwarfs the rounding grain by ~15 orders, the
#: ulp noise of engine-ordered double summation becomes VISIBLE at
#: any fixed-dp rounding — means/variances/regressions of a corpus
#: containing a finite 9.5e18 differ between engines in their last
#: printed digits, unfixably for double math.  A measure that large
#: is corrupt for these domains; stat_ok excludes it like a NULL.
STAT_ABS_MAX = 9e14


def stat_ok(c) -> Column:
    """TRUE iff the measure is NULL or finite inside STAT_ABS_MAX —
    the guard for double-moment paths (mean/var/corr/regr/median)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNull() | (~F.isnan(col)
                           & (F.abs(col) < F.lit(STAT_ABS_MAX)))


def stat_ok_sql(c: str) -> str:
    """DuckDB mirror of stat_ok."""
    return (f"(({c}) IS NULL OR (isfinite({c}) "
            f"AND abs({c}) < {STAT_ABS_MAX:.0e}))")


#: rate measures (discount, tax) cast to DECIMAL(4,2) in the 3-factor
#: TPC-H sums (a wider rate type would push the product past precision
#: 38); the matching sanity bound — a |rate| >= 100 is corrupt data
RATE_ABS_MAX = 100


def rate_ok(c) -> Column:
    """money_ok at DECIMAL(4,2) width (NULL passes, like money_ok)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNull() | (~F.isnan(col)
                           & (F.abs(col) < F.lit(RATE_ABS_MAX)))


def rate_ok_portable_sql(c: str) -> str:
    """money_ok at DECIMAL(4,2) width, engine-portable text."""
    return (f"({c} IS NULL OR (NOT isnan({c}) "
            f"AND abs({c}) < {RATE_ABS_MAX}))")


def money_dec(c) -> Column:
    """The conditional DECIMAL(18,2) measure term — NULL unless
    money_ok — shared by money_sum, the window/two-phase variants
    (money_sum_raw(...).over(w)) and weighted sums that multiply the
    term before summing (TWAP)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(money_ok(col), col.cast("decimal(18,2)"))


def money_sum_raw(c) -> Column:
    """The unrounded exact money sum (DECIMAL out) — compose with
    .over(w) for window prefix sums or re-aggregate for two-phase
    plans; money_sum is this + round + the DOUBLE cast.  ONE copy of
    the accumulation contract (r12 review: five inline re-spellings
    invited drift)."""
    return F.sum(money_dec(c))


def money_sum(c, dp: int = 2) -> Column:
    """Order-free exact money sum → DOUBLE.  The r12 many-files sweep
    proved raw double money sums are PARTIAL-ORDER-DEPENDENT: the same
    rows in a 1-file vs a 7-file parquet layout flipped sql_q1's
    sum_charge by a cent, because partial-aggregation order follows
    file layout — a result that depends on file count is wrong at any
    scale, and at 1000 executors the order is different every run.
    Fix = the sql_q10 pattern, shared: accumulate in DECIMAL(18,2)
    (exact, associative, order-free), round once, ONE cast back to
    DOUBLE (emitted schema unchanged).  The measure is summed
    CONDITIONALLY on money_ok (the cdc_apply shape) so corrupt
    ±inf/NaN/absurd-magnitude values never reach the DECIMAL cast
    while the row still counts for count(*) columns — less invasive
    than the TPC-H family's row-drop and identical on every committed
    fixture.  SQL mirror: money_sum_sql."""
    return F.round(money_sum_raw(c), dp).cast("double")


def money_sum_sql(c: str, dp: int = 2) -> str:
    """DuckDB mirror of money_sum: identical conditional DECIMAL
    accumulation, round, cast."""
    return (f"CAST(round(sum(CASE WHEN {money_ok_sql(c)} "
            f"THEN CAST({c} AS DECIMAL(18,2)) END), {dp}) AS DOUBLE)")


def finite_portable_sql(c: str) -> str:
    """finite-or-null as SQL TEXT that parses identically on Spark SQL
    and DuckDB (Spark SQL has no isfinite() — the tpch._fin
    spelling, shared here so queries built as spark.sql(...) strings
    and their oracles can embed ONE expression)."""
    return (f"({c} IS NULL OR (NOT isnan({c}) "
            f"AND abs({c}) != CAST('Infinity' AS DOUBLE)))")


def money_sum_portable_sql(c: str, dp: int = 2) -> str:
    """money_sum as engine-portable SQL text (see money_sum): exact
    conditional DECIMAL(18,2) sum of a money measure, rounded once,
    cast back to DOUBLE — embeddable verbatim in BOTH a spark.sql()
    query and its DuckDB oracle, so the two cannot drift."""
    return (f"CAST(round(sum(CASE WHEN {money_ok_portable_sql(c)} "
            f"THEN CAST({c} AS DECIMAL(18,2)) END), {dp}) AS DOUBLE)")


def rev_sum_portable_sql(price: str = "l_extendedprice",
                         disc: str = "l_discount") -> str:
    """The TPC-H revenue term sum(price·(1−discount)) as an exact
    engine-portable DECIMAL sum (the sql_q10 pattern, shared): per-row
    product in DECIMAL(18,2)·(1−DECIMAL(4,2)) — exact and inside
    precision 38 — conditional on both measures money_ok, rounded
    once, ONE cast to DOUBLE."""
    return (f"CAST(round(sum(CASE WHEN {money_ok_portable_sql(price)} "
            f"AND {rate_ok_portable_sql(disc)} "
            f"THEN CAST({price} AS DECIMAL(18,2)) "
            f"* (1 - CAST({disc} AS DECIMAL(4,2))) END), 2) AS DOUBLE)")
