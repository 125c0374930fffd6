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
