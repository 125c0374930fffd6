"""Shared ANSI-SQL fragments for the DuckDB oracle.

``USERS_CTE`` is the exact SQL mirror of ``tables.users_base/users_raw/
users_valid/users_clean``; every oracle query that consumes the canonical
user entity is written as  ``USERS_CTE + "SELECT ..."``.

Determinism policy (driver hash-gate safety):
* timestamps never leave a query as timestamp dtype — always formatted
  to strings identically on both sides;
* float aggregates are rounded (the per-row arithmetic is identical
  IEEE-754 on both engines; rounding absorbs summation-order noise);
* RATIO-OF-INTEGERS outputs are rounded in exact int64 arithmetic
  (functions/exact.py) — engine round() semantics DISAGREE on exact
  decimal halves (Spark rounds the shortest decimal repr half-up,
  DuckDB rounds the binary value), and a/b with a factor-5 reduced
  denominator lands on such halves; transcendental outputs (exp/log/
  sqrt mixes) cannot, and keep plain round();
* DuckDB integer aggregates are CAST to BIGINT (DuckDB sum(BIGINT)
  yields HUGEINT, Spark yields LONG);
* every ORDER BY / window has a total tie-break.
"""

USERS_CTE = """
WITH first_order AS (
  SELECT o_custkey, min(o_orderdate) AS first_order_ts
  FROM orders GROUP BY o_custkey
), users_base AS (
  SELECT
    c_custkey AS custkey,
    CAST(c_custkey AS VARCHAR) AS id,
    -- CASE guards: DuckDB split_part(NULL, ...) returns '' where
    -- Spark's returns NULL, so a NULL c_name leaked empty-string name
    -- parts into every downstream concat/substr (r11 all-NULL sweep)
    CASE WHEN c_name IS NULL THEN NULL
         ELSE split_part(c_name, '#', 1) END AS name_first,
    CASE WHEN c_name IS NULL THEN NULL
         ELSE split_part(c_name, '#', 2) END AS name_last,
    CASE WHEN c_custkey % 20 = 19 THEN NULL
         ELSE lower(replace(c_name, '#', '.')) || '@example.com' END AS email,
    lpad(CAST(c_custkey % 100 AS VARCHAR), 2, '0') AS phone,
    n_name AS country,
    n_name || ' City ' || CAST(c_custkey % 3 AS VARCHAR) AS city,
    CASE WHEN c_custkey % 25 = 13 THEN 'not-a-date'
         ELSE strftime(first_order_ts, '%Y-%m-%dT%H:%M:%S') END AS registered_raw,
    r_name AS region,
    c_mktsegment AS segment,
    c_acctbal AS acctbal,
    'https://pics.example.com/' || CAST(c_custkey AS VARCHAR) || '.jpg' AS thumbnail
  FROM customer
  LEFT JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN region ON n_regionkey = r_regionkey
  LEFT JOIN first_order ON c_custkey = o_custkey
), users_raw AS (
  SELECT * FROM users_base
  UNION ALL
  SELECT * FROM users_base WHERE custkey % 10 = 0
), users_valid AS (
  SELECT *, try_cast(registered_raw AS TIMESTAMP) AS registered_ts
  FROM users_raw
  WHERE email IS NOT NULL
    AND id IS NOT NULL
    AND try_cast(registered_raw AS TIMESTAMP) IS NOT NULL
), users_clean AS (
  SELECT DISTINCT * FROM users_valid
)
"""

# Spark date_format pattern <-> DuckDB strftime pattern used everywhere a
# timestamp is emitted.
SPARK_TS_FMT = "yyyy-MM-dd HH:mm:ss"
DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S"
