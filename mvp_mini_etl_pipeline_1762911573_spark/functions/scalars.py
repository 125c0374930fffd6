"""Scalar function battery (SURVEY.md §2.8 F1-F15).

Reference parity, per function: mock email lower+concat
(src/lib/randomuser.js:14), lpad phone (:15), CSV quote-escape
(pages/index.js:448), mod branching (randomuser.js:4-8), lenient
timestamp parse (:107), ISO format (pages/index.js:119), date
arithmetic (randomuser.js:9), URL hostname (pages/index.js:437-444),
JSON stringify (:262), null-coalesce (:56,:447), EXT map/json over
events.props.

All built-in pyspark.sql.functions — JVM-side, whole-stage codegen,
zero UDFs.  Every expression here is a narrow map: no shuffle at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import MapType, StringType

from ..oracles import USERS_CTE
from ..tables import load, users_raw


def _scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3: lower/concat (mock email), lpad (phone), regexp_replace
    (CSV '"'→'""' escape), plus trim/substr/split for battery width."""
    raw = users_raw(spark, sf_dir)
    return raw.select(
        "custkey",
        F.concat(F.lower("name_first"), F.lit("."),
                 F.lower("name_last"), F.lit("@example.com"))
         .alias("mock_email"),
        F.lpad(F.col("phone"), 4, "0").alias("padded_phone"),
        F.regexp_replace(
            F.concat(F.lit('say "'), F.col("name_first"), F.lit('"')),
            '"', '""').alias("csv_escaped"),
        F.substring("name_first", 1, 3).alias("prefix3"),
        F.upper("country").alias("country_upper"),
        F.length("email").alias("email_len"),
        F.split_part(F.col("email"), F.lit("@"), F.lit(2))
         .alias("email_domain"),
    )


def _scalar_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: modulo branching — the reference's index%2/index%3
    gender/country/city assignment (randomuser.js:4-8)."""
    raw = users_raw(spark, sf_dir)
    return raw.select(
        "custkey",
        F.when(F.col("custkey") % 2 == 0, "male").otherwise("female")
         .alias("gender"),
        F.when(F.col("custkey") % 3 == 0, "alpha")
         .when(F.col("custkey") % 3 == 1, "beta")
         .otherwise("gamma").alias("cohort"),
        F.pmod(F.col("custkey"), F.lit(7)).alias("bucket7"),
    )


def _scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5-F8: parse / format / extract / arithmetic on timestamps."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 10 == 0)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("iso"),
        F.year("ts").alias("yr"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("dom"),
        F.hour("ts").alias("hr"),
        F.date_format(F.date_trunc("day", F.col("ts")),
                      "yyyy-MM-dd").alias("day_floor"),
        F.date_format(F.col("ts") + F.expr("INTERVAL 7 DAYS"),
                      "yyyy-MM-dd HH:mm:ss").alias("plus_week"),
        F.datediff(F.lit("2026-01-01").cast("date"),
                   F.col("ts").cast("date")).alias("days_to_2026"),
    )


def _scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: URL hostname extraction (pages/index.js:437-444)."""
    raw = users_raw(spark, sf_dir)
    url = F.concat(F.lit("https://pics.example.com/u/"),
                   F.col("id"), F.lit(".jpg?size=64&v=2"))
    return raw.select(
        "custkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("size")).alias("size_param"),
    )


def _scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: JSON stringify of the whole row (raw modal payload,
    pages/index.js:262)."""
    raw = users_raw(spark, sf_dir)
    # the when() mirrors the oracle's `||` NULL propagation: a user
    # whose nation lookup missed (orphan nationkey) has country NULL,
    # which nulls the WHOLE concatenated payload in SQL — while
    # to_json would silently DROP the null field and emit a shorter
    # document (r10 single-row sweep; unreachable on the committed
    # fixtures, where every customer resolves a nation)
    fields = [F.col(c) for c in ("id", "name_first", "name_last",
                                 "country")]
    all_present = F.lit(True)
    for c in fields:
        all_present = all_present & c.isNotNull()
    return raw.select(
        "custkey",
        F.when(all_present,
               F.to_json(F.struct("id", "name_first", "name_last",
                                  "country"))).alias("payload"),
    )


def _scalar_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15: parse events.props JSON into a map and extract fields —
    from_json + element access + json-path."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 10 == 0)
    parsed = ev.select(
        "event_id", "props",
        F.from_json("props", MapType(StringType(), StringType()))
         .alias("m"),
    )
    return parsed.select(
        "event_id",
        F.map_keys("m").getItem(0).alias("first_key"),
        F.size(F.map_keys("m")).alias("n_keys"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.element_at(F.col("m"), "k").cast("bigint").alias("k_via_map"),
    )


def _scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT: parse_json once into the binary semi-structured
    type, then typed variant_get extraction — the shredded-JSON path
    that beats per-access string re-parsing at scale.

    try_parse_json, not parse_json (r12 string sweeps): a corrupt
    payload must degrade to NULL like every other JSON reader in the
    repo (from_json/get_json_object are lenient by design), not kill
    the job — parse_json THROWS on malformed input.  Spark's parsers
    accept a leading JSON document with trailing garbage and NULL on
    leading garbage; the oracle mirrors both via DUCK_JSON_LEAD."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 10 == 0)
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.variant_get(v, "$.missing", "string").alias("absent"),
        F.schema_of_variant(v).alias("var_schema"),
    )


def _scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type battery: map_from_arrays / map_concat /
    transform_values / map_filter / map_keys, reduced to deterministic
    scalar outputs (the oracle recomputes the VALUES as plain
    expressions — the map plumbing is the Spark-side subject under
    test)."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 20 == 0)
    base = ev.select(
        "event_id",
        F.map_from_arrays(
            F.array(F.lit("type"), F.lit("uid")),
            F.array(F.col("event_type"),
                    F.col("user_id").cast("string"))).alias("m"),
    )
    enriched = base.select(
        "event_id",
        F.map_concat(
            "m", F.create_map(F.lit("src"), F.lit("events"))).alias("m2"),
    )
    upper = enriched.select(
        "event_id",
        F.transform_values("m2", lambda k, v: F.upper(v)).alias("m3"),
        "m2",
    )
    return upper.select(
        "event_id",
        F.element_at("m2", "type").alias("type_val"),
        F.element_at("m3", "type").alias("type_upper"),
        F.size("m2").alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys("m2")), ",").alias("keys_csv"),
        F.size(F.map_filter(
            "m2", lambda k, v: k == F.lit("uid"))).alias("n_uid_entries"),
    )


def _scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT: PII scrubbing — the redaction pass a training corpus runs
    before release: mask the email local part, star out phone digits,
    replace the natural id with a salted-hash pseudonym (sha2 hex,
    identical lowercase output on both engines).  All narrow per-row
    JVM regex/hash expressions — no shuffle, no UDF; at 100 TB this is
    a pure map stage that runs at scan speed.  Patterns avoid
    lookarounds so Java regex (Spark) and RE2 (DuckDB) agree."""
    from ..tables import users_valid
    users = users_valid(spark, sf_dir)
    return users.select(
        "custkey",
        F.regexp_replace("email", r"^[^@]+", "***").alias("email_masked"),
        F.regexp_replace("phone", r"[0-9]", "*").alias("phone_masked"),
        F.sha2(F.concat(F.lit("pepper:"), F.col("id")), 256)
         .alias("id_pseudo"),
    )


QUERIES = {
    "scrub_pii": _scrub_pii,
    "scalar_string": _scalar_string,
    "scalar_variant": _scalar_variant,
    "scalar_map_ops": _scalar_map_ops,
    "scalar_case": _scalar_case,
    "scalar_date": _scalar_date,
    "scalar_url": _scalar_url,
    "scalar_json": _scalar_json,
    "scalar_map_json": _scalar_map_json,
}

def _duck_json_escape(col: str) -> str:
    """JSON string-escape a field exactly like Spark's to_json
    (Jackson) does — backslash and quote first, then the named
    control-char short escapes, then vertical tab as backslash-u000B
    (no short form exists for it) — so the
    concat-built scalar_json oracle escapes the CLASS, not just the
    one character an axis happened to plant (r12 review).  DuckDB's
    own to_json agrees with Jackson on all of these.  Remaining
    C0 controls (0x00-0x07, 0x0E-0x1F) are out of scope: no fixture
    generator or sweep axis emits them; extend the table before
    planting one."""
    e = col
    for frm, to in [
        ("chr(92)", "chr(92) || chr(92)"),   # backslash
        ("chr(34)", "chr(92) || chr(34)"),   # double quote
        ("chr(8)", "chr(92) || 'b'"),
        ("chr(9)", "chr(92) || 't'"),
        ("chr(10)", "chr(92) || 'n'"),
        ("chr(12)", "chr(92) || 'f'"),
        ("chr(13)", "chr(92) || 'r'"),
        ("chr(11)", "chr(92) || 'u000B'"),
    ]:
        e = f"replace({e}, {frm}, {to})"
    return e


def duck_json_lead(col: str) -> str:
    """DuckDB mirror of Spark's LENIENT JSON readers (r12 string
    sweeps): from_json / get_json_object / try_parse_json all parse a
    LEADING JSON document and ignore trailing garbage, but NULL on
    leading garbage — DuckDB's json_* functions are strict and ERROR
    on either.  The skip class before a prefix document is the full
    JSON whitespace set [ \\t\\r\\n] (r13 advice item: Spark's
    Jackson readers accept tab/CR/LF before a document, not just
    ASCII space — RFC 8259 ws).  This expression yields the leading OBJECT document
    when one exists (valid whole-string object, or a flat `{...}`
    prefix — the repo's props payloads are never nested) and NULL
    otherwise.  The json_type = 'OBJECT' conjunct (r12 review): a
    VALID but non-object payload ('123', '[1,2]') parses on DuckDB
    but is a NULL map to Spark's from_json(MapType), so the object
    guard is part of the mirror — consumers assert object shape
    (scalar_map_json's first_key/n_keys literals).  Residual fixture
    contract: scalar_variant's var_schema literal pins the `{"k": n}`
    shape — a corpus with valid non-object props would diverge there
    by design (schema_of_variant types the scalar), exactly like the
    other fixture-shape literals."""
    return (f"(CASE WHEN json_valid({col}) "
            f"AND json_type(TRY_CAST({col} AS JSON)) = 'OBJECT' "
            f"THEN {col} "
            f"ELSE nullif(regexp_extract({col}, "
            f"'^[ \\t\\r\\n]*(\\{{[^{{}}]*\\}})', 1), '') END)")


ORACLES = {
    "scrub_pii": USERS_CTE + """
SELECT custkey,
       regexp_replace(email, '^[^@]+', '***') AS email_masked,
       regexp_replace(phone, '[0-9]', '*', 'g') AS phone_masked,
       sha256('pepper:' || id) AS id_pseudo
FROM users_valid
""",
    "scalar_map_ops": """
SELECT event_id,
       event_type AS type_val,
       upper(event_type) AS type_upper,
       3 AS n_entries,
       'src,type,uid' AS keys_csv,
       1 AS n_uid_entries
FROM events WHERE event_id % 20 = 0
""",
    # var_schema is a literal for the fixed fixture shape; the lead-
    # document guard mirrors try_parse_json's lenient/NULL contract
    # (r12 string sweeps) and subsumes the NULL-props guard
    "scalar_variant": f"""
SELECT event_id,
       CAST(json_extract_string({duck_json_lead('props')}, '$.k')
            AS BIGINT) AS k_typed,
       CAST(NULL AS VARCHAR) AS absent,
       CASE WHEN {duck_json_lead('props')} IS NULL THEN NULL
            ELSE 'OBJECT<k: BIGINT>' END AS var_schema
FROM events WHERE event_id % 10 = 0
""",
    "scalar_string": USERS_CTE + """
SELECT custkey,
       lower(name_first) || '.' || lower(name_last) || '@example.com'
         AS mock_email,
       lpad(phone, 4, '0') AS padded_phone,
       replace('say "' || name_first || '"', '"', '""') AS csv_escaped,
       substr(name_first, 1, 3) AS prefix3,
       upper(country) AS country_upper,
       CAST(length(email) AS INTEGER) AS email_len,
       CASE WHEN email IS NULL THEN NULL
            ELSE split_part(email, '@', 2) END AS email_domain
FROM users_raw
""",
    # bucket7 is a sign-safe floor mod (((k % 7) + 7) % 7): the Spark
    # side is F.pmod, and plain `%` is remainder-of-dividend on BOTH
    # engines, so a negative custkey lands in a NEGATIVE % bucket but a
    # [0, 7) pmod bucket (r12 negative-keys sweep divergence).  The
    # gender/cohort branches keep plain % deliberately — Spark's `%`
    # IS remainder, so those match on any sign
    "scalar_case": USERS_CTE + """
SELECT custkey,
       CASE WHEN custkey % 2 = 0 THEN 'male' ELSE 'female' END AS gender,
       CASE custkey % 3 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
            ELSE 'gamma' END AS cohort,
       ((custkey % 7) + 7) % 7 AS bucket7
FROM users_raw
""",
    "scalar_date": """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS iso,
       CAST(year(ts) AS INTEGER) AS yr,
       CAST(month(ts) AS INTEGER) AS mo,
       CAST(day(ts) AS INTEGER) AS dom,
       CAST(hour(ts) AS INTEGER) AS hr,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_floor,
       strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d %H:%M:%S') AS plus_week,
       CAST(date_diff('day', CAST(ts AS DATE), DATE '2026-01-01')
            AS INTEGER) AS days_to_2026
FROM events WHERE event_id % 10 = 0
""",
    "scalar_url": USERS_CTE + """
SELECT custkey,
       'pics.example.com' AS host,
       '/u/' || id || '.jpg' AS path,
       'size=64&v=2' AS query,
       '64' AS size_param
FROM users_raw
""",
    # _duck_json_escape mirrors Spark to_json's full JSON string
    # escaping (backslash/quote/control chars; r12 unicode sweep +
    # review): the concat oracle must escape the CLASS a real JSON
    # serializer escapes, not one planted character
    "scalar_json": USERS_CTE + f"""
SELECT custkey,
       '{{"id":"' || {_duck_json_escape("id")}
       || '","name_first":"' || {_duck_json_escape("name_first")}
       || '","name_last":"' || {_duck_json_escape("name_last")}
       || '","country":"' || {_duck_json_escape("country")}
       || '"}}' AS payload
FROM users_raw
""",
    # the fixture props are always '{"k": n}', so first_key/n_keys are
    # literals — but only where a LEADING document parses: from_json
    # of NULL or leading-garbage props is a NULL map whose keys/size
    # are NULL (r11 all-NULL sweep; r12 string sweeps)
    "scalar_map_json": f"""
SELECT event_id,
       CASE WHEN {duck_json_lead('props')} IS NULL THEN NULL
            ELSE 'k' END AS first_key,
       CASE WHEN {duck_json_lead('props')} IS NULL THEN NULL
            ELSE 1 END AS n_keys,
       CAST(json_extract_string({duck_json_lead('props')}, '$.k')
            AS BIGINT) AS k_value,
       CAST(json_extract_string({duck_json_lead('props')}, '$.k')
            AS BIGINT) AS k_via_map
FROM events WHERE event_id % 10 = 0
""",
}
