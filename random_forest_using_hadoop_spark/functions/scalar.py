"""Scalar function families — SURVEY.md §2 B42–B49.

One query per family, each exercising several functions, all inside
whole-stage codegen (no Python in the hot path). Oracle-dialect deltas
(Spark ↔ DuckDB) are pinned per query in comments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from random_forest_using_hadoop_spark.helpers import dsum, o_dsum
from random_forest_using_hadoop_spark.registry import register
from random_forest_using_hadoop_spark.sources import load_table

# --- B42: string functions ---------------------------------------------------

# Dialect: Spark substring == DuckDB substr (1-based); Spark split on a
# regex == DuckDB string_split on a literal (single-space sep is both);
# both regexp_extract(col, pat, 1) return group 1.
_B42_ORACLE = r"""
SELECT p_partkey,
       upper(substr(p_name, 1, 8)) AS head,
       length(p_name) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       len(string_split(p_name, ' ')) AS n_words,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       regexp_replace(trim(p_name), ' ', '_', 'g') AS snake
FROM part
"""


@register("fn_string", oracle=_B42_ORACLE)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B42: substr/upper/length/concat_ws/lpad/split/regexp family."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.trim(F.col("p_name")), " ", "_").alias("snake"),
    )


# --- B43: date/time functions (BASELINE q_events_hourly shape) ---------------

# Dialect: date_trunc/year/month/hour agree; dayofweek deliberately
# avoided (Spark Sun=1 vs DuckDB Sun=0 — SURVEY §2 B43 note).
_B43_ORACLE = f"""
SELECT user_id,
       date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                 date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_id,
       year(ts) AS y,
       month(ts) AS m,
       event_type,
       COUNT(*) AS n,
       {o_dsum('value')} AS sum_value
FROM events
GROUP BY ALL
"""


@register("fn_datetime", oracle=_B43_ORACLE)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B43: hourly per-user×type event rollup — date_trunc/timestampdiff/
    year/month. This is the BASELINE q_events_hourly workload.

    The bucket is an *hour index* (hours since an hour-aligned NTZ
    origin), not a timestamp: it's tz-independent (no unix_timestamp —
    that would read NTZ through the session zone and break against the
    oracle on a non-UTC driver), and collecting ~99k bigints costs ~½ the
    py4j time of 99k datetimes (measured 1.11s → 0.65s at sf0.1). Both
    sides truncate to the hour *before* differencing so Spark's
    complete-intervals and DuckDB's boundary-crossing semantics agree.

    y/m are FUNCTIONS of hour_id, so they stay out of the group key —
    grouping on (user_id, hour_id, event_type) only and re-deriving the
    calendar fields from the bucket post-agg keeps the shuffle rows two
    ints narrower and the partial-agg hash key three columns wide
    instead of five. At 100 TB the shuffle is this query's only
    exchange; key width is the lever.

    Scale: ~1 group per user-hour-type; partial agg collapses map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    hour_id = F.expr(
        "timestampdiff(HOUR, timestamp_ntz'2024-01-01 00:00:00',"
        " date_trunc('hour', ts))"
    )
    bucket_ts = F.expr(
        "timestamp_ntz'2024-01-01 00:00:00' + make_dt_interval(0, hour_id)"
    )
    return (
        ev.groupBy("user_id", hour_id.alias("hour_id"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            "hour_id",
            F.year(bucket_ts).alias("y"),
            F.month(bucket_ts).alias("m"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --- B44: math functions -----------------------------------------------------

# round(x,6) guards libm last-ulp differences (ln/log10/pow); sqrt is
# IEEE-exact; magnitudes here keep the 1e-6 budget ≫ ulp error.
_B44_ORACLE = """
SELECT l_orderkey, l_linenumber,
       round(abs(l_quantity - 25.0), 6) AS dev,
       CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
       round(sqrt(l_extendedprice), 6) AS root_price,
       round(pow(l_quantity, 2.0), 6) AS qty_sq,
       round(ln(l_extendedprice + 1), 6) AS ln_price,
       round(log10(l_extendedprice + 1), 6) AS log_price,
       l_orderkey % 7 AS key_mod,
       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_side
FROM lineitem
"""
# Dialect: Spark ceil/floor(double) → BIGINT but DuckDB's → DOUBLE, and
# Spark signum → DOUBLE but DuckDB sign → INTEGER — both pinned above.


@register("fn_math", oracle=_B44_ORACLE)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B44: abs/ceil/floor/sqrt/pow/ln/log10/mod/sign."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_quantity") - 25.0), 6).alias("dev"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("root_price"),
        F.round(F.pow("l_quantity", F.lit(2.0)), 6).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_side"),
    )


# --- B45: conditional functions ----------------------------------------------

_B45_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END AS price_band,
       nullif(o_orderstatus, 'O') AS status_or_null,
       greatest(o_totalprice, 100000.0) AS at_least_100k,
       least(CAST(o_custkey AS DOUBLE), 500.0) AS capped_cust
FROM orders
"""


@register("fn_conditional", oracle=_B45_ORACLE)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B45: CASE WHEN / nullif / greatest / least."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("at_least_100k"),
        F.least(F.col("o_custkey").cast("double"), F.lit(500.0)).alias("capped_cust"),
    )


# --- B48: JSON extraction ----------------------------------------------------

# json_valid guard + ->> (unquoting extract) + TRY_CAST mirror Spark's
# get_json_object + try_cast semantics on ADVERSARIAL payloads, not
# just the fixture's '{"k": <int>}': malformed JSON → NULL (DuckDB's
# json_extract would hard-error), string-typed "12" → 12 (->> unquotes
# where json_extract keeps the quotes and the cast dies), nested
# object → NULL on both. Found by an r8 fuzz probe — the previous
# plain cast was an ANSI CAST_INVALID_INPUT crash on any non-scalar k.
_B48_ORACLE = """
SELECT CASE WHEN json_valid(props)
            THEN TRY_CAST(props ->> '$.k' AS INTEGER) END AS k,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


@register("fn_json", oracle=_B48_ORACLE)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B48: get_json_object over the events.props JSON strings,
    grouped to a small result. Robust to real-world payloads: a
    malformed document, a string-typed "12", or a nested object under
    $.k all land where the oracle lands them (NULL / 12 / NULL) —
    see the oracle comment for the dialect mapping."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr("try_cast(get_json_object(props, '$.k') as int)").alias("k"),
            "user_id",
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


# --- B49: casts + cryptographic hash -----------------------------------------

# Dialect: double→int casting ROUNDS in DuckDB but TRUNCATES in Spark —
# never cast floats to ints directly in oracle queries; go through
# floor() (pinned here). md5 agrees byte-for-byte.
_B49_ORACLE = """
SELECT doc_id,
       CAST(doc_id AS VARCHAR) AS id_str,
       CAST(n_chars AS DOUBLE) AS chars_dbl,
       CAST(floor(n_chars / 100.0) AS BIGINT) AS chars_century,
       md5(text) AS text_md5,
       md5(concat(coalesce(lang, '^^NULL^^'), ':',
                  CAST(doc_id AS VARCHAR))) AS key_md5
FROM documents
"""


@register("fn_cast_hash", oracle=_B49_ORACLE)
def q_fn_cast_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49: cast matrix (int→string, int→double, float→int via floor)
    + md5 content hashing (xxhash64 is Spark-only → excluded, §2)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("doc_id").cast("string").alias("id_str"),
        F.col("n_chars").cast("double").alias("chars_dbl"),
        F.floor(F.col("n_chars") / 100.0).cast("bigint").alias("chars_century"),
        F.md5("text").alias("text_md5"),
        # coalesce BEFORE the join: Spark concat_ws silently skips a
        # NULL lang (→ "7") while DuckDB's concat renders it empty
        # (→ ":7") — sentinel-coalescing on both engines keys the hash
        # identically (same class as the agg_table_checksum r9 fix)
        F.md5(
            F.concat_ws(
                ":",
                F.coalesce(F.col("lang"), F.lit("^^NULL^^")),
                F.col("doc_id").cast("string"),
            )
        ).alias("key_md5"),
    )


# --- bitwise function family --------------------------------------------------

# NB dialect traps pinned here: DuckDB's infix ^ is EXPONENT (xor is the
# function xor()); Spark's bitwiseXOR is ^ in its own SQL. bit_count
# return types differ (Spark INT, DuckDB TINYINT for integers) — cast
# both to BIGINT.
_BITWISE_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT) AS band,
       CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_mix,
       CAST(bit_count(o_orderkey) AS BIGINT) AS n_bits,
       CAST((o_orderkey >> 5) & 1 AS BIGINT) AS bit5,
       CAST((o_orderkey << 3) | 7 AS BIGINT) AS shifted_or
FROM orders
"""


@register("fn_bitwise", oracle=_BITWISE_ORACLE)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression family — AND-masked banding, XOR key mixing,
    popcount, bit probes, and shift/OR packing — the primitives behind
    hash partitioning, bitmap indexes, and the [[dedup_simhash]] banding,
    exercised here as a graded scalar surface.

    Scale: stateless codegen projections over the scan; zero shuffle.
    Integer semantics are two's-complement BIGINT on both engines, so
    every output is bit-exact by construction.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("band"),
        k.bitwiseXOR(F.col("o_custkey")).cast("bigint").alias("key_mix"),
        F.bit_count(k).cast("bigint").alias("n_bits"),
        F.shiftright(k, 5).bitwiseAND(F.lit(1)).cast("bigint").alias("bit5"),
        F.shiftleft(k, 3).bitwiseOR(F.lit(7)).cast("bigint").alias("shifted_or"),
    )


# --- calendar / interval family -----------------------------------------------

# Parity pinned by measurement: add_months ≡ + INTERVAL n MONTH (both
# clamp Jan 31 + 1mo → Feb 29); last_day identical; weekofyear is ISO
# week in both (2024-01-01 → 1).
_CALENDAR_ORACLE = """
SELECT o_orderkey,
       CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week
FROM orders
"""


@register("fn_calendar", oracle=_CALENDAR_ORACLE)
def q_fn_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/interval scalar family — month-end, month arithmetic
    with end-of-month clamping, quarter, day-of-year, ISO week — the
    functions fiscal-calendar rollups and retention offsets are built
    from (complements fn_datetime's truncation/diff surface).

    Scale: stateless codegen projection, zero shuffle. The dialect
    hazards live in the oracle note above — month clamping and ISO-week
    conventions are the classic cross-engine drift points and both are
    measured identical here.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return o.select(
        "o_orderkey",
        # DATE → string on both sides: DuckDB's pandas bridge widens
        # DATE to datetime64, which a stringifying hash distinguishes
        # from Spark's date objects.
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus3m"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
    )


# --- deterministic surrogate keys --------------------------------------------

_SKEY_ORACLE = """
WITH k AS (
  SELECT doc_id,
         ('0x' || substr(md5('doc|' || doc_id), 1, 15))::BIGINT AS skey
  FROM documents
),
audit AS (
  SELECT CAST(COUNT(*) - COUNT(DISTINCT skey) AS BIGINT) AS n_collisions FROM k
)
SELECT k.doc_id, k.skey, audit.n_collisions
FROM k CROSS JOIN audit
"""


@register("fn_surrogate_key", oracle=_SKEY_ORACLE)
def q_fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 60-bit surrogate keys from a namespaced content
    hash — the scale-safe replacement for ``monotonically_increasing_id``
    (whose values depend on partition layout, so two runs of the same
    pipeline disagree) and for sequence generators (a coordination
    bottleneck). Key = first 15 hex chars of md5('doc|' || id); the
    global collision count rides along as an audited column, recomputed
    by the oracle (Spark must observe the same 0 the oracle derives).

    Scale: pure per-row expression plus one count-distinct audit pass;
    the audit broadcasts a single row back — no window, no global sort
    (the crossJoin plans as a BroadcastNestedLoopJoin whose build side
    is that ONE row: the scalar-broadcast shape, not a quadratic join).
    At 60 bits the birthday bound keeps collision probability < 1e-5
    up to ~10⁷ keys per namespace; widen to two BIGINT columns (full
    md5) beyond that.
    """
    d = load_table(spark, sf_dir, "documents")
    skey = F.conv(
        F.substring(F.md5(F.concat(F.lit("doc|"), F.col("doc_id"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    k = d.select("doc_id", skey.alias("skey"))
    audit = k.agg(
        (F.count(F.lit(1)) - F.count_distinct("skey"))
        .cast("bigint")
        .alias("n_collisions")
    )
    return k.crossJoin(F.broadcast(audit))


# --- r11: VARIANT (Spark 4 semi-structured type) ------------------------------

_VARIANT_ORACLE = """
SELECT event_type AS t,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           / 1000000.0 AS sum_value,
       CAST(SUM(user_id % 11) AS BIGINT) AS a1_sum,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY event_type
"""


@register("fn_variant_shred", oracle=_VARIANT_ORACLE)
def q_fn_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT round trip: encode each event as a JSON document,
    `parse_json` it into the binary VARIANT type, then SHRED typed
    fields back out with `variant_get` (long, string, double, and an
    array index path) and aggregate — the oracle computes the same
    aggregates straight from the source columns, so any loss or type
    coercion inside the encode→variant→extract pipeline fails the
    value hash (doubles must survive via shortest-repr JSON rendering;
    null struct fields are dropped by to_json and must come back as
    NULLs, not zeros).

    Why VARIANT and not get_json_object (fn_json): at 100 TB a
    semi-structured column parsed per-expression re-parses the string
    for every path; VARIANT parses ONCE into a binary form that all
    `variant_get` calls share, and Spark shreds the accesses into
    columnar reads — the modern engine shape for event-payload
    analytics. All expressions here are JVM built-ins (no UDF), so the
    pipeline stays in codegen.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    payload = F.to_json(
        F.struct(
            F.col("user_id").alias("u"),
            F.col("event_type").alias("t"),
            F.col("value").alias("v"),
            F.array(
                F.col("user_id") % 7, F.col("user_id") % 11
            ).alias("a"),
        )
    )
    v = F.parse_json(payload)
    shredded = ev.select(
        F.try_variant_get(v, "$.u", "long").alias("uid"),
        F.try_variant_get(v, "$.t", "string").alias("t"),
        F.try_variant_get(v, "$.v", "double").alias("val"),
        F.try_variant_get(v, "$.a[1]", "long").alias("a1"),
    )
    return shredded.groupBy("t").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("val").alias("sum_value"),
        F.sum("a1").cast("bigint").alias("a1_sum"),
        F.countDistinct("uid").cast("bigint").alias("n_users"),
    )
