"""Scalar function surface: string / date / math / array / map-json /
case-cast queries. All JVM-side built-ins inside whole-stage codegen —
no Python UDFs in any hot path.

Reference grounding: ISO-8601 ``created_at`` handling (memory.ex:95) ≙
the date functions; the dynamic JSON payload (event.ex:33) ≙ the
map/json functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ex_hivent_spark.catalog import load_table
from ex_hivent_spark.functions.decimals import dround
from ex_hivent_spark.plans.registry import register


@register(
    "q_fn_string",
    oracle=r"""
    SELECT doc_id,
           upper(lang) AS lang_u,
           substring(text, 1, 10) AS prefix10,
           concat_ws('|', lang, source) AS lang_source,
           CAST(length(text) AS INTEGER) AS text_len,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(regexp_extract(source, 'src(\d+)', 1) AS INTEGER) AS src_num
    FROM documents
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function library over documents."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_u"),
        F.substring("text", 1, 10).alias("prefix10"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.length("text").alias("text_len"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.regexp_extract("source", r"src(\d+)", 1).cast("int").alias("src_num"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                AS INTEGER) AS days_since
    FROM events
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function library over event timestamps
    (created_at handling, memory.ex:95). Spark's dayofweek is 1=Sunday;
    DuckDB's is 0=Sunday, hence the +1 in the oracle."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day_ts"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofweek("ts").alias("dow"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .alias("days_since"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0
               AS net_price,
           abs(l_quantity - 25) AS qty_dev,
           CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct,
           sqrt(l_quantity) AS qty_sqrt,
           pow(l_discount, 2) AS disc_sq
    FROM lineitem
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function library over lineitem (all per-row IEEE double ops —
    bit-deterministic across engines)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
        .alias("net_price"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow("l_discount", F.lit(2)).alias("disc_sq"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT pos, n_vals,
           CAST(sum_val AS DOUBLE) / n_vals AS avg_val
    FROM (
      SELECT pos, count(*) AS n_vals,
             sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(25,10))) AS sum_val
      FROM (
        SELECT CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
               unnest(embedding) AS val
        FROM embeddings
      ) WHERE pos < 4
      GROUP BY pos
    )
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType surface: posexplode the embedding vector, average the
    first 4 dimensions across all rows (decimal-summed for determinism)."""
    em = load_table(spark, sf_dir, "embeddings")
    exploded = em.select(F.posexplode("embedding").alias("pos", "val")).filter(
        F.col("pos") < 4
    )
    return (
        exploded.groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.sum(F.col("val").cast("double").cast("decimal(25,10)"))
            .alias("sum_val_dec"),
        )
        .select(
            "pos",
            "n_vals",
            (F.col("sum_val_dec").cast("double") / F.col("n_vals"))
            .alias("avg_val"),
        )
    )


@register(
    "q_fn_json_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys
    FROM events
    """,
)
def q_fn_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the dynamic JSON payload (event.ex:33) into
    a map, read a key and count keys."""
    e = load_table(spark, sf_dir, "events")
    props_map = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return e.select(
        "event_id",
        F.element_at(props_map, "k").cast("int").alias("prop_k"),
        F.size(F.map_keys(props_map)).alias("n_keys"),
    )


@register(
    "q_fn_case_cast",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 200 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(floor(value) AS INTEGER) AS value_floor_int,
           CAST(user_id AS DOUBLE) AS user_id_d,
           CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS BIGINT)
               AS prop_k_long
    FROM events
    """,
)
def q_fn_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN buckets + cross-type casts. (double→int casts go through
    floor: Spark truncates while DuckDB rounds, so raw casts disagree.)"""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 200, "mid")
        .otherwise("high")
        .alias("bucket"),
        F.floor("value").cast("int").alias("value_floor_int"),
        F.col("user_id").cast("double").alias("user_id_d"),
        F.get_json_object("props", "$.k").cast("int").cast("long")
        .alias("prop_k_long"),
    )


@register(
    "q_fn_null_semantics",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'scrubbed') AS type_scrubbed,
           (value IS NOT DISTINCT FROM NULL) AS value_is_null,
           CASE WHEN value IS NOT DISTINCT FROM 0.0 THEN 'zero'
                WHEN value IS NULL THEN 'missing'
                ELSE 'present' END AS value_class,
           ifnull(CAST(user_id AS VARCHAR), '<anon>') AS user_label
    FROM events
    """,
)
def q_fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface: NULLIF / COALESCE / null-safe equality
    (Spark's <=> ≙ SQL IS NOT DISTINCT FROM) / IFNULL — the exact
    three-valued-logic corners engines must agree on."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("scrubbed"))
        .alias("type_scrubbed"),
        F.col("value").eqNullSafe(F.lit(None).cast("double"))
        .alias("value_is_null"),
        F.when(F.col("value").eqNullSafe(F.lit(0.0)), "zero")
        .when(F.col("value").isNull(), "missing")
        .otherwise("present")
        .alias("value_class"),
        F.ifnull(F.col("user_id").cast("string"), F.lit("<anon>"))
        .alias("user_label"),
    )


@register(
    "q_fn_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)
               AS n_positive,
           CAST(list_sum(list_transform(embedding,
                x -> CASE WHEN CAST(x AS DOUBLE) > 0 THEN 1 ELSE 0 END))
               AS INTEGER) AS n_positive_via_reduce,
           len(embedding) > 0
               AND list_bool_and(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)) < 10.0))
               AS all_bounded,
           list_bool_or(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) > 2.5)) AS any_large
    FROM embeddings
    """,
)
def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter / transform+aggregate /
    forall / exists) over the embedding vectors — the lambda-expression
    surface, all JVM-side."""
    em = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    return em.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: xd(x) > 0)).alias("n_positive"),
        F.aggregate(
            "embedding",
            F.lit(0),
            lambda acc, x: acc + F.when(xd(x) > 0, 1).otherwise(0),
        ).alias("n_positive_via_reduce"),
        F.forall("embedding", lambda x: F.abs(xd(x)) < 10.0).alias("all_bounded"),
        F.exists("embedding", lambda x: xd(x) > 2.5).alias("any_large"),
    )


@register(
    "q_fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INTEGER)
               AS n_vowel_runs,
           regexp_matches(text, '^[A-Z]') AS starts_upper,
           regexp_replace(source, '[0-9]+', '#', 'g') AS source_masked
    FROM documents
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function surface: group extraction, match counting,
    anchored match test, global replace — all in the regex subset Java
    and RE2 evaluate identically (classes/quantifiers/anchors, no
    lookaround or backreferences)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"src([0-9]+)", 1).alias("src_num"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]+"), F.lit(0)))
        .alias("n_vowel_runs"),
        F.col("text").rlike("^[A-Z]").alias("starts_upper"),
        F.regexp_replace("source", "[0-9]+", "#").alias("source_masked"),
    )


@register(
    "q_agg_conditional",
    oracle="""
    SELECT event_type,
           count(*) FILTER (value > 100) AS n_high,
           count(*) FILTER (value IS NULL) AS n_null_value,
           bool_and(value >= 0) AS all_nonnegative,
           bool_or(value > 190) AS any_very_high,
           CAST(max(CASE WHEN user_id % 2 = 0 THEN value END) AS DOUBLE)
               AS max_even_user_value
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation surface: count_if / filtered counts,
    every/any (bool_and/bool_or), and CASE-guarded max — all one hash
    aggregate, the FILTER-clause family every warehouse query leans
    on."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_high"),
        F.count_if(F.col("value").isNull()).alias("n_null_value"),
        F.every(F.col("value") >= 0).alias("all_nonnegative"),
        F.some(F.col("value") > 190).alias("any_very_high"),
        F.max(
            F.when(F.col("user_id") % 2 == 0, F.col("value"))
        ).alias("max_even_user_value"),
    )


@register(
    "q_fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           CAST(json_extract_string(props, '$.missing') AS INTEGER)
               AS prop_missing,
           json_valid('x' || props) AS still_valid
    FROM events
    """,
)
def q_fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type: ``props``
    parsed once with ``parse_json``, fields extracted with typed
    ``variant_get`` paths (missing path → NULL, not an error), and
    malformed input probed with ``try_parse_json`` (returns NULL
    instead of raising — the quarantine-friendly path).

    VARIANT is the scale answer for heterogeneous event payloads: the
    binary encoding is parsed once at ingest and every downstream
    field access is a cheap typed probe, instead of re-parsing JSON
    text per expression as ``get_json_object`` does. The oracle mirrors
    with DuckDB's JSON probes on the same paths.

    r16 wave 8: spread_table — the op is a pure projection doing four
    JSON parses per row, which ran entirely inside the one-task scan
    (1 job, no exchange, zero parallelism); the scale-adaptive spread
    parallelizes the parse map side and is inert on multi-split
    production inputs (guide §2.5/§6.2)."""
    from ex_hivent_spark.catalog import spread_table

    e = spread_table(spark, sf_dir, "events", "event_id")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("prop_k"),
        F.variant_get(v, "$.missing", "int").alias("prop_missing"),
        # prefix corruption: both engines reject it (Spark's Jackson
        # parser tolerates TRAILING garbage after a complete value)
        F.try_parse_json(F.concat(F.lit("x"), F.col("props")))
        .isNotNull()
        .alias("still_valid"),
    )


@register(
    "q_fn_fuzzy_match",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    t AS (
      SELECT p_name, string_split(p_name, ' ')[2] AS noun FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM t a JOIN t b ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def q_fn_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching with blocking — the record-linkage /
    entity-resolution primitive: candidate part-name pairs share a
    blocking key (the noun token) and survive a levenshtein edit-
    distance threshold. The blocked equi-join is the scale pattern —
    distance computes only within blocks, never across the full n²;
    at 100 TB the block key comes from phonetic/sorted-token keys, the
    plan is identical. Distinct names first, so the pair space is the
    name VOCABULARY, not the row count."""
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    t = names.select(
        "p_name", F.split("p_name", " ").getItem(1).alias("noun")
    )
    a, b = t.alias("a"), t.alias("b")
    pairs = a.join(
        b,
        (F.col("a.noun") == F.col("b.noun"))
        & (F.col("a.p_name") < F.col("b.p_name")),
    ).select(
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
    )
    return pairs.filter(F.col("edit_dist") <= 4)


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT event_id,
           event_id & user_id AS band,
           event_id | user_id AS bor,
           xor(event_id, user_id) AS bxor,
           (event_id & 255) << 3 AS shl,
           event_id >> 2 AS shr,
           CAST(bit_count(event_id) AS INT) AS popcount,
           ~event_id AS bnot
    FROM events
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface: AND/OR/XOR, shifts, population
    count, complement — the integer toolkit flag-packed columns and
    hash/bitmap constructions build on (the engine's bitmap rollup and
    Hilbert/Morton layouts use exactly these). Pure int64 arithmetic —
    identical in every engine, map-only plan."""
    e = load_table(spark, sf_dir, "events")
    x, y = F.col("event_id"), F.col("user_id")
    return e.select(
        "event_id",
        x.bitwiseAND(y).alias("band"),
        x.bitwiseOR(y).alias("bor"),
        x.bitwiseXOR(y).alias("bxor"),
        F.shiftleft(x.bitwiseAND(F.lit(255)), 3).cast("long").alias("shl"),
        F.shiftright(x, 2).cast("long").alias("shr"),
        F.bit_count(x).alias("popcount"),
        F.bitwise_not(x).alias("bnot"),
    )


@register(
    "q_fn_datetime_arith",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE) + CAST(user_id % 30 AS INTEGER) AS shifted_date,
           CAST(CAST(ts AS DATE) + to_months(CAST(user_id % 6 AS INTEGER))
                AS DATE) AS shifted_month,
           last_day(CAST(ts AS DATE)) AS month_end,
           CAST(quarter(ts) AS INT) AS qtr,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(weekofyear(ts) AS INT) AS iso_week
    FROM events
    """,
)
def q_fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic surface: day offsets, month offsets with
    end-of-month clamping (both engines clamp Jan 31 + 1 month to
    Feb 28/29), last_day, quarter, day-of-year, ISO week — the
    date-dimension toolkit every retention/billing rollup leans on.
    Map-only; integer calendar arithmetic is engine-exact."""
    e = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return e.select(
        "event_id",
        F.date_add(d, (F.col("user_id") % 30).cast("int")).alias(
            "shifted_date"
        ),
        F.add_months(d, (F.col("user_id") % 6).cast("int")).alias(
            "shifted_month"
        ),
        F.last_day(d).alias("month_end"),
        F.quarter("ts").alias("qtr"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("iso_week"),
    )


@register(
    "q_fn_try_arith",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 7 = 0 THEN NULL
                ELSE CAST(value / (user_id % 7) AS DOUBLE) END AS safe_div,
           TRY_CAST(
             CASE WHEN event_type = 'purchase' THEN '42'
                  ELSE event_type END AS INTEGER) AS maybe_int,
           TRY_CAST(props AS DOUBLE) AS props_as_num
    FROM events
    """,
)
def q_fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode: Spark 4 runs ANSI SQL, so
    ``x / 0`` and bad casts THROW mid-job — on a 100 TB run one
    malformed row kills hours of work. The ``try_*`` family turns those
    into NULLs: try_divide for the zero denominator, try_cast for
    non-numeric strings. Hash-checked against the explicit CASE/
    TRY_CAST oracle so the NULL-production contract is pinned.

    r16 wave 9: spread_table — a pure three-try-expression projection
    that ran entirely inside the one-task scan (the variant_json
    pattern, §2.5/§6.2); inert on multi-split production inputs."""
    from ex_hivent_spark.catalog import spread_table

    e = spread_table(spark, sf_dir, "events", "event_id")
    return e.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("user_id") % 7).alias("safe_div"),
        F.when(F.col("event_type") == "purchase", F.lit("42"))
        .otherwise(F.col("event_type"))
        .try_cast("int")
        .alias("maybe_int"),
        F.col("props").try_cast("double").alias("props_as_num"),
    )


@register(
    "q_fn_url_extract",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang || '/'
               || CAST(doc_id AS VARCHAR) || '?ref=corpus&n='
               || CAST(n_chars AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref_param,
           CAST(regexp_extract(url, '[?&]n=([0-9]+)', 1) AS BIGINT)
             AS n_param,
           regexp_extract(url, 'https://[^./]+[.]([^/]+)/', 1) AS domain
    FROM urls
    """,
)
def q_fn_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing via anchored regex capture groups: host, path,
    query parameters, and registrable domain from a synthesized
    per-document URL — the crawl-pipeline field extraction (Spark's
    ``parse_url`` has no DuckDB twin, so the engine standardizes on
    regexp_extract with patterns restricted to the RE2 ∩ Java-regex
    common subset: literal classes, no backrefs/lookahead — identical
    semantics in both engines, and a single codegen'd projection in
    Spark).

    Scale: map-only projection; regex cost is per-row constant and
    stays in whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=corpus&n="),
        F.col("n_chars").cast("string"),
    )
    urls = d.select("doc_id", url.alias("url"))
    return urls.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", r"^[a-z]+://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"[?&]ref=([^&]*)", 1).alias("ref_param"),
        F.regexp_extract("url", r"[?&]n=([0-9]+)", 1)
        .cast("bigint")
        .alias("n_param"),
        F.regexp_extract("url", r"https://[^./]+[.]([^/]+)/", 1).alias(
            "domain"
        ),
    )


@register(
    "q_fn_binary_codec",
    oracle="""
    WITH p AS (
      SELECT doc_id, substr(text, 1, 32) AS prefix FROM documents
    )
    SELECT doc_id,
           to_base64(prefix::BLOB) AS b64,
           lower(hex(prefix)) AS hex_lower,
           CAST(octet_length(prefix::BLOB) AS BIGINT) AS n_bytes,
           CAST(8 * octet_length(prefix::BLOB) AS BIGINT) AS n_bits,
           (from_base64(to_base64(prefix::BLOB)) = prefix::BLOB)
             AS b64_roundtrip,
           (unhex(hex(prefix)) = prefix::BLOB) AS hex_roundtrip,
           md5(prefix) AS prefix_md5
    FROM p
    """,
)
def q_fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec surface: base64 / hex encode-decode round-trips,
    byte/bit lengths, and content hashing over a text prefix — the
    function-coverage twin for opaque-payload handling (multimodal
    payload columns, checksum manifests, wire-format debugging).

    The prefix is capped at 32 bytes because Spark's ``base64``
    follows the MIME convention of chunking output beyond 76 chars
    (DuckDB's never chunks) — under the cap both engines emit the
    identical unchunked encoding, and the cap is documented as the
    cross-engine-safe envelope rather than papered over with a
    regexp strip. Hex is lower()-normalized (Spark emits uppercase
    A-F, DuckDB lowercase). Map-only projection, stays in codegen."""
    d = load_table(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, 32)
    b = F.encode(prefix, "UTF-8")
    return d.select(
        "doc_id",
        F.base64(b).alias("b64"),
        F.lower(F.hex(prefix)).alias("hex_lower"),
        F.octet_length(b).cast("bigint").alias("n_bytes"),
        F.bit_length(b).cast("bigint").alias("n_bits"),
        (F.unbase64(F.base64(b)) == b).alias("b64_roundtrip"),
        (F.unhex(F.hex(prefix)) == b).alias("hex_roundtrip"),
        F.md5(prefix).alias("prefix_md5"),
    )


# Deterministic synthetic IPv4: a multiplicative hash of user_id over
# the 32-bit space (the testdata has no IP column; same discipline as
# q_fn_url_extract's synthesized URLs and geo.py's hashed points).
_IP_MULT = 2654435761
_IP_MOD = 4294967296  # 2^32


@register(
    "q_fn_ip_cidr",
    oracle=f"""
    WITH ips AS (
      SELECT user_id,
             CAST((((user_id % 65536) * {_IP_MULT}) % {_IP_MOD}
                   + (((user_id // 65536) % 65536) * {_IP_MULT}) % 65536
                     * 65536) % {_IP_MOD} AS BIGINT) AS ip
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    parts AS (
      SELECT user_id, ip,
             CAST(floor(ip / 16777216) AS BIGINT) % 256 AS o1,
             CAST(floor(ip / 65536) AS BIGINT) % 256 AS o2,
             CAST(floor(ip / 256) AS BIGINT) % 256 AS o3,
             ip % 256 AS o4
      FROM ips
    )
    SELECT user_id, ip,
           o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip_str,
           CAST(o1 * 16777216 + o2 * 65536 AS BIGINT) AS subnet16,
           CAST(o1 * 16777216 + o2 * 65536 + o3 * 256 AS BIGINT)
             AS subnet24,
           (o1 = 10 OR (o1 = 172 AND o2 >= 16 AND o2 <= 31)
            OR (o1 = 192 AND o2 = 168)) AS is_private,
           (CAST(floor(ip / 4096) AS BIGINT)
              = CAST(floor(167772160 / 4096) AS BIGINT)) AS in_watch_cidr
    FROM parts
    """,
)
def q_fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parsing / CIDR arithmetic over a synthesized per-user
    address (multiplicative hash of user_id — the testdata carries no
    IP column, the q_fn_url_extract discipline): dotted-quad
    rendering, /16 and /24 subnet keys, the RFC-1918 private-range
    test, and membership in a /20 watch block (10.0.0.0/20) computed
    by prefix-integer division — the abuse-detection / geo-enrichment
    field toolkit.

    All octet math is exact integer div/mod (no bit-function
    divergence risk between engines: DuckDB's ``>>`` on BIGINT and
    Spark's ``shiftright`` agree, but div/mod is the least-surprise
    common subset and folds identically). The hash itself is the
    16-bit-split form of user_id·K mod 2^32 — every intermediate
    ≤ ~1.8e14, exact int64 for ANY user_id (the naive product wraps
    Spark's int64 at user_id > ~3.47e9 while DuckDB raises). Map-only
    projection over the distinct-user frame; stays in whole-stage
    codegen."""
    e = load_table(spark, sf_dir, "events")
    # 16-bit split of the multiplicative hash: user_id·K mod 2^32
    # computed as (lo·K mod 2^32 + (hi·K mod 2^16)·2^16) mod 2^32 with
    # lo/hi the low/high 16 bits of user_id mod 2^32. Every
    # intermediate stays below 1.8e14, so the hash is exact int64 for
    # ANY user_id — the naive user_id·K wraps Spark's int64 silently
    # (DuckDB raises) once user_id > ~3.47e9.
    lo = F.col("user_id") % 65536
    hi = F.expr("user_id div 65536") % 65536
    ips = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            (
                (lo * _IP_MULT % _IP_MOD + hi * _IP_MULT % 65536 * 65536)
                % _IP_MOD
            )
            .cast("bigint")
            .alias("ip"),
        )
    )
    ip = F.col("ip")
    o1 = F.floor(ip / 16777216).cast("bigint") % 256
    o2 = F.floor(ip / 65536).cast("bigint") % 256
    o3 = F.floor(ip / 256).cast("bigint") % 256
    o4 = ip % 256
    parts = ips.select(
        "user_id",
        "ip",
        o1.alias("o1"),
        o2.alias("o2"),
        o3.alias("o3"),
        o4.alias("o4"),
    )
    return parts.select(
        "user_id",
        "ip",
        F.concat_ws(
            ".",
            F.col("o1").cast("string"),
            F.col("o2").cast("string"),
            F.col("o3").cast("string"),
            F.col("o4").cast("string"),
        ).alias("ip_str"),
        (F.col("o1") * 16777216 + F.col("o2") * 65536)
        .cast("bigint")
        .alias("subnet16"),
        (
            F.col("o1") * 16777216
            + F.col("o2") * 65536
            + F.col("o3") * 256
        )
        .cast("bigint")
        .alias("subnet24"),
        (
            (F.col("o1") == 10)
            | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
            | ((F.col("o1") == 192) & (F.col("o2") == 168))
        ).alias("is_private"),
        (
            F.floor(ip / 4096).cast("bigint")
            == F.floor(F.lit(167772160) / 4096).cast("bigint")
        ).alias("in_watch_cidr"),
    )
