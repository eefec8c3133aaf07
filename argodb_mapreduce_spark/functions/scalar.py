"""Scalar function pack (SURVEY.md §2.D).

The reference exposes no scalar functions beyond its 13-type Hive cast
bridge (ArgodbSerdeUtils.java:71-102); users write them in map() code
(SURVEY.md §2.B8). The engine standardizes on pyspark.sql.functions —
JVM-side, whole-stage-codegen'd — and demonstrates each family with a
DuckDB-oracle-checked query: string, date, math, conditional, array,
map, JSON, regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT(c_name, ':', c_mktsegment) AS name_seg,
           TRIM(CONCAT(' ', c_name, ' ')) AS name_trim,
           REPLACE(c_name, '#', '-') AS name_dash,
           (c_name LIKE '%1%') AS has_one
    FROM customer
    """,
    tags=("scalar", "string"),
    doc="String functions: upper/lower/substring/length/concat/trim/replace/like.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("", F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.col("c_name").like("%1%").alias("has_one"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT doc_id,
           REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_word,
           REGEXP_MATCHES(text, 'data') AS mentions_data,
           REGEXP_REPLACE(text, '[aeiou]', '_', 'g') AS devoweled
    FROM documents
    """,
    tags=("scalar", "string"),
    doc="Regex extract/match/replace. DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("data").alias("mentions_data"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_ts,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
    FROM orders
    """,
    tags=("scalar", "date"),
    doc="Date/time functions: year/month/day, date arithmetic, truncation, datediff.",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_ts"),
        # TIMESTAMP, not DATE, as the contract type: Spark DateType
        # reaches pandas as object dates while DuckDB DATEs arrive as
        # datetime64 — a driver value-hash mismatch even when the days
        # are identical. Both engines' date_trunc over a timestamp
        # column yields TIMESTAMP, so no cast is needed on either side.
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_98"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT p_partkey,
           ROUND(p_retailprice, 1) AS price_r1,
           ABS(p_retailprice - 1000.0) AS dist_1000,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
           CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(POW(CAST(p_size AS DOUBLE), 2.0) AS DOUBLE) AS size_sq,
           ROUND(LN(p_retailprice), 6) AS price_ln,
           SQRT(p_retailprice) AS price_sqrt,
           p_size % 5 AS size_mod
    FROM part
    """,
    tags=("scalar", "math"),
    doc="Math functions: round/abs/floor/ceil/pow/ln/sqrt/mod — IEEE-deterministic per row on identical inputs.",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_1000"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.pow(F.col("p_size").cast("double"), F.lit(2.0)).alias("size_sq"),
        # ln differs between JVM and libm in the last ulp — round to 6 on both sides.
        F.round(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        (F.col("p_size") % 5).alias("size_mod"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
           (CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE NULL END) AS even_nation_bal,
           IF(c_acctbal > 0, 1, 0) AS is_positive
    FROM customer
    """,
    tags=("scalar", "conditional"),
    doc="Conditional functions: case/when, coalesce, nullif, if.",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("N/A")).alias("seg_or_na"),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal")).alias("even_nation_bal"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("is_positive"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_val,
           list_contains([CAST(label AS INT)], 3) AS label_is_3,
           array_to_string(list_sort(list_transform(embedding[1:3],
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 1024.0) AS BIGINT))), ',') AS head3_q
    FROM embeddings
    """,
    tags=("scalar", "array"),
    doc=(
        "Array functions over ArrayType(Float): size, index, contains, "
        "slice+transform+sort. The transformed slice is exposed as an "
        "exact 2^10-quantized integer string: the driver hash cannot take "
        "top-level arrays, and integer formatting (unlike double shortest-"
        "repr) is engine-independent."
    ),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.col("embedding").getItem(0).alias("first_val"),
        F.array_contains(F.array(F.col("label")), F.lit(3)).alias("label_is_3"),
        F.array_join(
            F.sort_array(
                F.transform(
                    F.slice("embedding", 1, 3),
                    lambda x: F.round(x.cast("double") * F.lit(1024.0)).cast("long"),
                )
            ).cast("array<string>"),
            ",",
        ).alias("head3_q"),
    )


@register(
    "fn_array_fold",
    oracle="""
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE), 4) AS DECIMAL(18,4)))) AS DOUBLE) AS emb_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
    tags=("scalar", "array"),
    doc=(
        "Array fold (F.aggregate) and filter — the building blocks of the "
        "vector ops in operators/similarity.py. Exact-decimal element sum "
        "keeps both engines' folds bit-identical."
    ),
)
def fn_array_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    elem_dec = lambda x: F.round(x.cast("double"), 4).cast("decimal(18,4)")  # noqa: E731
    return e.select(
        "vec_id",
        F.aggregate(
            F.transform("embedding", elem_dec),
            F.lit(0).cast("decimal(38,4)"),
            lambda acc, x: acc + x,
        )
        .cast("double")
        .alias("emb_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT n_nationkey,
           n_name AS from_map,
           CAST(2 AS INT) AS map_size
    FROM nation
    """,
    tags=("scalar", "map"),
    doc="Map construction and access (MapType is Spark-native; reference model has no nested types — north-star extension).",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    m2 = F.create_map(
        F.lit("name"), F.col("n_name"), F.lit("key"), F.col("n_nationkey").cast("string")
    )
    return n.select(
        "n_nationkey",
        F.create_map(F.lit("name"), F.col("n_name")).getItem("name").alias("from_map"),
        F.size(m2).alias("map_size"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
    tags=("scalar", "json"),
    doc="JSON extraction from events.props (SURVEY.md §2.C5): get_json_object / from_json.",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT").getItem("k").alias("k_int"),
    )


@register(
    "fn_cast_bridge",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS SMALLINT) AS ln_small,
           CAST(l_linenumber AS TINYINT) AS ln_tiny,
           CAST(l_quantity AS BIGINT) AS qty_long,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS qty_dec,
           CAST(l_extendedprice AS VARCHAR) AS price_str,
           CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date,
           (l_returnflag = 'R') AS is_return,
           CAST(NULL AS INT) AS always_null
    FROM lineitem
    """,
    tags=("scalar", "cast"),
    doc=(
        "The reference's 13-type Hive cast bridge (ArgodbSerdeUtils.java:71-102) "
        "exercised as Spark casts: tinyint/smallint/int/bigint/decimal/string/"
        "date/timestamp/boolean. Parses TINYINT numerically — the reference's "
        "String.getBytes() bug (ArgodbSerdeUtils.java:41-42) is NOT replicated."
    ),
)
def fn_cast_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("smallint").alias("ln_small"),
        F.col("l_linenumber").cast("tinyint").alias("ln_tiny"),
        F.col("l_quantity").cast("bigint").alias("qty_long"),
        # The decimal cast is exercised, then stringified at the contract
        # boundary: pandas renders Spark decimals as object-dtype Decimal
        # but DuckDB decimals as float64 — the same dtype class the driver
        # hash treats as a mismatch (q12 r1) — while decimal→string is
        # scale-exact ('25.00') in both engines.
        F.col("l_quantity").cast("decimal(12,2)").cast("string").alias("qty_dec"),
        F.col("l_extendedprice").cast("string").alias("price_str"),
        # DATE round-trips through pandas as midnight datetime; normalize
        # to timestamp on both sides for the hash compare.
        F.col("l_shipdate").cast("date").cast("timestamp").alias("ship_date"),
        (F.col("l_returnflag") == "R").alias("is_return"),
        F.lit(None).cast("int").alias("always_null"),
    )


@register(
    "fn_string_extended",
    oracle="""
    SELECT n_nationkey,
           LPAD(n_name, 16, '.') AS name_lpad,
           RPAD(n_name, 16, '.') AS name_rpad,
           REVERSE(n_name) AS name_rev,
           LEFT(n_name, 3) AS name_left,
           RIGHT(n_name, 3) AS name_right,
           REPEAT('-', n_regionkey + 1) AS dashes,
           TRANSLATE(n_name, 'AEIOU', 'aeiou') AS name_trans,
           CAST(INSTR(n_name, 'A') AS BIGINT) AS first_a,
           SPLIT_PART(CONCAT(n_name, '|', 'X'), '|', 1) AS split_head,
           ASCII(n_name) AS first_code,
           CHR(65 + n_regionkey) AS region_chr
    FROM nation
    """,
    tags=("scalar", "string"),
    doc="Extended string pack: lpad/rpad/reverse/left/right/repeat/translate/instr/split_part/ascii/chr.",
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.lpad("n_name", 16, ".").alias("name_lpad"),
        F.rpad("n_name", 16, ".").alias("name_rpad"),
        F.reverse("n_name").alias("name_rev"),
        F.expr("left(n_name, 3)").alias("name_left"),
        F.expr("right(n_name, 3)").alias("name_right"),
        F.repeat(F.lit("-"), F.col("n_regionkey") + 1).alias("dashes"),
        F.translate("n_name", "AEIOU", "aeiou").alias("name_trans"),
        F.instr("n_name", "A").cast("long").alias("first_a"),
        F.split_part(F.concat("n_name", F.lit("|"), F.lit("X")), F.lit("|"), F.lit(1)).alias("split_head"),
        F.ascii("n_name").alias("first_code"),
        F.chr(F.lit(65) + F.col("n_regionkey")).alias("region_chr"),
    )


@register(
    "fn_datetime_extended",
    oracle="""
    SELECT event_id,
           CAST(HOUR(ts) AS INT) AS ev_hour,
           CAST(MINUTE(ts) AS INT) AS ev_minute,
           CAST(SECOND(ts) AS INT) AS ev_second,
           CAST(isodow(ts) AS INT) AS ev_isodow,
           CAST(QUARTER(ts) AS INT) AS ev_quarter,
           last_day(CAST(ts AS DATE)) + INTERVAL 0 DAY AS month_end,
           CAST(ts AS DATE) + INTERVAL 2 MONTH AS plus_2mo
    FROM events
    """,
    tags=("scalar", "date"),
    doc="Extended datetime pack: hour/minute/second, ISO day-of-week, quarter, last_day, month arithmetic.",
)
def fn_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.hour("ts").alias("ev_hour"),
        F.minute("ts").alias("ev_minute"),
        F.second("ts").alias("ev_second"),
        (F.weekday("ts") + 1).alias("ev_isodow"),
        F.quarter("ts").alias("ev_quarter"),
        F.last_day(F.col("ts").cast("date")).cast("timestamp").alias("month_end"),
        F.add_months(F.col("ts").cast("date"), 2).cast("timestamp").alias("plus_2mo"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           LENGTH(md5(text)) AS md5_len
    FROM documents
    """,
    tags=("scalar", "hash"),
    doc="Hash functions shared across engines: md5, sha256 (Spark sha2/256).",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.length(F.md5("text")).cast("long").alias("md5_len"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 15 AS size_and,
           p_size | 16 AS size_or,
           xor(p_size, 21) AS size_xor,
           p_size << 2 AS size_shl,
           p_size >> 1 AS size_shr,
           ~p_size AS size_not
    FROM part
    """,
    tags=("scalar", "bitwise"),
    doc="Bitwise operators: and/or/xor/shifts/not.",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        s.bitwiseAND(15).alias("size_and"),
        s.bitwiseOR(16).alias("size_or"),
        s.bitwiseXOR(21).alias("size_xor"),
        F.shiftleft(s, 2).alias("size_shl"),
        F.shiftright(s, 1).alias("size_shr"),
        F.bitwise_not(s).alias("size_not"),
    )


@register(
    "fn_array_extended",
    oracle="""
    SELECT n_nationkey,
           array_to_string([n_nationkey, CAST(n_regionkey AS INT)], ',') AS pair,
           array_to_string(flatten([[n_nationkey], [CAST(n_regionkey AS INT)]]), ',') AS flat,
           array_to_string(list_sort(list_distinct([CAST(n_regionkey AS INT), CAST(n_regionkey AS INT), n_nationkey])), ',') AS uniq,
           array_to_string(range(1, 4), ',') AS seq_123,
           array_to_string([n_name, 'X'], '/') AS joined,
           len(list_intersect([n_nationkey, 99], [n_nationkey, 77])) AS n_common
    FROM nation
    """,
    tags=("scalar", "array"),
    doc=(
        "Extended array pack: literal arrays, flatten, distinct, sequence, "
        "join, intersect size. Integer arrays are string-joined at the "
        "contract boundary (driver hash cannot take top-level arrays)."
    ),
)
def fn_array_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    r = F.col("n_regionkey")

    def joined(col, sep=","):
        return F.array_join(col.cast("array<string>"), sep)

    return n.select(
        "n_nationkey",
        joined(F.array(k, r)).alias("pair"),
        joined(F.flatten(F.array(F.array(k), F.array(r)))).alias("flat"),
        joined(F.sort_array(F.array_distinct(F.array(r, r, k)))).alias("uniq"),
        joined(F.sequence(F.lit(1), F.lit(3)).cast("array<long>")).alias("seq_123"),
        F.array_join(F.array(F.col("n_name"), F.lit("X")), "/").alias("joined"),
        F.size(F.array_intersect(F.array(k, F.lit(99)), F.array(k, F.lit(77)))).cast("long").alias("n_common"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT c_custkey,
           c_name AS s_name,
           c_acctbal AS s_bal,
           (c_acctbal > 5000) AS s_rich
    FROM customer
    """,
    tags=("scalar", "struct"),
    doc="Nested struct build + field extraction (north-star nested types; reference model is flat — SURVEY.md §1.2).",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = F.struct(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        (F.col("c_acctbal") > 5000).alias("rich"),
    )
    nested = c.select("c_custkey", s.alias("s"))
    return nested.select(
        "c_custkey",
        F.col("s.name").alias("s_name"),
        F.col("s.bal").alias("s_bal"),
        F.col("s.rich").alias("s_rich"),
    )


@register(
    "fn_sample_selfcheck",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_source, TRUE AS subset_ok, TRUE AS fraction_ok
    FROM orders
    """,
    tags=("scalar", "sample", "approx"),
    doc=(
        "Seeded Bernoulli sample self-check: sampled rows are a subset of "
        "the source (anti-join empty) and the fraction lands within "
        "binomial bounds. Engines' RNGs differ, so only the source count "
        "and pass flags are emitted (hash-checkable contract); the whole "
        "check is one lazy plan — no driver-side counts (VERDICT r1)."
    ),
)
def fn_sample_selfcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = o.sample(fraction=0.2, seed=42)
    src = o.agg(F.count(F.lit(1)).alias("n_source"))
    samp = s.agg(F.count(F.lit(1)).alias("n_sampled"))
    bad = s.join(o, "o_orderkey", "left_anti").agg(F.count(F.lit(1)).alias("n_bad"))
    return (
        src.crossJoin(samp)
        .crossJoin(bad)
        .select(
            "n_source",
            (F.col("n_bad") == 0).alias("subset_ok"),
            (F.abs(F.col("n_sampled") / F.col("n_source") - 0.2) < 0.05).alias("fraction_ok"),
        )
    )


@register(
    "fn_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS maybe_null, o_orderstatus
      FROM orders
    )
    SELECT o_orderkey,
           maybe_null,
           COALESCE(maybe_null, 'open') AS coalesced,
           CASE WHEN maybe_null IS NOT NULL THEN 'filled' ELSE 'empty' END AS nvl2_equiv,
           (maybe_null IS NOT DISTINCT FROM o_orderstatus) AS nullsafe_eq,
           (maybe_null = o_orderstatus) IS NULL AS threevalued_unknown,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_orderkey % 8
                                   ORDER BY maybe_null ASC NULLS FIRST, o_orderkey ASC) AS BIGINT) AS rn_nulls_first
    FROM t
    """,
    tags=("scalar", "null"),
    doc=(
        "NULL-handling surface: NULLIF/COALESCE/NVL2, null-safe equality "
        "(Spark <=> ≙ SQL IS NOT DISTINCT FROM), three-valued-logic "
        "UNKNOWN detection, and NULLS FIRST ordering — the SQL corner "
        "cases a Hive-bridge user exercises constantly (reference rows "
        "pass through HCatRecord with Java nulls; SURVEY.md §1.2 NULL "
        "sentinel notes)."
    ),
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("maybe_null"),
        "o_orderstatus",
    )
    # Partitioned window (never a global single-reducer sort): each
    # shard still mixes NULL and non-NULL rows, so NULLS FIRST ordering
    # is exercised without the 100 TB anti-pattern.
    w = Window.partitionBy(F.col("o_orderkey") % 8).orderBy(
        F.col("maybe_null").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    return t.select(
        "o_orderkey",
        "maybe_null",
        F.coalesce("maybe_null", F.lit("open")).alias("coalesced"),
        F.nvl2("maybe_null", F.lit("filled"), F.lit("empty")).alias("nvl2_equiv"),
        F.col("maybe_null").eqNullSafe(F.col("o_orderstatus")).alias("nullsafe_eq"),
        (F.col("maybe_null") == F.col("o_orderstatus")).isNull().alias("threevalued_unknown"),
        F.row_number().over(w).cast("long").alias("rn_nulls_first"),
    )
