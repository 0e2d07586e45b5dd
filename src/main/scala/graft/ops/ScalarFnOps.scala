package graft.ops

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface: string, date/time, math, array (incl.
  * higher-order functions), map, JSON and conditional expressions. All
  * `org.apache.spark.sql.functions._` built-ins — fully codegen'd, no UDFs.
  *
  * Cross-engine numeric rules (validated empirically, see graft.num):
  * per-row *, /, -, sqrt on doubles are IEEE-identical in Spark and DuckDB;
  * transcendentals (ln/exp/pow) and decimal re-rounding of doubles are NOT
  * relied on in oracle'd outputs.
  */
object ScalarFnOps extends OpModule {

  private val D = DecimalType(38, 10)
  private val DF = DecimalType(28, 10)

  def ops: Seq[Op] = Seq(

    Op("fn_string",
      (s, dir) => Tables(s, dir, "part")
        .select(col("p_partkey"),
          lower(col("p_name")).as("lname"),
          upper(col("p_brand")).as("ubrand"),
          substring(col("p_type"), 1, 4).as("t4"),
          length(col("p_name")).as("name_len"),
          element_at(split(col("p_name"), " "), 1).as("first_word"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          regexp_replace(col("p_type"), " ", "_").as("type_us"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
        substring(p_type, 1, 4) AS t4, length(p_name) AS name_len,
        split_part(p_name, ' ', 1) AS first_word,
        p_brand || '/' || p_type AS brand_type,
        regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        replace(p_type, ' ', '_') AS type_us
        FROM part ORDER BY p_partkey""")),

    Op("fn_date",
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          date_add(col("o_orderdate").cast("date"), 7).as("plus7d"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        CAST(day(o_orderdate) AS INT) AS d, CAST(quarter(o_orderdate) AS INT) AS q,
        date_trunc('month', o_orderdate) AS month_start,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        CAST(o_orderdate AS DATE) + 7 AS plus7d
        FROM orders ORDER BY o_orderkey""")),

    Op("fn_math",
      (s, dir) => Tables(s, dir, "part")
        .select(col("p_partkey"),
          abs(col("p_size") - 25).as("size_dist"),
          (col("p_size") % 7).as("size_mod"),
          sqrt(col("p_size").cast("double")).as("size_sqrt"),
          floor(col("p_retailprice")).as("price_floor"),
          ceil(col("p_retailprice")).as("price_ceil"),
          (col("p_size") * col("p_size")).as("size_sq"),
          greatest(col("p_size"), lit(25)).as("size_hi"),
          least(col("p_size"), lit(25)).as("size_lo"),
          signum((col("p_size") - 25).cast("double")).cast("int").as("size_sign"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, abs(p_size - 25) AS size_dist,
        p_size % 7 AS size_mod, sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
        CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        p_size * p_size AS size_sq,
        greatest(p_size, 25) AS size_hi, least(p_size, 25) AS size_lo,
        CAST(sign(p_size - 25) AS INT) AS size_sign
        FROM part ORDER BY p_partkey""")),

    // Array ops incl. higher-order aggregate: exact elementwise sum via
    // decimal accumulation inside the HOF fold (order-deterministic).
    Op("fn_array",
      (s, dir) => Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_elem"),
          array_max(col("embedding")).cast("double").as("max_elem"),
          array_min(col("embedding")).cast("double").as("min_elem"),
          // Higher-order fold with integer accumulation: quantize each
          // element to micro-units (round() ties go half-away-from-zero in
          // BOTH engines, unlike decimal casts) and sum exactly as longs —
          // partition/order independent, no float drift.
          aggregate(col("embedding"), lit(0L),
            (acc, x) => acc + round(x.cast("double") * lit(1000000.0)).cast("long"))
            .as("elem_sum_micros"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        CAST(embedding[1] AS DOUBLE) AS first_elem,
        (SELECT CAST(MAX(x) AS DOUBLE) FROM UNNEST(embedding) AS t(x)) AS max_elem,
        (SELECT CAST(MIN(x) AS DOUBLE) FROM UNNEST(embedding) AS t(x)) AS min_elem,
        (SELECT CAST(SUM(CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) FROM UNNEST(embedding) AS t(x)) AS elem_sum_micros
        FROM embeddings ORDER BY vec_id""")),

    // Map construction + lookup (property-map surface of the graph model).
    Op("fn_map",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          map(lit("lang"), col("lang"), lit("source"), col("source")).as("props"))
        .select(col("doc_id"),
          element_at(col("props"), "lang").as("lang_v"),
          element_at(col("props"), "source").as("source_v"),
          array_join(map_keys(col("props")), ",").as("key_list"),
          size(col("props")).cast("long").as("n_keys"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang AS lang_v, source AS source_v,
        'lang,source' AS key_list, CAST(2 AS BIGINT) AS n_keys
        FROM documents ORDER BY doc_id""")),

    Op("fn_json",
      (s, dir) => Tables(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k_parsed"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val,
        CAST(props->>'k' AS BIGINT) AS k_parsed
        FROM events ORDER BY event_id""")),

    Op("fn_case",
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderpriority") === "1-URGENT", 1)
            .when(col("o_orderpriority") === "2-HIGH", 2)
            .when(col("o_orderpriority") === "3-MEDIUM", 3)
            .otherwise(9).as("prio_rank"),
          expr("coalesce(nullif(o_orderstatus, 'O'), 'OPEN')").as("status_label"),
          when(col("o_totalprice") > 150000.0, "big").otherwise("small").as("bucket"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
          WHEN '3-MEDIUM' THEN 3 ELSE 9 END AS prio_rank,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
        CASE WHEN o_totalprice > 150000.0 THEN 'big' ELSE 'small' END AS bucket
        FROM orders ORDER BY o_orderkey""")),

    // Bitwise surface (partition routing, bitmask flags, hash mixing —
    // the bit-level toolkit LSH/fingerprint operators build on): and / or /
    // xor / shifts / popcount, all codegen'd per-row primitives.
    Op("fn_bitwise",
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_orderkey").bitwiseAND(255)).as("band"),
          (col("o_orderkey").bitwiseOR(15)).as("ored"),
          (col("o_orderkey").bitwiseXOR(12345)).as("xored"),
          shiftleft(col("o_orderkey"), 2).as("shl"),
          shiftright(col("o_orderkey"), 3).as("shr"),
          bit_count(col("o_orderkey")).as("nbits"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderkey & 255 AS band,
        o_orderkey | 15 AS ored, xor(o_orderkey, 12345) AS xored,
        o_orderkey << 2 AS shl, o_orderkey >> 3 AS shr,
        bit_count(o_orderkey) AS nbits
        FROM orders ORDER BY o_orderkey""")),

    // Regex surface: extract / global replace / match predicate. Patterns
    // stay in the POSIX-class subset where Java regex (Spark) and RE2
    // (DuckDB) agree; DuckDB's regexp_replace needs the explicit 'g' flag
    // to match Spark's replace-all semantics.
    Op("fn_regex",
      (s, dir) => Tables(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_type"), "[AEIOU]", "").as("consonants"),
          col("p_brand").rlike("^Brand#[0-9]+$").as("brand_ok"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        regexp_replace(p_type, '[AEIOU]', '', 'g') AS consonants,
        regexp_matches(p_brand, '^Brand#[0-9]+$') AS brand_ok
        FROM part ORDER BY p_partkey""")),

    // URL decomposition — Spark's dedicated parse_url on one side, the
    // equivalent anchored regexes on the DuckDB side (which has no URL
    // parser). URLs are synthesized from document metadata, so every part
    // is present and the two parsers provably agree on this grammar.
    Op("fn_url",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/doc/"),
            col("doc_id").cast("string"), lit("?lang="), col("lang")).as("url"))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"))
        .orderBy("doc_id"),
      Some("""WITH u AS (SELECT doc_id,
          'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
            || '?lang=' || lang AS url FROM documents)
        SELECT doc_id,
          regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
          regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
          regexp_extract(url, '\?(.*)$', 1) AS query
        FROM u ORDER BY doc_id"""))
  )
}
