package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2 Tier C rows "String fns",
  * "Date/time fns", "Math fns", "Array/map/JSON fns").
  *
  * The string chain deliberately exercises the reference's sanitize
  * building blocks — `translate`, `regexp_replace`, `regexp_extract` —
  * used by A3/A4/A9 (`/root/reference/SharedCode/HelperFunction.py:36-41`,
  * `:18-19`, `:94-109`); the date entry includes the A7 archive stamp
  * format `yyyyMMddHHmm` (`HelperFunction.py:52`).
  *
  * All are codegen'd built-ins (no UDFs) — each projection stays inside a
  * single WholeStageCodegen span over the scan, so at 100 TB these run at
  * scan speed.
  */
object FunctionQueries extends graft.QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // translate / regexp_replace / regexp_extract / split / substring /
    // upper / trim / length / concat_ws over `part`.
    "q_string_fns" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "part")
        .filter($"p_partkey" % 20 === 0)
        .select(
          $"p_partkey",
          upper($"p_name").as("name_upper"),
          length($"p_name").as("name_len"),
          substring($"p_name", 1, 5).as("name_pfx"),
          element_at(split($"p_name", " "), 1).as("first_word"),
          regexp_extract($"p_brand", "\\d+", 0).cast("int").as("brand_num"),
          regexp_replace($"p_name", "[aeiou]", "").as("name_novowel"),
          translate($"p_type", "AEO", "aeo").as("type_translated"),
          trim(concat_ws("|", $"p_brand", $"p_type")).as("brand_type"))
        .orderBy($"p_partkey")
    }),

    // date_format (A7 stamp) / year / month / date_add / datediff /
    // date_trunc / unix epoch over `orders`.
    "q_date_fns" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderkey" % 50 === 0)
        .select(
          $"o_orderkey",
          date_format($"o_orderdate", "yyyyMMddHHmm").as("archive_stamp"),
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          date_add($"o_orderdate".cast("date"), 30).as("due_date"),
          datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          trunc($"o_orderdate".cast("date"), "month").as("month_start"),
          unix_timestamp($"o_orderdate").as("epoch_sec"))
        .orderBy($"o_orderkey")
    }),

    // Time-series resample / gap-fill: daily per-user event counts with
    // missing days ZERO-FILLED from a generated calendar spine
    // (sequence + explode over each user's own min/max day, left join
    // back). The spine is generated, never scanned — at 100 TB it is
    // |keys| × |days| tiny rows joined against pre-aggregated counts,
    // one shuffle on (user, day).
    "q_resample" -> ((s, dir) => {
      import s.implicits._
      val counts = Tables(s, dir, "events")
        .filter($"user_id" % 5 === 0)
        .groupBy($"user_id", to_date($"ts").as("d"))
        .agg(count(lit(1)).as("n"))
      val spine = counts.groupBy($"user_id")
        .agg(min($"d").as("d0"), max($"d").as("d1"))
        .select($"user_id", explode(sequence($"d0", $"d1")).as("d"))
      spine.join(counts, Seq("user_id", "d"), "left")
        .select($"user_id", $"d".cast("string").as("day"),
          coalesce($"n", lit(0L)).as("n"))
        .orderBy($"user_id", $"day")
    }),

    // Gap-fill by LINEAR INTERPOLATION (q_resample's zero-fill sibling):
    // daily per-user value sums, missing days filled with
    //   v_prev + (v_next - v_prev) * gap_fraction
    // where prev/next come from ignore-nulls running windows over the
    // calendar spine. Determinism: daily sums go through decimal; the
    // interpolation is one double multiply-add over identical inputs
    // written in the same operation order in both engines; day fractions
    // are divisions of exact integer day diffs. The spine bounds are each
    // user's own min/max day, so no leading/trailing null edges exist.
    // Scale: same shape as q_resample (generated spine joined to
    // pre-aggregated days, one (user, day) shuffle); the two ignore-null
    // windows share one user-key sort.
    "q_interpolate" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, dir, "events")
        .filter($"user_id" % 20 === 0)
        .groupBy($"user_id", to_date($"ts").as("d"))
        .agg(sum($"value".cast("decimal(18,2)")).cast("double").as("v"))
      val spine = daily.groupBy($"user_id")
        .agg(min($"d").as("d0"), max($"d").as("d1"))
        .select($"user_id", explode(sequence($"d0", $"d1")).as("d"))
      val joined = spine.join(daily, Seq("user_id", "d"), "left")
      val wPrev = Window.partitionBy($"user_id").orderBy($"d".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy($"user_id").orderBy($"d".asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      joined
        .withColumn("v_prev", last($"v", ignoreNulls = true).over(wPrev))
        .withColumn("d_prev",
          last(when($"v".isNotNull, $"d"), ignoreNulls = true).over(wPrev))
        .withColumn("v_next", first($"v", ignoreNulls = true).over(wNext))
        .withColumn("d_next",
          first(when($"v".isNotNull, $"d"), ignoreNulls = true).over(wNext))
        .select($"user_id", $"d".cast("string").as("day"),
          $"v".isNull.as("interpolated"),
          when($"v".isNotNull, $"v").otherwise(
            $"v_prev" + ($"v_next" - $"v_prev") *
              (datediff($"d", $"d_prev").cast("double") /
                datediff($"d_next", $"d_prev").cast("double"))).as("v"))
        .orderBy($"user_id", $"day")
    }),

    // round (on decimal — HALF_UP in both engines; double round semantics
    // diverge) / abs / floor / ceil / power / sqrt over `lineitem`.
    "q_math_fns" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_orderkey" % 100 === 0)
        .select(
          $"l_orderkey", $"l_linenumber",
          round(($"l_extendedprice" * $"l_discount").cast("decimal(30,6)"), 2)
            .cast("double").as("disc_amt"),
          abs($"l_quantity" - lit(25.0)).as("qty_dev"),
          floor($"l_extendedprice").cast("long").as("price_floor"),
          ceil($"l_extendedprice").cast("long").as("price_ceil"),
          pow($"l_quantity", 2).as("qty_sq"),
          sqrt($"l_quantity").as("qty_sqrt"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // VARIANT (Spark 4 semi-structured type): a nested JSON document is
    // built deterministically from event columns, parsed into the
    // BINARY variant encoding (parse_json), and read back through typed
    // path extraction (variant_get: object fields, a nested object, an
    // array element). The oracle computes the same sums STRAIGHT FROM
    // THE COLUMNS — ground truth, no JSON at all — so one hash pins the
    // whole encode→extract round trip. Floats ride as integer cents so
    // number formatting can't leak into the document. At 100 TB:
    // variant is the scan-speed answer to schemaless telemetry — typed
    // extraction without per-row from_json schema inference.
    "q_variant" -> ((s, dir) => {
      import s.implicits._
      val doc = concat(lit("{\"u\":"), $"user_id",
        lit(",\"t\":\""), $"event_type",
        lit("\",\"vals\":["), round($"value" * 100).cast("bigint"),
        lit(","), $"event_id" % 7,
        lit("],\"nest\":{\"d\":"), $"event_id" % 100, lit("}}"))
      Tables(s, dir, "events")
        .select($"event_type", parse_json(doc).as("v"))
        .select($"event_type",
          variant_get($"v", "$.u", "bigint").as("u"),
          variant_get($"v", "$.vals[0]", "bigint").as("cents"),
          variant_get($"v", "$.vals[1]", "bigint").as("m7"),
          variant_get($"v", "$.nest.d", "bigint").as("d"),
          variant_get($"v", "$.t", "string").as("t"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"u").as("sum_u"),
          sum($"cents").as("sum_cents"), sum($"m7").as("sum_m7"),
          sum($"d").as("sum_d"),
          sum(when($"t" === $"event_type", 1L).otherwise(0L)).as("t_roundtrip"))
        .orderBy($"event_type")
    }),

    // JSON extraction from events.props (get_json_object) + map building.
    "q_json_fns" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select(
          $"event_type",
          get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    // PERMISSIVE malformed-JSON parse law: real ingestion sees broken
    // records — %13 rows are TRUNCATED mid-string (unterminated JSON →
    // every extracted field null, the row survives; note trailing-garbage
    // like `{...}!!` is NOT corrupt to Jackson, which stops at the first
    // complete value — truncation is the portable corruption), %7 rows
    // miss a field (field-level null only). from_json must degrade
    // per-row, never fail the stage, and the counts/sums pin exactly
    // which rows parsed.
    "q_json_malformed" -> ((s, dir) => {
      import s.implicits._
      val src = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus")
        .withColumn("js",
          when($"o_orderkey" % 13 === 0,
            concat(lit("{\"k\":"), $"o_orderkey", lit(",\"st\":\""),
              $"o_orderstatus"))
          .when($"o_orderkey" % 7 === 0,
            concat(lit("{\"k\":"), $"o_orderkey", lit("}")))
          .otherwise(concat(lit("{\"k\":"), $"o_orderkey", lit(",\"st\":\""),
            $"o_orderstatus", lit("\"}"))))
      src.select(from_json($"js",
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, st STRING")).as("j"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when($"j.k".isNotNull, 1).otherwise(0)).cast("bigint")
            .as("n_k_parsed"),
          sum(when($"j.st".isNull, 1).otherwise(0)).cast("bigint")
            .as("n_st_null"),
          sum($"j.k".cast("decimal(30,0)")).cast("bigint").as("sum_k"))
    }),

    // explode/unnest + array fns: token arrays from document text.
    "q_explode_tokens" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 50 === 0)
        .select($"doc_id", explode(split($"text", " ")).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("n_docs"))
        .orderBy($"token")
    }),

    // Map fns (C12): from_json → map<string,string>, map_keys/map_values
    // with sorted-key determinism (JSON key order is a parser detail —
    // never hash-compare on it), dynamic element_at lookup.
    "q_map_fns" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.{MapType, StringType}
      Tables(s, dir, "events")
        .filter($"event_id" % 20 === 0)
        .select($"event_id", $"event_type",
          from_json($"props", MapType(StringType, StringType)).as("m"))
        // Flattened through array_join: the driver harness canonicalizes
        // results via a pandas sort, which cannot hash raw list cells —
        // final entry projections must be flat scalars only.
        .select($"event_id",
          array_join(sort_array(map_keys($"m")), "|").as("ks"),
          array_join(
            transform(sort_array(map_keys($"m")), k => element_at($"m", k)),
            "|").as("vs"),
          size($"m").as("n_keys"),
          // to_json of a struct: compact {"k":v} form in both engines.
          // NULLs are pinned away with coalesce — Spark drops null struct
          // fields from JSON (ignoreNullFields) while DuckDB emits them,
          // so a nullable field must never reach the generator.
          to_json(struct($"event_id",
            coalesce($"event_type", lit("")).as("event_type"))).as("js"))
        .orderBy($"event_id")
    }),

    // Array scalar fns over the same token arrays: size / array_contains /
    // element_at (1-based in both Spark and DuckDB lists).
    "q_array_fns" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 25 === 0)
        .select(
          $"doc_id",
          size(split($"text", " ")).as("n_tokens"),
          array_contains(split($"text", " "), "spark").as("has_spark"),
          element_at(split($"text", " "), 1).as("first_token"),
          element_at(split($"text", " "), -1).as("last_token"))
        .orderBy($"doc_id")
    }))

  def oracle: Map[String, String] = Map(
    "q_string_fns" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS name_upper,
        |  LENGTH(p_name) AS name_len,
        |  SUBSTRING(p_name, 1, 5) AS name_pfx,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  CAST(regexp_extract(p_brand, '\d+', 0) AS int) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |  translate(p_type, 'AEO', 'aeo') AS type_translated,
        |  TRIM(concat_ws('|', p_brand, p_type)) AS brand_type
        |FROM part WHERE p_partkey % 20 = 0 ORDER BY p_partkey""".stripMargin,
    "q_resample" ->
      """WITH counts AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d, COUNT(1) AS n
        |  FROM events WHERE user_id % 5 = 0 GROUP BY 1, 2
        |),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS timestamp),
        |      CAST(d1 AS timestamp), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM counts GROUP BY 1)
        |)
        |SELECT s.user_id, CAST(s.d AS varchar) AS day,
        |  CAST(COALESCE(c.n, 0) AS bigint) AS n
        |FROM spine s LEFT JOIN counts c USING (user_id, d)
        |ORDER BY s.user_id, day""".stripMargin,
    "q_interpolate" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(value AS decimal(18,2))) AS double) AS v
        |  FROM events WHERE user_id % 20 = 0 GROUP BY 1, 2
        |),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS timestamp),
        |      CAST(d1 AS timestamp), INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1)
        |),
        |j AS (
        |  SELECT s.user_id, s.d, daily.v
        |  FROM spine s LEFT JOIN daily USING (user_id, d)
        |),
        |w AS (
        |  SELECT user_id, d, v,
        |    last_value(v IGNORE NULLS) OVER wp AS v_prev,
        |    last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER wp AS d_prev,
        |    first_value(v IGNORE NULLS) OVER wn AS v_next,
        |    first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
        |      OVER wn AS d_next
        |  FROM j
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY d ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY user_id ORDER BY d ASC
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, CAST(d AS varchar) AS day,
        |  (v IS NULL) AS interpolated,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE v_prev + (v_next - v_prev) *
        |            (CAST(date_diff('day', d_prev, d) AS double) /
        |             CAST(date_diff('day', d_prev, d_next) AS double))
        |  END AS v
        |FROM w ORDER BY user_id, day""".stripMargin,
    "q_date_fns" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y%m%d%H%M') AS archive_stamp,
        |  CAST(year(o_orderdate) AS int) AS y,
        |  CAST(month(o_orderdate) AS int) AS m,
        |  CAST(o_orderdate AS DATE) + 30 AS due_date,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS int) AS days_since,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(epoch(o_orderdate) AS bigint) AS epoch_sec
        |FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin,
    "q_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ROUND(CAST(l_extendedprice * l_discount AS decimal(30,6)), 2) AS double) AS disc_amt,
        |  ABS(l_quantity - 25.0::double) AS qty_dev,
        |  CAST(FLOOR(l_extendedprice) AS bigint) AS price_floor,
        |  CAST(CEIL(l_extendedprice) AS bigint) AS price_ceil,
        |  POWER(l_quantity, 2) AS qty_sq,
        |  SQRT(l_quantity) AS qty_sqrt
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_json_malformed" ->
      """WITH src AS (
        |  SELECT CASE
        |    WHEN o_orderkey % 13 = 0 THEN
        |      '{"k":' || o_orderkey || ',"st":"' || o_orderstatus
        |    WHEN o_orderkey % 7 = 0 THEN '{"k":' || o_orderkey || '}'
        |    ELSE '{"k":' || o_orderkey || ',"st":"' || o_orderstatus || '"}'
        |  END AS js
        |  FROM orders
        |),
        |p AS (
        |  SELECT CASE WHEN json_valid(js)
        |           THEN CAST(js->>'k' AS bigint) END AS k,
        |         CASE WHEN json_valid(js) THEN js->>'st' END AS st
        |  FROM src
        |)
        |SELECT COUNT(1) AS n_rows,
        |  CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
        |    AS n_k_parsed,
        |  CAST(SUM(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS bigint)
        |    AS n_st_null,
        |  CAST(SUM(CAST(k AS decimal(30,0))) AS bigint) AS sum_k
        |FROM p""".stripMargin,
    "q_variant" ->
      """SELECT event_type, CAST(COUNT(1) AS bigint) AS n,
        |  CAST(SUM(user_id) AS bigint) AS sum_u,
        |  CAST(SUM(CAST(ROUND(value * 100) AS bigint)) AS bigint) AS sum_cents,
        |  CAST(SUM(event_id % 7) AS bigint) AS sum_m7,
        |  CAST(SUM(event_id % 100) AS bigint) AS sum_d,
        |  CAST(COUNT(1) AS bigint) AS t_roundtrip
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_json_fns" ->
      """SELECT event_type, COUNT(1) AS n,
        |  CAST(SUM(k) AS bigint) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type, CAST(props->>'k' AS int) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_explode_tokens" ->
      """SELECT token, COUNT(1) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents WHERE doc_id % 50 = 0)
        |GROUP BY token ORDER BY token""".stripMargin,
    "q_map_fns" ->
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), '|') AS ks,
        |  array_to_string(list_transform(list_sort(json_keys(props)),
        |                 k -> json_extract_string(props, '$.' || k)), '|') AS vs,
        |  CAST(len(json_keys(props)) AS int) AS n_keys,
        |  CAST(to_json(struct_pack(event_id := event_id, event_type := coalesce(event_type, ''))) AS varchar) AS js
        |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin,
    "q_array_fns" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS int) AS n_tokens,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  string_split(text, ' ')[1] AS first_token,
        |  string_split(text, ' ')[-1] AS last_token
        |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin)
}
