package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.WeightedMean
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar / higher-order / generator functions (SURVEY.md §2g) and the
  * custom-aggregate seam (`agg_udaf`, §2d).
  *
  * Everything here stays inside whole-stage codegen: built-in
  * `functions._` only, except the one deliberate `fn_udf` row (the UDF
  * seam itself) and the `Aggregator`-backed UDAF.
  */
object Scalars {

  private val fnString = QueryDef(
    "fn_string",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          upper(col("lang")).as("lang_uc"),
          substring(col("text"), 1, 12).as("prefix"),
          length(col("text")).cast("long").as("text_len"),
          concat(col("lang"), lit("_"), col("source")).as("tag"),
          trim(lit("  pad  ")).as("trimmed"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, upper(lang) AS lang_uc, substr(text, 1, 12) AS prefix,
              CAST(length(text) AS BIGINT) AS text_len,
              lang || '_' || source AS tag, trim('  pad  ') AS trimmed
            FROM documents ORDER BY doc_id"""))

  /** Timestamps only ever leave through date_trunc/extract → epoch
    * BIGINT (events.ts is ns-precision parquet; SURVEY.md §5). Spark
    * dayofweek is 1=Sunday, DuckDB dow is 0=Sunday — normalized in the
    * oracle (+1). */
  private val fnDate = QueryDef(
    "fn_date",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          unix_timestamp(date_trunc("day", col("ts"))).as("day_epoch"),
          hour(col("ts")).cast("long").as("h"),
          dayofweek(col("ts")).cast("long").as("dw"),
          dayofmonth(col("ts")).cast("long").as("dom"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
              CAST(extract(hour FROM ts) AS BIGINT) AS h,
              CAST(dayofweek(ts) + 1 AS BIGINT) AS dw,
              CAST(extract(day FROM ts) AS BIGINT) AS dom
            FROM events ORDER BY event_id"""))

  /** Interval arithmetic + calendar diffs — the scheduling/SLA date
    * surface beyond fn_date's field extraction: fixed-interval shifts,
    * day diffs against an epoch date, calendar-month rollover, quarter
    * bucketing. All outputs leave as epoch BIGINTs per the determinism
    * rules (both engines run UTC). */
  private val fnInterval = QueryDef(
    "fn_interval",
    (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          unix_timestamp(expr("o_orderdate + INTERVAL 90 DAYS")).as("due_epoch"),
          expr("CAST(datediff(o_orderdate, DATE '2000-01-01') AS BIGINT)")
            .as("days_since"),
          unix_timestamp(expr("add_months(date_trunc('MONTH', o_orderdate), 1)"))
            .as("month_next_epoch"),
          quarter(col("o_orderdate")).cast("long").as("qtr"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CAST(floor(epoch(o_orderdate + INTERVAL 90 DAY)) AS BIGINT) AS due_epoch,
              CAST(date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                AS days_since,
              CAST(floor(epoch(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH)) AS BIGINT)
                AS month_next_epoch,
              CAST(quarter(o_orderdate) AS BIGINT) AS qtr
            FROM orders ORDER BY o_orderkey"""))

  private val fnMath = QueryDef(
    "fn_math",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_orderkey") % 7).as("mod7"),
          expr("l_orderkey div 7").as("div7"),
          abs(col("l_discount") - 0.05).as("abs_disc"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
              l_orderkey % 7 AS mod7, l_orderkey // 7 AS div7,
              abs(l_discount - 0.05) AS abs_disc,
              round(ln(l_extendedprice), 6) AS ln_price,
              l_quantity * l_quantity AS qty_sq
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** Array ops over the embedding column; float elements are cast to
    * double on both engines so result schemas match exactly. The
    * slice/transform result is decomposed into scalar columns — the
    * driver's comparator sorts rows with pandas, which cannot hash
    * array-valued cells, so declared outputs must be scalar-only. */
  private val fnArray = QueryDef(
    "fn_array",
    (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("head3",
          expr("transform(slice(embedding, 1, 3), x -> CAST(x AS DOUBLE))"))
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("n_dim"),
          // try_element_at, not element_at: ANSI mode turns an
          // out-of-bounds index into INVALID_ARRAY_INDEX and kills the
          // query; DuckDB's list[i] yields NULL for the same row.
          // Embeddings are fixed 64-wide today, but a ragged row must
          // degrade to NULL on both engines, not crash one.
          expr("CAST(try_element_at(embedding, 1) AS DOUBLE)").as("first_val"),
          expr("try_element_at(head3, 2)").as("h2"),
          expr("try_element_at(head3, 3)").as("h3"),
          expr("CAST(array_position(embedding, array_max(embedding)) AS BIGINT)")
            .as("argmax"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS n_dim,
              CAST(embedding[1] AS DOUBLE) AS first_val,
              CAST(head3[2] AS DOUBLE) AS h2, CAST(head3[3] AS DOUBLE) AS h3,
              CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax
            FROM (SELECT *, list_transform(embedding[1:3], x -> CAST(x AS DOUBLE)) AS head3
                  FROM embeddings) ORDER BY vec_id"""))

  /** Higher-order lambda fold: L2 norm via transform + aggregate. Both
    * sides fold sequentially over identical doubles → exact match. */
  private val fnHigherOrder = QueryDef(
    "fn_higher_order",
    (s, d) =>
      Tables.embeddings(s, d)
        .withColumn("sq",
          expr("""aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""))
        .select(
          col("vec_id"),
          round(sqrt(col("sq")), 6).as("l2_norm"),
          expr("CAST(array_max(embedding) AS DOUBLE)").as("max_val"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id,
              round(sqrt(list_aggregate(
                list_transform(generate_series(1, len(embedding)),
                               i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                'sum')), 6) AS l2_norm,
              CAST(list_max(embedding) AS DOUBLE) AS max_val
            FROM embeddings ORDER BY vec_id"""))

  /** Generator surface: one row per token (explode = Catalyst
    * Generator). Restricted to doc_id < 100 to keep the verify dump
    * small; the plan is identical at any cardinality. */
  private val fnExplode = QueryDef(
    "fn_explode",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "token"),
    Some("""SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents WHERE doc_id < 100)
            GROUP BY doc_id, token ORDER BY doc_id, token"""))

  /** CUSTOM generator surface (§2g's UDTF seam): the native
    * [[graft.functions.SentenceSplit]] Catalyst `Generator` — one row
    * per sentence with its ordinal, expanded by `GenerateExec` inside
    * whole-stage codegen (plan-asserted in FunctionsSpec), no UDF and
    * no flatMap. The oracle reproduces the boundary semantics with
    * `regexp_split_to_array` + empty-fragment filter. */
  private val fnExplodeCustom = QueryDef(
    "fn_explode_custom",
    (s, d) =>
      Tables.documents(s, d)
        // the corpus has no punctuation, so synthesize sentence
        // boundaries the same way in both engines (plain left-to-right
        // non-overlapping replace) — real multi-row expansion, not a
        // 1-row-per-doc degenerate case
        .select(col("doc_id"),
          graft.functions.SentenceSplit.splitSentences(
            expr("replace(text, ' a ', '. ')")))
        .orderBy("doc_id", "pos"),
    Some("""WITH punct AS (
              SELECT doc_id, replace(text, ' a ', '. ') AS ptext
              FROM documents),
            parts AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(ptext, '[.!?]+[ \t\n\r]+')) AS sentence,
                     generate_subscripts(regexp_split_to_array(ptext, '[.!?]+[ \t\n\r]+'), 1) AS ord
              FROM punct)
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ord) - 1
                        AS INTEGER) AS pos,
                   sentence
            FROM parts WHERE sentence <> ''
            ORDER BY doc_id, pos"""))

  /** Schema-full JSON parse (vs json_ingest's path extraction). */
  private val fnJson = QueryDef(
    "fn_json",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("parsed", expr("from_json(props, 'k INT')"))
        .select(col("event_id"), col("parsed.k").as("k"))
        .filter(col("k") > 90)
        .orderBy("event_id"),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90
            ORDER BY event_id"""))

  /** The scalar-UDF seam: deterministic wordlist sentiment score
    * (PAPERS.md Twitter-sentiment lineage). Kept off the hot path by
    * design — native expressions everywhere else. */
  private val fnUdf = QueryDef(
    "fn_udf",
    (s, d) => {
      val pos = Set("fast", "small", "merge")
      val neg = Set("slow", "batch", "spill")
      val sentiment = udf { text: String =>
        val toks = text.split(" ")
        toks.count(pos.contains).toLong - toks.count(neg.contains).toLong
      }
      Tables.documents(s, d)
        .select(col("doc_id"), sentiment(col("text")).as("sentiment"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(len(list_filter(string_split(text, ' '),
                                   t -> t IN ('fast', 'small', 'merge'))) AS BIGINT)
            - CAST(len(list_filter(string_split(text, ' '),
                                   t -> t IN ('slow', 'batch', 'spill'))) AS BIGINT)
              AS sentiment
            FROM documents ORDER BY doc_id"""))

  /** Custom mergeable aggregate via the public Aggregator→udaf seam:
    * quantity-weighted mean price per return flag. */
  private val aggUdaf = QueryDef(
    "agg_udaf",
    (s, d) => {
      val wmean = udaf(WeightedMean,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      Tables.lineitem(s, d)
        .withColumn("price_c", expr("CAST(round(l_extendedprice * 100) AS DOUBLE)"))
        .withColumn("qty_i", expr("CAST(round(l_quantity) AS DOUBLE)"))
        .groupBy("l_returnflag")
        .agg(round(wmean(col("price_c"), col("qty_i")) / 100, 4).as("wmean_price"))
        .orderBy("l_returnflag")
    },
    // The cents inputs keep every partial sum integer-valued (< 2^53),
    // so the Aggregator's merge order cannot perturb the result.
    Some("""SELECT l_returnflag,
              round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                    / CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100, 4)
                AS wmean_price
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Regex functions: capture-group extraction, global replacement,
    * match predicate. Patterns stay in the POSIX-compatible subset so
    * Java regex (Spark) and RE2 (DuckDB) agree; DuckDB's
    * regexp_replace needs the explicit 'g' flag to match Spark's
    * replace-all semantics. */
  private val fnRegex = QueryDef(
    "fn_regex",
    (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "#([0-9]+)", 1).cast("long")
            .as("brand_num"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_type"), "[AEIOU]", "").as("type_consonants"),
          when(col("p_name").rlike("^(s|b)"), 1L).otherwise(0L)
            .as("starts_sb"))
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
              CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS BIGINT)
                AS brand_num,
              regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
              regexp_replace(p_type, '[AEIOU]', '', 'g') AS type_consonants,
              CAST(CASE WHEN regexp_matches(p_name, '^(s|b)') THEN 1 ELSE 0 END
                   AS BIGINT) AS starts_sb
            FROM part ORDER BY p_partkey"""))

  /** Hash digests + bitwise ops: md5 / sha256 on strings; AND / OR /
    * XOR / shifts / popcount on keys. All codegen'd scalar
    * expressions — the building blocks the dedup/shard operators are
    * made of, exposed as first-class functions. */
  private val fnHash = QueryDef(
    "fn_hash",
    (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          md5(col("c_name")).as("h_md5"),
          sha2(col("c_name"), 256).as("h_sha256"),
          (col("c_custkey").bitwiseAND(lit(255L))).as("b_and"),
          (col("c_custkey").bitwiseOR(lit(15L))).as("b_or"),
          (col("c_custkey").bitwiseXOR(lit(42L))).as("b_xor"),
          expr("shiftleft(c_custkey, 3)").as("b_shl"),
          expr("shiftright(c_custkey, 2)").as("b_shr"),
          expr("CAST(bit_count(c_custkey) AS BIGINT)").as("b_pop"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
              md5(c_name) AS h_md5, sha256(c_name) AS h_sha256,
              c_custkey & 255 AS b_and,
              c_custkey | 15 AS b_or,
              xor(c_custkey, 42) AS b_xor,
              c_custkey << 3 AS b_shl,
              c_custkey >> 2 AS b_shr,
              CAST(bit_count(c_custkey) AS BIGINT) AS b_pop
            FROM customer ORDER BY c_custkey"""))

  /** Null-handling semantics: nullif / coalesce / nvl2 and null-safe
    * aggregation — nulls are manufactured (nullif on zero discounts)
    * since the fixtures ship none, then collapsed back deterministically. */
  private val fnNull = QueryDef(
    "fn_null",
    (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("dn", expr("nullif(CAST(round(l_discount * 100) AS BIGINT), 0)"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          coalesce(col("dn"), lit(-1L)).as("disc_or_neg1"),
          expr("nvl2(dn, 'disc', 'free')").as("disc_flag"),
          expr("CAST(isnull(dn) AS INT)").cast("long").as("is_null"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
              coalesce(dn, -1) AS disc_or_neg1,
              CASE WHEN dn IS NOT NULL THEN 'disc' ELSE 'free' END AS disc_flag,
              CAST(CASE WHEN dn IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_null
            FROM (SELECT l_orderkey, l_linenumber,
                    nullif(CAST(round(l_discount * 100) AS BIGINT), 0) AS dn
                  FROM lineitem)
            ORDER BY l_orderkey, l_linenumber"""))

  /** Struct + map types: JSON decoded into a typed MAP, element
    * lookup, key enumeration, struct construction and field access —
    * the nested-type surface. Outputs stay scalar (the driver's
    * comparator hashes flat columns). */
  private val fnStructMap = QueryDef(
    "fn_struct_map",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("m", expr("from_json(props, 'map<string,int>')"))
        .select(
          col("event_id"),
          // try_element_at, not element_at: under ANSI mode a missing
          // map key would throw MAP_KEY_DOES_NOT_EXIST and kill the
          // query, while DuckDB's json_extract_string returns NULL —
          // try_element_at yields NULL on both engines.
          expr("CAST(try_element_at(m, 'k') AS BIGINT)").as("k_val"),
          expr("CAST(size(m) AS BIGINT)").as("n_keys"),
          expr("array_join(map_keys(m), ',')").as("keys_csv"),
          expr("named_struct('u', user_id, 'e', event_type).e").as("etype"),
          expr("CAST(struct(user_id, event_type).user_id AS BIGINT)").as("uid"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
              CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
              array_to_string(json_keys(props), ',') AS keys_csv,
              event_type AS etype,
              CAST(user_id AS BIGINT) AS uid
            FROM events ORDER BY event_id"""))

  /** Bitwise operator surface: and/or/xor, shifts, popcount — all
    * codegen'd built-ins (feature-flag decoding, bitmap membership,
    * hash mixing at the row level). */
  private val fnBitwise = QueryDef(
    "fn_bitwise",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          expr("CAST(user_id & 255 AS BIGINT)").as("andv"),
          expr("CAST(user_id | 4096 AS BIGINT)").as("orv"),
          expr("CAST(user_id ^ event_id AS BIGINT)").as("xorv"),
          expr("CAST(shiftleft(user_id, 3) AS BIGINT)").as("shl"),
          expr("CAST(shiftright(user_id, 2) AS BIGINT)").as("shr"),
          expr("CAST(bit_count(user_id) AS BIGINT)").as("nbits"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
              CAST(user_id & 255 AS BIGINT) AS andv,
              CAST(user_id | 4096 AS BIGINT) AS orv,
              CAST(xor(user_id, event_id) AS BIGINT) AS xorv,
              CAST(user_id << 3 AS BIGINT) AS shl,
              CAST(user_id >> 2 AS BIGINT) AS shr,
              CAST(bit_count(user_id) AS BIGINT) AS nbits
            FROM events ORDER BY event_id"""))

  val defs: Seq[QueryDef] = Seq(
    fnString, fnDate, fnInterval, fnMath, fnArray, fnHigherOrder, fnExplode,
    fnExplodeCustom, fnJson, fnUdf, aggUdaf, fnRegex, fnHash, fnNull,
    fnStructMap, fnBitwise)
}
