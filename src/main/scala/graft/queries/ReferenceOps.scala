package graft.queries

import graft.{QueryDef, Tables}
import graft.etl.TemporalFixups
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's operator inventory (SURVEY.md §2) re-expressed over
  * the shared testdata tables so the DuckDB oracle can gate each one:
  * A1 argMax latest-state, A2 groupArray, J1/J2 explode+left-join, the
  * P1-style JSON normalization, the MV's temporal fixups, and the full
  * §2.7 scalar/array function surface.
  */
object ReferenceOps {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** A1 (002:9-15): latest state per key. The deterministic form — rank
    * by (ts, unique id) — equals ClickHouse argMax up to tie-breaks.
    */
  def a1LatestState(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  // Events ts is nanosecond parquet; Spark truncates to micros on read, so
  // the oracle orders by the micro-truncated CAST for identical tie-sets.
  val a1LatestStateOracle: String =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** A1 as a true argMax aggregate: `max_by` over a unique ordering key. */
  def a1ArgMax(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        max_by(col("event_type"), col("event_id")).as("last_event_type"),
        max(col("event_id")).as("last_event_id"),
        max(col("value")).as("max_value"),
      )
      .orderBy(col("user_id"))
  }

  val a1ArgMaxOracle: String =
    """SELECT user_id, arg_max(event_type, event_id) AS last_event_type,
      | MAX(event_id) AS last_event_id, MAX(value) AS max_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** A2 (002:32-44 `groupArray`): collect per-group values; canonicalized
    * as a sorted distinct array (order-insensitive semantics, see
    * TechnoViews scale notes). The array stays internal; the output emits
    * a '|'-joined canonical string because the driver's pandas compare
    * cannot hash array cells (CORRECTNESS_r01).
    */
  def a2GroupArray(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(sort_array(collect_set(col("event_type"))), "|").as("event_types"),
        sum(dec(col("value"))).cast(DoubleType).as("total_value"),
      )
      .orderBy(col("user_id"))
  }

  val a2GroupArrayOracle: String =
    """SELECT user_id, COUNT(*) AS n_events,
      | array_to_string(list_sort(list(DISTINCT event_type)), '|') AS event_types,
      | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** The full genre-pipeline cascade (002:18-58) over `documents`:
    * explode tokens (J2/arrayJoin) → langs-per-token enrichment (J1's
    * dim-lookup semantics) → groupArray (A2) → flatten → lower → distinct
    * → arrayFilter → length(matched) > 0. Structure-identical to
    * [[graft.views.TechnoViews]]; this instance is DuckDB-checkable.
    *
    * Scale shape: the token→langs dictionary is derived from the fact
    * relation itself (unbounded cardinality), so it must never be
    * broadcast (VERDICT r1 #2). The dictionary is a DISTINCT (token,
    * lang) PAIR relation shuffle-joined back to the tokenized fact —
    * every shuffled row stays narrow (ids and scalars, no array
    * payloads), and the per-doc distinct-langs rollup is a plain
    * collect_set. The previous window form (collect_set over
    * partitionBy(token)) amplified each hot token's langs array onto
    * every occurrence INSIDE the window sort (VERDICT r2 #4); this
    * shape trades one extra narrow shuffle for zero array carriage.
    * Array-typed results stay internal; outputs are '|'-joined
    * canonical strings for the driver compare.
    */
  def genrePipeline(s: SparkSession, dir: String): DataFrame = {
    val docTok = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val dim = docTok.select(col("token"), col("lang")).distinct()
    val grouped = docTok.select(col("doc_id"), col("token"))
      .join(dim, "token")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(lower(col("lang")))).as("all_langs"))
    val matched = filter(col("all_langs"), l => l.contains("zh"))
    grouped.select(
      col("doc_id"),
      array_join(col("all_langs"), "|").as("all_langs"),
      array_join(matched, "|").as("matched"),
      (size(matched) > 0).as("has_zh"),
    ).orderBy(col("doc_id"))
  }

  val genrePipelineOracle: String =
    """WITH dt AS (
      |  SELECT doc_id, lang, token FROM (
      |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |    FROM documents) WHERE token <> ''),
      |dim AS (
      |  SELECT token, list(DISTINCT lang) AS langs
      |  FROM dt GROUP BY token),
      |tg AS (
      |  SELECT dt.doc_id,
      |    list_sort(list_distinct(list_transform(
      |      flatten(list(COALESCE(dim.langs, []))), l -> lower(l)))) AS all_langs
      |  FROM dt LEFT JOIN dim ON dt.token = dim.token
      |  GROUP BY dt.doc_id)
      |SELECT doc_id, array_to_string(all_langs, '|') AS all_langs,
      |  array_to_string(list_filter(all_langs, l -> contains(l, 'zh')), '|') AS matched,
      |  len(list_filter(all_langs, l -> contains(l, 'zh'))) > 0 AS has_zh
      |FROM tg ORDER BY doc_id""".stripMargin

  /** P1-style JSON normalization: schema-on-read extract + null
    * defaulting + typed cast + filter (spotify_metadata_to_kafka.py:30-49).
    */
  def p1JsonNormalize(s: SparkSession, dir: String): DataFrame = {
    val kSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        coalesce(from_json(col("props"), kSchema).getField("k"), lit(0)).as("k"))
      .filter(col("k") > 50)
      .orderBy(col("event_id"))
  }

  val p1JsonNormalizeOracle: String =
    """SELECT event_id, user_id,
      | COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), 0) AS k
      |FROM events
      |WHERE COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER), 0) > 50
      |ORDER BY event_id""".stripMargin

  /** The MV's temporal fixups (001:53-73) driven through five input
    * shapes: year-only, plain date, ISO timestamp, garbage, empty.
    */
  def dateFixup(s: SparkSession, dir: String): DataFrame = {
    val shape = pmod(col("o_orderkey"), lit(5))
    val raw = when(shape === 0, date_format(col("o_orderdate"), "yyyy"))
      .when(shape === 1, date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .when(shape === 2, date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .when(shape === 3, lit("not-a-date"))
      .otherwise(lit(""))
    Tables.t(s, dir, "orders")
      .select(col("o_orderkey"), raw.as("raw_str"),
        TemporalFixups.releaseDateFix(raw).as("release_date"))
      .orderBy(col("o_orderkey"))
  }

  val dateFixupOracle: String =
    """SELECT o_orderkey, raw_str,
      | COALESCE(TRY_CAST(
      |   CASE WHEN length(raw_str) = 4 AND regexp_matches(raw_str, '^[0-9]{4}$')
      |        THEN raw_str || '-01-01'
      |        ELSE substr(raw_str, 1, 10) END AS DATE),
      |  DATE '1970-01-01') AS release_date
      |FROM (
      |  SELECT o_orderkey,
      |    CASE mod(o_orderkey, 5)
      |      WHEN 0 THEN strftime(o_orderdate, '%Y')
      |      WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
      |      WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ')
      |      WHEN 3 THEN 'not-a-date'
      |      ELSE '' END AS raw_str
      |  FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** §2.7 string/conditional scalar function surface in one projection. */
  def scalarFunctions(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      lower(col("source")).as("lower_source"),
      upper(col("lang")).as("upper_lang"),
      trim(col("text")).as("trimmed").substr(lit(1), lit(20)).as("prefix20"),
      length(col("text")).as("text_len"),
      concat(col("lang"), lit("-"), col("source")).as("lang_source"),
      col("text").contains("join").as("has_join"),
      col("source").rlike("^src[0-9]+$").as("src_shaped"),
      when(col("n_chars") > 300, lit("long")).otherwise(lit("short")).as("size_class"),
      coalesce(nullif(col("lang"), lit("en")), lit("EN")).as("lang_or_default"),
    ).orderBy(col("doc_id"))
  }

  val scalarFunctionsOracle: String =
    """SELECT doc_id,
      | lower(source) AS lower_source,
      | upper(lang) AS upper_lang,
      | substr(trim(text), 1, 20) AS prefix20,
      | length(text) AS text_len,
      | lang || '-' || source AS lang_source,
      | contains(text, 'join') AS has_join,
      | regexp_matches(source, '^src[0-9]+$') AS src_shaped,
      | CASE WHEN n_chars > 300 THEN 'long' ELSE 'short' END AS size_class,
      | COALESCE(NULLIF(lang, 'en'), 'EN') AS lang_or_default
      |FROM documents ORDER BY doc_id""".stripMargin

  /** §2.7 string-manipulation + edit-distance surface beyond
    * [[scalarFunctions]]'s basics: levenshtein (the similarity
    * primitive fuzzy entity-matching pipelines key on), padding,
    * reverse/repeat, character translation, global replace, field
    * extraction (split_part), substring position, and left/right
    * slices — the function set Spark and DuckDB share with identical
    * semantics, each exercised over non-trivial inputs.
    */
  def stringFunctions(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      levenshtein(col("source"), col("lang")).as("lev_src_lang"),
      levenshtein(substring(col("text"), 1, 12), col("source")).as("lev_prefix"),
      lpad(col("source"), 8, "_").as("lpadded"),
      rpad(col("lang"), 6, ".").as("rpadded"),
      reverse(col("source")).as("rev_source"),
      repeat(col("lang"), 3).as("lang3"),
      translate(col("source"), "src", "XYZ").as("translated"),
      regexp_replace(col("source"), "src", "S").as("replaced"),
      split_part(concat(col("lang"), lit("-"), col("source")), lit("-"), lit(2))
        .as("second_field"),
      instr(col("source"), "r").as("r_pos"),
      substring(col("source"), 1, 4).as("left4"),
      col("source").substr(length(col("source")) - 1, lit(2)).as("right2"),
    ).orderBy(col("doc_id"))
  }

  val stringFunctionsOracle: String =
    """SELECT doc_id,
      | levenshtein(source, lang) AS lev_src_lang,
      | levenshtein(substring(text, 1, 12), source) AS lev_prefix,
      | lpad(source, 8, '_') AS lpadded,
      | rpad(lang, 6, '.') AS rpadded,
      | reverse(source) AS rev_source,
      | repeat(lang, 3) AS lang3,
      | translate(source, 'src', 'XYZ') AS translated,
      | replace(source, 'src', 'S') AS replaced,
      | split_part(lang || '-' || source, '-', 2) AS second_field,
      | strpos(source, 'r') AS r_pos,
      | substring(source, 1, 4) AS left4,
      | substring(source, length(source) - 1, 2) AS right2
      |FROM documents ORDER BY doc_id""".stripMargin

  /** §2.7 cryptographic digest surface: md5 and sha-256 hex digests —
    * the content-addressing primitives the dedup keys and split
    * assignments build on, gated directly so the digest contract
    * (lowercase hex over utf-8 bytes) is pinned cross-engine.
    */
  def hashFunctions(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      md5(col("source").cast(BinaryType)).as("md5_source"),
      sha2(col("text").cast(BinaryType), 256).as("sha256_text"),
      md5(concat(col("lang"), lit("|"), col("source")).cast(BinaryType))
        .as("md5_composite"),
    ).orderBy(col("doc_id"))
  }

  val hashFunctionsOracle: String =
    """SELECT doc_id,
      | md5(source) AS md5_source,
      | sha256(text) AS sha256_text,
      | md5(lang || '|' || source) AS md5_composite
      |FROM documents ORDER BY doc_id""".stripMargin

  /** §2.7 JSON function surface: path extraction (scalar, nested,
    * missing → null), existence, and array-element access over a JSON
    * document CONSTRUCTED deterministically via concat — both engines
    * parse byte-identical input, so the gate tests extraction
    * semantics, not serializer whitespace.
    */
  def jsonFunctions(s: SparkSession, dir: String): DataFrame = {
    val j = concat(
      lit("""{"id":"""), col("doc_id"),
      lit(""","meta":{"lang":""""), col("lang"), lit(""""},"tags":[""""),
      col("source"), lit("""","x"]}"""))
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      get_json_object(j, "$.id").as("id_str"),
      get_json_object(j, "$.meta.lang").as("nested_lang"),
      get_json_object(j, "$.tags[0]").as("first_tag"),
      get_json_object(j, "$.missing").as("absent"),
      get_json_object(j, "$.meta").as("meta_obj"),
    ).orderBy(col("doc_id"))
  }

  val jsonFunctionsOracle: String =
    """SELECT doc_id,
      | json_extract_string(j, '$.id') AS id_str,
      | json_extract_string(j, '$.meta.lang') AS nested_lang,
      | json_extract_string(j, '$.tags[0]') AS first_tag,
      | json_extract_string(j, '$.missing') AS absent,
      | CAST(json_extract(j, '$.meta') AS VARCHAR) AS meta_obj
      |FROM (SELECT doc_id,
      |  '{"id":' || doc_id || ',"meta":{"lang":"' || lang || '"},"tags":["'
      |    || source || '","x"]}' AS j
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** §2.7 array function surface (transform/filter/flatten/distinct/
    * slice/size) over tokenized documents. Arrays are computed natively
    * and emitted as '|'-joined canonical strings (driver compare cannot
    * hash array cells).
    */
  def arrayFunctions(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      array_join(array_sort(array_distinct(toks)), "|").as("distinct_tokens"),
      array_join(transform(toks, t => length(t).cast(StringType)), "|").as("token_lens"),
      array_join(filter(toks, t => length(t) > 4), "|").as("long_tokens"),
      array_join(flatten(array(slice(toks, 1, 3), slice(toks, 1, 2))), "|").as("flat_slices"),
    ).orderBy(col("doc_id"))
  }

  val arrayFunctionsOracle: String =
    """SELECT doc_id,
      | len(string_split(text, ' ')) AS n_tokens,
      | array_to_string(list_sort(list_distinct(string_split(text, ' '))), '|') AS distinct_tokens,
      | array_to_string(list_transform(string_split(text, ' '), t -> CAST(length(t) AS VARCHAR)), '|') AS token_lens,
      | array_to_string(list_filter(string_split(text, ' '), t -> length(t) > 4), '|') AS long_tokens,
      | array_to_string(flatten([string_split(text, ' ')[1:3], string_split(text, ' ')[1:2]]), '|') AS flat_slices
      |FROM documents ORDER BY doc_id""".stripMargin

  /** §2.7 temporal function surface over order timestamps: part
    * extraction, calendar truncation/arithmetic (month-clamped adds),
    * day arithmetic, formatting, and date construction. Cross-engine
    * notes: Spark's dayofweek is 1=Sunday while DuckDB's is 0=Sunday
    * (oracle adds 1); date_trunc returns TIMESTAMP in both — cast to
    * DATE on both sides.
    */
  def datetimeFunctions(s: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast(DateType)
    Tables.t(s, dir, "orders").select(
      col("o_orderkey"),
      d.as("order_date"),
      year(d).as("y"),
      month(d).as("m"),
      dayofmonth(d).as("dom"),
      quarter(d).as("q"),
      dayofweek(d).as("dow"),
      dayofyear(d).as("doy"),
      hour(col("o_orderdate")).as("hr"),
      date_trunc("month", d).cast(DateType).as("month_start"),
      last_day(d).as("month_end"),
      add_months(d, 3).as("plus3m"),
      date_add(d, 30).as("plus30d"),
      datediff(d, lit("1995-01-01").cast(DateType)).as("days_since_95"),
      date_format(d, "yyyy-MM").as("ym"),
      make_date(year(d) + 1, month(d), lit(1)).as("next_year_month"),
    ).orderBy(col("o_orderkey"))
  }

  val datetimeFunctionsOracle: String =
    """SELECT o_orderkey,
      | CAST(o_orderdate AS DATE) AS order_date,
      | year(CAST(o_orderdate AS DATE)) AS y,
      | month(CAST(o_orderdate AS DATE)) AS m,
      | day(CAST(o_orderdate AS DATE)) AS dom,
      | quarter(CAST(o_orderdate AS DATE)) AS q,
      | dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
      | dayofyear(CAST(o_orderdate AS DATE)) AS doy,
      | hour(o_orderdate) AS hr,
      | CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
      | last_day(CAST(o_orderdate AS DATE)) AS month_end,
      | CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      | CAST(o_orderdate AS DATE) + 30 AS plus30d,
      | datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
      | strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
      | make_date(year(CAST(o_orderdate AS DATE)) + 1,
      |   month(CAST(o_orderdate AS DATE)), 1) AS next_year_month
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** §2.7 map function surface: construction, cardinality, key lookup,
    * key listing, concat, entry filtering and value transformation.
    * Maps never cross the output boundary (arrow map cells break the
    * driver compare, and DuckDB 1.0's map_extract returns a LIST) —
    * every map-valued result is canonicalized to sorted `k=v` strings;
    * DuckDB's missing map_filter/transform_values are expressed through
    * the same map_entries list algebra the canonicalization uses.
    */
  def mapFunctions(s: SparkSession, dir: String): DataFrame = {
    val m = map(
      lit("lang"), col("lang"),
      lit("source"), col("source"),
      lit("size"), col("n_chars").cast(StringType))
    def entriesSorted(mm: Column): Column =
      array_join(array_sort(transform(map_entries(mm),
        e => concat(e.getField("key"), lit("="), e.getField("value")))), "|")
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      size(m).as("n_keys"),
      element_at(m, "lang").as("lang_val"),
      array_join(array_sort(map_keys(m)), "|").as("keys_sorted"),
      entriesSorted(m).as("entries"),
      entriesSorted(map_concat(m, map(lit("extra"), lit("1")))).as("entries_concat"),
      entriesSorted(map_filter(m, (_, v) => length(v) > 4)).as("entries_long_vals"),
      entriesSorted(transform_values(m, (_, v) => upper(v))).as("entries_upper"),
    ).orderBy(col("doc_id"))
  }

  val mapFunctionsOracle: String =
    """SELECT doc_id,
      | CAST(cardinality(m) AS INT) AS n_keys,
      | m['lang'][1] AS lang_val,
      | array_to_string(list_sort(map_keys(m)), '|') AS keys_sorted,
      | array_to_string(list_sort(list_transform(map_entries(m),
      |   e -> e.key || '=' || e.value)), '|') AS entries,
      | array_to_string(list_sort(list_transform(
      |   map_entries(map_concat(m, MAP {'extra': '1'})),
      |   e -> e.key || '=' || e.value)), '|') AS entries_concat,
      | COALESCE(array_to_string(list_sort(list_transform(
      |   list_filter(map_entries(m), e -> length(e.value) > 4),
      |   e -> e.key || '=' || e.value)), '|'), '') AS entries_long_vals,
      | array_to_string(list_sort(list_transform(map_entries(m),
      |   e -> e.key || '=' || upper(e.value))), '|') AS entries_upper
      |FROM (SELECT doc_id,
      |  MAP {'lang': lang, 'source': source, 'size': CAST(n_chars AS VARCHAR)} AS m
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** §2.7 regex function surface: group extraction, global replace,
    * backreference swaps (Spark `$n` vs RE2 `\n` — same semantics,
    * different spelling), match counting, regex split, and matching
    * predicates. Patterns stay in the portable class-based subset both
    * engines (java.util.regex vs RE2) treat identically — no
    * lookarounds, no engine-specific escapes.
    */
  def regexFunctions(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      regexp_extract(col("source"), "src([0-9]+)", 1).as("src_num"),
      regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "*").as("vowels_masked"),
      regexp_replace(col("source"), "([a-z]+)([0-9]+)", "$2$1").as("swapped"),
      size(regexp_extract_all(col("source"), lit("[0-9]"), lit(0))).as("n_digits"),
      array_join(split(col("source"), "[0-9]+"), "|").as("split_alpha"),
      col("text").rlike("[aeiou]{2}").as("has_vowel_run"),
    ).orderBy(col("doc_id"))
  }

  /** §2.7 bitwise function surface over int64 ids — the hash/partition
    * arithmetic toolkit (masking, banding, popcount) every sketching
    * operator builds on, gated directly.
    */
  def bitwiseFunctions(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    Tables.t(s, dir, "documents").select(
      id,
      id.bitwiseAND(255L).as("band_mask"),
      id.bitwiseOR(15L).as("with_low"),
      id.bitwiseXOR(85L).as("xored"),
      shiftleft(id, 3).as("shl3"),
      shiftright(id, 2).as("shr2"),
      bit_count(id).as("popcount"),
      bitwise_not(id).as("negated"),
    ).orderBy(id)
  }

  val bitwiseFunctionsOracle: String =
    """SELECT doc_id,
      | doc_id & 255 AS band_mask,
      | doc_id | 15 AS with_low,
      | xor(doc_id, 85) AS xored,
      | doc_id << 3 AS shl3,
      | doc_id >> 2 AS shr2,
      | CAST(bit_count(doc_id) AS INT) AS popcount,
      | ~doc_id AS negated
      |FROM documents ORDER BY doc_id""".stripMargin

  val regexFunctionsOracle: String =
    """SELECT doc_id,
      | regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
      | regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g') AS vowels_masked,
      | regexp_replace(source, '([a-z]+)([0-9]+)', '\2\1', 'g') AS swapped,
      | len(regexp_extract_all(source, '[0-9]')) AS n_digits,
      | array_to_string(string_split_regex(source, '[0-9]+'), '|') AS split_alpha,
      | regexp_matches(text, '[aeiou]{2}') AS has_vowel_run
      |FROM documents ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("fn_datetime_suite", datetimeFunctions, Some(datetimeFunctionsOracle)),
    QueryDef("fn_map_suite", mapFunctions, Some(mapFunctionsOracle)),
    QueryDef("fn_regex_suite", regexFunctions, Some(regexFunctionsOracle)),
    QueryDef("fn_bitwise_suite", bitwiseFunctions, Some(bitwiseFunctionsOracle)),
    QueryDef("a1_latest_state", a1LatestState, Some(a1LatestStateOracle)),
    QueryDef("a1_argmax", a1ArgMax, Some(a1ArgMaxOracle)),
    QueryDef("a2_group_array", a2GroupArray, Some(a2GroupArrayOracle)),
    QueryDef("j2_genre_pipeline", genrePipeline, Some(genrePipelineOracle)),
    QueryDef("p1_json_normalize", p1JsonNormalize, Some(p1JsonNormalizeOracle)),
    QueryDef("fx_date_fixup", dateFixup, Some(dateFixupOracle)),
    QueryDef("fn_scalar_suite", scalarFunctions, Some(scalarFunctionsOracle)),
    QueryDef("fn_string_suite", stringFunctions, Some(stringFunctionsOracle)),
    QueryDef("fn_hash_suite", hashFunctions, Some(hashFunctionsOracle)),
    QueryDef("fn_array_suite", arrayFunctions, Some(arrayFunctionsOracle)),
    QueryDef("fn_json_suite", jsonFunctions, Some(jsonFunctionsOracle)),
  )
}
