package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token/char statistics + quality score, stopword
  * language-ID heuristic, rolling-hash document fingerprinting, SimHash
  * fingerprints, and binary-column metadata extraction.
  *
  * Every operator here is a NARROW projection — pure per-row expressions,
  * no shuffle, no UDF — so at 100 TB each is a single whole-stage-codegen
  * map over the scan (HOF lambdas evaluate on the interpreted path but
  * stay inside the same stage; no exchange is ever introduced).
  *
  * Cross-engine determinism rules (the DuckDB oracle must match hashes
  * cell-for-cell): only integer arithmetic, md5/sha2 hex strings, and
  * `round(x, 6)` doubles cross the output boundary; engine-specific
  * hashes (xxhash64) never appear in oracle-gated outputs.
  */
object LlmText {

  private[queries] def tokens(c: Column): Column = split(c, " ")

  /** Deterministic cross-engine token/char hash: 31-polynomial over the
    * character codes, mod 1e9+7. Equals DuckDB's
    * `list_reduce(list_transform(string_split(s,''), c -> CAST(ascii(c) AS BIGINT)),
    *             (a,b) -> (a*31+b) % 1000000007)`
    * because ascii codes are < the modulus, so the missing initial mod on
    * the first element is a no-op.
    */
  private[queries] def polyHash(c: Column): Column =
    when(length(c) === 0, lit(0L)).otherwise(
      aggregate(
        transform(split(c, ""), ch => ascii(ch).cast(LongType)),
        lit(0L),
        (acc, ch) => (acc * lit(31L) + ch) % lit(1000000007L),
      ))

  private val polyHashSqlFmt =
    "CASE WHEN length(%s) = 0 THEN 0 ELSE list_reduce(list_transform(string_split(%s, ''), c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) %% 1000000007) END"

  private def polyHashSql(e: String): String = polyHashSqlFmt.format(e, e)

  private val stopEn = Seq("the", "a", "of", "and", "in", "to")
  private val stopDe = Seq("der", "die", "das", "und", "ist")
  private val stopEs = Seq("el", "que", "de", "los", "y")
  private val stopFr = Seq("le", "la", "et", "les", "des")

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  private def stopCountSql(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** The composite quality score of [[textStats]] as a standalone
    * column over `text` — shared with
    * [[LlmDedup.clusterRepByQuality]] so "quality" means the same
    * number everywhere it ranks documents.
    */
  private[queries] def qualityExpr(text: Column): Column = {
    val toks = split(text, " ")
    val nTok = size(toks)
    val stopRatio = round(stopCount(toks, stopEn).cast(DoubleType) / nTok, 6)
    round(least(lit(1.0), nTok.cast(DoubleType) / 50.0) * (lit(1.0) - stopRatio), 6)
  }

  /** DuckDB rendering of [[qualityExpr]] (column `text` in scope). */
  private[queries] val qualityExprSql: String = {
    val stop = stopCountSql(stopEn)
    s"""round(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)
       | * (1.0 - round(CAST($stop AS DOUBLE) / len(string_split(text, ' ')), 6)), 6)"""
      .stripMargin.replace("\n", "")
  }

  /** Token counting (whitespace + a BPE-ish regex segmentation), char
    * stats, punctuation/stopword ratios, and a composite quality score —
    * the standard pre-training corpus quality signals.
    *
    * avg_token_len uses the single-space-join arithmetic identity
    * (chars - (n-1)) / n instead of a second pass over the tokens.
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nCh = length(col("text"))
    val stop = stopCount(toks, stopEn)
    val stopRatio = round(stop.cast(DoubleType) / nTok, 6)
    val punct = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      nTok.as("n_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .as("n_bpeish_tokens"),
      nCh.as("n_chars_txt"),
      round((nCh - nTok + 1).cast(DoubleType) / nTok, 6).as("avg_token_len"),
      punct.as("n_punct"),
      round(punct.cast(DoubleType) / nCh, 6).as("punct_ratio"),
      stop.as("n_stopwords"),
      stopRatio.as("stopword_ratio"),
      round(least(lit(1.0), nTok.cast(DoubleType) / 50.0) * (lit(1.0) - stopRatio), 6)
        .as("quality_score"),
    ).orderBy(col("doc_id"))
  }

  val textStatsOracle: String = {
    val stop = stopCountSql(stopEn)
    s"""SELECT doc_id,
       | len(string_split(text, ' ')) AS n_tokens,
       | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpeish_tokens,
       | length(text) AS n_chars_txt,
       | round(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
       |   / len(string_split(text, ' ')), 6) AS avg_token_len,
       | length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
       | round(CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
       |   / length(text), 6) AS punct_ratio,
       | $stop AS n_stopwords,
       | round(CAST($stop AS DOUBLE) / len(string_split(text, ' ')), 6) AS stopword_ratio,
       | round(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)
       |   * (1.0 - round(CAST($stop AS DOUBLE) / len(string_split(text, ' ')), 6)), 6)
       |   AS quality_score
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Language-ID n-gram/stopword heuristic: score each candidate
    * language by its stopword hits, pick the max with a fixed priority
    * (en > de > es > fr), `und` when nothing scores.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val en = stopCount(toks, stopEn)
    val de = stopCount(toks, stopDe)
    val es = stopCount(toks, stopEs)
    val fr = stopCount(toks, stopFr)
    Tables.t(s, dir, "documents").select(
      col("doc_id"), col("lang").as("labeled_lang"),
      en.as("score_en"), de.as("score_de"), es.as("score_es"), fr.as("score_fr"),
      when(en >= greatest(de, es, fr) && en > 0, lit("en"))
        .when(de >= greatest(es, fr) && de > 0, lit("de"))
        .when(es >= fr && es > 0, lit("es"))
        .when(fr > 0, lit("fr"))
        .otherwise(lit("und")).as("predicted_lang"),
    ).orderBy(col("doc_id"))
  }

  val langIdOracle: String = {
    val (en, de, es, fr) =
      (stopCountSql(stopEn), stopCountSql(stopDe), stopCountSql(stopEs), stopCountSql(stopFr))
    s"""SELECT doc_id, lang AS labeled_lang,
       | $en AS score_en, $de AS score_de, $es AS score_es, $fr AS score_fr,
       | CASE WHEN $en >= greatest($de, $es, $fr) AND $en > 0 THEN 'en'
       |      WHEN $de >= greatest($es, $fr) AND $de > 0 THEN 'de'
       |      WHEN $es >= $fr AND $es > 0 THEN 'es'
       |      WHEN $fr > 0 THEN 'fr'
       |      ELSE 'und' END AS predicted_lang
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: whole-text rolling polynomial hash plus a
    * first/last-token pair hash (cheap prefix/suffix signature). Both are
    * deterministic across engines (char-code arithmetic only).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      polyHash(col("text")).as("doc_hash"),
      polyHash(element_at(toks, 1)).as("first_token_hash"),
      polyHash(element_at(toks, -1)).as("last_token_hash"),
    ).orderBy(col("doc_id"))
  }

  val fingerprintOracle: String =
    s"""SELECT doc_id,
       | ${polyHashSql("text")} AS doc_hash,
       | ${polyHashSql("string_split(text, ' ')[1]")} AS first_token_hash,
       | ${polyHashSql("string_split(text, ' ')[-1]")} AS last_token_hash
       |FROM documents ORDER BY doc_id""".stripMargin

  private val SimhashBits = 32

  /** SimHash fingerprint: per-token 31-poly hash → per-bit ±1 votes over
    * the token multiset → sign vector → packed 32-bit fingerprint.
    *
    * ONE narrow pass with no explode and no per-document shuffle — at
    * 100 TB this stays a map over the scan, where the explode+groupBy
    * formulation would shuffle every token. The per-row loop is the
    * custom [[graft.functions.SimHash32]] expression (the nested-HOF
    * column form computes identically but pays per-element expression
    * interpretation, ~8x). The DuckDB oracle uses the explode form;
    * same arithmetic.
    */
  def simHash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s) // idempotent
    Tables.t(s, dir, "documents")
      .select(col("doc_id"),
        call_function("simhash32", tokens(col("text"))).as("simhash"))
      .orderBy(col("doc_id"))
  }

  val simHashOracle: String = {
    val th = polyHashSql("token")
    val sums = (0 until SimhashBits)
      .map(j => s"SUM(((h >> $j) & 1) * 2 - 1) AS s$j").mkString(", ")
    val pack = (0 until SimhashBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |th AS (SELECT doc_id, $th AS h FROM tok),
       |votes AS (SELECT doc_id, $sums FROM th GROUP BY doc_id)
       |SELECT doc_id, $pack AS simhash FROM votes ORDER BY doc_id""".stripMargin
  }

  /** Multimodal plumbing: media payloads as opaque binary columns with
    * typed metadata. The testdata has no blob table, so the text column
    * stands in as the payload (cast to binary); the *operations* are the
    * real ones a media pipeline runs first: byte length, content digest
    * (dedup key), and header-derived dimensions (here a deterministic
    * stand-in — the real decoder is [[graft.media.MediaFeatures]]).
    */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    val bin = col("text").cast(BinaryType)
    Tables.t(s, dir, "documents").select(
      col("doc_id"),
      length(bin).as("n_bytes"),
      sha2(bin, 256).as("content_sha256"),
      md5(bin).as("content_md5"),
      (pmod(col("n_chars") * 31, lit(640)) + 1).as("fake_width"),
      (pmod(col("n_chars") * 17, lit(480)) + 1).as("fake_height"),
      lit(3).as("channels"),
    ).orderBy(col("doc_id"))
  }

  val binaryMetaOracle: String =
    """SELECT doc_id,
      | octet_length(encode(text)) AS n_bytes,
      | sha256(text) AS content_sha256,
      | md5(text) AS content_md5,
      | (n_chars * 31) % 640 + 1 AS fake_width,
      | (n_chars * 17) % 480 + 1 AS fake_height,
      | 3 AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gopher-style quality filter rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", arXiv:2112.11446 §A1.1) adapted to
    * the single-line corpus: word-count bounds, mean-word-length
    * bounds, alphabetic-word fraction, stopword presence, and the two
    * repetition signals — fraction of word occurrences covered by the
    * most frequent bigram and fraction of duplicated trigrams. One
    * boolean `keep` composes the rules, the per-rule signals are kept
    * as columns so downstream curation can re-threshold without a
    * second corpus pass.
    *
    * Scale shape: one narrow per-row pass for the word stats plus ONE
    * doc_id-keyed n-gram aggregation for both repetition signals — the
    * bigrams and trigrams explode into a single tagged (doc_id, n,
    * gram) relation, so the corpus is shuffled once, not once per
    * n-gram order; after the (doc_id, n, gram) count both signals
    * reduce in the same second-level hash aggregate. No window over
    * the corpus, no n-gram relation ever leaves its aggregation. The
    * n-gram arrays are built with zip_with over slices (no per-element
    * re-split: the token array is projected once — see the HOF
    * re-evaluation pitfall in SURVEY §6).
    */
  def gopherQuality(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("text"), tokens(col("text")).as("t"))
      .withColumn("n_words", size(col("t")))
    val len2 = greatest(col("n_words") - 1, lit(0))
    val len3 = greatest(col("n_words") - 2, lit(0))
    val bigrams = zip_with(
      slice(col("t"), lit(1), len2), slice(col("t"), lit(2), len2),
      (x, y) => concat_ws(" ", x, y))
    val trigrams = zip_with(
      zip_with(slice(col("t"), lit(1), len3), slice(col("t"), lit(2), len3),
        (x, y) => concat_ws(" ", x, y)),
      slice(col("t"), lit(3), len3),
      (xy, z) => concat_ws(" ", xy, z))
    val grams = base.select(col("doc_id"), explode(concat(
      transform(bigrams, g => struct(lit(2).as("n"), g.as("g"))),
      transform(trigrams, g => struct(lit(3).as("n"), g.as("g"))))).as("ng"))
      .select(col("doc_id"), col("ng.n").as("n"), col("ng.g").as("g"))
      .groupBy(col("doc_id"), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        max(when(col("n") === 2, col("c"))).as("max2"),
        count(when(col("n") === 3, lit(1))).as("d3"),
        sum(when(col("n") === 3, col("c"))).as("tot3"))
    val scored = base.select(
      col("doc_id"), col("n_words"),
      round((length(col("text")) - col("n_words") + 1).cast(DoubleType) / col("n_words"), 6)
        .as("mean_word_len"),
      round(size(filter(col("t"), w => w.rlike("^[a-z]+$"))).cast(DoubleType) / col("n_words"), 6)
        .as("alpha_frac"),
      stopCount(col("t"), stopEn).as("n_stop"),
    )
      .join(grams, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_words"), col("mean_word_len"), col("alpha_frac"), col("n_stop"),
        round(lit(2).cast(DoubleType) * coalesce(col("max2"), lit(0L)) / col("n_words"), 6)
          .as("top2_frac"),
        coalesce(round(lit(1).cast(DoubleType) - col("d3").cast(DoubleType) / col("tot3"), 6),
          lit(0.0)).as("dup3_frac"),
      )
    // every comparison is over the ROUNDED signal columns, so an
    // engine-ulp difference can never flip the keep decision
    scored.select(
      col("doc_id"), col("n_words"), col("mean_word_len"), col("alpha_frac"),
      col("n_stop"), col("top2_frac"), col("dup3_frac"),
      (col("n_words").between(25, 100000) &&
        col("mean_word_len").between(3, 10) &&
        col("alpha_frac") >= 0.8 && col("n_stop") >= 1 &&
        col("top2_frac") <= 0.125 && col("dup3_frac") <= 0.05).as("keep"),
    ).orderBy(col("doc_id"))
  }

  val gopherQualityOracle: String = {
    val stop = stopCountSql(stopEn)
    s"""WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
       |st AS (SELECT doc_id, len(t) AS n_words,
       |  round(CAST(length(text) - len(t) + 1 AS DOUBLE) / len(t), 6) AS mean_word_len,
       |  round(CAST(len(list_filter(t, w -> regexp_full_match(w, '[a-z]+'))) AS DOUBLE)
       |    / len(t), 6) AS alpha_frac,
       |  $stop AS n_stop
       | FROM tok),
       |bg AS (SELECT doc_id,
       |  unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg FROM tok),
       |b2 AS (SELECT doc_id, max(c) AS max2
       |  FROM (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1),
       |tg AS (SELECT doc_id,
       |  unnest(list_transform(range(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tg FROM tok),
       |t3 AS (SELECT doc_id, COUNT(DISTINCT tg) AS d3, COUNT(*) AS tot3 FROM tg GROUP BY 1),
       |scored AS (
       |  SELECT s.doc_id, s.n_words, s.mean_word_len, s.alpha_frac, s.n_stop,
       |    round(CAST(2 AS DOUBLE) * COALESCE(b2.max2, 0) / s.n_words, 6) AS top2_frac,
       |    COALESCE(round(CAST(1 AS DOUBLE) - CAST(t3.d3 AS DOUBLE) / t3.tot3, 6),
       |      CAST(0 AS DOUBLE)) AS dup3_frac
       |  FROM st s LEFT JOIN b2 USING (doc_id) LEFT JOIN t3 USING (doc_id))
       |SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop, top2_frac, dup3_frac,
       |  (n_words BETWEEN 25 AND 100000 AND mean_word_len BETWEEN 3 AND 10
       |    AND alpha_frac >= CAST(0.8 AS DOUBLE) AND n_stop >= 1
       |    AND top2_frac <= CAST(0.125 AS DOUBLE)
       |    AND dup3_frac <= CAST(0.05 AS DOUBLE)) AS keep
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Repeated-n-gram coverage (Gopher repetition filters, rule family
  // of Rae et al. 2021 §A1.1: "fraction of characters in duplicate
  // n-grams" — here token-level for the whitespace corpus)
  // ------------------------------------------------------------------

  private val DupGramN = 3

  /** Within-document repetition screen: the fraction of a doc's tokens
    * covered by at least one 3-gram that occurs ≥ 2 times IN THAT DOC
    * — the Gopher/RefinedWeb duplicate-n-gram filter that catches
    * boilerplate loops, spam keyword stuffing, and decoder
    * degeneration, which per-token entropy misses when the repeats are
    * long-range. Exact integer counts end-to-end: gram occurrences
    * carry their positions, repeated grams re-explode to the covered
    * position set, and coverage is a distinct-position count — the
    * single round-6 division is the output ratio.
    *
    * Scale shape: two linear explodes (grams with positions, covered
    * positions) and hash aggregates keyed by doc — the postings
    * discipline; the repeated-gram join is (doc, gram)-keyed,
    * doc-local, never cross-doc.
    */
  def dupNgramFrac(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).as("n_tokens"))
    val grams = base.filter(col("n_tokens") >= DupGramN)
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(1), col("n_tokens") - (DupGramN - 1))).as("i"),
        col("tk"))
      .select(col("doc_id"), col("n_tokens"), col("i"),
        array_join(slice(col("tk"), col("i"), lit(DupGramN)), " ").as("gram"))
    val counts = grams.groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val repeated = counts.filter(col("cnt") >= 2)
      .select(col("doc_id"), col("gram"))
    val covered = grams.join(repeated, Seq("doc_id", "gram"))
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (DupGramN - 1))).as("pos"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("covered_tokens"))
    val gramStats = counts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_distinct_grams"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_repeated_grams"))
    base.select(col("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"))
      .join(gramStats, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_distinct_grams"), lit(0L)).as("n_distinct_grams"),
        coalesce(col("n_repeated_grams"), lit(0L)).as("n_repeated_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)).cast(DoubleType) /
          col("n_tokens"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val dupNgramFracOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk,
       |    len(string_split(text, ' ')) AS n_tokens
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, n_tokens, i,
       |    array_to_string(tk[i : i + ${DupGramN - 1}], ' ') AS gram
       |  FROM (SELECT doc_id, n_tokens, tk,
       |          unnest(range(1, n_tokens - ${DupGramN - 2})) AS i
       |        FROM t WHERE n_tokens >= $DupGramN)),
       |c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
       |rep AS (SELECT doc_id, gram FROM c WHERE cnt >= 2),
       |cov AS (
       |  SELECT doc_id, COUNT(*) AS covered_tokens FROM (
       |    SELECT DISTINCT doc_id, pos FROM (
       |      SELECT g.doc_id, unnest(range(g.i, g.i + $DupGramN)) AS pos
       |      FROM g JOIN rep USING (doc_id, gram)))
       |  GROUP BY 1),
       |gs AS (
       |  SELECT doc_id, COUNT(*) AS n_distinct_grams,
       |    SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS n_repeated_grams
       |  FROM c GROUP BY 1)
       |SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(gs.n_distinct_grams, 0) AS BIGINT) AS n_distinct_grams,
       |  CAST(COALESCE(gs.n_repeated_grams, 0) AS BIGINT) AS n_repeated_grams,
       |  CAST(COALESCE(cov.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       |  round(CAST(COALESCE(cov.covered_tokens, 0) AS DOUBLE) / t.n_tokens, 6)
       |    AS dup_frac
       |FROM t LEFT JOIN gs USING (doc_id) LEFT JOIN cov USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("ta_dup_ngram_frac", dupNgramFrac, Some(dupNgramFracOracle)),
    QueryDef("ta_text_stats", textStats, Some(textStatsOracle)),
    QueryDef("ta_langid", langId, Some(langIdOracle)),
    QueryDef("ta_fingerprint", fingerprint, Some(fingerprintOracle)),
    QueryDef("ta_simhash", simHash, Some(simHashOracle)),
    QueryDef("ta_gopher_quality", gopherQuality, Some(gopherQualityOracle)),
    QueryDef("mm_binary_meta", binaryMeta, Some(binaryMetaOracle)),
  )
}
