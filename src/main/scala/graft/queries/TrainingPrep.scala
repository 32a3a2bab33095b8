package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-corpus preparation operators a 100 TB pipeline needs
  * between curation and the trainer: sliding-window document chunking,
  * benchmark decontamination (the GPT-3/PaLM n-gram-overlap check that
  * keeps eval data out of the training set), and token-distribution
  * entropy scoring (a repetition/quality signal complementary to the
  * Gopher rules in [[LlmText]]).
  *
  * Scale notes: chunking is embarrassingly parallel (per-row array
  * ops, no shuffle at all — the whole query is one narrow projection).
  * Decontamination's benchmark gram set is tiny relative to the train
  * side (the eval suite, not the corpus), so the semi join broadcasts
  * under AQE and the train side streams once; nothing retains a
  * train×train term. Entropy is one (doc_id, token) hash aggregate —
  * the same shape as TF-IDF — with the per-doc total derived from the
  * token array length rather than a second shuffle.
  *
  * Float discipline (same as [[LlmCuration]]'s LM scores): every
  * libm-touched sum runs through DECIMAL(38,12) so partial-aggregation
  * order can't change the result, and outputs are round(,6).
  */
object TrainingPrep {

  /** Chunk width / stride in tokens: 32-token chunks every 24 tokens
    * (8-token overlap) — small enough that the 10-99-token testdata
    * docs produce 1-5 chunks each.
    */
  private val ChunkW = 32
  private val ChunkS = 24

  /** Contamination n-gram order and the deterministic eval split:
    * every 29th doc_id acts as the held-out benchmark.
    */
  private val GramN = 8
  private val BenchMod = 29

  /** Sliding-window chunking: each doc explodes into ceil(n/S) chunks
    * of up to W tokens starting every S tokens. Pure per-row compute —
    * `.explain` shows a single Project/Generate over the scan.
    */
  def chunkSliding(s: SparkSession, dir: String): DataFrame = {
    val tk = Tables.t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    tk.select(col("doc_id"), col("tk"),
        explode(sequence(lit(0), size(col("tk")) - 1, lit(ChunkS))).as("st"))
      .select(
        col("doc_id"),
        (col("st") / ChunkS).cast(LongType).as("chunk_idx"),
        least(size(col("tk")) - col("st"), lit(ChunkW)).cast(LongType).as("n_tokens"),
        array_join(slice(col("tk"), col("st") + 1, lit(ChunkW)), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val chunkOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |st AS (SELECT doc_id, tk, unnest(range(0, len(tk), $ChunkS)) AS st FROM t)
       |SELECT doc_id,
       |  CAST(st // $ChunkS AS BIGINT) AS chunk_idx,
       |  CAST(least(len(tk) - st, $ChunkW) AS BIGINT) AS n_tokens,
       |  array_to_string(tk[st + 1 : st + $ChunkW], ' ') AS chunk_text
       |FROM st ORDER BY doc_id, chunk_idx""".stripMargin

  /** Distinct GramN-grams per doc. Package-private so the
    * decontamination stages (and ScaleBench) share one definition. */
  private def docGrams(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= GramN)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(col("tk")) - GramN + 1),
          i => array_join(slice(col("tk"), i, lit(GramN)), " ")))).as("gram"))

  /** Benchmark decontamination: for every training doc, the fraction
    * of its distinct 8-grams that also occur anywhere in the held-out
    * benchmark split. The benchmark gram set is DISTINCT and small →
    * the hit check is a left-semi join that AQE broadcasts; the train
    * side is touched once. Exactly the published GPT-3/PaLM
    * decontamination procedure with the eval suite standing in as the
    * contaminated source.
    */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val grams = docGrams(s, dir)
    val bench = grams.filter(col("doc_id") % BenchMod === 0)
      .select(col("gram")).distinct()
    val train = grams.filter(col("doc_id") % BenchMod =!= 0)
    val totals = train.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val hits = train.join(bench, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("n_grams"), 6).as("overlap"))
      .orderBy(col("doc_id"))
  }

  private val contaminationOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       |g AS (SELECT doc_id, unnest(list_distinct(
       |        [array_to_string(tk[i : i + ${GramN - 1}], ' ')
       |         for i in range(1, len(tk) - ${GramN - 2})])) AS gram
       |      FROM t WHERE len(tk) >= $GramN),
       |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % $BenchMod = 0),
       |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % $BenchMod <> 0),
       |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM tr GROUP BY doc_id),
       |hit AS (SELECT doc_id, COUNT(*) AS n_hit
       |        FROM tr JOIN bench USING (gram) GROUP BY doc_id)
       |SELECT tot.doc_id, n_grams, COALESCE(n_hit, 0) AS n_hit,
       |  round(COALESCE(n_hit, 0) / CAST(n_grams AS DOUBLE), 6) AS overlap
       |FROM tot LEFT JOIN hit USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Shannon entropy (nats) and type-token ratio of each doc's token
    * distribution — low entropy flags repetitive/templated text. The
    * per-doc total comes from the token array length (no second
    * aggregate); the p·ln(p) sum runs through DECIMAL(38,12) so the
    * result is independent of partial-aggregation order.
    */
  def tokenEntropy(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val totals = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("total"))
    val cnt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
    val p = col("cnt") / col("total")
    cnt.join(totals, "doc_id")
      .groupBy(col("doc_id"), col("total"))
      .agg(count(lit(1)).as("n_distinct"),
        (-sum((p * log(p)).cast(DecimalType(38, 12))).cast(DoubleType)).as("h"))
      .select(col("doc_id"), col("total").cast(LongType).as("n_tokens"),
        col("n_distinct"), round(col("h"), 6).as("entropy"),
        round(col("n_distinct") / col("total"), 6).as("ttr"))
      .orderBy(col("doc_id"))
  }

  private val entropyOracle: String =
    """WITH tot AS (SELECT doc_id, len(string_split(text, ' ')) AS total FROM documents),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |c AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY doc_id, token)
      |SELECT c.doc_id, CAST(total AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_distinct,
      |  round(-CAST(SUM(CAST((cnt / CAST(total AS DOUBLE))
      |      * ln(cnt / CAST(total AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE), 6)
      |    AS entropy,
      |  round(COUNT(*) / CAST(total AS DOUBLE), 6) AS ttr
      |FROM c JOIN tot USING (doc_id)
      |GROUP BY c.doc_id, total ORDER BY doc_id""".stripMargin

  /** Epoch upsampling — the step that APPLIES a domain mixture: each
    * source's docs replicate ceil(max_tokens / source_tokens) times
    * (capped at 4 epochs, the usual repetition-harm bound), so
    * low-resource domains approach token parity with the largest. The
    * factor is pure integer arithmetic — `(mx + n - 1) div n` — so
    * both engines agree exactly even at ratio boundaries; the global
    * max arrives as an uncorrelated scalar subquery over the ~|sources|
    * aggregate (evaluated once, broadcast into the projection).
    */
  def upsampleEpochs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.t(s, dir, "documents")
    val bySource = docs.groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("n_tok"))
    val maxTok = bySource.select(max(col("n_tok")))
    val factors = bySource
      .withColumn("mx", maxTok.scalar())
      .select(col("source"),
        least(lit(4L), expr("(mx + n_tok - 1) div n_tok")).as("factor"))
    docs.join(factors, "source")
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("factor"))).as("epoch"))
      .orderBy(col("doc_id"), col("epoch"))
  }

  private val upsampleOracle: String =
    """WITH bs AS (SELECT source, SUM(len(string_split(text, ' '))) AS n_tok
      |  FROM documents GROUP BY source),
      |f AS (SELECT source,
      |  CAST(least(4, ((SELECT MAX(n_tok) FROM bs) + n_tok - 1) // n_tok)
      |    AS BIGINT) AS factor
      |  FROM bs)
      |SELECT d.doc_id, d.source, unnest(range(1, f.factor + 1)) AS epoch
      |FROM documents d JOIN f USING (source)
      |ORDER BY doc_id, epoch""".stripMargin

  /** Content-defined chunking (CDC) dedup hits: documents split at
    * ROLLING-HASH boundaries (a token starts a new chunk when its md5
    * leads with hex 0/1 — expected chunk length 8 tokens), then chunks
    * whose exact text recurs anywhere in the corpus are surfaced with
    * their copy counts. Unlike fixed windows ([[chunkSliding]]), CDC
    * boundaries RESYNCHRONIZE after insertions/deletions — the same
    * passage shifted by k tokens still produces identical chunks, so
    * shared passages dedup regardless of offset (the property
    * rsync/LBFS-style chunking is built on).
    *
    * Scale shape: chunk assembly is a pure per-row array program —
    * boundary positions via filter over the token index sequence,
    * chunk texts via zip_with over adjacent boundaries — so the ONLY
    * exchange is the final chunk-key aggregate, and the wire carries
    * 16-byte keys + counts, not text (the md5 key crosses the shuffle;
    * the chunk text never leaves the map side).
    */
  def cdcChunk(s: SparkSession, dir: String): DataFrame = {
    val tk = col("tk")
    val n = size(tk)
    // chunk starts: position 1 unconditionally, then every boundary
    // token. The seed start makes the zip below total for n >= 1.
    // sequence(2, n) REVERSES to [2, 1] when n = 1 (negative step) and
    // element_at(tk, 2) on a 1-token doc is an out-of-bounds read —
    // a crash under ANSI mode — so the candidate positions must be
    // empty for single-token docs (same load-bearing guard as
    // commonPassages' shingle sequence).
    val starts = concat(array(lit(1)),
      filter(when(n >= 2, sequence(lit(2), n)).otherwise(array().cast("array<int>")),
        i => substring(md5(element_at(tk, i).cast(BinaryType)), 1, 1).isin("0", "1")))
    val ends = concat(slice(starts, lit(2), size(starts) - 1), array(n + 1))
    val chunks = zip_with(starts, ends, (st, en) => array_join(slice(tk, st, en - st), " "))
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(n >= 1)
      .select(col("doc_id"), explode(chunks).as("ctext"))
      .select(col("doc_id"),
        md5(col("ctext").cast(BinaryType)).as("chunk_key"),
        size(split(col("ctext"), " ")).cast(LongType).as("n_tokens"))
      .groupBy(col("chunk_key"), col("n_tokens"))
      .agg(count(lit(1)).as("n_copies"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_copies") > 1)
      .orderBy(col("n_copies").desc, col("chunk_key"))
  }

  private val cdcOracle: String =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |fl AS (SELECT doc_id, pos, w,
      |  CASE WHEN pos > 1 AND substr(md5(w), 1, 1) IN ('0', '1')
      |    THEN 1 ELSE 0 END AS b FROM tk),
      |ch AS (SELECT doc_id, pos, w,
      |  SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS cid FROM fl),
      |chunks AS (
      |  SELECT doc_id, cid, string_agg(w, ' ' ORDER BY pos) AS ctext,
      |    COUNT(*) AS n_tok
      |  FROM ch GROUP BY 1, 2)
      |SELECT md5(ctext) AS chunk_key, CAST(n_tok AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_copies,
      |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM chunks GROUP BY 1, 2 HAVING COUNT(*) > 1
      |ORDER BY n_copies DESC, chunk_key""".stripMargin

  private val BpeTopK = 20

  /** First-iteration BPE merge candidates (Sennrich, Haddow & Birch
    * 2016 — the training step of byte-pair-encoding tokenizers): the
    * corpus-wide frequency of every ADJACENT CHARACTER PAIR inside a
    * word, weighted by word frequency, ranked to the [[BpeTopK]]
    * merge candidates. This is exactly the statistic a tokenizer
    * trainer computes per merge round; one round is oracle-gateable
    * because the argmax ranking (count desc, pair asc) is
    * deterministic, where the full iterated trainer would need
    * corpus rewrites between rounds.
    *
    * Scale shape: one corpus hash aggregate to the word-frequency
    * VOCABULARY, then pair generation explodes only the distinct-word
    * relation (positions ≤ word length), weighted by the carried
    * frequency — the corpus text is scanned once and never re-read at
    * pair granularity. Final top-k is a 1-group WindowGroupLimit over
    * the pair-vocabulary relation.
    */
  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val pairs = words
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
    pairs
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy()
          .orderBy(col("n").desc, col("pair"))))
      .filter(col("rank") <= BpeTopK)
      .select(col("rank").cast(LongType).as("rank"), col("pair"), col("n"))
      .orderBy(col("rank"))
  }

  val bpeMergesOracle: String =
    s"""WITH words AS (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) >= 2 GROUP BY 1),
       |pairs AS (
       |  SELECT substr(w, i, 2) AS pair, CAST(SUM(freq) AS BIGINT) AS n
       |  FROM (SELECT w, freq, unnest(range(1, len(w))) AS i FROM words)
       |  GROUP BY 1),
       |ranked AS (
       |  SELECT pair, n,
       |    ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
       |  FROM pairs)
       |SELECT CAST(rank AS BIGINT) AS rank, pair, n
       |FROM ranked WHERE rank <= $BpeTopK ORDER BY rank""".stripMargin

  private val BpeApplyRules = 8
  private val BpeApplyTopWords = 50

  /** BPE merge APPLICATION (the encode step that completes
    * [[bpeMerges]]'s train step — Sennrich, Haddow & Birch 2016 §3):
    * the top-[[BpeApplyRules]] trained merge rules are applied to the
    * word vocabulary in rank order, one rule per unrolled round (the
    * labelProp fixed-rounds device), yielding each word's final token
    * sequence. Within a round a rule is applied greedily
    * left-to-right with no overlap: a position merges iff its
    * (tok, next) pair matches AND the previous position did not merge
    * — resolved WITHOUT per-row recursion by run-length parity over
    * maximal match runs (a matched position merges iff its offset in
    * the run is even), one running-max window per round, identical in
    * both engines.
    *
    * Scale shape: everything after the corpus scan runs on the
    * DISTINCT-WORD vocabulary (Heaps-bounded: ~10⁸ rows at 100 TB,
    * ~10 chars each), windows partition by word (bounded tiny
    * partitions), and the 8-rule table is ONE broadcast 1-row
    * relation pivoted to columns — the corpus text itself is scanned
    * once for the vocabulary and once for rule training, never at
    * character granularity. Final top-k rank is over (freq, word)
    * with integer keys — nothing floats.
    */
  /** Shared chain behind [[bpeApply]] and [[bpeFertility]]: per-word
    * (w, freq, n_tokens, tokens) after the full 8-round merge
    * application over the vocabulary relation.
    */
  private def bpeTokenized(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables.t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val pairs = words
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("freq"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
    val ranked = pairs.withColumn("rank", row_number().over(
      Window.partitionBy().orderBy(col("n").desc, col("pair"))))
      .filter(col("rank") <= BpeApplyRules)
    // rule table pivoted to ONE row (pair_1..pair_8) so a single
    // broadcast carries every round's rule through the plan
    val ruleCols = (1 to BpeApplyRules).map(r =>
      max(when(col("rank") === r, col("pair"))).as(s"pair_$r"))
    val rules = ranked.agg(ruleCols.head, ruleCols.tail: _*)
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    val runWin = wWin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val init = words
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")))).as("pos"))
      .select(col("w"), col("freq"), col("pos"),
        expr("substring(w, pos, 1)").as("tok"))
      .crossJoin(broadcast(rules))
    val finalToks = (1 to BpeApplyRules).foldLeft(init) { (t, r) =>
      t.withColumn("nxt", lead(col("tok"), 1).over(wWin))
        // null-safe: a missing rule (tiny vocab) or last position must
        // read as NOT matched in BOTH engines, never null
        .withColumn("mtch", coalesce(col("nxt").isNotNull &&
          concat(col("tok"), col("nxt")) === col(s"pair_$r"), lit(false)))
        .withColumn("last_nm",
          max(when(!col("mtch"), col("pos"))).over(runWin))
        .withColumn("applied", col("mtch") &&
          (col("pos") - coalesce(col("last_nm"), lit(0))) % 2 === 1)
        .withColumn("drop_me",
          coalesce(lag(col("applied"), 1).over(wWin), lit(false)))
        .filter(!col("drop_me"))
        .withColumn("tok", when(col("applied"),
          concat(col("tok"), col("nxt"))).otherwise(col("tok")))
        .withColumn("pos", row_number().over(wWin))
        .drop("nxt", "mtch", "last_nm", "applied", "drop_me")
    }
    finalToks
      .groupBy(col("w"), col("freq"))
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        // '|'-joined canonical string per the r01 output contract
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          t => t.getField("tok")), "|").as("tokens"))
  }

  def bpeApply(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bpeTokenized(s, dir)
      .withColumn("rank", row_number().over(
        Window.partitionBy().orderBy(col("freq").desc, col("w"))))
      .filter(col("rank") <= BpeApplyTopWords)
      .select(col("rank").cast(LongType).as("rank"), col("w").as("word"),
        col("freq"), col("n_tokens"), col("tokens"))
      .orderBy(col("rank"))
  }

  /** Tokenizer FERTILITY diagnostic over the trained BPE (the standard
    * tokenizer-eval number in LLM data work — how many subword tokens
    * an average word costs, and how many characters a token carries):
    * corpus-frequency-weighted tokens/word and chars/token, stratified
    * by word-length bucket so the place fertility degrades (long-tail
    * long words) is visible. All accumulations are exact BIGINTs over
    * the vocabulary relation; the two ratios are single rounded
    * divisions — and the whole chain reuses [[bpeTokenized]], so the
    * merge semantics cannot drift between the apply and eval gates.
    */
  def bpeFertility(s: SparkSession, dir: String): DataFrame = {
    val bucket = when(length(col("w")) <= 4, "len_2_4")
      .when(length(col("w")) <= 8, "len_5_8")
      .otherwise("len_9p")
    bpeTokenized(s, dir)
      .select(bucket.as("bucket"), col("w"), col("freq"), col("n_tokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("freq")).as("n_words"),
        sum(col("freq") * length(col("w")).cast(LongType)).as("n_chars"),
        sum(col("freq") * col("n_tokens")).as("n_subtokens"))
      .select(col("bucket"), col("n_types"), col("n_words"), col("n_chars"),
        col("n_subtokens"),
        round(col("n_subtokens").cast(DoubleType) /
          col("n_words").cast(DoubleType), 6).as("fertility"),
        round(col("n_chars").cast(DoubleType) /
          col("n_subtokens").cast(DoubleType), 6).as("chars_per_token"))
      .orderBy(col("bucket"))
  }

  /** Shared oracle WITH-chain ending at the `agg` CTE
    * (w, freq, n_tokens, tokens) — the SQL twin of [[bpeTokenized]].
    */
  private val bpeChainSql: String = {
    val ruleCols = (1 to BpeApplyRules)
      .map(r => s"max(CASE WHEN rank = $r THEN pair END) AS pair_$r")
      .mkString(", ")
    val rounds = (1 to BpeApplyRules).map { r =>
      s"""a$r AS (SELECT *, lead(tok) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |  FROM t${r - 1}),
         |b$r AS (SELECT *, COALESCE(nxt IS NOT NULL
         |    AND tok || nxt = pair_$r, false) AS mtch FROM a$r),
         |c$r AS (SELECT *, max(CASE WHEN NOT mtch THEN pos END) OVER
         |    (PARTITION BY w ORDER BY pos ROWS UNBOUNDED PRECEDING)
         |    AS last_nm FROM b$r),
         |d$r AS (SELECT *, (mtch AND (pos - COALESCE(last_nm, 0)) % 2 = 1)
         |    AS applied FROM c$r),
         |e$r AS (SELECT *, COALESCE(lag(applied) OVER
         |    (PARTITION BY w ORDER BY pos), false) AS drop_me FROM d$r),
         |t$r AS (SELECT w, freq, ${(1 to BpeApplyRules).map(i => s"pair_$i").mkString(", ")},
         |    CAST(ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS INT) AS pos,
         |    CASE WHEN applied THEN tok || nxt ELSE tok END AS tok
         |  FROM e$r WHERE NOT drop_me)""".stripMargin
    }.mkString(",\n")
    s"""WITH words AS (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) >= 2 GROUP BY 1),
       |prs AS (
       |  SELECT substr(w, i, 2) AS pair, CAST(SUM(freq) AS BIGINT) AS n
       |  FROM (SELECT w, freq, unnest(range(1, len(w))) AS i FROM words)
       |  GROUP BY 1),
       |rkd AS (
       |  SELECT pair, n, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
       |  FROM prs),
       |rules AS (SELECT $ruleCols FROM rkd WHERE rank <= $BpeApplyRules),
       |t0 AS (
       |  SELECT w, freq, CAST(i AS INT) AS pos, substr(w, i, 1) AS tok,
       |    ${(1 to BpeApplyRules).map(i => s"pair_$i").mkString(", ")}
       |  FROM (SELECT w, freq, unnest(range(1, len(w) + 1)) AS i FROM words)
       |  CROSS JOIN rules),
       |$rounds,
       |agg AS (
       |  SELECT w, freq, COUNT(*) AS n_tokens,
       |    string_agg(tok, '|' ORDER BY pos) AS tokens
       |  FROM t$BpeApplyRules GROUP BY 1, 2)""".stripMargin
  }

  val bpeApplyOracle: String =
    s"""$bpeChainSql,
       |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY freq DESC, w) AS rank
       |  FROM agg)
       |SELECT CAST(rank AS BIGINT) AS rank, w AS word, freq,
       |  CAST(n_tokens AS BIGINT) AS n_tokens, tokens
       |FROM rk WHERE rank <= $BpeApplyTopWords ORDER BY rank""".stripMargin

  val bpeFertilityOracle: String =
    s"""$bpeChainSql
       |SELECT
       |  CASE WHEN len(w) <= 4 THEN 'len_2_4'
       |    WHEN len(w) <= 8 THEN 'len_5_8' ELSE 'len_9p' END AS bucket,
       |  COUNT(*) AS n_types,
       |  CAST(SUM(freq) AS BIGINT) AS n_words,
       |  CAST(SUM(freq * len(w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(freq * n_tokens) AS BIGINT) AS n_subtokens,
       |  round(CAST(SUM(freq * n_tokens) AS DOUBLE)
       |    / CAST(SUM(freq) AS DOUBLE), 6) AS fertility,
       |  round(CAST(SUM(freq * len(w)) AS DOUBLE)
       |    / CAST(SUM(freq * n_tokens) AS DOUBLE), 6) AS chars_per_token
       |FROM agg GROUP BY 1 ORDER BY 1""".stripMargin

  private val EncodeFolds = 5

  /** Leakage-free target encoding (the Kaggle/CatBoost device, see
    * Micci-Barreca 2001): encode `o_orderpriority` by the mean order
    * value, computed OUT-OF-FOLD — row in fold k gets the category
    * mean over the other folds, (S_cat − S_cat,k)/(n_cat − n_cat,k) —
    * so a model trained on the encoded column never sees its own
    * row's target (the leak that makes naive target encoding
    * overfit). Folds are the deterministic o_orderkey % 5. Spend is
    * exact cents; the leave-fold-out mean is one double division per
    * (category, fold) cell.
    *
    * Scale shape: one fact hash aggregate to the (category, fold)
    * grid (25 cells); the leave-one-out arithmetic runs on the grid
    * via two window sums. A 100 TB train set joins the 25-row encoded
    * grid back by (category, fold) broadcast — this gate emits the
    * grid itself (the reusable artifact).
    */
  def targetEncode(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.t(s, dir, "orders")
      .select(col("o_orderpriority"),
        (col("o_orderkey") % EncodeFolds).as("fold"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy(col("o_orderpriority"), col("fold"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast(DecimalType(38, 0))).as("sm"))
    val wCat = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
    cells
      .withColumn("n_cat", sum(col("n")).over(wCat))
      .withColumn("s_cat", sum(col("sm")).over(wCat))
      .select(col("o_orderpriority"), col("fold"), col("n").as("n_in_fold"),
        round((col("s_cat") - col("sm")).cast(DoubleType)
          / (col("n_cat") - col("n")).cast(DoubleType) / 100.0, 6)
          .as("encoded"))
      .orderBy(col("o_orderpriority"), col("fold"))
  }

  val targetEncodeOracle: String =
    s"""WITH cells AS (
       |  SELECT o_orderpriority, o_orderkey % $EncodeFolds AS fold,
       |    COUNT(*) AS n,
       |    SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS sm
       |  FROM orders GROUP BY 1, 2),
       |loo AS (
       |  SELECT o_orderpriority, fold, n,
       |    SUM(n) OVER (PARTITION BY o_orderpriority) AS n_cat,
       |    SUM(sm) OVER (PARTITION BY o_orderpriority) AS s_cat, sm
       |  FROM cells)
       |SELECT o_orderpriority, fold, n AS n_in_fold,
       |  round(CAST(s_cat - sm AS DOUBLE) / CAST(n_cat - n AS DOUBLE)
       |    / 100.0, 6) AS encoded
       |FROM loo ORDER BY o_orderpriority, fold""".stripMargin

  private val SpanBlock = 3  // tokens per maskable block
  private val SpanMod = 7    // 1-in-7 blocks masked → ~14% of tokens

  /** T5-style span-corruption masking plan (Raffel et al. 2020 §3.1.4
    * — the denoising objective's data prep): each document's tokens
    * partition into [[SpanBlock]]-token blocks; a deterministic hash
    * of (doc_id, block) masks 1 in [[SpanMod]] blocks (≈14% of
    * tokens, T5's 15% target). The gate emits the (input, target)
    * pair a trainer consumes: input = the text with each masked block
    * replaced by the `<X>` sentinel, target = the masked blocks
    * joined by the sentinel. Fixed-width blocks make span selection
    * OVERLAP-FREE by construction — hash-selected variable spans need
    * a stateful resolve that no relational expression replays — and
    * the hash-rank device ([[LlmCuration.groupSample]]'s h60) makes
    * the mask consistent across reruns and engines.
    *
    * Scale shape: one explode to (doc, block) — bounded by token
    * count / block width — one hash aggregate back to documents with
    * ordered array folds for the two texts. No windows, no joins,
    * embarrassingly parallel.
    */
  def spanCorrupt(s: SparkSession, dir: String): DataFrame = {
    val t = split(col("text"), " ")
    val blocks = Tables.t(s, dir, "documents")
      .select(col("doc_id"), size(t).as("n_tokens"),
        // DIV, not "/": Column division on ints is DOUBLE division
        explode(expr(
          s"sequence(0, (size(split(text, ' ')) - 1) DIV $SpanBlock)")).as("blk"),
        t.as("tk"))
      .select(col("doc_id"), col("n_tokens"), col("blk"),
        concat_ws(" ",
          slice(col("tk"), col("blk") * SpanBlock + 1, lit(SpanBlock)))
          .as("btext"),
        (Sketches.h60(concat_ws(":", col("doc_id"), col("blk"), lit("t5")))
          % SpanMod === 0).as("masked"))
    blocks.groupBy(col("doc_id"), col("n_tokens"))
      .agg(
        sum(when(col("masked"),
          size(split(col("btext"), " "))).otherwise(0)).cast(LongType)
          .as("n_masked_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("blk"),
          when(col("masked"), lit("<X>")).otherwise(col("btext")).as("seg")))),
          x => x("seg")), " ").as("input_text"),
        array_join(transform(array_sort(collect_list(
          when(col("masked"), struct(col("blk"), col("btext").as("seg"))))),
          x => x("seg")), "<X>").as("target_text"))
      .select(col("doc_id"), col("n_tokens").cast(LongType).as("n_tokens"),
        col("n_masked_tokens"), col("input_text"), col("target_text"))
      .orderBy(col("doc_id"))
  }

  val spanCorruptOracle: String =
    s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |blocks AS (
       |  SELECT doc_id, len(t) AS n_tokens, blk,
       |    array_to_string(t[blk * $SpanBlock + 1 : blk * $SpanBlock + $SpanBlock], ' ')
       |      AS btext,
       |    (${graft.queries.Sketches.h60Sql(
             s"CAST(doc_id AS VARCHAR) || ':' || CAST(blk AS VARCHAR) || ':t5'")})
       |      % $SpanMod = 0 AS masked
       |  FROM (SELECT doc_id, t, unnest(range(0, (len(t) - 1) // $SpanBlock + 1)) AS blk
       |    FROM tok))
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN masked THEN len(string_split(btext, ' '))
       |    ELSE 0 END) AS BIGINT) AS n_masked_tokens,
       |  string_agg(CASE WHEN masked THEN '<X>' ELSE btext END, ' '
       |    ORDER BY blk) AS input_text,
       |  COALESCE(string_agg(CASE WHEN masked THEN btext END, '<X>'
       |    ORDER BY blk), '') AS target_text
       |FROM blocks GROUP BY doc_id, n_tokens
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Curation filter funnel
  // ---------------------------------------------------------------------

  private val FunnelStops = Seq("the", "a", "of", "and", "in", "to")

  /** Sequential curation-filter attrition report — the per-filter
    * removal table every production corpus pipeline publishes (what
    * fraction died at language ID, what at length, what at lexical
    * quality): four ordered filters (language = en, length bounds,
    * TTR floor, stopword-fraction ceiling), each row stating how many
    * docs entered the step, failed it, and survived. Counts are exact
    * integers; the ratio thresholds compare a single double division
    * against an exact constant — deterministic cross-engine.
    *
    * Scale shape: ONE documents scan computes all four flags per row
    * (narrow codegen map), one global aggregate builds the cumulative
    * counters with map-side combine, and the 4-row funnel unpivots
    * from that single aggregate row — no joins, no second scan.
    */
  def filterFunnel(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast(DoubleType)
    val stopFrac = size(filter(toks,
      t => t.isin(FunnelStops: _*))).cast(DoubleType) / nTok
    val flags = Tables.t(s, dir, "documents").select(
      (col("lang") === "en").as("f1"),
      col("n_chars").between(100, 500).as("f2"),
      (size(array_distinct(toks)).cast(DoubleType) / nTok >= 0.3).as("f3"),
      (stopFrac <= 0.5).as("f4"))
    val cum = flags.agg(
      count(lit(1)).as("n0"),
      sum(when(col("f1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("f1") && col("f2") && col("f3"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("f1") && col("f2") && col("f3") && col("f4"), 1L)
        .otherwise(0L)).as("n4"))
    val step = (i: Int, name: String, nin: Column, nout: Column) =>
      struct(lit(i.toLong).as("step"), lit(name).as("filter"),
        nin.as("n_in"), (nin - nout).as("n_fail"), nout.as("n_out"))
    cum.select(explode(array(
        step(1, "lang_en", col("n0"), col("n1")),
        step(2, "len_100_500", col("n1"), col("n2")),
        step(3, "ttr_min_03", col("n2"), col("n3")),
        step(4, "stopfrac_max_05", col("n3"), col("n4")))).as("r"))
      .select(col("r.step"), col("r.filter"), col("r.n_in"),
        col("r.n_fail"), col("r.n_out"))
      .orderBy(col("step"))
  }

  val filterFunnelOracle: String = {
    val stopsIn = FunnelStops.map(w => s"'$w'").mkString(", ")
    s"""WITH fl AS (
       |  SELECT lang = 'en' AS f1,
       |    n_chars BETWEEN 100 AND 500 AS f2,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) >= 0.3 AS f3,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN ($stopsIn))) AS DOUBLE)
       |      / len(string_split(text, ' ')) <= 0.5 AS f4
       |  FROM documents),
       |cum AS (
       |  SELECT COUNT(*) AS n0,
       |    SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS n1,
       |    SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS n2,
       |    SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS n3,
       |    SUM(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS n4
       |  FROM fl)
       |SELECT CAST(step AS BIGINT) AS step, filter,
       |  CAST(n_in AS BIGINT) AS n_in,
       |  CAST(n_in - n_out AS BIGINT) AS n_fail,
       |  CAST(n_out AS BIGINT) AS n_out
       |FROM (
       |  SELECT 1 AS step, 'lang_en' AS filter, n0 AS n_in, n1 AS n_out FROM cum
       |  UNION ALL
       |  SELECT 2, 'len_100_500', n1, n2 FROM cum
       |  UNION ALL
       |  SELECT 3, 'ttr_min_03', n2, n3 FROM cum
       |  UNION ALL
       |  SELECT 4, 'stopfrac_max_05', n3, n4 FROM cum)
       |ORDER BY step""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("cu_filter_funnel", filterFunnel, Some(filterFunnelOracle)),
    QueryDef("cu_span_corrupt", spanCorrupt, Some(spanCorruptOracle)),
    QueryDef("cu_bpe_merges", bpeMerges, Some(bpeMergesOracle)),
    QueryDef("cu_bpe_apply", bpeApply, Some(bpeApplyOracle)),
    QueryDef("cu_bpe_fertility", bpeFertility, Some(bpeFertilityOracle)),
    QueryDef("cu_target_encode", targetEncode, Some(targetEncodeOracle)),
    QueryDef("cu_cdc_chunk", cdcChunk, Some(cdcOracle)),
    QueryDef("cu_chunk_sliding", chunkSliding, Some(chunkOracle)),
    QueryDef("cu_contamination", contamination, Some(contaminationOracle)),
    QueryDef("cu_upsample_epochs", upsampleEpochs, Some(upsampleOracle)),
    QueryDef("ta_token_entropy", tokenEntropy, Some(entropyOracle)),
  )
}
