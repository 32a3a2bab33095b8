package graft

import graft.queries.TrainingPrep

/** Driver-side reference checks for the round-14 gates, on the house
  * pattern: every oracle-gated query also proves its algebra against an
  * independently-coded reference at sf0.001, so a shared mistake both
  * engines would replay identically still fails.
  */
class Round14GatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Shared independently-coded BPE reference (ADVICE r14 #4: one copy,
  // used by both the apply and fertility replays): train pair counts on
  // the word vocabulary, take the top-8 merges (count desc, pair asc),
  // apply each rule in rank order with a sequential left-to-right
  // greedy scan (consume two tokens on a match, never re-match the
  // merged token within the same rule pass).
  private def referenceWordsAndEncoder(dir: String)
      : (Map[String, Long], String => Vector[String]) = {
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1))
      .filter(_.length >= 2)
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length - 1) {
      val p = w.substring(i, i + 2)
      pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
    }
    val rules = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(8).map(_._1)
    def applyRule(toks: Vector[String], pair: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) + toks(i + 1) == pair) {
          out += toks(i) + toks(i + 1); i += 2
        } else { out += toks(i); i += 1 }
      }
      out.result()
    }
    val encode = (w: String) =>
      rules.foldLeft(w.map(_.toString).toVector)(applyRule)
    (words, encode)
  }

  test("cu_bpe_apply: tokenization replays an imperative greedy BPE encoder") {
    val got = TrainingPrep.bpeApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.nonEmpty)

    val (words, encode) = referenceWordsAndEncoder(dir)
    val expected = words.toSeq
      .sortBy { case (w, f) => (-f, w) }.take(50).zipWithIndex
      .map { case ((w, f), i) =>
        val toks = encode(w)
        (i + 1L, w, f, toks.length.toLong, toks.mkString("|"))
      }
    assert(got.toSeq === expected)

    // structural pins: tokens reassemble the word; counts agree
    for ((_, word, _, nTok, toks) <- got) {
      val parts = toks.split('|')
      assert(parts.length.toLong === nTok, s"$word token count")
      assert(parts.mkString === word, s"$word reassembly")
    }
  }

  test("cu_bpe_apply: merges actually fire (some word has fewer tokens than chars)") {
    val got = TrainingPrep.bpeApply(spark, dir).collect()
    assert(got.exists(r => r.getLong(3) < r.getString(1).length.toLong),
      "no merge fired on any top word — rule application is vacuous")
  }

  test("cu_bpe_fertility: bucket moments replay the imperative encoder") {
    val got = TrainingPrep.bpeFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    assert(got.nonEmpty)
    val (words, encode) = referenceWordsAndEncoder(dir)
    def nTok(w: String): Long = encode(w).length.toLong
    def bucket(w: String): String =
      if (w.length <= 4) "len_2_4" else if (w.length <= 8) "len_5_8" else "len_9p"
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = words.toSeq.groupBy { case (w, _) => bucket(w) }.toSeq
      .sortBy(_._1).map { case (b, ws) =>
        val nTypes = ws.size.toLong
        val nWords = ws.map(_._2).sum
        val nChars = ws.map { case (w, f) => f * w.length }.sum
        val nSub = ws.map { case (w, f) => f * nTok(w) }.sum
        (b, nTypes, nWords, nChars, nSub,
          r6(nSub.toDouble / nWords), r6(nChars.toDouble / nSub))
      }
    assert(got === expected)
  }
}
