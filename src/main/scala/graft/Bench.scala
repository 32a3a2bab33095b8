package graft

/** Benchmark main. Per-query wall time over EVERY registered query
  * (sorted, stable order), one JSON line on stdout (driver contract).
  *
  * Measurement discipline (VERDICT r1 #7, ADVICE r3 #5):
  *  - full materialization via a `noop`-format write, so Catalyst cannot
  *    prune projections the way it can under `.count()`;
  *  - fixed (sorted) query order + one untimed warmup pass, so
  *    JVM/codegen warmup doesn't land in the first measurement;
  *  - caches cleared after every run: each sample pays its own persist
  *    cost and leaves nothing behind (samples are like-for-like);
  *  - BOTH raw samples are recorded in `samples` alongside the min in
  *    `queries`, so cross-round comparisons can be made on matching
  *    methodology (ADVICE r3: min-of-2 vs r1/r2 single-pass);
  *  - failures are surfaced in an `errors` map and excluded from `value`
  *    instead of being blended in as fake timings.
  *
  * Diagnosis knobs (BENCH_r03 showed position-correlated swings on
  * unchanged queries):
  *  - SPARK_GRAFT_BENCH_ONLY: comma-separated query subset;
  *  - SPARK_GRAFT_BENCH_ORDER: sorted (default) | reverse.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    val defs = SparkEntry.queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val sortedNames = defs.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val names = sys.env.getOrElse("SPARK_GRAFT_BENCH_ORDER", "sorted") match {
      case "reverse" => sortedNames.reverse
      case _         => sortedNames
    }

    def runOnce(name: String): Unit = {
      defs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      // queries that persist intermediates (the dedup family) must not
      // accumulate cache across runs; each measurement pays its own
      // persist cost and leaves nothing behind
      spark.catalog.clearCache()
    }

    // Warmup: one untimed pass of EVERY query absorbs JVM/codegen/
    // parquet-footer first-touch cost, so the timed passes measure
    // steady state and stay comparable run-over-run (first-touch
    // noise was +-20% on per-query numbers).
    names.foreach { n =>
      try runOnce(n) catch { case _: Throwable => () }
    }

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val raw = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // two timed passes per query; headline is the MIN (single-pass numbers
    // on a shared box carry ±20% scheduler/GC noise), but both samples are
    // reported so methodology changes never hide in the aggregate
    names.foreach { name =>
      try {
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          runOnce(name)
          (System.nanoTime() - t0) / 1e9
        }
        times(name) = samples.min
        raw(name) = samples
      } catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def d3(v: Double): String = f"$v%.3f".replace(",", ".")
    // Full-precision raw samples go on their OWN line, printed FIRST:
    // the driver keeps only the last ~2000 chars of stdout, and in r4
    // the samples map pushed the headline queries/value out of that
    // window (BENCH_r04.json tail starts mid-samples). The contract
    // line below is compact (3-decimal minima, ~1.4 KB for 55 queries)
    // and printed LAST so the tail always contains it whole.
    val ss = raw.map { case (k, v) => s"${jstr(k)}:${v.mkString("[", ",", "]")}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"samples","unit":"sec","samples":$ss}""")
    val qs = times.map { case (k, v) => s"${jstr(k)}:${d3(v)}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.values.sum
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
