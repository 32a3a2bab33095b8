package graft

/** Benchmark main. Per-query wall time over EVERY registered query
  * (sorted, stable order), one JSON line on stdout (driver contract).
  *
  * Measurement discipline (VERDICT r1 #7):
  *  - full materialization via a `noop`-format write, so Catalyst cannot
  *    prune projections the way it can under `.count()`;
  *  - fixed (sorted) query order + one untimed warmup pass of the first
  *    query, so JVM/codegen warmup doesn't land in the first measurement;
  *  - failures are surfaced in an `errors` map and excluded from `value`
  *    instead of being blended in as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    // Bench everything (sorted = stable order run-over-run) so per-query
    // timings stay comparable with BENCH_r01, which ran the full set.
    val defs = SparkEntry.queries
    val names = defs.keys.toSeq.sorted

    def runOnce(name: String): Unit = {
      defs(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      // queries that persist intermediates (the dedup family) must not
      // accumulate cache across 2x35 runs; each measurement pays its
      // own persist cost and leaves nothing behind
      spark.catalog.clearCache()
    }

    // Warmup: one untimed pass of EVERY query absorbs JVM/codegen/
    // parquet-footer first-touch cost, so the timed pass measures
    // steady state and stays comparable run-over-run (first-touch
    // noise was +-20% on per-query numbers).
    names.foreach { n =>
      try runOnce(n) catch { case _: Throwable => () }
    }

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // two timed passes, keep the per-query MIN: single-pass numbers on a
    // shared box carry ±20% scheduler/GC noise that min-of-2 mostly
    // removes, so round-over-round comparisons track real plan changes
    names.foreach { name =>
      try {
        val samples = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          runOnce(name)
          (System.nanoTime() - t0) / 1e9
        }
        times(name) = samples.min
      } catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = times.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = times.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
  }
}
