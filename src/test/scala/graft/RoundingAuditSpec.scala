package graft

import graft.queries.{Graph, StatOps, StreamingGates}
import org.apache.spark.sql.DataFrame

/** The r11 lesson (`gr_modularity`, VERDICT r11 #2): a gate whose final
  * projection `round()`s a DOUBLE produced by several float operations
  * is one FMA-contraction / re-association away from a cross-engine
  * hash flip IF the pre-round value sits on a rounding boundary. The
  * repo's first line of defense is the exact-numerator/single-crossing
  * recipe; for the Pearson-shaped gates where a full exact route would
  * overflow DECIMAL(38), this audit proves the SECOND defense: at gate
  * scale (the driver's sf0.01 verify data) every pre-round double
  * lands at least 10^-(scale+3) away from a HALF-boundary — i.e. ≥1e-9
  * in value units for the round-6 outputs — so any last-ulp engine
  * divergence rounds to the same decimal.
  */
/** Shared boundary-distance probe — also used by Round12GatesSpec's
  * driver-side replays to certify THEIR pre-round values.
  */
object RoundingAudit {
  /** Distance of x from the nearest round-half boundary, in units of
    * 10^-scale (0.5 = dead center of a decimal cell, 0.0 = exactly on
    * a x.xxx5 boundary).
    */
  def boundaryDist(x: Double, scale: Int): Double = {
    val scaled = math.abs(x) * math.pow(10, scale)
    if (scaled.isNaN || scaled.isInfinite || scaled >= 1e15) 0.5
    else {
      val frac = scaled - math.floor(scaled)
      math.abs(frac - 0.5)
    }
  }

  /** True when a value this close to x (same formula, ulp-level
    * divergence at most) must round to the same 6-dp decimal.
    */
  def safe6(x: Double): Boolean = boundaryDist(x, 6) >= 1e-3
}

class RoundingAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val gateDir = "/root/testdata/sf0.01"

  private def boundaryDist(x: Double, scale: Int): Double =
    RoundingAudit.boundaryDist(x, scale)

  private def audit(name: String, df: DataFrame,
      cols: Seq[(String, Int)]): Unit = {
    val rows = df.select(cols.map(c => org.apache.spark.sql.functions
      .col(c._1)): _*).collect()
    assert(rows.nonEmpty, s"$name: audit relation is empty")
    for (row <- rows; ((cname, scale), i) <- cols.zipWithIndex) {
      if (!row.isNullAt(i)) {
        val v = row.getDouble(i)
        val d = boundaryDist(v, scale)
        assert(d >= 1e-3,
          s"$name.$cname = $v sits within 10^-${scale + 3} of a " +
            s"round-$scale boundary (dist $d) — restructure to the " +
            "exact-numerator recipe before this flips an engine hash")
      }
    }
  }

  test("gr_assortativity pre-round value is boundary-safe at gate scale") {
    audit("gr_assortativity", Graph.assortativityRaw(spark, gateDir),
      Seq(("r0", 6)))
  }

  test("ops_cuped pre-round values are boundary-safe at gate scale") {
    audit("ops_cuped", StatOps.cupedRaw(spark, gateDir),
      Seq(("mean_post0", 6), ("mean_post_cuped0", 6), ("theta0", 6),
        ("corr20", 6)))
  }

  test("st_lag_autocorr pre-round values are boundary-safe at gate scale") {
    audit("st_lag_autocorr", StreamingGates.lagAutocorrRaw(spark, gateDir),
      Seq(("ac0", 6)))
  }

  test("st_correlogram pre-round values are boundary-safe at both scales") {
    // ac0 feeds the round-6 output AND the round-9 dominant-period rank
    audit("st_correlogram", StreamingGates.correlogramRaw(spark, gateDir),
      Seq(("ac0", 6), ("ac0", 9)))
  }

  test("st_seasonal_naive pre-round values are boundary-safe at gate scale") {
    audit("st_seasonal_naive", StreamingGates.seasonalNaiveRaw(spark, gateDir),
      Seq(("mn", 6), ("ms", 6), ("mase0", 6)))
  }

  test("public gates equal their raw frames rounded (refactor is a pure split)") {
    // sf0.001 keeps this equivalence check cheap; the raws above ran
    // at gate scale already
    import org.apache.spark.sql.functions._
    val a = Graph.assortativity(spark, sfDir).collect()
    val b = Graph.assortativityRaw(spark, sfDir)
      .select(col("n_sym_edges"), round(col("r0"), 6).as("assortativity"))
      .collect()
    assert(a.toSeq === b.toSeq)
    val c = StatOps.cuped(spark, sfDir).collect()
    val d = StatOps.cupedRaw(spark, sfDir)
      .select(col("arm"), col("n_users"),
        round(col("mean_post0"), 6).as("mean_post"),
        round(col("mean_post_cuped0"), 6).as("mean_post_cuped"),
        round(col("theta0"), 6).as("theta"),
        round(col("corr20"), 6).as("var_reduction"))
      .orderBy(col("arm")).collect()
    assert(c.toSeq === d.toSeq)
  }
}
