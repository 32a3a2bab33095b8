package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.plans.AsOfJoinExec

/** Micro-benchmark for the [[graft.plans.AsOfJoinExec]] per-row
  * compare (VERDICT r8 #6): isolates the (key, time) ordinal compare —
  * the merge loop's per-row hotspot — from shuffle/sort/projection,
  * and times the interpreted-ordering path against the
  * primitive-specialized path on the exec's common case (long key,
  * timestamp-backed long time) over UnsafeRows, exactly the row shape
  * the exec's `rktProj`/`lktProj` produce.
  *
  * Run: `sbt "runMain graft.AsOfMicroBench"`. Prints a markdown row
  * (captured into SCALE_CURVE.md) plus one JSON line.
  */
object AsOfMicroBench {

  private val Rows = 1 << 20
  private val Passes = 24

  def main(args: Array[String]): Unit = {
    val schema = StructType(Seq(StructField("k", LongType), StructField("t", LongType)))
    val proj = UnsafeProjection.create(schema)
    // deterministic pseudo-random (no Math.random): splitmix64-ish walk
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    val rows: Array[InternalRow] = Array.fill(Rows) {
      proj(new GenericInternalRow(Array[Any](next() & 0xffffL, next()))).copy()
    }

    def run(cmp: (InternalRow, Int, InternalRow, Int) => Int): (Long, Long) = {
      var acc = 0L
      val t0 = System.nanoTime()
      var p = 0
      while (p < Passes) {
        var i = 0
        while (i < Rows - 1) {
          val c = cmp(rows(i), 0, rows(i + 1), 0)
          // mirror the exec: the time compare only runs on key-equal
          // rows there, but timing both per pair keeps the loop honest
          acc += c + cmp(rows(i), 1, rows(i + 1), 1)
          i += 1
        }
        p += 1
      }
      (System.nanoTime() - t0, acc)
    }

    val spec = AsOfJoinExec.ordinalCompare(LongType)
    val interp = AsOfJoinExec.ordinalCompare(LongType, forceInterpreted = true)
    // warmup both paths (JIT), then measure
    run(spec); run(interp)
    val (tSpec, accS) = run(spec)
    val (tInterp, accI) = run(interp)
    require(accS == accI, "comparator paths disagree") // and defeats DCE
    val nCmp = 2L * Passes * (Rows - 1)
    val nsS = tSpec.toDouble / nCmp
    val nsI = tInterp.toDouble / nCmp
    println("| compare path | ns/compare | ratio |")
    println("|---|---|---|")
    println(f"| interpreted ordering | $nsI%.2f | 1.0x |")
    println(f"| primitive specialized | $nsS%.2f | ${nsI / nsS}%.1fx |")
    println(s"""{"metric":"asof_compare_ns","interpreted":$nsI,"specialized":$nsS,"ratio":${nsI / nsS}}""")
  }
}
