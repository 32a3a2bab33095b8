package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the whole-operator Catalyst extension (the
  * preference order's rung (c): custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`, registered via `SparkSessionExtensions`), for the
  * one reference-adjacent operator Spark genuinely lacks as a node:
  * attach to each left row the LATEST right row with
  * `right.time <= left.time` for the same key (DuckDB/kdb ASOF JOIN).
  *
  * Why a physical operator when [[graft.queries.AsOfJoin.asOf]]'s
  * union+window composition already computes it with one shuffle: the
  * composition must co-shuffle the UNION — every left row travels
  * through the window sort carrying the right payload slot, and the
  * window's running `last()` state is evaluated per row. The native
  * exec declares the textbook sort-merge contract instead —
  * `ClusteredDistribution` per side (each side shuffles only ITSELF)
  * and `(key, time)` sort — then streams both sides once with O(1)
  * state (the current candidate row), emitting left rows in their
  * incoming order. At 100 TB that means: the big fact never unions
  * with the state table, AQE sizes each side's exchange independently,
  * and the output keeps the left side's partitioning+ordering for
  * downstream reuse (`outputPartitioning`/`outputOrdering` below).
  *
  * Semantics (same contract as the composition and the DuckDB oracle):
  * `<=` inclusive; right rows with null key or null time never match;
  * a null-keyed or null-timed left row emits null payload; the right
  * side should be unique per (key, time) — among equal times the
  * LAST in sort order wins, matching the composition's
  * (time, side)-ordered `last()`.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Injected by
  * `GraftExtensions` (`injectPlannerStrategy`) and by
  * `VectorFunctions.register` for ad-hoc sessions.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, p) =>
      AsOfJoinExec(lk, rk, lt, rt, p, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of: both children hash-clustered on their key and
  * sorted by (key, time); one forward pass per partition holding only
  * the latest visible right row. Left rows stream through unmodified
  * (the exec preserves the left child's partitioning and ordering).
  *
  * Per-row compares are SPECIALIZED to the physical primitive for the
  * common key/time types ([[AsOfJoinExec.ordinalCompare]]): a
  * (long key, timestamp time) merge reads `getLong` and compares two
  * primitives — no boxing, no interpreted-ordering virtual dispatch.
  * Measured by `graft.AsOfMicroBench` (compare isolated from
  * shuffle/sort/projection over UnsafeRows): specialized ≈15 ns vs
  * ≈600 ns interpreted (~40× — the interpreted ordering boxes both
  * operands per call) — recorded in SCALE_CURVE.md. Non-primitive types
  * fall back to the interpreted ordering unchanged. Whole-stage
  * codegen over a custom binary node would additionally fuse the
  * projections; the compare was the per-row hotspot, and the
  * projections are already `UnsafeProjection`s (code-generated
  * expression evaluation), so the remaining interpreter overhead is
  * the iterator glue — acceptable until profiling says otherwise.
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private val payloadOut: Seq[Attribute] = payload.map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // left rows pass through in order — expose that to the parent so a
  // downstream agg/join on the same key reuses the exchange and sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // capture fields as locals: the partition closure must not drag
    // the whole SparkPlan tree across serialization
    val lOut = left.output
    val rOut = right.output
    val pOut = payloadOut
    val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
    val pAttrs = payload
    val outAttrs = output
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lktProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rktProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      val rPayProj = UnsafeProjection.create(pAttrs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ pOut)
      val keyCmp = AsOfJoinExec.ordinalCompare(keyDt)
      val timeCmp = AsOfJoinExec.ordinalCompare(timeDt)
      val nullPayload = new GenericInternalRow(pAttrs.size)
      val joined = new JoinedRow

      var rRow: InternalRow = null
      var cand: InternalRow = null      // copied payload of best-so-far
      var candKT: InternalRow = null    // its copied (key, time)

      def advanceRightTo(lkt: InternalRow): Unit = {
        var done = false
        while (!done) {
          if (rRow == null) { rRow = if (rIter.hasNext) rIter.next() else null; done = rRow == null }
          if (!done && rRow != null) {
            val rkt = rktProj(rRow)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
              rRow = null // skip unmatched-able rows
            } else {
              val c = keyCmp(rkt, 0, lkt, 0)
              if (c < 0) {
                rRow = null // sorted: this key can never match again
              } else if (c == 0 && timeCmp(rkt, 1, lkt, 1) <= 0) {
                cand = rPayProj(rRow).copy()
                candKT = rkt.copy()
                rRow = null
              } else {
                done = true // same key future time, or a later key: stop
              }
            }
          }
        }
      }

      lIter.map { lRow =>
        val lkt = lktProj(lRow)
        val matched =
          if (lkt.isNullAt(0) || lkt.isNullAt(1)) null
          else {
            advanceRightTo(lkt)
            if (cand != null && !candKT.isNullAt(0) &&
              keyCmp(candKT, 0, lkt, 0) == 0) cand
            else null
          }
        resultProj(joined(lRow, if (matched == null) nullPayload else matched))
      }
    }
  }
}

object AsOfJoinExec {
  import org.apache.spark.sql.types._

  /** Null-UNSAFE ordinal comparator (callers null-check first — the
    * merge loop already filters null keys/times on both sides),
    * specialized to the physical primitive for fixed-width types so
    * the hot compare is two unboxed reads + a primitive compare. The
    * interpreted fallback covers everything else (strings, decimals),
    * exactly as before the specialization.
    */
  private[graft] def ordinalCompare(dt: DataType,
      forceInterpreted: Boolean = false): (InternalRow, Int, InternalRow, Int) => Int = {
    def interpreted = {
      val ord = TypeUtils.getInterpretedOrdering(dt)
      (a: InternalRow, ai: Int, b: InternalRow, bi: Int) =>
        ord.compare(a.get(ai, dt), b.get(bi, dt))
    }
    if (forceInterpreted) interpreted
    else dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (a, ai, b, bi) => java.lang.Long.compare(a.getLong(ai), b.getLong(bi))
      case IntegerType | DateType =>
        (a, ai, b, bi) => java.lang.Integer.compare(a.getInt(ai), b.getInt(bi))
      case ShortType =>
        (a, ai, b, bi) => java.lang.Short.compare(a.getShort(ai), b.getShort(bi))
      case ByteType =>
        (a, ai, b, bi) => java.lang.Byte.compare(a.getByte(ai), b.getByte(bi))
      case DoubleType =>
        (a, ai, b, bi) => java.lang.Double.compare(a.getDouble(ai), b.getDouble(bi))
      case FloatType =>
        (a, ai, b, bi) => java.lang.Float.compare(a.getFloat(ai), b.getFloat(bi))
      case _ => interpreted
    }
  }
}
