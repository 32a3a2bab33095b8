package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels as Catalyst expressions with `doGenCode`.
  *
  * Why not column expressions or HOFs: a 64-dim dot product written as
  * `element_at` chains builds a ~130-node expression tree whose
  * generated code trips Janino method limits (falling the stage back to
  * interpreted eval), and `aggregate`/`zip_with` HOFs are
  * CodegenFallback by design. Either way the ANN verification hot path
  * pays ~10x. A custom BinaryExpression compiles to a 3-line primitive
  * loop inside whole-stage codegen — the preference order the engine
  * follows everywhere: native functions, then custom Expression, then
  * HOF, then (never) UDF.
  *
  * Null element semantics: embeddings are dense `array<double>` with no
  * null entries; null ARRAYS propagate null (BinaryExpression default).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // Length mismatch → null, never a silently-truncated partial sum: a
  // malformed embedding must surface as a missing score, not a
  // plausible-but-deflated one that skews rankings invisibly.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 32-bit SimHash over a token array, one fused per-row loop.
  *
  * Arithmetic contract (must match the DuckDB oracle bit-for-bit):
  * per-token hash h = fold over Unicode CODE POINTS of
  * (h * 31 + cp) mod 1e9+7 (equals `ascii()`-based column arithmetic in
  * both engines); per-bit ±1 votes over the token multiset; bit j of
  * the result = vote_j > 0. The nested-HOF column form computes the
  * same thing ~8x slower (per-element expression interpretation).
  */
case class SimHash32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val Mod = 1000000007L
  private val Bits = 32

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](Bits)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val s = arr.getUTF8String(t).toString
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % Mod
        i += Character.charCount(cp)
      }
      var j = 0
      while (j < Bits) {
        votes(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      t += 1
    }
    var packed = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) packed |= 1L << j
      j += 1
    }
    packed
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Generator: token array → one row per DISTINCT word-bigram shingle,
  * with the distinct-set size on every row (so similarity joins get
  * |set| without a window or second pass).
  *
  * Why custom: the column-expression form
  * (`transform`+`element_at` bigrams → `array_distinct` → `explode`)
  * pays per-element interpreted-HOF overhead (~6µs/element measured —
  * 1.8s per pass at sf0.1); this is one compiled loop with a hash set.
  */
case class BigramShingles(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_shingles requires array<string>, got ${other.simpleString}")
  }

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_sh", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("sh", org.apache.spark.sql.types.StringType)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    val set = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i < n - 1) {
      set.add(org.apache.spark.unsafe.types.UTF8String.concatWs(
        org.apache.spark.unsafe.types.UTF8String.fromString(" "),
        arr.getUTF8String(i), arr.getUTF8String(i + 1)))
      i += 1
    }
    val nSh = set.size
    val it = set.iterator()
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): org.apache.spark.sql.catalyst.InternalRow =
        org.apache.spark.sql.catalyst.InternalRow(nSh, it.next())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Width-parameterized sibling of [[BigramShingles]]: distinct
  * word-w-gram shingles per doc as generator rows (n_sh, sh), set size
  * first so joins can size-filter before any explode-side shuffle.
  * Longer shingles are the containment family's working width (Broder
  * 1997 used ~10-grams): on a small-vocabulary corpus bigram df is
  * huge and an inverted index over bigrams degenerates toward
  * quadratic, while w >= 4 keeps shingle frequency — and with it
  * candidate volume — near the true-pair count.
  */
case class NgramShingles(child: Expression, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(width >= 2, s"ngram_shingles width must be >= 2, got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles requires array<string>, got ${other.simpleString}")
  }

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_sh", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("sh", org.apache.spark.sql.types.StringType)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Iterator.empty
    val n = arr.numElements()
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val set = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i <= n - width) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](width)
      var j = 0
      while (j < width) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      set.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts.toIndexedSeq: _*))
      i += 1
    }
    val nSh = set.size
    val it = set.iterator()
    new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): org.apache.spark.sql.catalyst.InternalRow =
        org.apache.spark.sql.catalyst.InternalRow(nSh, it.next())
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registration: once per session (idempotent) for local use, plus the
  * `spark.sql.extensions=graft.functions.GraftExtensions` path for a
  * real cluster.
  */
object VectorFunctions {

  type Builder = Seq[Expression] => Expression

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))),
    (FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (children: Seq[Expression]) => SimHash32(children.head)),
    (FunctionIdentifier("bigram_shingles"),
      new ExpressionInfo(classOf[BigramShingles].getName, "bigram_shingles"),
      (children: Seq[Expression]) => BigramShingles(children.head)),
    (FunctionIdentifier("ngram_shingles"),
      new ExpressionInfo(classOf[NgramShingles].getName, "ngram_shingles"),
      (children: Seq[Expression]) => NgramShingles(children(0),
        children(1).eval().asInstanceOf[Int])),
    // Spark's NATIVE BloomFilter sketch pair (the machinery behind
    // runtime row-level filtering), surfaced as session functions so
    // the sketch family's production twin builds its membership index
    // as a distributed TypedImperativeAggregate and probes it with the
    // codegen'd might_contain — no per-row md5, no driver-side sketch
    // loop. Catalyst ships them unregistered; this injection is the
    // documented extension point (same jar, public constructors).
    (FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))),
    (FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))),
  )

  def register(spark: SparkSession): Unit = {
    functions.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ExistsRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ExistsRewrite
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }

  /** Dot product of two `array<double>` columns (codegen'd loop). The
    * caller must have run [[register]] on the session (Sessions.local
    * does; query fns re-register defensively — it is idempotent).
    */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.ExistsRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
