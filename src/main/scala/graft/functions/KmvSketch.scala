package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values sketch as a typed [[Aggregator]]: the buffer is the
  * sorted array of the k smallest DISTINCT 60-bit hashes seen so far.
  *
  * This is the one-pass form of the KMV gate
  * ([[graft.queries.Sketches.kmvDistinct]], which materializes every
  * distinct hash and ranks with a window): here each partition keeps at
  * most k longs and `merge` combines two sketches — so the shuffle
  * ships k values per partition instead of every distinct key. At
  * 100 TB that is the difference between a 2 KB-per-partition exchange
  * and shuffling the key space; it is also the shape a streaming or
  * hierarchical (per-file → per-split → global) rollup needs, because
  * KMV union IS sketch merge.
  *
  * Determinism: insertion order cannot affect the result — the k
  * smallest distinct values of a multiset are order-free, `reduce`
  * and `merge` preserve exactly that invariant (dedup via sorted
  * search, cut at k). SketchesSpec property-tests agreement with the
  * window-based derivation and merge associativity under shuffling.
  */
object KmvSketch extends Aggregator[Long, Array[Long], Array[Long]] {

  val K = 256

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    // saturated and not smaller than the current kth → almost every row
    // at scale takes this O(log k) exit
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present (duplicate key)
    else if (buf.length >= K && h > buf(buf.length - 1)) buf
    else {
      val ins = -pos - 1
      val n = math.min(buf.length + 1, K)
      val out = new Array[Long](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted distinct arrays, cut at K
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length) { i += 1; a(i - 1) }
        else if (i >= a.length) { j += 1; b(j - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (a(i) > b(j)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) } // equal: consume both once
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = implicitly(
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}
