package graft.udf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise running sum + count for a fixed-dimension vector mean. */
final case class VecSumBuf(sum: Array[Double], n: Long)

/** Typed Aggregator computing the element-wise mean of `array<float>`
  * vectors — the scale-clean centroid builder for IVF-style ANN indexes.
  *
  * The naive formulation (posexplode every vector → groupBy(cell, pos) →
  * avg → re-assemble) multiplies the shuffle by the vector dimensionality
  * (64× here): at 100 TB of embeddings that is a dead stage. This buffer is
  * one `dim`-length double array + count per GROUP — partial aggregation
  * (map-side combine) sums vectors locally, merge adds two arrays, and the
  * shuffle carries one buffer per (partition, cell), independent of row
  * count. Same shape as [[StableMean]]: reduce/merge/finish with a compact
  * buffer, registered through `functions.udaf`.
  *
  * Empty input finishes to an empty array (no cell has zero members in
  * practice — groupBy only materializes observed keys).
  */
object VectorMean extends Aggregator[Seq[Float], VecSumBuf, Seq[Double]] {

  def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)

  def reduce(b: VecSumBuf, v: Seq[Float]): VecSumBuf =
    if (v == null) b
    else if (b.n == 0L) {
      val s = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { s(i) = v(i).toDouble; i += 1 }
      VecSumBuf(s, 1L)
    } else {
      // In-place accumulation: the buffer object is owned by the aggregate
      // operator between updates, so mutating the array avoids one
      // allocation per input row.
      val s = b.sum
      var i = 0
      while (i < s.length) { s(i) += v(i).toDouble; i += 1 }
      VecSumBuf(s, b.n + 1L)
    }

  def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf =
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val s = a.sum
      var i = 0
      while (i < s.length) { s(i) += b.sum(i); i += 1 }
      VecSumBuf(s, a.n + b.n)
    }

  def finish(b: VecSumBuf): Seq[Double] =
    if (b.n == 0L) Seq.empty
    else {
      val out = new Array[Double](b.sum.length)
      var i = 0
      while (i < out.length) { out(i) = b.sum(i) / b.n; i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

  def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
