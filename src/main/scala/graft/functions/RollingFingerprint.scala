package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined document fingerprint via a polynomial ROLLING hash
  * (Rabin–Karp style), one JIT-compiled pass per row — the fourth native
  * text kernel beside MinHash / ShingleHashes / SimHash64.
  *
  * A `window`-char hash rolls across the character stream in O(1) per
  * position (subtract the outgoing char's highest-power term, multiply,
  * add the incoming char); positions where `(h & mask) == 0` are ANCHORS
  * (expected rate 1/(mask+1)), and the fingerprint is the ordered distinct
  * anchor-window hashes. Because anchors are chosen by local CONTENT, not
  * offset, an edit perturbs only the anchors whose windows overlap it —
  * prepending a sentence to a 10 kB document leaves the rest of the
  * fingerprint intact, where fixed-offset chunking would shift every chunk
  * boundary and share nothing. That shift-invariance is what makes rolling
  * fingerprints the tool for substring-level / containment dedup
  * (quotes, mirrors, boilerplate wrappers), complementing MinHash
  * (set-resemblance) and SimHash (global distance).
  *
  * Deterministic, null-safe, partition-local — embarrassingly parallel;
  * compare/bucket the emitted hashes exactly like the shingle hashes.
  */
case class RollingFingerprint(child: Expression, window: Int, mask: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 0x100000001b3L // FNV prime as the polynomial base (odd)
  // B^(window-1) mod 2^64, for removing the outgoing character's term.
  private val Bpow: Long = {
    var p = 1L; var i = 1
    while (i < window) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.length < window) return new GenericArrayData(Array.emptyLongArray)
    val anchors = new mutable.LinkedHashSet[Long]
    var h = 0L
    var i = 0
    while (i < window) { h = h * B + s.charAt(i); i += 1 }
    if ((h & mask) == 0L) anchors.add(h)
    while (i < s.length) {
      h = (h - s.charAt(i - window) * Bpow) * B + s.charAt(i)
      if ((h & mask) == 0L) anchors.add(h)
      i += 1
    }
    new GenericArrayData(anchors.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  /** Name-per-parameter registration (same rebinding rationale as
    * [[ShingleHashes.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession, window: Int, mask: Long): String = {
    val name = s"graft_rolling_fp_${window}_$mask"
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        exprs => RollingFingerprint(exprs.head, window, mask),
        "built-in")
    name
  }

  def rollingFingerprint(spark: org.apache.spark.sql.SparkSession, text: Column,
      window: Int = 16, mask: Long = 0x3f): Column =
    org.apache.spark.sql.functions.call_function(
      register(spark, window, mask), text)
}
