package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.CharNgrams
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the [[graft.functions.CharNgrams]] generator kernel:
  * row count, positions, window contents, and the reconstruction identity
  * (overlapping n-grams re-assemble the input) for arbitrary strings and
  * window sizes — the algebra `text_char_ngrams` and the SQL LATERAL VIEW
  * rely on.
  */
object CharNgramsPropSpec extends Properties("CharNgrams") {

  private def grams(s: String, n: Int): Seq[(Int, String)] = {
    val expr = CharNgrams(BoundReference(0, StringType, nullable = true), Literal(n))
    expr.eval(InternalRow(UTF8String.fromString(s))).iterator.toSeq
      .map(r => (r.getInt(0), r.getUTF8String(1).toString))
  }

  // ASCII-only generator: the kernel indexes by Java char, and the fixture
  // contract (like the oracle compare) is ASCII text; surrogate-pair
  // semantics are out of scope by design.
  private val genStr: Gen[String] = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
  private val genN: Gen[Int] = Gen.choose(1, 8)

  property("emits exactly max(len - n + 1, 0) rows with 0-based consecutive positions") =
    forAll(genStr, genN) { (s, n) =>
      val g = grams(s, n)
      g.length == math.max(s.length - n + 1, 0) &&
        g.map(_._1) == g.indices.toList
    }

  property("every gram is the n-char window at its position") =
    forAll(genStr, genN) { (s, n) =>
      grams(s, n).forall { case (i, gr) => gr == s.substring(i, i + n) }
    }

  property("overlapping grams reconstruct the input (first chars + last gram's tail)") =
    forAll(genStr, genN) { (s, n) =>
      val g = grams(s, n)
      g.isEmpty || (g.dropRight(1).map(_._2.head).mkString + g.last._2) == s
    }

  property("null and undersized inputs emit nothing") =
    forAll(genN) { n =>
      val expr = CharNgrams(BoundReference(0, StringType, nullable = true), Literal(n))
      expr.eval(InternalRow(null.asInstanceOf[AnyRef])).iterator.isEmpty &&
        grams("x" * (n - 1), n).isEmpty
    }
}
