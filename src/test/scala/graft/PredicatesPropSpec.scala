package graft

import org.apache.spark.sql.SaveMode
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.extract.{Predicates, QueryTemplate}
import graft.model._

/** Property tests over the predicate builder (SURVEY §5.3): generated
  * (lower, upper, lastPoint, type) configs always reproduce the reference
  * decision tree (__init__.py:69-94) and the splice is faithful.
  */
object PredicatesPropSpec extends Properties("Predicates") {

  private val genInt = Gen.choose(0L, 100000L).map(_.toString)
  private val genOpt = Gen.option(genInt)

  private def cfg(lo: Option[String], hi: Option[String]) = TableConfig("t",
    replicationMethod = ReplicationMethod.Incremental,
    iterateColumn = Some("c"), iterateColumnType = IterateType.IntCol,
    filterLowerBound = lo, filterUpperBound = hi)

  property("decision tree: bounds → append; watermark → append; neither → 1=1 overwrite") =
    forAll(genOpt, genOpt, genOpt) { (lo, hi, lp) =>
      val (clause, mode) = Predicates.incrementalClause(cfg(lo, hi), lp)
      if (lo.isDefined || hi.isDefined) {
        mode == SaveMode.Append &&
          lo.forall(v => clause.contains(s"c >= $v")) &&
          hi.forall(v => clause.contains(s"c < $v")) &&
          (clause.contains(" AND ") == (lo.isDefined && hi.isDefined))
      } else lp match {
        case Some(v) => mode == SaveMode.Append && clause == s"WHERE c >= $v"
        case None    => mode == SaveMode.Overwrite && clause == "WHERE 1=1"
      }
    }

  property("int literals render bare, datetime quoted") = forAll(genInt) { v =>
    Predicates.renderLiteral(v, IterateType.IntCol) == v &&
      Predicates.renderLiteral(v, IterateType.DatetimeCol) == s"'$v'"
  }

  property("splice replaces every hole and leaves the rest intact") =
    forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (pre, post) =>
      val spliced = QueryTemplate.splice(s"$pre {query_filter} $post", "WHERE 1=1")
      spliced == s"$pre WHERE 1=1 $post"
    }

  property("splice is idempotent when clause has no hole") =
    forAll(genInt) { v =>
      val once = QueryTemplate.splice("SELECT {query_filter}", s"WHERE c >= $v")
      QueryTemplate.splice(once, "WHERE 1=1") == once
    }
}
