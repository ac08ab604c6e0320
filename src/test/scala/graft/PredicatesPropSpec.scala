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

  // Watermark UTC render: for any µs-precision instant (1970–2100, the
  // fixture/real-data range), parsing the rendered string back as a UTC
  // wall clock recovers the exact instant — on any JVM default timezone,
  // including ones whose DST gaps contain the wall clock.
  private val genMicros: Gen[Long] =
    Gen.choose(0L, 4102444800000000L) // 2100-01-01 in epoch µs
  private val zones = Seq("UTC", "America/New_York", "Asia/Kolkata", "Pacific/Chatham")

  property("renderUtc round-trips any instant under any default timezone") =
    forAll(genMicros, Gen.oneOf(zones)) { (us, zone) =>
      val prev = java.util.TimeZone.getDefault
      try {
        java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone(zone))
        val i = java.time.Instant.ofEpochSecond(
          java.lang.Math.floorDiv(us, 1000000L),
          java.lang.Math.floorMod(us, 1000000L) * 1000L)
        val s = graft.extract.Extractor.renderUtc(i)
        val back = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC)
        back == i && s.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?""")
      } finally java.util.TimeZone.setDefault(prev)
    }
}
