package graft.extract

import graft.model._
import org.apache.spark.sql.{Column, SaveMode}
import org.apache.spark.sql.functions._

/** Predicate synthesis for incremental extraction — the heart of the reference
  * (mkpipe_extractor_clickhouse/__init__.py:69-94). Two renderings are provided:
  *
  *   - SQL clause strings, for `{query_filter}` template parity (the reference
  *     always goes through SQL text, __init__.py:96-99);
  *   - native Catalyst [[Column]] predicates, the engine's preferred path —
  *     structurally typed, injection-free, and pushed down to the Parquet scan
  *     by Catalyst (`PushedFilters` in the physical plan), unlike the
  *     reference's f-string splicing (__init__.py:76-91).
  *
  * Semantics preserved exactly: bounds are half-open (`>= lower AND < upper`,
  * each independently optional, __init__.py:74-83); the watermark predicate is
  * INCLUSIVE (`>= last_point`, __init__.py:89) so the boundary row is
  * re-extracted every run — at-least-once delivery, dedup is downstream's job.
  */
object Predicates {

  /** Literal rendering switch (reference __init__.py:75-78 vs :80-83):
    * int → bare literal; anything else (datetime) → single-quoted.
    */
  def renderLiteral(v: String, t: IterateType): String = t match {
    case IterateType.IntCol      => v
    case IterateType.DatetimeCol => s"'$v'"
  }

  /** Typed literal for the Column path — no string splicing. */
  def typedLit(v: String, t: IterateType): Column = t match {
    case IterateType.IntCol      => lit(v.toLong)
    case IterateType.DatetimeCol => lit(v).cast("timestamp")
  }

  /** `col >= lower` / `col < upper` fragments, each bound optional
    * (reference __init__.py:73-84).
    */
  def boundParts(
      column: String,
      lower: Option[String],
      upper: Option[String],
      t: IterateType): Seq[String] =
    lower.map(v => s"$column >= ${renderLiteral(v, t)}").toSeq ++
      upper.map(v => s"$column < ${renderLiteral(v, t)}").toSeq

  /** Inclusive watermark fragment (reference __init__.py:86-91). */
  def watermarkPart(column: String, lastPoint: String, t: IterateType): String =
    s"$column >= ${renderLiteral(lastPoint, t)}"

  /** Tautology used on initial/full loads so the splice point stays valid SQL
    * (reference __init__.py:94,119).
    */
  val Tautology = "WHERE 1=1"

  /** The incremental decision tree, verbatim from __init__.py:71-94.
    * Returns (WHERE clause text, sink write mode).
    */
  def incrementalClause(
      t: TableConfig,
      lastPoint: Option[String]): (String, SaveMode) = {
    val col = t.iterateColumn.getOrElse(
      throw new IllegalArgumentException("incremental extraction requires iterateColumn"))
    val bounds = boundParts(col, t.filterLowerBound, t.filterUpperBound, t.iterateColumnType)
    if (bounds.nonEmpty)
      ("WHERE " + bounds.mkString(" AND "), SaveMode.Append)
    else lastPoint match {
      case Some(lp) => ("WHERE " + watermarkPart(col, lp, t.iterateColumnType), SaveMode.Append)
      case None     => (Tautology, SaveMode.Overwrite)
    }
  }

  /** Column-native equivalent of [[incrementalClause]] — same decision tree,
    * but producing a Catalyst predicate Spark can push to the scan.
    */
  def incrementalPredicate(
      t: TableConfig,
      lastPoint: Option[String]): (Column, SaveMode) = {
    val c = col(t.iterateColumn.getOrElse(
      throw new IllegalArgumentException("incremental extraction requires iterateColumn")))
    val ty = t.iterateColumnType
    val bounds: Seq[Column] =
      t.filterLowerBound.map(v => c >= typedLit(v, ty)).toSeq ++
        t.filterUpperBound.map(v => c < typedLit(v, ty)).toSeq
    if (bounds.nonEmpty)
      (bounds.reduce(_ && _), SaveMode.Append)
    else lastPoint match {
      case Some(lp) => (c >= typedLit(lp, ty), SaveMode.Append)
      case None     => (lit(true), SaveMode.Overwrite)
    }
  }
}
