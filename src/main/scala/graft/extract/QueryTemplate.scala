package graft.extract

import java.nio.file.{Files, Paths}
import graft.model.TableConfig

/** `{query_filter}` template splice (reference:
  * mkpipe_extractor_clickhouse/__init__.py:45-54 resolve, :96-97,118-119 splice;
  * semantics README.md:63-66). A custom query is either inline
  * (`customQuery`) or loaded from `<sqlDir>/<customQueryFile>`; the literal
  * `{query_filter}` hole is replaced with the generated WHERE clause (or
  * `WHERE 1=1` on initial/full loads so the SQL stays valid).
  */
object QueryTemplate {
  val Hole = "{query_filter}"

  def splice(template: String, whereClause: String): String =
    template.replace(Hole, whereClause)

  /** Inline custom_query wins over custom_query_file (reference __init__.py:46-47). */
  def resolve(t: TableConfig, sqlDir: String = "./sql"): Option[String] =
    t.customQuery.orElse(
      t.customQueryFile.map(f => Files.readString(Paths.get(sqlDir, f))))
}
