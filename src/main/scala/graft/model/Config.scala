package graft.model

/** Connection parameters, mirroring the reference extractor's
  * ConnectionConfig surface (reference: mkpipe_extractor_clickhouse/__init__.py:18-24,
  * README.md:17-26). Defaults match the reference (port 8123, user "default",
  * empty password). The engine reads Parquet fixtures, but the config layer keeps
  * the full connection surface so a live JDBC/native source could be dropped in.
  */
final case class ConnectionConfig(
    host: String = "localhost",
    port: Int = 8123,
    user: String = "default",
    password: String = "",
    database: String = "default",
    /** Full JDBC URL override — when set, wins over the host/port/database
      * ClickHouse form (lets any JDBC engine, e.g. embedded Derby in tests,
      * ride the same reader plumbing).
      */
    jdbcUrl: Option[String] = None,
)

/** Replication strategy (reference: __init__.py:71,116; README.md:105). */
sealed trait ReplicationMethod
object ReplicationMethod {
  case object Full extends ReplicationMethod
  case object Incremental extends ReplicationMethod
}

/** Literal-rendering type for the iterate column (reference: __init__.py:75-91,
  * README.md:108): Int renders bare numeric literals, Datetime renders quoted
  * string literals. The reference treats any non-"int" value as datetime.
  */
sealed trait IterateType
object IterateType {
  case object IntCol extends IterateType
  case object DatetimeCol extends IterateType

  def fromString(s: String): IterateType =
    if (s.equalsIgnoreCase("int")) IntCol else DatetimeCol
}

/** Per-table extraction config (reference: fields consumed at __init__.py:45-122;
  * full parameter table README.md:100-116). `partitionsColumn` defaults to
  * `iterateColumn` when unset (README.md:109); `partitionsCount` default 10,
  * `fetchsize` default 100000 (README.md:110-111).
  */
final case class TableConfig(
    name: String,
    targetName: Option[String] = None,
    replicationMethod: ReplicationMethod = ReplicationMethod.Full,
    iterateColumn: Option[String] = None,
    iterateColumnType: IterateType = IterateType.IntCol,
    filterLowerBound: Option[String] = None,
    filterUpperBound: Option[String] = None,
    partitionsColumn: Option[String] = None,
    partitionsCount: Int = 10,
    fetchsize: Int = 100000,
    customQuery: Option[String] = None,
    customQueryFile: Option[String] = None,
    writePartitions: Option[Int] = None,
    tags: Map[String, String] = Map.empty,
    passOnError: Boolean = false,
) {
  /** README.md:109 — partitions column falls back to the iterate column. */
  def effectivePartitionsColumn: Option[String] =
    partitionsColumn.orElse(iterateColumn)
  def effectiveTargetName: String = targetName.getOrElse(name)
}
