package graft

import graft.extract.JdbcSource
import graft.model._

/** Option-plumbing parity with the reference's connector configuration
  * (__init__.py:26-43, README.md:72-96) — constructed, not executed
  * (zero-egress environment).
  */
class JdbcSourceSpec extends SparkSpec {

  private val conn = ConnectionConfig(host = "ch.example", database = "analytics")

  test("base options carry url/user/password with reference defaults") {
    val o = JdbcSource.baseOptions(conn)
    assert(o("url") == "jdbc:clickhouse://ch.example:8123/analytics")
    assert(o("user") == "default" && o("password") == "")
  }

  test("table mode vs pushed-query mode (A1 vs A2)") {
    val t = TableConfig("events", fetchsize = 50000)
    assert(JdbcSource.tableOptions(t, None, None) ==
      Map("dbtable" -> "events", "fetchsize" -> "50000"))
    val q = JdbcSource.tableOptions(t, Some("SELECT * FROM events WHERE 1=1"), None)
    assert(q("query") == "SELECT * FROM events WHERE 1=1" && !q.contains("dbtable"))
  }

  test("stride partitioning maps to Spark JDBC options; partitionsColumn falls back to iterateColumn") {
    val t = TableConfig("events",
      replicationMethod = ReplicationMethod.Incremental,
      iterateColumn = Some("event_id"), partitionsCount = 8)
    val o = JdbcSource.tableOptions(t, None, bounds = Some(("0", "1000")))
    assert(o("partitionColumn") == "event_id")
    assert(o("lowerBound") == "0" && o("upperBound") == "1000")
    assert(o("numPartitions") == "8")
    // No bounds → no partitioning options (full replication, README.md:93).
    assert(!JdbcSource.tableOptions(t, None, None).contains("partitionColumn"))
  }

  test("reader assembles without touching the network") {
    val r = JdbcSource.reader(spark, conn, TableConfig("events"))
    assert(r != null) // .load() would require a live source
  }
}
