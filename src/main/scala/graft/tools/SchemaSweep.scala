package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** One-shot discovery sweep: print every ORACLED query whose output schema
  * contains a DOUBLE/FLOAT column, as `name -> cols`. Used to seed the
  * pinned allowlist in SchemaDisciplineSpec; not part of the build contract.
  */
object SchemaSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sf = "/root/testdata/sf0.001"
    val oracled = graft.SparkEntry.queries.filter(kv => graft.SparkEntry.oracleSql.contains(kv._1))
    oracled.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val cols = fn(spark, sf).schema.fields.collect {
          case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
        }
        if (cols.nonEmpty) println(s"""DOUBLECOL "$name" -> Seq(${cols.map("\"" + _ + "\"").mkString(", ")}),""")
      } catch {
        case e: Throwable => println(s"ERR $name: ${e.getClass.getSimpleName} ${e.getMessage.take(120)}")
      }
    }
    println("SWEEP_DONE")
    spark.stop()
  }
}
