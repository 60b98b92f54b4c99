package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps one oracle SQL string to a file — fast local iteration on a
  * single query's DuckDB side without paying a full Verify run.
  * Usage: runMain graft.tools.DumpSql <query-key> <out-file>
  */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val sql = graft.SparkEntry.oracleSql(args(0))
    Files.writeString(Paths.get(args(1)), sql)
    println(s"wrote ${sql.length} chars")
  }
}
