package graft

/** Dev helper: run ONE SparkEntry query against an sf dir and dump its
  * result + oracle SQL for a single-query DuckDB compare
  * (`tools/check.py` accepts an out dir with any subset of queries).
  * Usage: runMain graft.RunOne <name> <sfDir> <outDir> */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = Sessions.base()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    val sql = SparkEntry.oracleSql.get(name)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      sql.map(s => s"{${q(name)}: ${q(s)}}").getOrElse("{}"))
    spark.stop()
  }
}
