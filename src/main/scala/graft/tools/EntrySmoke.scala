package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.base()
    s.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(s).count()
    println(s"ENTRY_ROWS=$n")
    s.stop()
  }
}
