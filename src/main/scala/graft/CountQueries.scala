package graft

/** Dev tool: print the declared query / oracle counts (docs upkeep). */
object CountQueries {
  def main(args: Array[String]): Unit =
    println(s"queries=${SparkEntry.queries.size} " +
      s"oracles=${SparkEntry.oracleSql.size}")
}
