package graft

/** Scratch main for quick experiments (not part of the engine).
  * Currently: dump oracle SQL for standalone DuckDB syntax checks
  * (see scripts/selfcheck.py for the companion check loop). */
object Playground {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/oracles.json"), json)
    println(s"wrote /tmp/oracles.json with ${SparkEntry.oracleSql.size} oracles; " +
      s"${SparkEntry.queries.size} queries total")
  }
}
