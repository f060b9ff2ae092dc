package graft.tools

import java.nio.file.{Files, Paths}

/** Write SparkEntry.oracleSql as oracle_sql.json (same escaping as Verify)
  * WITHOUT running any query — lets scripts/check_oracle.py validate a
  * hand-picked subset of OneQuery dumps during iteration. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle entries")
  }
}
