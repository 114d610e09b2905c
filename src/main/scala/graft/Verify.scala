package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for local
    // subset checks (the driver always runs with exactly two args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.ts is TIMESTAMP(NANOS); see graft.Tables
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Bake absolute read_parquet() paths in place of bare table names:
    // works whether or not the oracle runner pre-registers views for
    // every table (TESTDATA.md's list omits documents/embeddings).
    // Quoted literals like 'lineitem' stay untouched; an `AS <table>`
    // alias is appended unless the query already aliases the table
    // (DuckDB otherwise auto-aliases every scan "read_parquet" and
    // multi-table joins collide).
    val sqlKeywords = Set("JOIN", "ON", "WHERE", "GROUP", "ORDER", "UNION",
      "LIMIT", "OFFSET", "ASOF", "LEFT", "RIGHT", "INNER", "CROSS", "USING",
      "AND", "OR", "AS", "INTERSECT", "EXCEPT")
    def qualify(sql: String): String =
      Tables.all.foldLeft(sql) { (s, t) =>
        val re = s"(?<!')\\b$t\\b(?!')(\\s*)([A-Za-z_][A-Za-z0-9_]*)?".r
        re.replaceAllIn(s, m => {
          val ws = Option(m.group(1)).getOrElse("")
          val next = Option(m.group(2)).getOrElse("")
          val scan = s"read_parquet('$sfDir/$t.parquet')"
          val aliased =
            if (next.nonEmpty && !sqlKeywords.contains(next.toUpperCase)) scan // explicit alias follows
            else s"$scan AS $t"
          java.util.regex.Matcher.quoteReplacement(s"$aliased$ws$next")
        })
      }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(qualify(v))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
