package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration;
    // the driver always passes exactly two)
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus)
      // stable micros timestamps in dumped parquet (DuckDB reads them natively)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
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
    // a crashed query must surface as an err row in the driver's
    // correctness artifact, not vanish into stderr (r6 lost two queries'
    // rows that way) — failures accumulate into a sentinel beside the
    // dumps for the driver / local oracle_check to pick up. The sentinel
    // is truncated BEFORE the loop and rewritten after EVERY failure
    // (ADVICE r8: a clean-completion-only write meant a JVM-fatal crash
    // mid-run left a stale sentinel from a prior run — the exact failure
    // mode the sentinel targets — and oracle_check could FAIL queries for
    // stale reasons or still miss the crash).
    val sentinel = Paths.get(s"$outDir/_failed.json")
    val failures = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def writeSentinel(): Unit = Files.writeString(sentinel,
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    writeSentinel() // empty {} up front: any prior run's sentinel is dead
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failures += name -> (s"${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator
              .take(1).mkString.take(300))
          writeSentinel()
        }
      }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
