package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.loadBaselines — the parser feeding the outlier retry gate.
  * ADVICE r9: the old regex harvest would silently read nested numeric
  * fields ("tasks", "cpu_sec") of any other JSON file as per-query wall
  * records and trigger spurious retries; the parser is now a real JSON
  * parse restricted to registered query names, and accepts both the
  * legacy flat schema and the r10 metrics-record schema. */
class BenchBaselineSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = Files.createTempFile("baseline", ".json")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  private val known = Set("q01_filter_project", "q02_pricing_summary")

  test("legacy flat schema {name: wall} parses; unknown keys are dropped") {
    val path = write("""{"q01_filter_project": 0.435, "q99_not_registered": 1.0}""")
    assert(Bench.loadBaselines(path, known) ===
      Map("q01_filter_project" -> 0.435))
  }

  test("r10 record schema {name: {wall, metrics…}} yields the wall only") {
    val path = write(
      """{"q01_filter_project": {"wall": 0.44, "cpu_sec": 3.2, "tasks": 37},
        | "q02_pricing_summary": {"wall": 1.1, "shuf_w": 12345}}""".stripMargin)
    assert(Bench.loadBaselines(path, known) ===
      Map("q01_filter_project" -> 0.44, "q02_pricing_summary" -> 1.1))
  }

  test("a bench_full.json pointed at by mistake harvests nothing") {
    // the failure ADVICE r9 described: nested numerics must NOT become
    // per-query baselines (none of bench_full's top-level keys are query
    // names, and its nested metric objects carry no "wall" under a query
    // name either)
    val path = write(
      """{"metric":"total","value":147.0,
        | "metrics":{"q01_filter_project":{"tasks":37,"cpu_sec":3.2}},
        | "queries":{"q01_filter_project":0.44}}""".stripMargin)
    assert(Bench.loadBaselines(path, known) === Map.empty)
  }

  test("absent or malformed file disables the retry pass (empty map)") {
    assert(Bench.loadBaselines("/nonexistent/path.json", known) === Map.empty)
    assert(Bench.loadBaselines(write("not json at all {"), known) === Map.empty)
    assert(Bench.loadBaselines(write("[1,2,3]"), known) === Map.empty)
  }

  test("a record entry without a numeric wall is skipped, others kept") {
    val path = write(
      """{"q01_filter_project": {"note": "rebased"},
        | "q02_pricing_summary": {"wall": 1.104}}""".stripMargin)
    assert(Bench.loadBaselines(path, known) ===
      Map("q02_pricing_summary" -> 1.104))
  }
}
