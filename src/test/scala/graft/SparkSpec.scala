package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one forked test JVM).
  * Every suite asserts the process-wide zero-`ERROR CodeGenerator`
  * invariant on exit ([[CodegenGuard]]): a janino failure silently
  * falls back to interpreted evaluation (the r14 q203 incident), so
  * the gate has to be an assertion, not a log grep. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sf0001 = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    // reattach in case log4j was reconfigured since install (Spark's
    // logging bootstrap replaces the Configuration once per JVM)
    CodegenGuard.install()
    assert(CodegenGuard.count == 0,
      s"codegen fell back to interpreted evaluation somewhere in this " +
        s"JVM: ${CodegenGuard.report} — find the expression and fix it " +
        "(the q203 class: silent ~50x cpu, correct rows)")
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // AFTER session init: Spark's logging bootstrap replaces the log4j
    // Configuration, detaching any appender installed earlier
    CodegenGuard.install()
    s
  }
}
