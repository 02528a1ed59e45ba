package graft

import org.apache.logging.log4j.LogManager
import org.scalatest.funsuite.AnyFunSuite

/** Wiring proof for the zero-`ERROR CodeGenerator` invariant (the r6
  * gate-proof standard: a gate that was never seen to fire proves
  * nothing): log a synthetic ERROR on the exact CodeGenerator logger
  * and assert the guard counted it — then reset, so the other suites'
  * afterAll assertions keep guarding REAL fallbacks. Deliberately NOT a
  * SparkSpec (its afterAll asserts count == 0). */
class CodegenGuardSpec extends AnyFunSuite {

  test("guard counts ERROR events on the CodeGenerator logger") {
    CodegenGuard.install()
    val before = CodegenGuard.count
    LogManager.getLogger(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .error("synthetic compile failure (CodegenGuardSpec wiring proof)")
    assert(CodegenGuard.count == before + 1,
      "the appender is not attached to the CodeGenerator logger — " +
        "the invariant would pass vacuously")
    assert(CodegenGuard.report.contains("synthetic compile failure"))
    // retract exactly the synthetic event — a real fallback counted
    // earlier in this JVM must survive for the suites' afterAll gates
    CodegenGuard.retractOneForTest("CodegenGuardSpec wiring proof")
    assert(CodegenGuard.count == before)
  }

  test("WARN events on the logger do not count") {
    CodegenGuard.install()
    val before = CodegenGuard.count
    LogManager.getLogger(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .warn("generated method grew past 8 KB (JIT threshold) — warn only")
    assert(CodegenGuard.count == before,
      "WARN-level codegen chatter (method-size warnings) must not trip " +
        "the ERROR invariant")
  }
}
