package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{LoggerConfig, Property}

/** Zero-`ERROR CodeGenerator` invariant, as an ASSERTION instead of a
  * log grep (VERDICT r14 maintenance item).
  *
  * Why it exists: when janino fails to compile a generated method (or
  * the method exceeds the JIT limits), Spark logs ONE error on the
  * `...codegen.CodeGenerator` logger and silently falls back to
  * interpreted evaluation — the plan still returns correct rows at
  * ~50× cpu (the r14 q203 incident: a Column-built Morton dilation ran
  * interpreted for three rounds because nothing failed). The invariant
  * is therefore a PERF gate, not a correctness gate, and it must be
  * enforced where perf is measured: the bench run and the test suite.
  *
  * Mechanics: one counting appender attached to the CodeGenerator
  * logger config (created if only a parent config exists), counting
  * ERROR-and-worse events process-wide. `SparkSpec` asserts the count
  * is zero after every suite; `Bench` ships it as `codegen_errors` in
  * both JSON artifacts so the driver record carries the invariant. */
object CodegenGuard {

  private val LoggerName =
    "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"

  private val errors = new AtomicLong(0)
  private val samples = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val AppenderName = "graft-codegen-guard"

  private lazy val appender = {
    val a = new AbstractAppender(
        AppenderName, null, null, true, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit =
        if (event.getLevel.isMoreSpecificThan(Level.ERROR)) {
          errors.incrementAndGet()
          if (samples.size < 3) samples.add(
            Option(event.getMessage).map(_.getFormattedMessage)
              .getOrElse("").linesIterator.take(1).mkString.take(300))
        }
    }
    a.start()
    a
  }

  /** Idempotent ATTACH-IF-MISSING, not attach-once: Spark's own logging
    * bootstrap REPLACES the log4j2 Configuration when the first Spark
    * class logs (an install that ran before SparkSession init is
    * silently detached — observed: the wiring-proof spec passed alone
    * and failed after any Spark suite). Call AFTER session creation;
    * callers that assert also re-call right before reading the count. */
  def install(): Unit = this.synchronized {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val existing = cfg.getLoggerConfig(LoggerName)
    // getLoggerConfig returns the nearest ANCESTOR config when no config
    // exists for the exact name — attaching there would count every
    // Spark error; create the specific config instead (additive, so
    // normal console logging is untouched)
    val target =
      if (existing.getName == LoggerName) existing
      else {
        val lc = new LoggerConfig(LoggerName, existing.getLevel, true)
        cfg.addLogger(LoggerName, lc)
        lc
      }
    if (!target.getAppenders.containsKey(AppenderName)) {
      target.addAppender(appender, Level.ERROR, null)
      ctx.updateLoggers()
    }
  }

  def count: Long = errors.get()

  /** Test hook: CodegenGuardSpec proves the appender wiring by logging a
    * synthetic ERROR on the exact logger, then RETRACTS exactly that one
    * event — a full reset would also erase any REAL fallback counted
    * earlier in the JVM and make every later suite's zero-count
    * assertion vacuous (review finding on the first cut, which zeroed). */
  private[graft] def retractOneForTest(syntheticMarker: String): Unit = {
    errors.decrementAndGet()
    samples.removeIf(_.contains(syntheticMarker))
  }

  def report: String = {
    val head = s"${errors.get()} ERROR CodeGenerator event(s)"
    if (samples.isEmpty) head
    else {
      val it = new java.util.ArrayList[String](samples)
      head + "; first: " + it.toArray.mkString(" | ")
    }
  }
}
