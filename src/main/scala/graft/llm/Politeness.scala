package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl politeness scheduling — turning an unordered URL frontier into
  * per-host fetch slots. A polite crawler fetches one URL per host per
  * `delay` seconds (the de-facto `Crawl-delay` extension robots.txt
  * carries next to q151's RFC 9309 rules), so the planning problem is:
  * within each host, sequence the URLs deterministically and space them
  * `delay` apart; across hosts, everything is independent.
  *
  * Spark shape: one hash partition by host feeds BOTH the delay join
  * and the `row_number` window — per-host sequencing is the
  * parallelism unit, so the single shuffle is inherent, not
  * incidental. A mega-host (the Wikipedia partition) is a genuine skew
  * key, but politeness makes per-host work SERIAL by definition — the
  * skewed partition is exactly the crawl-time bottleneck the schedule
  * itself encodes, and no salting can parallelize what the protocol
  * serializes. Hosts absent from the delay table get `defaultDelay`.
  */
object Politeness {

  /** `frontier(host, url, …)` × `delays(host, delay_sec)` →
    * frontier columns + `fetch_at = start + slot * delay`.
    * URLs are sequenced per host in binary string order (deterministic
    * on both engines; canonicalized URLs are unique within a host). */
  def schedule(frontier: DataFrame, delays: DataFrame, start: Long,
      defaultDelay: Int = 1): DataFrame = {
    val w = Window.partitionBy("host").orderBy("url")
    val slot: Column = row_number().over(w) - 1
    frontier
      .join(delays.select(col("host"), col("delay_sec")), Seq("host"), "left")
      .withColumn("fetch_at",
        (lit(start) + slot.cast("long") *
          coalesce(col("delay_sec"), lit(defaultDelay)).cast("long"))
          .cast("long"))
      .drop("delay_sec")
  }
}
