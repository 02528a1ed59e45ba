package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.llm.{CharsetSniff, Mojibake, Sitemap}

/** B36 × B37: the r11 text-ingest operators (sitemap parse, mojibake
  * repair, charset sniff+decode) are row-local `Dataset` transformations
  * (mapPartitions, no aggregation state), so they run UNCHANGED inside
  * Structured Streaming — a crawl frontier is naturally a stream, and
  * frontier seeding / text repair must not need a batch rewrite. Pins
  * streaming ≡ batch including the drop/flag edge rows. Source = parquet
  * file stream, Trigger.AvailableNow (the repo convention). */
class StreamingTextIngestSpec extends SparkSpec {
  import spark.implicits._

  private def stage[T <: Product : org.apache.spark.sql.Encoder](rows: Seq[T]): String = {
    val dir = Files.createTempDirectory("graft-ingest-").toString
    rows.toDS().write.mode("overwrite").parquet(dir)
    dir
  }

  private def ckpt(): String = Files.createTempDirectory("graft-ckpt-").toString

  test("streaming sitemap parse ≡ batch, entry drops included") {
    val docs = Seq(
      1L -> "<urlset><url><loc>https://a/1</loc><priority>0.8</priority></url></urlset>",
      2L -> "<urlset><url><lastmod>2020-01-01</lastmod></url><url><loc>https://a/2</loc></url></urlset>",
      3L -> "not xml")
    val dir = stage(docs)
    val stream = spark.readStream.schema(docs.toDS().schema).parquet(dir)
      .as[(Long, String)]
    val q = Sitemap.entries(stream)
      .writeStream.format("memory").queryName("sitemap_stream")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sitemap_stream")
      .as[Sitemap.UrlRow].collect().sortBy(r => (r.doc_id, r.seq)).toSeq
    val batch = Sitemap.entries(docs.toDS())
      .collect().sortBy(r => (r.doc_id, r.seq)).toSeq
    assert(streamed == batch)
    assert(streamed.map(_.doc_id) == Seq(1L, 2L), "loc-less + junk docs must drop")
  }

  test("streaming mojibake repair ≡ batch, flags included") {
    val clean = "café réel"
    val docs = Seq(
      1L -> "plain",
      2L -> new String(clean.getBytes("UTF-8"), "ISO-8859-1"),
      3L -> clean)
    val dir = stage(docs)
    val stream = spark.readStream.schema(docs.toDS().schema).parquet(dir)
      .as[(Long, String)]
    val q = Mojibake.repairAll(stream)
      .writeStream.format("memory").queryName("mojibake_stream")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt())
      .start()
    q.awaitTermination()
    val streamed = spark.table("mojibake_stream")
      .as[Mojibake.Repaired].collect().sortBy(_.doc_id).toSeq
    val batch = Mojibake.repairAll(docs.toDS()).collect().sortBy(_.doc_id).toSeq
    assert(streamed == batch)
    assert(streamed.map(_.was_mojibake) == Seq(false, true, false))
    assert(streamed(1).text == clean)
  }

  test("streaming charset sniff+decode ≡ batch, fallback class included") {
    val docs = Seq(
      (1L, "text/html; charset=iso-8859-1", "café".getBytes("ISO-8859-1")),
      (2L, "text/plain", "plain café".getBytes("UTF-8")),
      (3L, "text/plain", "caf".getBytes("UTF-8") ++ Array(0xE9.toByte)))
    val dir = stage(docs)
    val stream = spark.readStream.schema(docs.toDS().schema).parquet(dir)
      .as[(Long, String, Array[Byte])]
    val q = CharsetSniff.decodeAll(stream)
      .writeStream.format("memory").queryName("charset_stream")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt())
      .start()
    q.awaitTermination()
    val streamed = spark.table("charset_stream")
      .as[CharsetSniff.Row].collect().sortBy(_.doc_id).toSeq
    val batch = CharsetSniff.decodeAll(docs.toDS()).collect().sortBy(_.doc_id).toSeq
    assert(streamed == batch)
    assert(streamed.map(_.source) == Seq("header", "utf8", "fallback"))
  }

  test("streaming metadata harvest + main-content extraction ≡ batch") {
    val docs = Seq(
      1L -> ("""<html lang="EN"><head><title>T1</title>""" +
        """<meta name="robots" content="noindex">""" +
        """<link rel="canonical" href="/c1"></head>""" +
        """<body><nav><a href="/a">HomePageLink</a> <a href="/b">AboutUsLink</a></nav>""" +
        """<p>Body paragraph one with plenty of characters.</p></body></html>"""),
      2L -> "<p>Hi</p>", // all-bad blocks, empty metadata
      3L -> "no markup at all but long enough to be one good block")
    val dir = stage(docs)
    def stream = spark.readStream.schema(docs.toDS().schema).parquet(dir)
      .as[(Long, String)]

    val mq = graft.llm.Html.metadataAll(stream)
      .writeStream.format("memory").queryName("meta_stream")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt())
      .start()
    mq.awaitTermination()
    val mStreamed = spark.table("meta_stream")
      .as[graft.llm.Html.MetaRow].collect().sortBy(_.doc_id).toSeq
    val mBatch = graft.llm.Html.metadataAll(docs.toDS())
      .collect().sortBy(_.doc_id).toSeq
    assert(mStreamed == mBatch)
    assert(mStreamed(0).noindex && mStreamed(0).canonical == "/c1" &&
      mStreamed(0).lang == "en")

    val cq = graft.llm.Html.mainContentAll(stream)
      .writeStream.format("memory").queryName("content_stream")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt())
      .start()
    cq.awaitTermination()
    val cStreamed = spark.table("content_stream")
      .as[graft.llm.Html.ContentRow].collect().sortBy(_.doc_id).toSeq
    val cBatch = graft.llm.Html.mainContentAll(docs.toDS())
      .collect().sortBy(_.doc_id).toSeq
    assert(cStreamed == cBatch)
    assert(cStreamed(0).content == "Body paragraph one with plenty of characters.")
    assert(cStreamed(1).n_good == 0)
    assert(cStreamed(2).n_good == 1)
  }
}
