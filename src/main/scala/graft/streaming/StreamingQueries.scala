package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.queries.Q

/** Streaming contract Q23–Q25 (SURVEY §2.8/§2.9, B37–B44).
  *
  * Each query has two renderings with identical semantics:
  *  - a *batch* DataFrame (what `Verify` dumps; DuckDB-oracle checked);
  *  - a *streaming* run over the same events table replayed through
  *    `readStream` with `Trigger.AvailableNow`, whose closed result must equal
  *    the batch result (asserted in `StreamingParitySpec`).
  *
  * The batch↔stream equality is exactly Structured Streaming's contract: a
  * streaming query is the incrementalized execution of the same logical plan.
  * Watermarks make state bounded at scale — at 100 TB/day of events the
  * windowed aggregations keep only open windows in the state store.
  */
object StreamingQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** Shared transform: tumbling 1h window per event_type (B39). */
  private def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(dec(col("value"))), 2).cast("double").as("sum_value"))
      .select(
        col("w.start").cast("timestamp_ntz").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Shared transform: sliding 1h/30m window per event_type (B40). */
  private def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(dec(col("value"))), 2).cast("double").as("sum_value"))
      .select(
        col("w.start").cast("timestamp_ntz").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  // ---------------------------------------------------------------- Q23
  val q23 = Q(
    "q23_tumbling_window",
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
      |       event_type, count(*) AS cnt,
      |       CAST(CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
    tumbling(Tables(s, dir, "events")).orderBy("window_start", "event_type")
  }

  // ---------------------------------------------------------------- Q24
  // Sliding 1h/30m: every event falls in exactly two 30m-aligned windows; the
  // oracle materializes both via time_bucket and its 30m-shifted twin.
  val q24 = Q(
    "q24_sliding_window",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      |w AS (
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value FROM e
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type, value FROM e
      |)
      |SELECT window_start, event_type, count(*) AS cnt,
      |       CAST(CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
    sliding(Tables(s, dir, "events")).orderBy("window_start", "event_type")
  }

  // ---------------------------------------------------------------- Q25
  val q25 = Q(
    "q25_stream_dedup",
    "SELECT count(DISTINCT event_id) AS n_distinct FROM events") { (s, dir) =>
    Tables(s, dir, "events")
      .select("event_id").distinct()
      .agg(count(lit(1)).as("n_distinct"))
  }

  // ---------------------------------------------------------------- Q50
  // Session windows (B41) as a batch query against a gaps-and-islands
  // oracle: a new session starts when the gap since the previous event
  // reaches the inactivity timeout (session_window's [start, end) contract:
  // an event exactly `gap` later is a NEW session, hence >=); end = last
  // event + gap. This closes the one streaming operator that was spec-only
  // in round 1.
  val q50 = Q(
    "q50_session_window",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (SELECT user_id, ts,
      |             CASE WHEN lag(ts) OVER w IS NULL
      |                  OR ts >= lag(ts) OVER w + INTERVAL '30 minutes'
      |                  THEN 1 ELSE 0 END AS new_s
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts,
      |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                              ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM m)
      |SELECT min(ts) AS session_start,
      |       max(ts) + INTERVAL '30 minutes' AS session_end,
      |       user_id, count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    sessionWindows(Tables(s, dir, "events"), "30 minutes")
      .select(
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("user_id"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  // ---------------------------------------------------------------- Q59
  // B43 value-checked: the mapGroupsWithState state machine run over the
  // batch events table (each group visited once) against a plain GROUP BY
  // oracle — count/min/max only, which are order-independent and FP-exact
  // (see Stateful.userExtremes).
  val q59 = Q(
    "q59_stateful_user_stats",
    """SELECT user_id, count(*) AS n_events,
      |       min(value) AS min_value, max(value) AS max_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    graft.streaming.Stateful.userExtremes(Tables(s, dir, "events"))
      .toDF()
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- Q67
  // Stream-stream interval join (B37/B38 family): view→click attribution —
  // each view joined to the same user's clicks landing within the next 6
  // hours. The batch rendering is oracle-checked; q67Streaming runs the
  // SAME join as a genuine watermarked stream-stream join (both sides are
  // unbounded, state-store-buffered) and StreamingParitySpec asserts
  // equality. At 100 TB/day the time-range condition is what makes this
  // runnable: the watermark + range bound lets Spark evict buffered rows
  // older than (watermark - 6h), so state is a sliding 6h slice per side,
  // not the whole history.
  private def viewClickJoin(
      views: DataFrame, clicks: DataFrame, joinType: String = "inner"): DataFrame =
    views.join(
        clicks,
        col("user_id") === col("c_user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr("INTERVAL 6 HOURS"),
        joinType)
      .select(
        col("user_id"), col("view_id"), col("click_id"),
        col("view_ts").cast("timestamp_ntz").as("view_ts"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"))

  private def viewSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))

  private def clickSide(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("ts").as("click_ts"))

  val q67 = Q(
    "q67_stream_stream_join",
    """WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS view_ts
      |           FROM events WHERE event_type = 'view'),
      |c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      |      FROM events WHERE event_type = 'click')
      |SELECT v.user_id, view_id, click_id, view_ts, click_ts
      |FROM v JOIN c ON v.user_id = c.user_id
      |             AND click_ts >= view_ts
      |             AND click_ts < view_ts + INTERVAL '6 hours'
      |ORDER BY view_id, click_id""".stripMargin) { (s, dir) =>
    val events = Tables(s, dir, "events")
    viewClickJoin(viewSide(events), clickSide(events))
      .orderBy("view_id", "click_id")
  }

  // ---------------------------------------------------------------- Q81
  // The left-outer rendering of q67 — the streaming semantics only a
  // watermark makes possible (null-extension on state eviction). The batch
  // rendering here is the oracle-checked contract; q67OuterStreaming is the
  // genuine watermarked stream whose matched-rows ≡ this inner part and
  // whose null-extensions ≡ this query's unmatched views older than the
  // eviction horizon (both asserted in StreamingParitySpec). A view is
  // either matched (only non-null click rows) or unmatched (exactly one
  // null row), so the (view_id, click_id) order is engine-unambiguous
  // despite the nullable key.
  val q81 = Q(
    "q81_stream_stream_outer",
    """WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS view_ts
      |           FROM events WHERE event_type = 'view'),
      |c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      |      FROM events WHERE event_type = 'click')
      |SELECT v.user_id, view_id, click_id, view_ts, click_ts
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |                  AND click_ts >= view_ts
      |                  AND click_ts < view_ts + INTERVAL '6 hours'
      |ORDER BY view_id, click_id""".stripMargin) { (s, dir) =>
    q67OuterBatch(s, dir).orderBy("view_id", "click_id")
  }

  // ---------------------------------------------------------------- Q91
  // The FULL outer rendering — both join-mode extremes of the watermarked
  // stream-stream join in the oracle contract (q67 inner, q81 left, q91
  // full): unmatched views AND unmatched clicks null-extend on state
  // eviction. Both sort keys are nullable here, and the engines disagree
  // on default null placement (Spark NULLS FIRST asc, DuckDB NULLS LAST) —
  // the oracle pins NULLS FIRST explicitly to match Spark's asc default.
  val q91 = Q(
    "q91_stream_stream_full",
    """WITH v AS (SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS view_ts
      |           FROM events WHERE event_type = 'view'),
      |c AS (SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      |      FROM events WHERE event_type = 'click')
      |SELECT v.user_id AS view_user_id, c.user_id AS click_user_id,
      |       view_id, click_id, view_ts, click_ts
      |FROM v FULL JOIN c ON v.user_id = c.user_id
      |                  AND click_ts >= view_ts
      |                  AND click_ts < view_ts + INTERVAL '6 hours'
      |ORDER BY view_id NULLS FIRST, click_id NULLS FIRST""".stripMargin) { (s, dir) =>
    val events = Tables(s, dir, "events")
    viewSide(events).join(
        clickSide(events),
        col("user_id") === col("c_user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr("INTERVAL 6 HOURS"),
        "full_outer")
      .select(
        col("user_id").as("view_user_id"),
        col("c_user_id").as("click_user_id"),
        col("view_id"), col("click_id"),
        col("view_ts").cast("timestamp_ntz").as("view_ts"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"))
      .orderBy(col("view_id").asc_nulls_first, col("click_id").asc_nulls_first)
  }

  // --------------------------------------------------------------- Q116
  // Index-backed streaming ingest dedup (B42 + DedupIndex): the foreachBatch
  // ingest loop ([[StreamingDedup]]) run as its batch-sequential rendering —
  // the SAME `ingestBatch` code the streaming sink executes per micro-batch
  // (StreamingDedupSpec pins streaming ≡ this composition, the q67/q81/q91
  // convention). History = doc_id%4==0; three batches carry the remaining
  // thirds PLUS planted exact row copies exercising all three duplicate
  // regimes: vs-history (%8==0 rows into batch 1), within-batch (%8==1 rows
  // doubled in batch 1), vs-earlier-batch (%8==5 rows of batch 1 replayed in
  // batch 2). Copies are identical rows and the output is the accepted
  // CONTENT digest, so which copy survives never shows. Oracle: planted
  // copies are all pre-existing texts, so accepted ≡ distinct non-history
  // texts absent from history — expressible without restating the planting.
  val q116 = Q.offBench(
    "q116_streaming_ingest_dedup",
    """WITH hist AS (SELECT text FROM documents WHERE doc_id % 4 = 0),
      |batch AS (SELECT DISTINCT text FROM documents WHERE doc_id % 4 <> 0)
      |SELECT sha256(batch.text) AS digest FROM batch
      |WHERE NOT EXISTS (SELECT 1 FROM hist WHERE hist.text = batch.text)
      |ORDER BY digest""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    def part(i: Int): DataFrame =
      docs.filter(pmod(col("doc_id"), lit(4L)) === i.toLong)
    def slice8(of: DataFrame, r: Int): DataFrame =
      of.filter(pmod(col("doc_id"), lit(8L)) === r.toLong)
    val history = part(0)
    val batches = Seq(
      part(1).union(slice8(history, 0)).union(slice8(part(1), 1)),
      part(2).union(slice8(part(1), 5)),
      part(3))
    val base = java.nio.file.Files.createTempDirectory("graft_q116_ingest")
    val idx = base.resolve("index").toString
    val acc = base.resolve("accepted").toString
    graft.llm.DedupIndex.build(history, idx)
    batches.foreach(b => StreamingDedup.ingestBatch(b, idx, acc))
    s.read.parquet(acc)
      .select(sha2(col("text"), 256).as("digest"))
      .orderBy("digest")
  }

  // --------------------------------------------------------------- Q117
  // Streaming NEAR-dup ingest (B32 + B42): q116's loop with the exact-digest
  // screen swapped for the banded-MinHash signature screen
  // ([[StreamingNearDup]] / [[graft.llm.NearDupIndex]]). Planted near-dups
  // (fixture texts with one word appended → only the final shingle differs)
  // exercise the three regimes: vs-history, within-batch keep-first,
  // vs-earlier-batch. Seeded signatures → deterministic accepted set, but
  // the near-dup decision is a sketch estimate, not SQL-expressible →
  // composite registration (rows-only driver check); semantics are pinned
  // by StreamingNearDupSpec and the estimate-vs-exact-Jaccard property.
  val q117 = Q.composite("q117_streaming_neardup_ingest") { (s, dir) =>
    val docs = Tables(s, dir, "documents").select("doc_id", "text")
    def part(i: Int): DataFrame =
      docs.filter(pmod(col("doc_id"), lit(4L)) === i.toLong)
    // near-dup copy: new id, last shingle changed
    def nd(of: DataFrame, r: Int): DataFrame =
      of.filter(pmod(col("doc_id"), lit(8L)) === r.toLong)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zzzz")).as("text"))
    val history = part(0)
    val batches = Seq(
      part(1).union(nd(history, 0)),
      part(2).union(nd(part(1), 1)),
      part(3))
    val base = java.nio.file.Files.createTempDirectory("graft_q117_neardup")
    val idx = base.resolve("index").toString
    val acc = base.resolve("accepted").toString
    graft.llm.NearDupIndex.build(history, idx)
    batches.foreach(b => StreamingNearDup.ingestBatch(b, idx, acc))
    s.read.parquet(acc).select("doc_id").orderBy("doc_id")
  }

  // --------------------------------------------------------------- Q276
  // Streaming maintenance of the persisted k-NN graph index
  // ([[StreamingKnnIndex]] — the q116 foreachBatch loop applied to
  // KnnGraph.upsert), run as its batch-sequential rendering: the SAME
  // ingestBatch code the streaming sink executes per micro-batch
  // (StreamingKnnIndexSpec pins streaming ≡ this composition AND the
  // maintained medoid entry table AND the serving composition with
  // q273's bucket-pruned searchIndexed). Two batches of new vectors
  // extend a base index; because the upsert law is exact per batch,
  // the maintained index equals the full rebuild — so the ORACLE IS
  // q264's rebuild oracle VERBATIM, and one hash certifies the whole
  // incremental ingest chain including the per-batch index
  // round-trips through parquet. offBench: index writes under the
  // Verify single-writer protocol (the q49/q116 stance).
  val q276 = Q.offBench(
    "q276_streaming_knn_index",
    graft.llm.LlmQueries.q264.oracle.get) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val cs: Array[Array[Float]] = emb.filter(col("vec_id") < 12)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val name = "knnstream_" + java.lang.Integer.toHexString(dir.hashCode)
    val base = emb.filter(col("vec_id") >= 40)
    graft.llm.KnnGraph.saveIndex(
      graft.llm.KnnGraph.build(base, cs, degree = 12, nProbe = 3),
      base, cs, name, buckets = 8)
    StreamingKnnIndex.ingestBatch(
      emb.filter(col("vec_id") >= 20 && col("vec_id") < 40),
      name, cs, degree = 12, nProbe = 3, buckets = 8)
    StreamingKnnIndex.ingestBatch(
      emb.filter(col("vec_id") < 20),
      name, cs, degree = 12, nProbe = 3, buckets = 8)
    StreamingKnnIndex.load(s, name)._2
      .select("src", "rk", "dst").orderBy("src", "rk")
  }

  // --------------------------------------------------------------- Q277
  // CDC changelog applied to the persisted k-NN index
  // ([[StreamingKnnIndex.applyChangelog]] — the ANN-index member of
  // the changelog-maintainer family: Upsert q208 row state, ScdMerge
  // q252 history, AggMaintain q263 aggregates, q268 sketch buckets).
  // One changelog carries deletes AND inserts, including the id-in-both
  // REPLACEMENT path: D = vec_id ≥ 12 with %9 = 4 (q274's delete
  // class), N re-inserts the even half of D (%18 = 4) with their
  // original vectors — so the final membership is expressible, the
  // delete tier's probe-cell re-fill, the insert tier's back-edge
  // splice, AND the replace path all fire in one apply. Composing the
  // two exact laws gives apply(build(B), cl) ≡ build((B ∖ D) ∪ N), so
  // the ORACLE IS q264's rebuild oracle over the surviving membership
  // (vec_id < 12 OR vec_id % 18 ≠ 13) — one hash certifies the whole
  // chain including both index round-trips through parquet.
  val q277 = Q.offBench(
    "q277_knn_index_changelog",
    graft.llm.LlmQueries.q264.oracle.get.replace("FROM embeddings)",
      "FROM embeddings WHERE vec_id < 12 OR vec_id % 18 <> 13)")) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val cs: Array[Array[Float]] = emb.filter(col("vec_id") < 12)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val name = "knncdc_" + java.lang.Integer.toHexString(dir.hashCode)
    graft.llm.KnnGraph.saveIndex(
      graft.llm.KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
      emb, cs, name, buckets = 8)
    val d = emb.filter(col("vec_id") >= 12 && pmod(col("vec_id"), lit(9L)) === 4)
      .withColumn("op", lit("D"))
    val n = emb.filter(col("vec_id") >= 12 && pmod(col("vec_id"), lit(18L)) === 4)
      .withColumn("op", lit("I"))
    StreamingKnnIndex.applyChangelog(d.unionByName(n), name, cs,
      degree = 12, nProbe = 3, buckets = 8)
    StreamingKnnIndex.load(s, name)._2
      .select("src", "rk", "dst").orderBy("src", "rk")
  }

  // --------------------------------------------------------------- Q280
  // CDC changelog applied to the PQ-augmented index (q277's apply over
  // q279's layout): the maintainer detects the codes column, reloads
  // the PERSISTED codebook, and re-saves through it — codes stay
  // comparable across batches by construction (re-deriving from pinned
  // rows would be a silent corruption if the changelog deleted them;
  // dropping the column, what a plain re-save would do, would break
  // every later searchIndexedPq). D/N mirror q277 shifted past the
  // codebook rows (D = vec_id ≥ 20 with %9 = 4, N re-inserts the even
  // half), and the final state is SERVED: the ORACLE IS q279's
  // PQ-beam oracle over the surviving membership, so one hash
  // certifies maintain → re-encode → code-distance beam → exact rerank
  // end to end.
  val q280 = Q.offBench(
    "q280_knn_pq_changelog",
    graft.llm.LlmQueries.q279.oracle.get.replace("FROM embeddings)",
      "FROM embeddings WHERE vec_id < 20 OR vec_id % 18 <> 13)")) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val cs: Array[Array[Float]] = emb.filter(col("vec_id") < 12)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val name = "knnpqcdc_" + java.lang.Integer.toHexString(dir.hashCode)
    graft.llm.KnnGraph.saveIndexPq(
      graft.llm.KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
      emb, cs, m = 8, dimsPer = 8, nCodebook = 8, cbStart = 12, name,
      buckets = 8)
    val d = emb.filter(col("vec_id") >= 20 && pmod(col("vec_id"), lit(9L)) === 4)
      .withColumn("op", lit("D"))
    val n = emb.filter(col("vec_id") >= 20 && pmod(col("vec_id"), lit(18L)) === 4)
      .withColumn("op", lit("I"))
    StreamingKnnIndex.applyChangelog(d.unionByName(n), name, cs,
      degree = 12, nProbe = 3, buckets = 8)
    graft.llm.KnnGraph.searchIndexedPq(s, name,
        emb.filter(col("vec_id") < 5),
        topK = 3, beam = 16, rounds = 4, rerank = 8)
      .select("q_id", "rk", "node").orderBy("q_id", "rk")
  }

  // --------------------------------------------------------------- Q282
  // PQ codebook refresh (KnnGraph.refreshCodebook — the missing half
  // of q280's codebook-PRESERVATION story: maintenance keeps the build
  // codebook so codes stay comparable, but on a drifting corpus a
  // frozen codebook degrades into quantization noise — the
  // uniform-fixture lesson). The refresh retrains the sub-codebooks
  // from the CURRENT corpus (new pinned rows 20-27, disjoint from the
  // original 12-19), re-encodes EVERY node's codes, and swaps cb +
  // codes + entries — by design the rare O(index) op, fired on the
  // q283 drift signal, never per batch. Chain under test: build
  // (cbStart=12) → changelog deletes (D = vec_id ≥ 28 with %9 = 4,
  // disjoint from BOTH codebooks' rows; the delta write + old-codebook
  // preservation path) → refresh (cbStart=20) → PQ-beam serve. The
  // law: refresh(maintained) ≡ saveIndexPq(current corpus, new rows) —
  // graph edges pass through, so the ORACLE IS q279's ladder over the
  // surviving membership with the cb CTE moved to rows 20-27; one hash
  // certifies maintain → retrain → re-encode → serve end to end.
  val q282 = Q.offBench(
    "q282_pq_codebook_refresh",
    graft.llm.LlmQueries.q279.oracle.get
      .replace("FROM embeddings)",
        "FROM embeddings WHERE vec_id < 28 OR vec_id % 9 <> 4)")
      .replace("SELECT vec_id - 12 AS j", "SELECT vec_id - 20 AS j")
      .replace("vec_id >= 12 AND vec_id < 20",
        "vec_id >= 20 AND vec_id < 28")) { (s, dir) =>
    val emb = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val cs: Array[Array[Float]] = emb.filter(col("vec_id") < 12)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val name = "knnpqrf_" + java.lang.Integer.toHexString(dir.hashCode)
    graft.llm.KnnGraph.saveIndexPq(
      graft.llm.KnnGraph.build(emb, cs, degree = 12, nProbe = 3),
      emb, cs, m = 8, dimsPer = 8, nCodebook = 8, cbStart = 12, name,
      buckets = 8)
    val d = emb.filter(col("vec_id") >= 28 && pmod(col("vec_id"), lit(9L)) === 4)
      .withColumn("op", lit("D"))
    StreamingKnnIndex.applyChangelog(d, name, cs,
      degree = 12, nProbe = 3, buckets = 8)
    graft.llm.KnnGraph.refreshCodebook(s, name, cs,
      m = 8, dimsPer = 8, nCodebook = 8, cbStart = 20, buckets = 8)
    graft.llm.KnnGraph.searchIndexedPq(s, name,
        emb.filter(col("vec_id") < 5),
        topK = 3, beam = 16, rounds = 4, rerank = 8)
      .select("q_id", "rk", "node").orderBy("q_id", "rk")
  }

  val all: Seq[Q] = Seq(q23, q24, q25, q50, q59, q67, q81, q91, q116, q117,
    q276, q277, q280, q282)

  // ------------------------------------------------------------------------
  // Streaming runners (exercised by StreamingParitySpec; Trigger.AvailableNow
  // processes all available input then stops — deterministic, closed result).
  // ------------------------------------------------------------------------

  /** Read the events fixture as a bounded file stream with the batch schema
    * (raw `ts` normalized to µs TimestampType via [[Tables.normalizeEvents]],
    * exactly as in batch — `withWatermark` rejects TIMESTAMP_NTZ, so the
    * normalization must happen before any event-time declaration).
    *
    * The file streaming source lists a *directory*, so the single fixture
    * file is staged into a temp dir (hardlink when possible — zero copy). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(s"$dir/events.parquet")
    val streamDir = Files.createTempDirectory("graft-events-stream-")
    val dst = streamDir.resolve("events.parquet")
    streamDir.toFile.deleteOnExit()
    try Files.createLink(dst, src)
    catch { case _: Exception => Files.copy(src, dst) }
    dst.toFile.deleteOnExit()
    val raw = spark.read.parquet(src.toString).schema
    Tables.normalizeEvents(
      spark.readStream.schema(raw).parquet(streamDir.toString))
  }

  /** Shared bounded-run memory-sink runner (single definition — trigger /
    * checkpoint / sink handling changes in one place). */
  private[streaming] def runToTable(
      df: DataFrame, name: String, checkpoint: String, mode: String): Unit = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Q23 as a real stream: tumbling windows with a watermark (B38/B39). */
  def q23Streaming(spark: SparkSession, dir: String, checkpoint: String): DataFrame = {
    val agg = tumbling(eventsStream(spark, dir).withWatermark("ts", "10 minutes"))
    runToTable(agg, "q23_stream", checkpoint, "complete")
    spark.table("q23_stream").orderBy("window_start", "event_type")
  }

  /** Q24 as a real stream: sliding windows (B40). */
  def q24Streaming(spark: SparkSession, dir: String, checkpoint: String): DataFrame = {
    val agg = sliding(eventsStream(spark, dir).withWatermark("ts", "10 minutes"))
    runToTable(agg, "q24_stream", checkpoint, "complete")
    spark.table("q24_stream").orderBy("window_start", "event_type")
  }

  /** Q25 as a real stream: stateful dedup within watermark (B38/B42).
    *
    * Deliberate semantic bound: `dropDuplicatesWithinWatermark` only dedups
    * re-deliveries arriving within the watermark horizon — duplicates more
    * than 1h of event-time apart would count twice vs the batch
    * `count(DISTINCT)`. That IS the streaming dedup contract (state must be
    * droppable); size the watermark to the real re-delivery window. */
  def q25Streaming(spark: SparkSession, dir: String, checkpoint: String): DataFrame = {
    val deduped = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id")
    runToTable(deduped, "q25_stream", checkpoint, "append")
    spark.table("q25_stream")
      .agg(count(lit(1)).as("n_distinct"))
  }

  /** q50 as a real stream (B41): session windows with a watermark,
    * completing the oracle triangle for the last streaming operator:
    * batch↔DuckDB (q50) + stream↔batch (here, StreamingParitySpec).
    *
    * Complete output mode, same as q23/q24's bounded runs: in append mode
    * a bounded AvailableNow run withholds every session the final
    * watermark hasn't passed (the last hour of event time) — correct
    * unbounded-stream semantics, but not comparable to batch on a finite
    * fixture. The watermark still declares state droppability for the
    * unbounded deployment. */
  def q50Streaming(spark: SparkSession, dir: String, checkpoint: String): DataFrame = {
    val agg = sessionWindows(
      eventsStream(spark, dir).withWatermark("ts", "1 hour"), "30 minutes")
    runToTable(agg, "q50_stream", checkpoint, "complete")
    spark.table("q50_stream")
      .select(
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"),
        col("user_id"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** q67 as a genuine stream-stream join: both sides read the events stream,
    * carry their own watermark, and meet in a state-store-buffered inner
    * join with a time-range condition. Append is the ONLY output mode
    * Spark supports for stream-stream joins — matches emit as both sides
    * arrive, and the watermark + range bound define when a buffered row
    * can no longer match and is evicted. AvailableNow over the bounded
    * fixture drains everything, so the closed result equals the batch
    * join (StreamingParitySpec). */
  def q67Streaming(spark: SparkSession, dir: String, checkpoint: String): DataFrame = {
    val views = viewSide(eventsStream(spark, dir))
      .withWatermark("view_ts", "10 minutes")
    val clicks = clickSide(eventsStream(spark, dir))
      .withWatermark("click_ts", "10 minutes")
    runToTable(viewClickJoin(views, clicks), "q67_stream", checkpoint, "append")
    spark.table("q67_stream").orderBy("view_id", "click_id")
  }

  /** q67's LEFT OUTER sibling — the semantics only a watermark makes
    * possible on unbounded streams: a view with no click can only be
    * null-extended once the join is CERTAIN no match can arrive, i.e. when
    * the click-side watermark passes view_ts + 6h. Matched rows stream out
    * as in the inner join; unmatched rows emit on state eviction. On a
    * bounded AvailableNow run the final watermark stops 10 min short of
    * max(event ts), so views inside the last 6h10m of event time are
    * still "awaiting a possible match" and are legitimately withheld —
    * the parity spec asserts exactly that horizon split (matched rows ≡
    * batch inner join; null-extensions ≡ batch anti-join rows older than
    * the horizon). */
  def q67OuterStreaming(spark: SparkSession, dir: String, checkpoint: String): DataFrame = {
    val views = viewSide(eventsStream(spark, dir))
      .withWatermark("view_ts", "10 minutes")
    val clicks = clickSide(eventsStream(spark, dir))
      .withWatermark("click_ts", "10 minutes")
    runToTable(viewClickJoin(views, clicks, "left_outer"),
      "q67_outer_stream", checkpoint, "append")
    spark.table("q67_outer_stream").orderBy("view_id", "click_id")
  }

  /** Batch rendering of the left-outer view→click join (the spec's oracle
    * for [[q67OuterStreaming]]'s matched + evicted split). */
  def q67OuterBatch(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables(spark, dir, "events")
    viewClickJoin(viewSide(events), clickSide(events), "left_outer")
  }

  /** q91 as a genuine watermarked FULL outer stream-stream join: unmatched
    * rows on EITHER side null-extend when their state evicts — a view once
    * the click watermark passes view_ts + 6h (as in the left-outer), a
    * click once the VIEW watermark passes click_ts (no future view can
    * satisfy view_ts ≤ click_ts after that). On a bounded AvailableNow run
    * both certainty horizons stop short of the stream end, so the
    * late-event-time tail is legitimately withheld — the parity spec
    * asserts the matched ≡ inner equivalence and the subset/completeness
    * split per side. */
  def q91FullStreaming(spark: SparkSession, dir: String, checkpoint: String): DataFrame = {
    val views = viewSide(eventsStream(spark, dir))
      .withWatermark("view_ts", "10 minutes")
    val clicks = clickSide(eventsStream(spark, dir))
      .withWatermark("click_ts", "10 minutes")
    val joined = views.join(
        clicks,
        col("user_id") === col("c_user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr("INTERVAL 6 HOURS"),
        "full_outer")
      .select(
        col("user_id").as("view_user_id"),
        col("c_user_id").as("click_user_id"),
        col("view_id"), col("click_id"),
        col("view_ts").cast("timestamp_ntz").as("view_ts"),
        col("click_ts").cast("timestamp_ntz").as("click_ts"))
    runToTable(joined, "q91_full_stream", checkpoint, "append")
    spark.table("q91_full_stream")
  }

  /** Session windows per user (B41; spec-tested, not oracle-checked — DuckDB
    * has no session_window equivalent). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"))
}
