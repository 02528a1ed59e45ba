package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the remaining member of the ANN compression
  * family next to IVF cells (q42), int8 scalar quantization (q73), and
  * random projections (q35): PQ splits each vector into M subspaces and
  * stores ONE BYTE per subspace (the id of the nearest sub-codebook
  * centroid), an M-byte code replacing a 4·dim-byte float vector — the
  * memory regime billion-vector indexes actually run in — and scores a
  * query against the whole corpus with M table lookups per vector
  * (Jégou et al. 2011).
  *
  * Kept EXACT the graft way: vectors land on an integer grid first
  * (global-scale `round(x·64)` clamped to ±127 — the q73a HALF_UP ≡
  * half-away-from-zero convention both engines share), codebooks are
  * PINNED corpus rows (the q42a fixed-centroid discipline — k-means
  * would be seed- and order-dependent), and every distance is an exact
  * integer Σ(aᵢ−bᵢ)², so encode (argmin with lowest-j tie-break), the
  * per-query lookup tables, and the final (dist, vec_id) ranking are
  * all bit-deterministic and a SQL oracle replays them with no rounded
  * double anywhere.
  *
  * Scale shape: codebook (M·K sub-centroids) and query set are bounded
  * driver-side collects by construction (the q42a pattern); encoding
  * and scoring are row-local over the corpus with the per-query tables
  * riding the closure (M·K ints each); one window shuffle for top-k per
  * query. Footprint story: 64-dim float = 256 B/vector, PQ code = M=8
  * bytes — 32×.
  */
object Pq extends Serializable {

  /** Integer-grid projection: `least(127, greatest(-127, round(x·64)))`
    * per element, as a codegen HOF (no UDF). */
  def grid(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"), x =>
        least(lit(127d), greatest(lit(-127d), round(x.cast("double") * 64)))
          .cast("long")).as("g"))

  private[llm] def d2(a: IndexedSeq[Long], aOff: Int, b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < b.length) {
      val d = a(aOff + i) - b(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Symmetric-distance PQ search: grid → pinned codebooks (rows
    * `vec_id < nCodebook`, one sub-centroid per row per subspace) →
    * per-vector M-byte encode → per-query M×K lookup tables → top-k by
    * (dist asc, vec_id asc), self excluded. `dim` must equal
    * `m * dimsPer`. */
  def sdcTopK(emb: DataFrame, m: Int, dimsPer: Int, nCodebook: Int,
      nQueries: Int, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val g = grid(emb)
    // bounded collects (the q42a discipline): K codebook rows + queries
    val cbRows: Map[Long, Array[Long]] = g.filter(col("vec_id") < nCodebook)
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }.toMap
    val cb: Array[Array[Array[Long]]] = Array.tabulate(m, nCodebook) { (mm, j) =>
      java.util.Arrays.copyOfRange(cbRows(j.toLong), mm * dimsPer, (mm + 1) * dimsPer)
    }
    val queries: Array[(Long, Array[Long])] = g.filter(col("vec_id") < nQueries)
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }
    // Symmetric distance: queries are encoded through the codebook first,
    // and each table entry is the centroid-to-centroid distance
    // t(m)(j) = d²(cb(m)(code_q(m)), cb(m)(j)). When a query IS a codebook
    // row (the q183 setup) its encode is itself, so this coincides with the
    // raw-query (ADC) tables — but it stays SDC when nQueries > nCodebook.
    val tables: Array[(Long, Array[Array[Long]])] = queries.map { case (qid, qg) =>
      val qCodes = encode(qg.toIndexedSeq, m, dimsPer, cb)
      qid -> Array.tabulate(m, nCodebook) { (mm, j) =>
        d2(cb(mm)(qCodes(mm)).toIndexedSeq, 0, cb(mm)(j))
      }
    }
    val scored = g.as[(Long, Seq[Long])].mapPartitions(_.flatMap { case (vid, gv) =>
      val v = gv.toIndexedSeq
      val codes = Array.tabulate(m) { mm =>
        var best = 0
        var bestD = Long.MaxValue
        var j = 0
        while (j < nCodebook) {
          val d = d2(v, mm * dimsPer, cb(mm)(j))
          if (d < bestD) { bestD = d; best = j } // strict: lowest j wins ties
          j += 1
        }
        best
      }
      tables.iterator.filter(_._1 != vid).map { case (qid, t) =>
        var dist = 0L
        var mm = 0
        while (mm < m) { dist += t(mm)(codes(mm)); mm += 1 }
        (qid, vid, dist)
      }
    }).toDF("q_id", "vec_id", "dist")
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("int").as("rk"), col("vec_id"), col("dist"))
  }

  /** IVFPQ — the composed deployment shape of Jégou et al. 2011 (and of
    * every billion-vector index since): the coarse IVF quantizer (q42's
    * cells) prunes the corpus to `nProbe` cells per query, and PQ codes
    * (q183's tables) score ONLY those cells' members — candidate work
    * proportional to nProbe/nCells of the corpus at M table lookups per
    * candidate, never a full scan and never a float vector read.
    *
    * Kept exact the graft way, composing the two certified halves'
    * disciplines: integer grid first; coarse centroids PINNED to grid
    * rows `[0, nCells)` and PQ sub-codebooks to rows
    * `[nCells, nCells+nCodebook)` (disjoint ranges — the q42a/q183
    * fixed-parameter discipline); every distance an exact integer
    * Σ(a−b)²; all argmins tie-break on the lowest index; queries encode
    * through the PQ codebook (true SDC, see [[sdcTopK]]). No residual
    * encoding — this is the IVF+PQ composition, not IVFADC; residuals
    * would put query-time float subtraction back in the hot path and
    * break the shared-codes property the SDC tables rely on.
    *
    * Scale shape: centroids, codebooks, and the per-query probe sets are
    * bounded driver-side collects (nCells + nCodebook + nQueries·nProbe
    * rows); cell assignment, member encode, and table scoring are all
    * row-local over the corpus with the tables riding the closure; the
    * single shuffle is the per-query top-k window. At rest the index is
    * `cell + M bytes` per vector — the [[Ivf.saveIndex]] bucketed layout
    * applies unchanged, with `SelectedBucketsCount` pruning the
    * unprobed cells' IO at the file level.
    *
    * Output carries the member's `cell` so the oracle certifies the
    * coarse assignment together with the PQ ranking. */
  def ivfpqTopK(emb: DataFrame, nCells: Int, nProbe: Int, m: Int,
      dimsPer: Int, nCodebook: Int, nQueries: Int, k: Int): DataFrame = {
    val scored = ivfpqScored(emb, nCells, nProbe, m, dimsPer, nCodebook, nQueries)
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("int").as("rk"),
        col("vec_id"), col("cell").cast("int").as("cell"), col("dist"))
  }

  /** The candidate stage of [[ivfpqTopK]] before the top-k window: one
    * row per (query, member-of-a-probed-cell) scored pair. Exposed so
    * the ScaleStress harness can measure rows-scored (the pruning
    * ratio) directly. */
  private[graft] def ivfpqScored(emb: DataFrame, nCells: Int, nProbe: Int,
      m: Int, dimsPer: Int, nCodebook: Int, nQueries: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val g = grid(emb)
    // bounded collects: nCells coarse + nCodebook sub-centroids + queries
    val pinned: Map[Long, Array[Long]] =
      g.filter(col("vec_id") < nCells + nCodebook)
        .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }.toMap
    require(pinned.size == nCells + nCodebook,
      s"PQ pinned-parameter contract: corpus must contain vec_ids " +
        s"0..${nCells + nCodebook - 1} to seed $nCells coarse centroids + " +
        s"$nCodebook codebook rows; found ${pinned.size}")
    val coarse: Array[Array[Long]] = Array.tabulate(nCells)(j => pinned(j.toLong))
    val cb: Array[Array[Array[Long]]] = Array.tabulate(m, nCodebook) { (mm, j) =>
      java.util.Arrays.copyOfRange(
        pinned((nCells + j).toLong), mm * dimsPer, (mm + 1) * dimsPer)
    }
    val queries: Array[(Long, Array[Long])] = g.filter(col("vec_id") < nQueries)
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }

    def nearestCell(v: IndexedSeq[Long]): Int = {
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < nCells) {
        val d = d2(v, 0, coarse(j))
        if (d < bestD) { bestD = d; best = j } // strict: lowest j wins ties
        j += 1
      }
      best
    }
    // per-query probe set (sorted ascending for the membership scan) and
    // SDC tables from the query's OWN codes (true symmetric distance)
    val perQuery: Array[(Long, Array[Int], Array[Array[Long]])] =
      queries.map { case (qid, qg) =>
        val d2c = Array.tabulate(nCells)(j => d2(qg.toIndexedSeq, 0, coarse(j)))
        val probes = (0 until nCells).sortBy(j => (d2c(j), j)).take(nProbe)
          .sorted.toArray
        val qCodes = encode(qg.toIndexedSeq, m, dimsPer, cb)
        val tables = Array.tabulate(m, nCodebook) { (mm, j) =>
          d2(cb(mm)(qCodes(mm)).toIndexedSeq, 0, cb(mm)(j))
        }
        (qid, probes, tables)
      }
    g.as[(Long, Seq[Long])].mapPartitions(_.flatMap { case (vid, gv) =>
      val v = gv.toIndexedSeq
      val cell = nearestCell(v)
      // encode lazily: only vectors landing in SOME query's probe set pay it
      var codes: Array[Int] = null
      perQuery.iterator
        .filter { case (qid, probes, _) =>
          qid != vid && java.util.Arrays.binarySearch(probes, cell) >= 0
        }
        .map { case (qid, _, t) =>
          if (codes == null) codes = encode(v, m, dimsPer, cb)
          var dist = 0L
          var mm = 0
          while (mm < m) { dist += t(mm)(codes(mm)); mm += 1 }
          (qid, vid, cell, dist)
        }
    }).toDF("q_id", "vec_id", "cell", "dist")
  }

  /** Persist the IVFPQ index at rest in its production layout — the
    * [[Ivf.saveIndex]] treatment for PQ codes: `<name>_codes` is a
    * catalog table of (vec_id, cell, codes) bucketed AND sorted on
    * `cell` (M ints per vector instead of the float embedding — the
    * whole point of PQ at rest), `<name>_coarse` / `<name>_cb` are the
    * pinned coarse centroids and sub-codebooks (nCells and M·K rows).
    * One shuffle at index build, amortized over every later probe; a
    * search's `cell IN (…)` filter prunes unprobed buckets at the FILE
    * level (`SelectedBucketsCount` in the plan), so candidate IO is
    * proportional to nProbe/nCells of an already-M-bytes-per-vector
    * index — the compose of the two scale wins. */
  def saveIndex(emb: DataFrame, nCells: Int, m: Int, dimsPer: Int,
      nCodebook: Int, name: String, buckets: Int = 16): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val g = grid(emb)
    val pinned: Map[Long, Array[Long]] =
      g.filter(col("vec_id") < nCells + nCodebook)
        .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }.toMap
    require(pinned.size == nCells + nCodebook,
      s"PQ pinned-parameter contract: corpus must contain vec_ids " +
        s"0..${nCells + nCodebook - 1} to seed $nCells coarse centroids + " +
        s"$nCodebook codebook rows; found ${pinned.size}")
    val coarse: Array[Array[Long]] = Array.tabulate(nCells)(j => pinned(j.toLong))
    val cb: Array[Array[Array[Long]]] = Array.tabulate(m, nCodebook) { (mm, j) =>
      java.util.Arrays.copyOfRange(
        pinned((nCells + j).toLong), mm * dimsPer, (mm + 1) * dimsPer)
    }
    val codes = g.as[(Long, Seq[Long])].mapPartitions(_.map { case (vid, gv) =>
      val v = gv.toIndexedSeq
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < nCells) {
        val d = d2(v, 0, coarse(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      (vid, best, encode(v, m, dimsPer, cb).toSeq)
    }).toDF("vec_id", "cell", "codes")
    graft.sources.Bucketing.writeBucketed(codes, s"${name}_codes", "cell", buckets)
    coarse.zipWithIndex.map { case (c, j) => (j, c.toSeq) }.toSeq
      .toDF("j", "g").write.mode("overwrite").format("parquet")
      .saveAsTable(s"${name}_coarse")
    (for (mm <- 0 until m; j <- 0 until nCodebook)
      yield (mm, j, cb(mm)(j).toSeq)).toDF("m", "j", "sub")
      .write.mode("overwrite").format("parquet").saveAsTable(s"${name}_cb")
  }

  /** Search a [[saveIndex]]-persisted IVFPQ index: probe nProbe cells per
    * query (against the k-row coarse table — bounded collect), build the
    * per-query SDC tables from the persisted sub-codebooks, then scan
    * ONLY the probed cells' buckets (`cell IN (…)` → file-level bucket
    * pruning) scoring M lookups per code row. Results are identical to
    * [[ivfpqTopK]] over the same corpus and pins (spec-asserted). */
  def searchIndexed(spark: org.apache.spark.sql.SparkSession, name: String,
      queries: DataFrame, nProbe: Int, k: Int): DataFrame = {
    import spark.implicits._
    val coarse: Array[Array[Long]] = spark.table(s"${name}_coarse")
      .as[(Int, Seq[Long])].collect().sortBy(_._1).map(_._2.toArray)
    val cbRows = spark.table(s"${name}_cb")
      .as[(Int, Int, Seq[Long])].collect()
    val m = cbRows.map(_._1).max + 1
    val nCodebook = cbRows.map(_._2).max + 1
    val cb: Array[Array[Array[Long]]] = Array.ofDim(m, nCodebook)
    cbRows.foreach { case (mm, j, sub) => cb(mm)(j) = sub.toArray }
    val dimsPer = cb(0)(0).length
    val nCells = coarse.length
    // The per-query SDC tables (M·K ints each) and probe sets ride the
    // closure, so the query set is a DRIVER collect by design — correct
    // for the bounded query batches ANN serving runs, a driver OOM for
    // an unbounded one. Enforced contract (the maxSpan/buildBounded
    // precedent: violations raise, never degrade): collect through a
    // limit ONE ROW past the cap — a single job that both bounds the
    // collect itself and detects the violation, with no extra count()
    // pass over the caller's plan.
    val cap = 65536
    val qs: Array[(Long, Array[Long])] = grid(queries).limit(cap + 1)
      .as[(Long, Seq[Long])].collect().map { case (id, v) => id -> v.toArray }
    require(qs.length <= cap,
      s"searchIndexed query batch exceeds the $cap bounded-collect " +
        "contract - chunk the query set and issue multiple searches")
    val perQuery: Array[(Long, Array[Int], Array[Array[Long]])] =
      qs.map { case (qid, qg) =>
        val d2c = Array.tabulate(nCells)(j => d2(qg.toIndexedSeq, 0, coarse(j)))
        val probes = (0 until nCells).sortBy(j => (d2c(j), j)).take(nProbe)
          .sorted.toArray
        val qCodes = encode(qg.toIndexedSeq, m, dimsPer, cb)
        val tables = Array.tabulate(m, nCodebook) { (mm, j) =>
          d2(cb(mm)(qCodes(mm)).toIndexedSeq, 0, cb(mm)(j))
        }
        (qid, probes, tables)
      }
    val allCells = perQuery.flatMap(_._2).distinct.sorted
    val scored = spark.table(s"${name}_codes")
      .filter(col("cell").isin(allCells.toIndexedSeq.map(x => x: Any): _*))
      .as[(Long, Int, Seq[Int])].mapPartitions(_.flatMap { case (vid, cell, cs) =>
        val codes = cs.toArray
        perQuery.iterator
          .filter { case (qid, probes, _) =>
            qid != vid && java.util.Arrays.binarySearch(probes, cell) >= 0
          }
          .map { case (qid, _, t) =>
            var dist = 0L
            var mm = 0
            while (mm < m) { dist += t(mm)(codes(mm)); mm += 1 }
            (qid, vid, cell, dist)
          }
      }).toDF("q_id", "vec_id", "cell", "dist")
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("int").as("rk"),
        col("vec_id"), col("cell").cast("int").as("cell"), col("dist"))
  }

  /** Exposed for spec use: encode one grid vector against a codebook. */
  private[llm] def encode(v: IndexedSeq[Long], m: Int, dimsPer: Int,
      cb: Array[Array[Array[Long]]]): Array[Int] =
    Array.tabulate(m) { mm =>
      var best = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < cb(mm).length) {
        val d = d2(v, mm * dimsPer, cb(mm)(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      best
    }

  /** Total squared quantization error of one grid vector under a
    * codebook — Σ_m min_j d2(sub_m, cb(m)(j)), i.e. the distance the
    * encode loses by construction. Integer-exact, so it oracle-replays;
    * the DRIFT SIGNAL for codebook refresh: when fresh vectors'
    * distortion pulls away from the build-time distribution, the frozen
    * codebook has become quantization noise and
    * [[KnnGraph.refreshCodebook]] should fire (the --pqdrift curve). */
  private[llm] def encodeDistortion(v: IndexedSeq[Long], m: Int,
      dimsPer: Int, cb: Array[Array[Array[Long]]]): Long = {
    var s = 0L
    var mm = 0
    while (mm < m) {
      var bestD = Long.MaxValue
      var j = 0
      while (j < cb(mm).length) {
        val d = d2(v, mm * dimsPer, cb(mm)(j))
        if (d < bestD) bestD = d
        j += 1
      }
      s += bestD
      mm += 1
    }
    s
  }
}
