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
object Pq {

  /** Integer-grid projection: `least(127, greatest(-127, round(x·64)))`
    * per element, as a codegen HOF (no UDF). */
  def grid(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"), x =>
        least(lit(127d), greatest(lit(-127d), round(x.cast("double") * 64)))
          .cast("long")).as("g"))

  private def d2(a: IndexedSeq[Long], aOff: Int, b: Array[Long]): Long = {
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
}
