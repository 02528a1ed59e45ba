package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The pigeonhole-banded hamming candidate join shared by the perceptual
  * near-dup family ([[ImageHash]]: 4×16 bits over two BIGINT halves;
  * [[AudioHash]]: 4×8 bits over one int) — one definition so the scale
  * contract (band-key EQUI-join, never an all-pairs join; exact
  * `bit_count(xor)` rerank; `distinct` over multi-band matches) lives in
  * one place the next modality reuses, and PlanContractSpec's pin covers
  * every caller at once.
  */
private[llm] object Banding {

  /** Candidate-join + rerank over pre-banded hashes.
    *
    * @param hashes   one row per doc: `doc_id` + `hashCols`
    * @param hashCols hash columns carried to the rerank (suffixed `_a`/
    *                 `_b` on the two join sides)
    * @param bandKeys one Column per band (the pigeonhole guarantee —
    *                 any pair within the caller's hamming bound agrees
    *                 exactly on ≥ 1 band — is the CALLER's contract)
    * @param hamming  exact distance over the suffixed hash columns
    * @return (id_a, id_b, hamming), id_a < id_b, hamming ≤ maxHamming
    */
  def nearDupPairs(hashes: DataFrame, hashCols: Seq[String],
      bandKeys: Seq[Column], hamming: Column, maxHamming: Int): DataFrame = {
    val banded = hashes
      .select(col("doc_id") +: hashCols.map(col) :+
        posexplode(array(bandKeys: _*)): _*)
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")
    def side(suffix: String) = banded.select(
      col("band") +: col("key") +: col("doc_id").as("id" + suffix) +:
        hashCols.map(c => col(c).as(c + suffix)): _*)
    side("_a").join(side("_b"), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
