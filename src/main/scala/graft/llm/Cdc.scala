package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (Muthitacharoen et al. 2001, LBFS; the
  * rsync/backup-dedup boundary rule) — the INSERTION-ROBUST sub-
  * document dedup primitive the shingle tier (q130) is not: fixed
  * windows shift under a single inserted byte, so every downstream
  * shingle changes; CDC cuts where a rolling window hash hits a
  * residue, so an edit only reshapes the chunks it touches and every
  * other chunk keeps its identity across document versions.
  *
  * Boundary rule: position i (1-based, i ≥ w) ends a chunk iff
  * H(i) ≡ 0 (mod 64), H(i) = Σ_{j<16} code(s[i−15+j])·257^(15−j)
  * mod 1000003 — a polynomial window hash with PRECOMPUTED integer
  * power constants (inlined identically in the DuckDB oracle, the
  * pinned-constants discipline), prime modulus BEFORE the residue test
  * (257^k mod 64 degenerates to {1, 257 mod 64} — a power-of-two
  * modulus would make the boundary rule depend on two characters'
  * parity classes only; measured ~1/64 boundary rate with the prime).
  * No minimum-chunk suppression: that rule is sequential and would
  * break both the position-parallel engine form and the oracle replay;
  * the window length itself keeps degenerate runs bounded.
  *
  * Everything is position-parallel (one `transform` over positions,
  * nested `aggregate` over the 16-char window — HOFs, no UDF,
  * row-local; boundaries land in their own projection so the chunk
  * expression references them once — CollapseProject keeps non-cheap
  * aliases un-inlined). PERFORMANCE SHAPE, measured the hard way:
  * Spark's higher-order functions are CodegenFallback — they run
  * INTERPRETED, silently, with no `ERROR CodeGenerator` line for the
  * guard to catch — and `UTF8String.substring` is O(position) (UTF-8
  * is variable-width, charAt is a scan). A first cut that called
  * substr(text, i−15+j, 1) inside the window fold was O(len²·w) boxed
  * evals per doc and ran 600+ s at sf0.1 on docs averaging 300 chars;
  * the fix extracts the CODEPOINT ARRAY once per doc (one O(len²/2)
  * substr pass, len ≤ ~600) and the window fold then does O(1)
  * element_at lookups on ints. Chunk IDENTITY here is the chunk
  * string, so the oracle can replay equality exactly; at 100 TB the
  * dedup key is xxhash64(chunk) — bodies never shuffle — exactly
  * q130's measured hash-vs-string trade (2.9× exchange volume). */
object Cdc {

  /** 257^(15−j) mod 1000003 for j = 0..15. */
  val Pows: Seq[Int] = Seq(57526, 385439, 203835, 117525, 731977, 555379,
    126675, 381817, 709659, 107820, 529604, 457315, 974545, 66049, 257, 1)

  private val powsSql = Pows.mkString("array(", ", ", ")")

  /** Adds `chunks` (array<string>) computed from non-empty `textCol`;
    * a doc shorter than the window is one whole-doc chunk.
    *
    * Binding discipline: the codepoint array and the boundary list are
    * bound as LAMBDA VARIABLES (a single-element-array `transform` is
    * SQL's let-expression), NOT as intermediate projected columns —
    * CollapseProject inlines aliased columns into their use sites, and
    * with the codes array referenced 16× inside the window fold the
    * inlined form re-derived the whole array PER ELEMENT ACCESS:
    * O(len⁴) per doc, measured as a multi-minute hang at sf0.01. A
    * lambda variable is evaluated exactly once by construction, on
    * every Spark version, whatever the optimizer does. */
  def withChunks(df: DataFrame, textCol: String): DataFrame = {
    // the sub-window guard matters twice over: sequence(16, n) with
    // n < 16 silently yields a DESCENDING sequence (Spark infers step
    // −1), and the out-of-range element_at then throws under ANSI
    val bndsOf = (cs: String) =>
      s"""IF(size($cs) < 16, slice(array(1), 1, 0),
         |filter(transform(sequence(16, size($cs)),
         |  i -> IF(aggregate(sequence(0, 15), 0L,
         |       (acc, j) -> acc + element_at($cs, i - 15 + j) *
         |         element_at($powsSql, j + 1)) % 1000003 % 64 = 0, i, -1)),
         |  x -> x > 0))""".stripMargin
    val chunksOf = (bs: String) =>
      s"""transform(
         |  CASE WHEN size($bs) = 0
         |  THEN array(named_struct('s', 1, 'e', length($textCol)))
         |  ELSE concat(
         |    transform(sequence(1, size($bs)),
         |      k -> named_struct(
         |        's', IF(k = 1, 1, element_at($bs, k - 1) + 1),
         |        'e', element_at($bs, k))),
         |    IF(element_at($bs, -1) < length($textCol),
         |       array(named_struct('s', element_at($bs, -1) + 1,
         |                          'e', length($textCol))),
         |       slice(array(named_struct('s', 1, 'e', 1)), 1, 0)))
         |  END,
         |  sp -> substring($textCol, sp.s, sp.e - sp.s + 1))""".stripMargin
    val codes =
      s"transform(sequence(1, length($textCol)), " +
        s"p -> ascii(substr($textCol, p, 1)))"
    df.withColumn("chunks", expr(
      s"""element_at(transform(array($codes), cs ->
         |  element_at(transform(array(${bndsOf("cs")}), bs ->
         |    ${chunksOf("bs")}), 1)), 1)""".stripMargin))
  }
}
