package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (Muthitacharoen et al. 2001, LBFS; the
  * rsync/backup-dedup boundary rule) — the INSERTION-ROBUST sub-
  * document dedup primitive the shingle tier (q130) is not: fixed
  * windows shift under a single inserted byte, so every downstream
  * shingle changes; CDC cuts where a rolling window hash hits a
  * residue, so an edit only reshapes the chunks it touches and every
  * other chunk keeps its identity across document versions.
  *
  * Boundary rule: position i (1-based code point index, i ≥ w) ends a
  * chunk iff H(i) ≡ 0 (mod 64), H(i) = Σ_{j<16} code(s[i−15+j])·
  * 257^(15−j) mod 1000003 — a polynomial window hash with PRECOMPUTED
  * integer power constants (inlined identically in the DuckDB oracle,
  * the pinned-constants discipline), prime modulus BEFORE the residue
  * test (257^k mod 64 degenerates to {1, 257 mod 64} — a power-of-two
  * modulus would make the boundary rule depend on two characters'
  * parity classes only; measured ~1/64 boundary rate with the prime).
  * `code` is the full Unicode CODE POINT (what `ascii()` returns and
  * `substr`/`length` count — a surrogate pair is ONE position), and
  * all hash arithmetic is 64-bit: a code point can reach 0x10FFFF, so
  * code·pow ≤ ~1.1e12 and a 16-term sum ≤ ~1.7e13 — far past INT but
  * comfortably inside LONG. (The first HOF cut multiplied two INTs;
  * any code point > 2203 — Devanagari, CJK, emoji — overflowed 32-bit
  * and threw under Spark 4's ANSI default. Widened on BOTH sides:
  * the engine accumulates in LONG, the oracle casts to BIGINT.)
  * No minimum-chunk suppression: that rule is sequential and would
  * break both the position-parallel engine form and the oracle replay;
  * the window length itself keeps degenerate runs bounded.
  *
  * PERFORMANCE SHAPE, measured the hard way (three lessons, preserved
  * in [[withChunksHof]]'s scaladoc and binding discipline):
  * (1) Spark's higher-order functions are CodegenFallback — they run
  * INTERPRETED, silently, with no `ERROR CodeGenerator` line for the
  * guard to catch; (2) `UTF8String.substring` is O(position) (UTF-8 is
  * variable-width, charAt is a scan), so per-position substr inside a
  * fold is O(len²·w); (3) CollapseProject inlines aliased columns into
  * their use sites, so an intermediate column referenced k× is
  * re-derived k× — bind with lambda variables instead. The production
  * path [[withChunks]] sidesteps all three: ONE codegen'd Catalyst
  * expression ([[graft.functions.ContentChunks]], the MortonInterleave
  * precedent) whose kernel does the code-point scan + rolling window
  * hash + chunk split in a single O(len) JIT-hot pass per document.
  *
  * Chunk IDENTITY here is the chunk string, so the oracle can replay
  * equality exactly; at 100 TB the dedup key is xxhash64(chunk) —
  * bodies never shuffle — exactly q130's measured hash-vs-string
  * trade (2.9× exchange volume). */
object Cdc {

  /** 257^(15−j) mod 1000003 for j = 0..15. */
  val Pows: Seq[Int] = Seq(57526, 385439, 203835, 117525, 731977, 555379,
    126675, 381817, 709659, 107820, 529604, 457315, 974545, 66049, 257, 1)

  private val powsArr: Array[Long] = Pows.map(_.toLong).toArray

  // BIGINT literals on the engine side (57526L) so every product in the
  // window fold is 64-bit from the first term — the ANSI-overflow class
  // the r15 advice flagged
  private val powsSql = Pows.map(p => s"${p}L").mkString("array(", ", ", ")")

  /** One-pass chunker kernel, shared by the interpreted eval and the
    * generated code of [[graft.functions.ContentChunks]] (a Scala
    * object emits static forwarders, so generated Java calls
    * `graft.llm.Cdc.chunkArray(s)` directly — one call per site, one
    * JIT-compiled method). Semantics are EXACTLY the SQL boundary rule
    * above: 1-based code-point positions, 16-code-point window,
    * Σ code·pow mod 1000003 mod 64 == 0 cuts AFTER position i; a doc
    * shorter than the window (or with no boundary) is one whole-doc
    * chunk; a boundary at the exact end emits no trailing chunk; the
    * empty string is one empty chunk (substring(s,1,0) in the HOF
    * form). Rolling state is a 16-slot code-point ring; the window sum
    * is recomputed per position (16 mult-adds on longs — branch-free,
    * no modular-inverse subtleties, ~ns per position JIT-compiled). */
  def chunkArray(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val n = s.length // UTF-16 units; positions below are code points
    val ring = new Array[Long](16)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](4)
    var p = 0 // 0-based code-point index of the character being read
    var i = 0 // char (UTF-16) offset of that character
    var chunkStart = 0 // char offset where the current chunk began
    while (i < n) {
      val cp = s.codePointAt(i)
      ring(p % 16) = cp.toLong
      i += Character.charCount(cp)
      p += 1
      if (p >= 16) {
        // window = code points p-16..p-1 (0-based); oldest lives at
        // ring((p-16) % 16) = ring(p % 16), so term j is ring((p+j) % 16)
        var acc = 0L
        var j = 0
        while (j < 16) { acc += ring((p + j) % 16) * powsArr(j); j += 1 }
        if (acc % 1000003L % 64L == 0L) {
          out += UTF8String.fromString(s.substring(chunkStart, i))
          chunkStart = i
        }
      }
    }
    if (chunkStart < n || out.isEmpty)
      out += UTF8String.fromString(s.substring(chunkStart, n))
    new GenericArrayData(out.toArray[Any])
  }

  /** Adds `chunks` (array<string>) computed from `textCol` — the
    * production path: one codegen'd expression, O(len) per document,
    * inside whole-stage codegen (no interpreted-HOF constant factor,
    * no length bound needed). Registers the graft function family
    * idempotently (the ZCurve discipline) so callers need no setup. */
  def withChunks(df: DataFrame, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("chunks", call_function(
      graft.functions.GraftFunctions.ContentChunksName, col(textCol)))
  }

  /** The pure-SQL HOF form of the same rule — kept as the independent
    * cross-check twin ([[chunkArray]]'s arithmetic is verified against
    * it in CdcSpec) and as the documentation of the three measured
    * performance lessons (see object scaladoc). O(len²) per document
    * by construction (the code-point extraction is a per-position
    * substr scan), so the length contract is ENFORCED in-plan (the
    * Ewma discipline), not assumed: docs past `maxChars` fail loudly
    * instead of stalling a run.
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
  def withChunksHof(df: DataFrame, textCol: String,
      maxChars: Int = 10000): DataFrame = {
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
    // codes are BIGINT from extraction (the cast rides the same substr
    // pass) so the window fold never multiplies two INTs
    val codes =
      s"transform(sequence(1, length($textCol)), " +
        s"p -> CAST(ascii(substr($textCol, p, 1)) AS BIGINT))"
    df.filter(assert_true(length(col(textCol)) <= maxChars,
        lit(s"Cdc.withChunksHof: text exceeds the $maxChars-char " +
          "contract of the O(len²) HOF form — use withChunks")).isNull)
      .withColumn("chunks", expr(
        s"""element_at(transform(array($codes), cs ->
           |  element_at(transform(array(${bndsOf("cs")}), bs ->
           |    ${chunksOf("bs")}), 1)), 1)""".stripMargin))
  }
}
