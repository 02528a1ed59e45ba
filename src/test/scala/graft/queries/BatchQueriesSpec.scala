package graft.queries

import graft.SparkSpec

/** Shape/sanity checks per declared query on sf0.001. Exact-value correctness
  * is the DuckDB oracle gate (scripts/oracle_check.py / driver t2); these
  * specs catch regressions fast without the oracle in the loop.
  */
class BatchQueriesSpec extends SparkSpec {

  test("every declared query runs and yields its declared columns") {
    for (q <- graft.SparkEntry.allQueries) {
      val df = q.run(spark, sf0001)
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to run")
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
      // registry lint: an engine-side DECIMAL final column can never
      // hash-match the driver (its canonicalization coerces ORACLE decimals
      // to float64 while engine decimals stay Decimal — the round-5
      // six-red-rows incident). Fold in decimal, cast the output to DOUBLE.
      val decCols = df.schema.fields.collect {
        case f if hasDecimal(f.dataType) => f.name
      }
      assert(decCols.isEmpty,
        s"${q.name} emits DECIMAL output column(s) ${decCols.mkString(", ")} — " +
          "cast the final column to DOUBLE on both engine and oracle sides")
      // registry lint: the driver canonicalizes oracle-checked results with
      // pandas sort_values over ALL columns, which raises `TypeError:
      // unhashable type: numpy.ndarray` on ARRAY (and MAP/STRUCT) cells —
      // the r14 q215 incident. Oracle-declared queries must emit only
      // scalar final columns (array_join/to_json the nested value); rows-
      // only queries never reach the pandas path so nested outputs are fine.
      if (q.oracle.isDefined) {
        val nestedCols = df.schema.fields.collect {
          case f if isNested(f.dataType) => f.name
        }
        assert(nestedCols.isEmpty,
          s"${q.name} declares an oracle but emits nested output column(s) " +
            s"${nestedCols.mkString(", ")} — the driver's pandas sort_values " +
            "cannot canonicalize ARRAY/MAP/STRUCT cells; array_join or " +
            "to_json the final column on both engine and oracle sides")
      }
      // scale lint: an unpartitioned Window moves ALL rows to one
      // partition — fatal at 100 TB and a WindowExec warning per run
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      val unpart = df.queryExecution.optimizedPlan.collect {
        case wnd: LWindow if wnd.partitionSpec.isEmpty => wnd
      }
      assert(unpart.isEmpty,
        s"${q.name} plans ${unpart.size} unpartitioned Window operator(s)")
    }
  }

  private def isNested(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: ArrayType | _: MapType | _: StructType => true
      case _                                         => false
    }
  }

  private def hasDecimal(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: DecimalType    => true
      case ArrayType(e, _)   => hasDecimal(e)
      case MapType(k, v, _)  => hasDecimal(k) || hasDecimal(v)
      case StructType(fs)    => fs.exists(f => hasDecimal(f.dataType))
      case _                 => false
    }
  }

  test("q01 filters and computes net price") {
    val rows = BatchQueries.q01.run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0))
  }

  test("q02 pricing summary has one row per (returnflag, linestatus)") {
    val rows = BatchQueries.q02.run(spark, sf0001).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    assert(rows.nonEmpty && rows.length <= 9)
  }

  test("q03 revenue ordered descending") {
    val rev = BatchQueries.q03.run(spark, sf0001).collect().map(_.getDouble(1))
    assert(rev.nonEmpty && rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("q07 rollup includes grand total matching orders count") {
    val rows = BatchQueries.q07.run(spark, sf0001).collect()
    val grand = rows.filter(r => r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(grand.length == 1)
    val total = graft.Tables(spark, sf0001, "orders").count()
    assert(grand.head.getLong(2) == total)
  }

  test("q09 emits at most 3 rows per priority, ranks 1..k") {
    val rows = BatchQueries.q09.run(spark, sf0001).collect()
    val byPri = rows.groupBy(_.getString(0))
    assert(byPri.values.forall(g => g.length <= 3 && g.map(_.getInt(1)).sorted.sameElements(1 to g.length)))
  }

  test("q17 norms: unit embeddings have sq_norm ~ 1") {
    val rows = BatchQueries.q17.run(spark, sf0001).collect()
    assert(rows.forall(r => math.abs(r.getDouble(2) - 1.0) < 0.01))
    assert(rows.forall(_.getLong(1) == 64))
  }
}
