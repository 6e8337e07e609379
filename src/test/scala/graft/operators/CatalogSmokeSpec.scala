package graft.operators

import graft.{QueryCatalog, SparkSpec}

/** Every registered query runs on sf0.001 and is deterministic: two
  * executions produce byte-identical ordered rows. Catches regressions
  * without the DuckDB oracle in the loop (the oracle remains the
  * authority for correctness at sf0.01).
  */
class CatalogSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  QueryCatalog.all.foreach { spec =>
    test(s"${spec.name} runs and is deterministic at sf0.001") {
      val r1 = spec.fn(spark, dir).collect().map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      })
      val r2 = spec.fn(spark, dir).collect().map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      })
      assert(r1.length === r2.length)
      assert(r1.toSeq === r2.toSeq, s"${spec.name} not deterministic")
    }
  }

  test("every registered query has a DuckDB oracle") {
    // since round 2 even the HLL sketch is oracle-checked (q16 emits an
    // error-bound boolean instead of the engine-specific estimate)
    val rowsOnly = QueryCatalog.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnly === Set.empty[String])
  }
}
