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
      val df1 = spec.fn(spark, dir)
      val r1 = df1.collect().map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      })
      // global anti-pattern sweep on the executed plan: an unbroadcast
      // CartesianProduct anywhere in the catalog is a scale bug (the
      // legitimate small-frame crosses all ride BroadcastNestedLoop)
      assert(!df1.queryExecution.executedPlan.toString.contains("CartesianProduct"),
        s"${spec.name} plans a CartesianProduct")
      val r2 = spec.fn(spark, dir).collect().map(_.toSeq.map {
        case a: Array[_] => a.toSeq
        case x => x
      })
      assert(r1.length === r2.length)
      assert(r1.toSeq === r2.toSeq, s"${spec.name} not deterministic")
    }
  }

  test("query ids are unique and follow the q<nn>_ naming contract") {
    val names = QueryCatalog.all.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    val ids = names.map(_.takeWhile(_ != '_'))
    assert(ids.distinct.size === ids.size, "duplicate query ids")
  }

  test("filters and projections reach the parquet scan (q03 pushdown)") {
    val df = QueryCatalog.all.find(_.name == "q03_filter_project").get.fn(spark, dir)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(!scan.contains("PushedFilters: []"), "pushed-filter list is empty")
    // projection pruning: the scan must not read every lineitem column
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_comment"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("every registered query has a DuckDB oracle") {
    // since round 2 even the HLL sketch is oracle-checked (q16 emits an
    // error-bound boolean instead of the engine-specific estimate)
    val rowsOnly = QueryCatalog.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(rowsOnly === Set.empty[String])
  }
}
