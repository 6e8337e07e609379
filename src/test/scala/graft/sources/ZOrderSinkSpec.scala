package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: correctness of the Morton interleave, lossless
  * round-trip, and the headline claim — a two-predicate scan reads
  * FEWER FILES under the z-ordered layout than under a linear sort,
  * with pruning decided by parquet footers alone. */
class ZOrderSinkSpec extends SparkSpec {

  import spark.implicits._

  test("morton interleaves bits: unit squares come out contiguous") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("a", "b")
      .select(ZOrderSink.morton(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 (2,2)=12 (3,3)=15
    assert(rows === Seq(0L, 1L, 2L, 3L, 12L, 15L))
  }

  test("z-ordered write round-trips every row") {
    val tmp = Files.createTempDirectory("zorder_rt").toString
    val df = spark.range(0, 10000).select(
      (col("id") % 100).as("x"), (col("id") / 100).cast("long").as("y"), col("id"))
    ZOrderSink.write(df, s"$tmp/t", "x", "y", nFiles = 16)
    val back = spark.read.parquet(s"$tmp/t")
    assert(back.count() === 10000)
    assert(back.agg(sum("id")).as[Long].head() === (0L until 10000L).sum)
  }

  test("files without usable column stats are kept, never pruned or crashed on") {
    val tmp = Files.createTempDirectory("zorder_nostats").toString
    // one normal file + one whose x/y chunks are entirely null + one
    // missing the columns outright — pruning must keep the latter two
    spark.range(0, 100).select((col("id") % 10).as("x"), (col("id") / 10).cast("long").as("y"))
      .coalesce(1).write.parquet(s"$tmp/t")
    Seq((null.asInstanceOf[java.lang.Long], null.asInstanceOf[java.lang.Long]))
      .toDF("x", "y").coalesce(1).write.mode("append").parquet(s"$tmp/t")
    spark.range(0, 5).select(col("id").as("other"))
      .coalesce(1).write.mode("append").parquet(s"$tmp/t")
    val all = ZOrderSink.pruneFiles(spark, s"$tmp/t", "x", 0L, 0L, "y", 0L, 0L)
    // the stats-bearing file matches the box too (x=0,y=0 exists) → all 3 kept
    assert(all.size === 3, s"conservative keep expected, got $all")
    val none = ZOrderSink.pruneFiles(spark, s"$tmp/t", "x", 50L, 60L, "y", 50L, 60L)
    // out-of-range box prunes the stats-bearing file, keeps the two statless ones
    assert(none.size === 2, s"statless files must survive pruning, got $none")
  }

  test("stats sidecar: written by write(), identical keep-set to the footer scan") {
    val tmp = Files.createTempDirectory("zorder_sidecar").toString
    val df = spark.range(0, 16384).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
    ZOrderSink.write(df, s"$tmp/t", "x", "y", nFiles = 16)
    val fs = new org.apache.hadoop.fs.Path(s"$tmp/t")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecar = new org.apache.hadoop.fs.Path(s"$tmp/t/_stats.parquet")
    assert(fs.exists(sidecar), "write() must materialize the stats sidecar")
    // data reads must not see the underscore-prefixed sidecar
    assert(spark.read.parquet(s"$tmp/t").count() === 16384)
    val boxes = Seq((0L, 31L, 0L, 31L), (100L, 127L, 0L, 127L), (500L, 600L, 500L, 600L))
    val withSidecar = boxes.map { case (al, ah, bl, bh) =>
      ZOrderSink.pruneFiles(spark, s"$tmp/t", "x", al, ah, "y", bl, bh).sorted
    }
    fs.delete(sidecar, true)
    val footerOnly = boxes.map { case (al, ah, bl, bh) =>
      ZOrderSink.pruneFiles(spark, s"$tmp/t", "x", al, ah, "y", bl, bh).sorted
    }
    assert(withSidecar === footerOnly,
      "sidecar and footer pruning must agree on every keep-set")
    assert(withSidecar.head.nonEmpty && withSidecar.head.size < 16)
    assert(withSidecar(2).isEmpty, "out-of-domain box must prune everything")
  }

  test("row-group pruning reads fewer row groups and bytes than whole files") {
    val tmp = Files.createTempDirectory("zorder_rowgroups").toString
    val hc = spark.sparkContext.hadoopConfiguration
    val (oldBlock, oldPage) = (hc.get("parquet.block.size"), hc.get("parquet.page.size"))
    // force many small row groups so within-file granularity exists
    hc.setInt("parquet.block.size", 16 * 1024)
    hc.setInt("parquet.page.size", 4 * 1024)
    try {
      val df = spark.range(0, 16384).select(
        (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"))
      // ONE file: file-level pruning can do nothing, row groups must
      ZOrderSink.write(df, s"$tmp/t", "x", "y", nFiles = 1)
      val box = (0L, 15L, 0L, 15L)
      val files = ZOrderSink.pruneFiles(spark, s"$tmp/t", "x", box._1, box._2, "y", box._3, box._4)
      assert(files.size === 1, "the single file intersects the box")
      val sel = ZOrderSink.pruneRowGroups(spark, s"$tmp/t", "x", box._1, box._2, "y", box._3, box._4)
      assert(sel.size === 1)
      val s = sel.head
      assert(s.hasStats && !s.keptAll, "a small box must not need every row group")
      assert(s.blocks.nonEmpty)
      // vs the whole file: strictly fewer groups and bytes
      val all = ZOrderSink.pruneRowGroups(spark, s"$tmp/t", "x", 0L, 127L, "y", 0L, 127L)
      // all-kept via stats: keptAll with blocks/bytes still populated
      assert(all.head.keptAll && all.head.hasStats)
      assert(s.blocks.size < all.head.blocks.size)
      assert(s.bytes < all.head.bytes)
      // the kept groups must cover at least every matching row
      val matching = spark.read.parquet(s"$tmp/t")
        .filter(col("x").between(box._1, box._2) && col("y").between(box._3, box._4)).count()
      assert(matching === 16L * 16L)
      val keptRows = spark.read.parquet(s"$tmp/t/_stats.parquet")
        .filter(col("column") === "x" && col("block").isin(s.blocks.map(Int.box): _*))
        .select(sum(col("rows"))).collect()(0).getLong(0)
      assert(keptRows >= matching)
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", oldBlock)
      if (oldPage == null) hc.unset("parquet.page.size") else hc.set("parquet.page.size", oldPage)
    }
  }

  test("two-predicate scan prunes more files under z-order than linear layout") {
    val tmp = Files.createTempDirectory("zorder_prune").toString
    // 64k points on a 256x256 grid, shuffled ids
    val df = spark.range(0, 65536).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val nFiles = 64
    // linear layout: perfectly sorted by x (best case for x-pruning)
    df.repartitionByRange(nFiles, col("x"))
      .sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$tmp/linear")
    ZOrderSink.write(df, s"$tmp/zorder", "x", "y", nFiles)
    // a 32x32 query box: 1/64 of the area
    val (xLo, xHi, yLo, yHi) = (64L, 95L, 64L, 95L)
    val linFiles = ZOrderSink.pruneFiles(spark, s"$tmp/linear", "x", xLo, xHi, "y", yLo, yHi)
    val zFiles = ZOrderSink.pruneFiles(spark, s"$tmp/zorder", "x", xLo, xHi, "y", yLo, yHi)
    // linear: x prunes to ~1/8 of files but every surviving file spans
    // all of y; z-order: the box touches only the tiles it overlaps
    assert(zFiles.size < linFiles.size,
      s"z-order read ${zFiles.size} files, linear ${linFiles.size}")
    assert(zFiles.size <= nFiles / 8,
      s"z-order should isolate the box to a few tiles, read ${zFiles.size}/$nFiles")
    // and the pruned subset is sufficient: same answer as the full scan
    val full = spark.read.parquet(s"$tmp/zorder")
      .filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi)).count()
    val pruned = spark.read.parquet(zFiles: _*)
      .filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi)).count()
    assert(pruned === full)
    assert(full === 32L * 32L)
  }
}
