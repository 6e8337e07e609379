package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for two-key file skipping — the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` idea as a plain-parquet sink.
  *
  * A linear layout (sort by key A) gives perfect min/max file pruning
  * on A and none on B; interleaving the bits of both keys into one
  * sort key makes every file a small RECTANGLE in (A, B) space, so a
  * two-predicate scan overlaps O(perimeter) files instead of all of
  * them. At 100 TB this is the difference between reading a whole
  * table and reading a few hundred files: pruning happens on footer
  * metadata (or a stats catalog) before any row is scanned.
  *
  * Both keys are min/max-scaled to 16-bit grid cells (the scaling is a
  * 2-row broadcast-able aggregate, one scan), interleaved into a
  * 32-bit Morton code with the classic bit-spread sequence — all
  * codegen'd built-in ops — and the frame is range-partitioned by that
  * code: each output file covers a contiguous Morton range, i.e. a
  * tile. The write also materializes a `_stats.parquet` sidecar (per
  * file, per row group, per key column min/max — the stats catalog),
  * so `pruneFiles`/`pruneRowGroups` answer from ONE bounded read
  * instead of O(#files) footer opens, keeping only files (and row
  * groups) whose [min,max] box intersects the predicate box; a footer
  * scan remains the fallback for directories without a sidecar. */
object ZOrderSink {

  /** Spread the low 16 bits of `v` to even bit positions (0, 2, 4, …):
    * the standard mask sequence, expressed over Spark long ops so it
    * stays inside whole-stage codegen. */
  private def spreadBits(v: Column): Column = {
    val s1 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of two 16-bit grid cells (a in even bits, b in odd). */
  private[sources] def morton(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Scale a value into [0, 65535] given its min/max (inclusive).
    * Computed on doubles: long arithmetic `(v−lo)·65536` silently
    * overflows once the key range exceeds ~2^47, scrambling the Morton
    * layout (pruning would stay CORRECT via footer stats, but the
    * clustering quality — the whole point — would be lost). A double
    * carries 53 mantissa bits; the cell index only needs 16 bits of
    * resolution, so the rounding on huge ranges moves a value at most
    * one cell — harmless for layout. */
  private def cell(v: Column, lo: Long, hi: Long): Column =
    if (hi == lo) lit(0L)
    else {
      val span = hi.toDouble - lo.toDouble + 1.0 // up to 2^64, fine as double
      val scaled = floor((v.cast("double") - lit(lo.toDouble)) * lit(65536.0 / span))
      least(lit(65535L), greatest(lit(0L), scaled.cast("long")))
    }

  /** Write `df` z-ordered by two long columns into `nFiles` parquet
    * files, each covering one Morton-range tile of (a, b) space, then
    * write the `_stats.parquet` sidecar (per file, per row group, per
    * key column min/max) that [[pruneFiles]]/[[pruneRowGroups]] read
    * instead of opening every footer — the write owns both artifacts,
    * the way a lakehouse commit owns data files + stats in one
    * transaction. */
  def write(df: DataFrame, path: String, a: String, b: String, nFiles: Int): Unit = {
    val Array(bounds) = df.agg(
      floor(min(col(a))).cast("long").as("alo"), floor(max(col(a))).cast("long").as("ahi"),
      floor(min(col(b))).cast("long").as("blo"), floor(max(col(b))).cast("long").as("bhi")).collect()
    val z = morton(
      cell(col(a), bounds.getLong(0), bounds.getLong(1)),
      cell(col(b), bounds.getLong(2), bounds.getLong(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
    writeStats(df.sparkSession, path, Seq(a, b))
  }

  /** One row group's stats for one column. `range` None means the
    * chunk carries no usable stats (statless, all-null, or non-INT64):
    * a "no pruning claim" marker — stats absence may only ever WIDEN
    * the read set, never narrow it. */
  private[sources] final case class BlockStat(
      file: String, block: Int, rows: Long, bytes: Long,
      column: String, lo: Option[Long], hi: Option[Long]) {
    def range: Option[(Long, Long)] = for (l <- lo; h <- hi) yield (l, h)
  }

  /** The sidecar's name: underscore-prefixed, so Hadoop/Spark data
    * scans of the directory ignore it. */
  private val StatsName = "_stats.parquet"

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))

  /** Per-row-group per-column stats of one file, from its FOOTER (no
    * data pages). */
  private def footerStats(conf: Configuration, file: Path, columns: Seq[String]): Seq[BlockStat] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      reader.getFooter.getBlocks.toArray.toSeq
        .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData])
        .zipWithIndex.flatMap { case (block, i) =>
          columns.map { column =>
            val chunks = block.getColumns.toArray.toSeq
              .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
              .filter(_.getPath.toDotString == column)
            val range = for {
              chunk <- chunks.headOption if chunks.size == 1
              stats <- Option(chunk.getStatistics) if stats.hasNonNullValue
              lo <- Option(stats.genericGetMin).collect { case l: java.lang.Long => l.longValue() }
              hi <- Option(stats.genericGetMax).collect { case l: java.lang.Long => l.longValue() }
            } yield (lo, hi)
            BlockStat(file.toString, i, block.getRowCount, block.getTotalByteSize,
              column, range.map(_._1), range.map(_._2))
          }
        }
    } finally reader.close()
  }

  /** Write the stats sidecar for the data files under `path`: one scan
    * of every footer NOW (at write time, when the footers are in page
    * cache anyway) so reads never pay the O(#files) footer-RPC pass —
    * the lakehouse stats-catalog move. Overwrites any previous
    * sidecar; call after appends to refresh it (files newer than the
    * sidecar are simply kept un-pruned until then). */
  def writeStats(spark: SparkSession, path: String, columns: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val stats = dataFiles(fs, dir).flatMap(footerStats(conf, _, columns))
    import spark.implicits._
    stats.toDF().coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$StatsName")
  }

  /** All block stats for `path`: the sidecar if present (ONE small
    * parquet read), else a footer scan over every data file. Files
    * with no stats rows (e.g. appended after the sidecar was written)
    * are conservatively unprunable — callers keep them. */
  private def blockStats(
      spark: SparkSession, path: String, columns: Seq[String]): Map[String, Seq[BlockStat]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val sidecar = new Path(dir, StatsName)
    val stats =
      if (fs.exists(sidecar))
        spark.read.parquet(sidecar.toString).collect().toSeq.map { r =>
          BlockStat(r.getAs[String]("file"), r.getAs[Int]("block"),
            r.getAs[Long]("rows"), r.getAs[Long]("bytes"), r.getAs[String]("column"),
            Option(r.getAs[java.lang.Long]("lo")).map(_.longValue()),
            Option(r.getAs[java.lang.Long]("hi")).map(_.longValue()))
        }
      else dataFiles(fs, dir).flatMap(footerStats(conf, _, columns))
    stats.groupBy(_.file)
  }

  /** A file's [min, max] for `column` from its block stats — None (no
    * pruning claim) unless EVERY row group carries usable stats: a
    * single statless chunk poisons the whole file's range, because a
    * range from the stats-bearing groups alone could wrongly prune
    * rows living in the statless one. */
  private def fileRange(blocks: Seq[BlockStat], column: String): Option[(Long, Long)] = {
    val ranges = blocks.filter(_.column == column).map(_.range)
    if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
    else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
  }

  private def intersects(r: Option[(Long, Long)], lo: Long, hi: Long): Boolean =
    r match {
      case Some((rlo, rhi)) => rlo <= hi && rhi >= lo
      case None => true // no stats claim ⇒ cannot exclude
    }

  /** File-level skipping: the data files under `path` whose min/max
    * boxes intersect [aLo, aHi] × [bLo, bHi]. Feed the result to
    * `spark.read.parquet(files: _*)` — rows never touched for skipped
    * files. Reads the `_stats.parquet` sidecar when present (one
    * bounded read instead of O(#files) footer opens); footer scan is
    * the fallback, with IDENTICAL keep semantics (the sidecar is the
    * same footer metadata, materialized at write time). */
  def pruneFiles(
      spark: SparkSession, path: String,
      a: String, aLo: Long, aHi: Long,
      b: String, bLo: Long, bHi: Long): Seq[String] = {
    val stats = blockStats(spark, path, Seq(a, b))
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    dataFiles(dir.getFileSystem(conf), dir).map(_.toString)
      .filter { f =>
        stats.get(f) match {
          case Some(blocks) =>
            intersects(fileRange(blocks, a), aLo, aHi) &&
              intersects(fileRange(blocks, b), bLo, bHi)
          case None => true // not in the sidecar (e.g. late append) ⇒ keep
        }
      }
  }

  /** Row groups selected for one file. Two independent facts:
    * `hasStats` = the sidecar/footer made a stats claim for this file
    * (when false, read the whole file — `blocks` is empty and `bytes`
    * is 0 because the size is unknown without opening the footer);
    * `keptAll` = every row group survived the predicate (trivially
    * true when there is no stats claim). A stats-backed file whose
    * groups ALL intersect reports `keptAll = true` with `blocks` and
    * `bytes` fully populated. */
  final case class RowGroupSelection(
      file: String, blocks: Seq[Int], bytes: Long,
      keptAll: Boolean, hasStats: Boolean)

  /** Row-group-level skipping: within every kept file, only the row
    * groups whose own min/max boxes intersect the predicate box — the
    * granularity a stats catalog buys beyond file pruning (a z-ordered
    * file is itself Morton-sorted, so a small box touches a small
    * PREFIX of its row groups). Files or groups without usable stats
    * are kept whole, mirroring [[pruneFiles]]'s conservatism. */
  def pruneRowGroups(
      spark: SparkSession, path: String,
      a: String, aLo: Long, aHi: Long,
      b: String, bLo: Long, bHi: Long): Seq[RowGroupSelection] = {
    val stats = blockStats(spark, path, Seq(a, b))
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    dataFiles(dir.getFileSystem(conf), dir).map(_.toString).flatMap { f =>
      stats.get(f) match {
        case None =>
          Some(RowGroupSelection(f, Nil, 0L, keptAll = true, hasStats = false))
        case Some(blocks) =>
          val byBlock = blocks.groupBy(_.block).toSeq.sortBy(_._1)
          val kept = byBlock.filter { case (_, bs) =>
            intersects(fileRange(bs, a), aLo, aHi) &&
              intersects(fileRange(bs, b), bLo, bHi)
          }
          if (kept.isEmpty) None
          else Some(RowGroupSelection(f, kept.map(_._1),
            kept.map(_._2.head.bytes).sum,
            keptAll = kept.size == byBlock.size, hasStats = true))
      }
    }
  }
}
