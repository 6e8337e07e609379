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
  * tile. `pruneFiles` then does what a lakehouse stats catalog does:
  * read each footer's per-column min/max (no data pages) and keep only
  * files whose [min,max] box intersects the predicate box. */
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
    * files, each covering one Morton-range tile of (a, b) space. */
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
  }

  /** Per-file [min, max] of an INT64 column, from parquet FOOTERS only
    * (what a lakehouse keeps in its stats catalog). None — meaning
    * "keep the file, no pruning claim" — unless EVERY row group
    * carries usable stats for the column: a single statless (or
    * all-null, or non-INT64) chunk poisons the whole file's range,
    * because a range computed from the stats-bearing groups alone
    * could wrongly prune rows living in the statless one. Stats
    * absence may only ever widen the read set. */
  private def footerRange(conf: Configuration, file: Path, column: String): Option[(Long, Long)] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val perBlock = reader.getFooter.getBlocks.toArray.toSeq
        .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.BlockMetaData])
        .map { block =>
          val chunks = block.getColumns.toArray.toSeq
            .map(_.asInstanceOf[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
            .filter(_.getPath.toDotString == column)
          for {
            chunk <- chunks.headOption if chunks.size == 1
            stats <- Option(chunk.getStatistics) if stats.hasNonNullValue
            lo <- Option(stats.genericGetMin).collect { case l: java.lang.Long => l.longValue() }
            hi <- Option(stats.genericGetMax).collect { case l: java.lang.Long => l.longValue() }
          } yield (lo, hi)
        }
      if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
      else {
        val ranges = perBlock.flatten
        Some((ranges.map(_._1).min, ranges.map(_._2).max))
      }
    } finally reader.close()
  }

  /** File-level skipping: the data files under `path` whose footer
    * min/max boxes intersect [aLo, aHi] × [bLo, bHi]. Feed the result
    * to `spark.read.parquet(files: _*)` — rows never touched for
    * skipped files. */
  def pruneFiles(
      spark: SparkSession, path: String,
      a: String, aLo: Long, aHi: Long,
      b: String, bLo: Long, bHi: Long): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
      .filter { p =>
        // missing stats on either column ⇒ keep the file (conservative)
        (footerRange(conf, p, a), footerRange(conf, p, b)) match {
          case (Some((alo, ahi)), Some((blo, bhi))) =>
            alo <= aHi && ahi >= aLo && blo <= bHi && bhi >= bLo
          case _ => true
        }
      }
      .map(_.toString)
  }
}
