package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** File sinks (SURVEY §2.1: the reference writes JSON dimension files,
  * getcards.py:66-89 / update_cardsdata.py:27-54; the driver contract
  * adds parquet). Small-table sinks coalesce to one file (dimension
  * semantics); fact sinks keep partitioning and support partitionBy —
  * at 100 TB the partition columns are the pruning keys for every
  * downstream scan.
  */
object Sinks {

  /** Tiny-dimension JSON sink (one file, reference card_metadata shape). */
  def writeJsonDim(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  /** CSV sink with header (small result tables / exports). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Parquet fact sink; partitionBy columns become directory-level
    * pruning keys. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
