package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic cross-engine numeric helpers.
  *
  * `round()` is NOT portable across engines: Spark rounds the shortest
  * decimal representation HALF_UP (1222.745 → 1222.75) while DuckDB
  * rounds the binary double (1222.74499999… → 1222.74). Both are
  * defensible; they differ on half-ulp boundaries. `floor(x*s + 0.5)/s`
  * runs the SAME IEEE-754 ops on the same bits in both engines, so the
  * result is bit-identical. Oracle SQL must use the same formula.
  */
object Det {

  /** Bit-portable round-to-scale: floor(x * 10^d + 0.5) / 10^d.
    * Oracle twin: `floor(x * 1eD + 0.5) / 1eD`. */
  def rnd(c: Column, digits: Int): Column = {
    val s = math.pow(10, digits)
    floor(c * s + lit(0.5)) / lit(s)
  }

  /** 2-decimal money rounding. Oracle: floor(x*100 + 0.5)/100. */
  def money(c: Column): Column = rnd(c, 2)

  /** 6-decimal rate rounding. Oracle: floor(x*1e6 + 0.5)/1e6. */
  def rate(c: Column): Column = rnd(c, 6)

  /** Total-order a finished frame WITHOUT double-executing its
    * derivation: a global ORDER BY's RangePartitioner SAMPLES its
    * child, so an exchange-free pre-sort chain (scan → heavy per-row
    * compute, or a join/agg whose distribution the child already
    * satisfies) runs twice — once for the sample pass, once for real
    * (SCALE.md round 13: two back-to-back 14 s jobs inside one q72).
    * The eager checkpoint materializes the output-sized rows so the
    * sample reads blocks. Use ONLY where the pre-sort chain is
    * expensive AND exchange-free — behind a shuffle the sample pass
    * reuses map outputs and this barrier would be pure overhead. */
  def ordered(df: DataFrame, keys: Column*): DataFrame =
    df.localCheckpoint().orderBy(keys: _*)
}

/** Share-of-total WITHOUT an unpartitioned window: the total is a
  * 1-row aggregate broadcast back into the frame. Numerically identical
  * to `sum().over(Window.partitionBy())` for integer value columns
  * (exact sum either way), but avoids the single-partition WindowExec
  * stage and its "No Partition Defined" warning on every run. */
object Share {
  def of(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val total = df.agg(sum(col(valueCol)).as("__total"))
    df.crossJoin(broadcast(total))
      .withColumn(outCol, Det.rate(col(valueCol).cast("double") / col("__total")))
      .drop("__total")
  }
}
