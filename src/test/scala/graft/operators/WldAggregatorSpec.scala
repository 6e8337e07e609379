package graft.operators

import graft.SparkSpec
import graft.battle.BattleFixtures
import org.apache.spark.sql.functions._

class WldAggregatorSpec extends SparkSpec {

  test("typed Aggregator agrees with the expression kernel per group") {
    import spark.implicits._
    val battles = BattleFixtures.classifiedBattles(spark, 36)
    // expression form
    val expected = battles.groupBy(col("my_deck_type"))
      .agg(Wld.counts(col("result")).head, Wld.counts(col("result")).tail: _*)
      .withColumn("win_rate", Det.rate(col("wins").cast("double") / col("games")))
      .collect()
      .map(r => r.getAs[String]("my_deck_type") ->
        (r.getAs[Long]("games"), r.getAs[Long]("wins"), r.getAs[Long]("losses"),
          r.getAs[Long]("draws"), r.getAs[Double]("win_rate"))).toMap
    // typed form
    val typed = battles.select(col("my_deck_type").as("k"), col("result"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(WldAggregator.toColumn.name("s"))
      .collect()
      .map { case (k, s) => k -> (s.games, s.wins, s.losses, s.draws, s.win_rate) }.toMap
    assert(typed === expected)
  }

  test("registered as udaf, usable from untyped DataFrame agg") {
    import spark.implicits._
    val wld = udaf(WldAggregator)
    val out = Seq("win", "win", "loss", "other").toDF("result")
      .agg(wld(col("result")).as("s"))
      .select(col("s.games"), col("s.wins"), col("s.draws"), col("s.win_rate"))
      .collect()(0)
    assert(out.getLong(0) === 4L)
    assert(out.getLong(1) === 2L)
    assert(out.getLong(2) === 1L)
    assert(out.getDouble(3) === 0.5)
  }

  test("empty input finishes to zeros") {
    assert(WldAggregator.finish(WldAggregator.zero) === WldStats(0L, 0L, 0L, 0L, 0.0))
  }
}
