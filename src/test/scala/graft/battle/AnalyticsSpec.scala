package graft.battle

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  // 36 battles: results cycle win/loss/draw → 12 each
  private lazy val battles = BattleFixtures.classifiedBattles(spark, 36).cache()

  test("computeSummary: golden WLD counts and rate") {
    val r = UserAnalytics.computeSummary(battles).collect()(0)
    assert(r.getAs[Long]("games") === 36)
    assert(r.getAs[Long]("wins") === 12)
    assert(r.getAs[Long]("losses") === 12)
    assert(r.getAs[Long]("draws") === 12)
    assert(math.abs(r.getAs[Double]("win_rate") - 12.0 / 36) < 1e-6)
  }

  test("computeSummary on empty input: zeros, not nulls (user_analytics.py:213-220)") {
    val empty = battles.filter(lit(false))
    val r = UserAnalytics.computeSummary(empty).collect()(0)
    assert(r.getAs[Long]("games") === 0)
    assert(r.getAs[Double]("win_rate") === 0.0)
  }

  test("participant table has exactly 2 × battles rows, opp results flipped") {
    val p = MetaAnalytics.participantTable(battles).cache()
    assert(p.count() === 72)
    assert(p.filter(col("role") === "my").count() === 36)
    // my wins == opp losses (flip invariant)
    val myWins = p.filter(col("role") === "my" && col("result") === "win").count()
    val oppLosses = p.filter(col("role") === "opp" && col("result") === "loss").count()
    assert(myWins === oppLosses)
    p.unpersist()
  }

  test("symmetric matrix invariants: Σgames = 2×battles, wins(a,b) = losses(b,a)") {
    val m = MetaAnalytics.symmetricMatchupMatrix(battles).cache()
    val totalGames = m.agg(sum("games")).collect()(0).getLong(0)
    assert(totalGames === 2 * 36)
    val cells = m.collect().map(r =>
      (r.getAs[String]("deck_type"), r.getAs[String]("opp_type")) ->
        (r.getAs[Long]("wins"), r.getAs[Long]("losses"))).toMap
    cells.foreach { case ((a, b), (wins, losses)) =>
      val back = cells((b, a))
      assert(wins === back._2, s"wins($a,$b) != losses($b,$a)")
      assert(losses === back._1, s"losses($a,$b) != wins($b,$a)")
    }
    m.unpersist()
  }

  test("meta deck summary: meta_share sums to ~1, sample_ok flags not filters") {
    val p = MetaAnalytics.participantTable(battles)
    val s = MetaAnalytics.metaDeckSummary(p, minGames = 10).cache()
    val shareSum = s.agg(sum("meta_share")).collect()(0).getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-4)
    // every archetype present in data is kept regardless of sample_ok
    assert(s.filter(!col("sample_ok")).count() + s.filter(col("sample_ok")).count() === s.count())
    s.unpersist()
  }

  test("deckTypeCounts zero-fills the full archetype domain") {
    val onlyCycle = battles.filter(col("my_deck_type") === "Cycle" && col("opp_deck_type") === "Cycle")
    val counts = MetaAnalytics.deckTypeCounts(spark, MetaAnalytics.participantTable(onlyCycle))
    assert(counts.count() === DeckType.Archetypes.size)
    assert(counts.filter(col("n") === 0).count() >= 4)
  }

  test("cardPerformance: min-games HAVING filter and flipped opponent results") {
    val perf = UserAnalytics.cardPerformance(battles, minGames = 3)
    val rows = perf.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("games") >= 3))
    // a card appearing on both sides aggregates both POVs
    val all = UserAnalytics.cardPerformance(battles, minGames = 1)
    val totalCardGames = all.agg(sum("games")).collect()(0).getLong(0)
    assert(totalCardGames === 2 * 8 * 36) // 16 card slots per battle
  }

  test("worst ordering is the exact opposite total sort (reversal quirk)") {
    val best = UserAnalytics.cardPerformance(battles, minGames = 1).collect().map(_.getAs[String]("card"))
    val worst = UserAnalytics.cardPerformance(battles, minGames = 1, worst = true).collect().map(_.getAs[String]("card"))
    assert(best.reverse.toSeq === worst.toSeq)
  }

  test("userDeckMatchups: δ=0 puts wr == overall in BOTH tough and easy") {
    // craft battles where one opp deck sits exactly at the overall rate
    val df = BattleFixtures.classifiedBattles(spark, 12) // overall 4/12 = 1/3
    val out = UserAnalytics.userDeckMatchups(spark, df, delta = 0.0)
    val both = out.groupBy(col("opp_deck")).agg(countDistinct(col("role")).as("roles"))
      .filter(col("roles") === 2)
    // any deck at exactly the overall rate must appear twice
    val overall = UserAnalytics.computeSummary(df).collect()(0).getAs[Double]("win_rate")
    val atOverall = out.filter(col("win_rate") === overall).select("opp_deck").distinct().count()
    assert(both.count() === atOverall)
  }

  test("matchup summary applies HAVING and advantage labels") {
    val m = MetaAnalytics.symmetricMatchupMatrix(battles)
    val s = MetaAnalytics.metaMatchupSummary(m, minGames = 2)
    val rows = s.collect()
    assert(rows.forall(_.getAs[Long]("games") >= 2))
    rows.foreach { r =>
      val wr = r.getAs[Double]("win_rate")
      val adv = r.getAs[String]("advantage")
      if (wr >= 0.55) assert(adv === "favored")
      else if (wr <= 0.45) assert(adv === "unfavored")
      else assert(adv === "even")
    }
  }

  test("MetaLoop accumulates batches until convergence") {
    val batch = BattleFixtures.classifiedBattles(spark, 30)
    val batches = Iterator.continually(batch).take(10)
    // 30 battles/batch → 60 participant rows; require 100 total battles &
    // 20 per required archetype → needs 4 batches
    val res = MetaLoop.run(spark, batches, minTotal = 100L, minPerType = 20L, maxLoops = 10)
    assert(res.converged)
    assert(res.loops === 4)
    assert(res.totalBattles === 120)
    DeckType.RequiredArchetypes.foreach { t =>
      assert(res.typeCounts.getOrElse(t, 0L) >= 20L, s"archetype $t")
    }
  }

  test("MetaLoop gives up at maxLoops when threshold unreachable") {
    val batch = BattleFixtures.classifiedBattles(spark, 3)
    val res = MetaLoop.run(spark, Iterator.continually(batch).take(100),
      minTotal = 100000L, minPerType = 100L, maxLoops = 5)
    assert(!res.converged)
    assert(res.loops === 5)
  }
}
