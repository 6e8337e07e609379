package graft.battle

import graft.{SparkEntry, SparkSpec}

class CoachSessionSpec extends SparkSpec {

  test("coach flow: meta once, user analytics, routed answer with context") {
    val coach = new CoachSession(
      spark,
      BattleFixtures.cardMetaDf(spark),
      () => Iterator.continually(BattleFixtures.classifiedBattles(spark, 30)).take(10),
      minTotal = 100L, minPerType = 20L)
    assert(coach.meta.converged)
    val user = coach.analyzeUser(BattleFixtures.rawBattlesDf(spark))
    val a = coach.answer("How do I play against Beatdown?", user)
    assert(a.category === "matchup")
    assert(a.context.startsWith("{") && a.context.length <= QnaRouter.MaxContextChars)
    assert(a.needs.contains("meta_matchups"))
    // 4 ranked games < 20 → health warning fires for non-meta category
    assert(a.warning.isDefined)
    val metaQ = coach.answer("what does the meta look like", user)
    assert(metaQ.category === "meta")
    assert(metaQ.warning.isEmpty)
  }

  test("driver smoke: SparkEntry.entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq.contains("win_rate"))
  }
}
