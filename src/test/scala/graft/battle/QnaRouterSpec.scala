package graft.battle

import graft.SparkSpec

class QnaRouterSpec extends SparkSpec {

  test("keyword routing picks categories; unknown falls back to other + SEND_ALL") {
    assert(QnaRouter.classify("How do I play against Beatdown?")._1 === "matchup")
    assert(QnaRouter.classify("what is my best card")._1 === "card")
    assert(QnaRouter.classify("what does the meta look like")._1 === "meta")
    assert(QnaRouter.classify("how is my win rate")._1 === "user")
    val (cat, needs) = QnaRouter.classify("zzzzz unrelated")
    assert(cat === "other")
    assert(needs === QnaRouter.DefaultNeeds("other"))
  }

  test("keywords match whole words only, not substrings") {
    // "hi" must not hit "i", "game" must not hit "me", "favs" must not
    // hit "vs" — these previously stole the "other" SEND_ALL fallback
    assert(QnaRouter.classify("hi there, explain the game")._1 === "other")
    assert(QnaRouter.classify("list some favs please")._1 === "other")
    assert(QnaRouter.classify("what should I play")._1 === "user")
    assert(QnaRouter.classify("X versus Y")._1 === "matchup")
    // multi-word phrase still matches across whitespace
    assert(QnaRouter.classify("show win    rate please")._1 === "user")
  }

  test("context JSON selects needed tables, limits rows, truncates at 4000") {
    import spark.implicits._
    val big = (0 until 500).map(i => (i.toLong, "x" * 50)).toDF("id", "pad")
    val small = Seq((1L, 0.5)).toDF("deck", "wr")
    val ctx = QnaRouter.buildContext(Seq("user_summary", "missing_table"),
      Map("user_summary" -> small))
    assert(ctx.contains("\"user_summary\""))
    assert(!ctx.contains("missing_table"))
    val bigCtx = QnaRouter.buildContext(Seq("a", "b"), Map("a" -> big, "b" -> big), topN = 100)
    assert(bigCtx.length <= QnaRouter.MaxContextChars)
  }

  test("data health warning skipped for meta category") {
    assert(QnaRouter.dataHealthWarning("user", 5L).isDefined)
    assert(QnaRouter.dataHealthWarning("meta", 5L).isEmpty)
    assert(QnaRouter.dataHealthWarning("user", 25L).isEmpty)
  }
}
