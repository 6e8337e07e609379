package graft.battle

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {

  private lazy val raw = BattleFixtures.rawBattlesDf(spark)

  test("filters to ranked 1v1 with full decks and normalizes fields") {
    val out = Normalize(raw).collect().map(r =>
      (r.getAs[String]("battle_time"), r.getAs[String]("result"),
        r.getAs[Seq[String]]("my_cards").size, r.getAs[String]("mode_name")))
    // battles 1,2,3,7 survive; 4 (2v2), 5 (mode), 6 (<8 cards), 8 (7 cards) drop
    assert(out.length === 4)
    assert(out.map(_._2).toSeq.sorted === Seq("draw", "loss", "loss", "win"))
    assert(out.forall(_._3 == 8))
  }

  test("mode_name falls back to type when gameMode.name is null") {
    val out = Normalize(raw).collect()
    val fallback = out.filter(_.getAs[String]("battle_time") == "20251210T159000.000Z")
    assert(fallback.length === 1)
    assert(fallback.head.getAs[String]("mode_name") === "PvP")
  }

  test("crowns comparison produces win/loss/draw") {
    val byTime = Normalize(raw).collect()
      .map(r => r.getAs[String]("battle_time") -> r.getAs[String]("result")).toMap
    assert(byTime("20251210T153000.000Z") === "win")
    assert(byTime("20251210T154000.000Z") === "loss")
    assert(byTime("20251210T155000.000Z") === "draw")
  }

  test("requireFullDecks=false keeps partial decks with cleaned card names") {
    val out = Normalize(raw, requireFullDecks = false).collect()
      .filter(_.getAs[String]("battle_time") == "20251210T158000.000Z")
    assert(out.length === 1)
    // 6 real cards + "" + "  " → trimmed/empty dropped → 6
    assert(out.head.getAs[Seq[String]]("my_cards").size === 6)
  }
}
