package graft.battle

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ingestion-boundary robustness (SURVEY §1.3: malformed-input handling
  * lives at the source, not scattered through operators): unparseable
  * JSON lines and type-mismatched rows must not kill the pipeline OR
  * silently corrupt downstream aggregates — they surface as nulls at
  * the boundary and are dropped by the same normalization guards that
  * mirror battle_filters.py's defensive checks. */
class CorruptInputSpec extends SparkSpec {

  import spark.implicits._

  test("unparseable and mis-typed JSON lines null out; normalization drops them") {
    val good = BattleFixtures.rawBattleJson.head
    val lines = Seq(
      good,
      """{"battleTime": "20251210T150000.000Z", "type": "PvP", "gameMode": {"id": "NOT_A_NUMBER"}}""",
      """this is not json at all{{{""",
      """{"battleTime": 42}""")
    val parsed = spark.read.schema(BattleSchema.raw)
      .json(spark.createDataset(lines))
    assert(parsed.count() === 4, "PERMISSIVE mode keeps one row per line")
    // corrupt/mis-shaped rows have no team/opponent → the ranked-1v1
    // filter (size == 1 on both) drops them before any aggregate
    val times = Normalize(parsed).select("battle_time").as[String].collect()
    assert(times.length === 1, s"only the good row survives, got ${times.toSeq}")
    assert(good.contains(times.head), "the survivor is the well-formed battle")
  }

  test("FAILFAST mode is the loud alternative at the same boundary") {
    val e = intercept[Exception] {
      spark.read.schema(BattleSchema.raw).option("mode", "FAILFAST")
        .json(spark.createDataset(Seq("""not json"""))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed")
      || e.getCause != null && e.getCause.getMessage.toLowerCase.contains("malformed"))
  }
}
