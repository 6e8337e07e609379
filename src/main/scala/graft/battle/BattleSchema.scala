package graft.battle

import org.apache.spark.sql.types._

/** Data model for the battle domain (SURVEY.md §1).
  *
  * Raw battle shape per reference consumers
  * (src/analytics/battle_filters.py:19-89, fields observed in
  * testapi.py:48); only fields the pipeline reads are modeled.
  */
object BattleSchema {

  /** Whitelisted ranked-1v1 game mode ids
    * (src/analytics/battle_filters.py:4-7). */
  val RankedModeIds: Seq[Long] = Seq(72000006L, 72000464L)

  val cardStruct: StructType = StructType(Seq(
    StructField("name", StringType)))

  val participantStruct: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("crowns", IntegerType),
    StructField("cards", ArrayType(cardStruct))))

  /** Raw battle-log schema for spark.read.schema(...).json. */
  val raw: StructType = StructType(Seq(
    StructField("battleTime", StringType),
    StructField("type", StringType),
    StructField("gameMode", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType)))),
    StructField("team", ArrayType(participantStruct)),
    StructField("opponent", ArrayType(participantStruct))))
}

/** Flat post-normalization row (battle_filters.py:56-63). */
final case class NormalizedBattle(
    battle_time: String,
    result: String, // "win" | "loss" | "draw"
    my_cards: Seq[String],
    opp_cards: Seq[String],
    mode_name: String)

/** Card metadata dimension row (src/data/card_metadata.json shape,
  * template getcards.py:74-89). elixir is nullable — Mirror has none. */
final case class CardMeta(
    id: Long,
    name: String,
    maxLevel: Int,
    elixir: Option[Int],
    is_big_tank: Boolean,
    is_bait_piece: Boolean,
    is_bridge_spam_piece: Boolean)
