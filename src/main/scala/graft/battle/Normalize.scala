package graft.battle

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter + normalize of raw battle logs
  * (src/analytics/battle_filters.py:10-124), as one declarative
  * filter→project chain that Catalyst fuses; nested-array work uses
  * codegen'd higher-order functions, no UDFs.
  */
object Normalize {

  /** is_ranked_1v1_battle (battle_filters.py:10-35): exactly one
    * participant per side and a whitelisted gameMode id. */
  def isRanked1v1: Column =
    size(col("team")) === 1 && size(col("opponent")) === 1 &&
      col("gameMode.id").isin(BattleSchema.RankedModeIds: _*)

  /** cards[].name, trimmed, nulls/empties dropped
    * (battle_filters.py:76-86). */
  private def cardNames(side: Column): Column =
    filter(
      transform(side.getItem(0).getField("cards"),
        c => trim(c.getField("name"))),
      x => x.isNotNull && x =!= "")

  /** crowns comparison → result enum (battle_filters.py:38-49). */
  private def resultCol: Column = {
    val my = col("team").getItem(0).getField("crowns")
    val opp = col("opponent").getItem(0).getField("crowns")
    when(my > opp, "win").when(my < opp, "loss").otherwise("draw")
  }

  /** filter_and_normalize_ranked_1v1 (battle_filters.py:100-124) with the
    * 8-card guard applied uniformly at normalization (SURVEY §2.13: the
    * reference guards user-side classification but not meta-side; we
    * normalize the divergence here and document it). */
  def apply(raw: DataFrame, requireFullDecks: Boolean = true): DataFrame = {
    val normalized = raw
      .filter(isRanked1v1)
      .select(
        col("battleTime").as("battle_time"),
        resultCol.as("result"),
        cardNames(col("team")).as("my_cards"),
        cardNames(col("opponent")).as("opp_cards"),
        coalesce(col("gameMode.name"), col("type")).as("mode_name"))
    if (requireFullDecks)
      normalized.filter(size(col("my_cards")) === 8 && size(col("opp_cards")) === 8)
    else normalized
  }
}
