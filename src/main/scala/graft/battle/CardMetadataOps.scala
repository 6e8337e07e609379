package graft.battle

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small ingestion-side parity utilities. */
object TagOps {

  /** normalize_player_tag (src/api/battles.py:6-17): trim, uppercase,
    * ensure a leading '#'. */
  def normalizeTag(tag: Column): Column = {
    val t = upper(trim(tag))
    when(t.startsWith("#"), t).otherwise(concat(lit("#"), t))
  }

  /** URL-encoded form ('#' → '%23', battles.py:33-35). */
  def urlEncodeTag(tag: Column): Column =
    regexp_replace(normalizeTag(tag), "#", "%23")
}

/** Card-metadata maintenance (update_cardsdata.py:27-54): merge freshly
  * fetched card stats into the existing metadata dimension by name,
  * backfilling elixir where the existing row lacks it and appending
  * newly seen cards with default flags. */
object CardMetadataOps {

  def backfill(existing: DataFrame, fetched: DataFrame): DataFrame = {
    val f = fetched.select(
      col("name"),
      col("id").as("f_id"),
      col("maxLevel").as("f_maxLevel"),
      col("elixir").as("f_elixir"))
    existing.join(f, Seq("name"), "full_outer")
      .select(
        coalesce(col("id"), col("f_id")).as("id"),
        col("name"),
        coalesce(col("maxLevel"), col("f_maxLevel")).as("maxLevel"),
        coalesce(col("elixir"), col("f_elixir")).as("elixir"),
        coalesce(col("is_big_tank"), lit(false)).as("is_big_tank"),
        coalesce(col("is_bait_piece"), lit(false)).as("is_bait_piece"),
        coalesce(col("is_bridge_spam_piece"), lit(false)).as("is_bridge_spam_piece"))
  }
}
