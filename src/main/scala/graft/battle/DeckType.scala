package graft.battle

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deck archetype classification (src/analytics/deck_type.py:85-152;
  * features :38-82): a priority rule cascade over per-deck features
  * computed from the card-metadata dimension.
  *
  * Two tiers (SURVEY §2.4):
  *  - `classifyDeck`: plain Scala function over a broadcastable Map —
  *    mirrors the reference exactly; used by unit/property tests and as
  *    a UDF where a column-level classifier is convenient.
  *  - `classifyDecks`: relational decomposition — explode cards →
  *    broadcast-join metadata → groupBy features → CASE cascade. Fully
  *    Catalyst-optimizable (predicate pushdown, partial agg, codegen)
  *    and the scale path for classifying billions of decks.
  *
  * Semantics preserved from the reference:
  *  - avg elixir = sum(known elixirs) / 8.0 — FIXED denominator 8, null
  *    elixirs contribute 0 (deck_type.py:51-61)
  *  - defaults avg=3.0, cycle=12.0 when no elixir known
  *  - 4-card cycle cost = sum of the 4 cheapest known elixirs
  *  - cascade: Siege (X-Bow or Mortar) → Bait (≥3 bait pieces) →
  *    Cycle (cycle cost ≤ 9) → Bridge Spam (≥2 pieces) → Beatdown
  *    (≥1 big tank AND avg ≥ 3.5) → Hybrid; empty deck → Hybrid
  */
object DeckType {

  val Archetypes: Seq[String] =
    Seq("Siege", "Bait", "Cycle", "Bridge Spam", "Beatdown", "Hybrid")

  /** Archetypes that must reach coverage in Phase 0 (Hybrid exempt;
    * meta_workflow.py:42-49). */
  val RequiredArchetypes: Seq[String] =
    Seq("Siege", "Bait", "Cycle", "Bridge Spam", "Beatdown")

  // ------------------------------------------------------------ tier 1
  def classifyDeck(cards: Seq[String], meta: Map[String, CardMeta]): String = {
    if (cards.isEmpty) return "Hybrid"
    val metas = cards.flatMap(meta.get)
    val elixirs = metas.flatMap(_.elixir)
    val avg = if (elixirs.isEmpty) 3.0 else elixirs.sum / 8.0
    val cycle = if (elixirs.isEmpty) 12.0 else elixirs.sorted.take(4).sum.toDouble
    val baitCount = metas.count(_.is_bait_piece)
    val bridgeCount = metas.count(_.is_bridge_spam_piece)
    val tankCount = metas.count(_.is_big_tank)
    if (cards.contains("X-Bow") || cards.contains("Mortar")) "Siege"
    else if (baitCount >= 3) "Bait"
    else if (cycle <= 9) "Cycle"
    else if (bridgeCount >= 2) "Bridge Spam"
    else if (tankCount >= 1 && avg >= 3.5) "Beatdown"
    else "Hybrid"
  }

  // ------------------------------------------------------------ tier 2
  /** The cascade as a Column over feature columns. */
  private def cascade: Column =
    when(col("has_xbow") || col("has_mortar"), "Siege")
      .when(col("bait_count") >= 3, "Bait")
      .when(col("cycle_cost") <= 9, "Cycle")
      .when(col("bridge_count") >= 2, "Bridge Spam")
      .when(col("tank_count") >= 1 && col("avg_elixir") >= 3.5, "Beatdown")
      .otherwise("Hybrid")

  /** Classify a deck column on `df`. `idCols` must uniquely key rows;
    * all other columns are re-joined after aggregation. cardMeta is the
    * (tiny) metadata dimension — always broadcast.
    *
    * Pipeline: explode_outer(cards) → broadcast left join meta →
    * groupBy(id) feature agg → CASE. Empty decks survive via
    * explode_outer and classify as Hybrid (cycle default 12, no flags).
    */
  def classifyDecks(
      df: DataFrame,
      cardMeta: DataFrame,
      cardsCol: String,
      outCol: String,
      idCols: Seq[String]): DataFrame = {
    val ids = idCols.map(col)
    val exploded = df
      .select(ids :+ col(cardsCol).as("__cards"): _*)
      .select(ids :+ explode_outer(col("__cards")).as("__card"): _*)
      .join(broadcast(cardMeta.select(
        col("name").as("__card"), col("elixir"),
        col("is_big_tank"), col("is_bait_piece"), col("is_bridge_spam_piece"))),
        Seq("__card"), "left")
    val feats = exploded
      .groupBy(ids: _*)
      .agg(
        max(when(col("__card") === "X-Bow", true).otherwise(false)).as("has_xbow"),
        max(when(col("__card") === "Mortar", true).otherwise(false)).as("has_mortar"),
        sum(when(col("is_bait_piece"), 1).otherwise(0)).as("bait_count"),
        sum(when(col("is_bridge_spam_piece"), 1).otherwise(0)).as("bridge_count"),
        sum(when(col("is_big_tank"), 1).otherwise(0)).as("tank_count"),
        count(col("elixir")).as("known_elixirs"),
        sum(coalesce(col("elixir"), lit(0))).as("elixir_sum"),
        sort_array(collect_list(col("elixir"))).as("known_sorted"))
      .withColumn("avg_elixir",
        when(col("known_elixirs") === 0, 3.0)
          .otherwise(col("elixir_sum").cast("double") / 8.0))
      .withColumn("cycle_cost",
        when(col("known_elixirs") === 0, 12.0)
          .otherwise(expr(
            "CAST(aggregate(slice(known_sorted, 1, 4), 0, (acc, x) -> acc + x) AS DOUBLE)")))
    val classified = feats.select(ids :+ cascade.as(outCol): _*)
    df.join(classified, idCols)
  }
}
