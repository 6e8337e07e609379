package graft.battle

import graft.sources.{AwtChartRenderer, ChartRenderer, ChartSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The notebook's on-disk plot bundle — generate_card_plots
  * (plots.py:144-212) + generate_meta_plots (meta_workflow.py:608-686,
  * per-deck helper :94-184) re-expressed engine-side. Every chart is
  * written TWICE: the Vega-Lite spec (`<name>.json`, the golden-testable
  * engine artifact) and a rasterized `<name>.png` through the
  * [[ChartRenderer]] adapter, so a reference user gets the same files
  * the demo notebook's cell 4 consumes — fully offline.
  *
  * All inputs are the final SMALL aggregates (top-10 cards, ≤6
  * archetypes), so the driver-side collects here are bounded by
  * construction at any input scale — same argument as [[ChartSpec]].
  */
object PlotBundle {

  /** meta_workflow.py:176 — `attacker_type.lower().replace(" ", "_")`. */
  private[battle] def safeName(s: String): String = s.toLowerCase.replace(" ", "_")

  private def write(spec: String, dir: String, name: String,
      renderer: ChartRenderer): (String, String) = {
    ChartSpec.writeChartSpec(spec, s"$dir/$name.json")
    val png = s"$dir/$name.png"
    renderer.render(spec, png)
    name -> png
  }

  /** generate_card_plots (plots.py:144-212): the 7 per-user plot files
    * (4 card bars, 2 deck-type pies, 1 deck-type bar) from a
    * classified-battle frame. Returns logical name → png path, keys
    * matching the reference's analytics["plots"] dict. */
  def userPlots(classified: DataFrame, dir: String, prefix: String = "user",
      renderer: ChartRenderer = AwtChartRenderer): Map[String, String] = {
    def cards(side: String, worst: Boolean): DataFrame =
      UserAnalytics.cardPerformanceBySide(classified, side, worst = worst)
        .select(col("card"), col("win_rate"))
    def types(side: String): DataFrame =
      UserAnalytics.deckTypesBySide(classified, side)
        .select(col("deck_type").as("type"), col("games"), col("win_rate"))
    Map(
      "best_cards" -> write(ChartSpec.barSpec(cards("my", worst = false),
        "Best Cards (Win Rate)", "card", "win_rate"),
        dir, s"${prefix}_best_cards", renderer),
      "worst_cards" -> write(ChartSpec.barSpec(cards("my", worst = true),
        "Worst Cards (Win Rate)", "card", "win_rate"),
        dir, s"${prefix}_worst_cards", renderer),
      "tough_opp_cards" -> write(ChartSpec.barSpec(cards("opp", worst = false),
        "Opponent Threat Cards (Their Win Rate)", "card", "win_rate"),
        dir, s"${prefix}_tough_opp_cards", renderer),
      "easy_opp_cards" -> write(ChartSpec.barSpec(cards("opp", worst = true),
        "Opponent Easy Cards (Their Win Rate)", "card", "win_rate"),
        dir, s"${prefix}_easy_opp_cards", renderer),
      "my_deck_types_pie" -> write(ChartSpec.pieSpec(types("my"),
        "My Deck Types (by Games)", "type", "games"),
        dir, s"${prefix}_my_deck_types", renderer),
      "opp_deck_types_pie" -> write(ChartSpec.pieSpec(types("opp"),
        "Opponent Deck Types (by Games)", "type", "games"),
        dir, s"${prefix}_opp_deck_types", renderer),
      "opp_deck_types_bar" -> write(ChartSpec.barSpec(types("opp")
          .select(col("type"), col("win_rate")),
        "My Win Rate vs Opponent Deck Types", "type", "win_rate"),
        dir, s"${prefix}_opp_deck_types_bar", renderer),
    ).map { case (k, (_, png)) => k -> png }
  }

  /** generate_meta_plots (meta_workflow.py:608-686): the meta pie +
    * win-rate bar plus one matchup bar per archetype
    * (_plot_meta_matchups_by_deck :94-184 — mirror matchups excluded
    * from the bars, included in the title's game total, win rates
    * plotted as percent, strongest matchup first). */
  def metaPlots(deckSummary: DataFrame, matchupSummary: DataFrame, dir: String,
      renderer: ChartRenderer = AwtChartRenderer): Map[String, String] = {
    val base = Map(
      "meta_deck_types_pie" -> write(ChartSpec.pieSpec(
        deckSummary.select(col("deck_type").as("type"), col("games")),
        "Meta Deck Types (by Games Played)", "type", "games"),
        dir, "meta_deck_types", renderer),
      "meta_deck_types_winrate_bar" -> write(ChartSpec.barSpec(
        deckSummary.select(col("deck_type").as("type"), col("win_rate")),
        "Meta Deck Types Win Rate (All Participants)", "type", "win_rate"),
        dir, "meta_deck_types_winrate", renderer),
    ).map { case (k, (_, png)) => k -> png }
    // ≤ |archetypes|² rows by construction — a driver loop over the
    // collected keys mirrors the reference's by_attacker grouping
    val perDeck = matchupSummary
      .groupBy(col("deck_type")).agg(sum(col("games")).as("total_games"))
      .orderBy(col("deck_type")).collect()
      .flatMap { r =>
        val (attacker, total) = (r.getString(0), r.getLong(1))
        val rows = matchupSummary
          .filter(col("deck_type") === attacker && col("opp_type") =!= attacker)
          .orderBy(col("win_rate").desc, col("opp_type"))
          .select(col("opp_type"),
            Det2.pct(col("win_rate")).as("win_rate_pct"))
        if (rows.isEmpty) None
        else {
          val title = s"$attacker vs other deck types (meta win rates, $total games)"
          val (_, png) = write(
            ChartSpec.barSpec(rows, title, "opp_type", "win_rate_pct"),
            dir, s"meta_matchups_${safeName(attacker)}", renderer)
          Some(attacker -> png)
        }
      }.toMap
    base ++ perDeck
  }
}

/** Percent projection for plot frames (win_rate × 100, 1-decimal —
  * meta_workflow.py:149's `* 100.0` with its `%1.1f` bar labels). */
private object Det2 {
  def pct(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.operators.Det.rnd(c * 100.0, 1)
}
