package graft.battle

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Workflow-level entry points — the engine-side equivalents of the
  * reference's LangGraph graph builders (langgraph.json →
  * build_user_analytics_graph / build_meta_graph). A reference user
  * calls one function and gets every table that workflow produced.
  */
object UserWorkflow {

  /** All Phase 1 outputs (user_workflow.py:370-400 fan-out +
    * build_user_llm_tables_node :323-363). */
  final case class UserTables(
      normalized: DataFrame,
      summary: DataFrame,
      summaryTable: DataFrame,
      deckTypeSummary: DataFrame,
      deckTypeMatchups: DataFrame,
      userDeckMatchups: DataFrame,
      cardBest: DataFrame,
      cardWorst: DataFrame,
      deckBest: DataFrame,
      deckWorst: DataFrame)

  /** raw battle-log DataFrame (BattleSchema.raw) + card metadata →
    * normalize → classify both sides → cache → six aggregations from
    * the one cached input (mirrors the reference computing all
    * analytics from one normalized list, user_workflow.py:265-290). */
  def run(spark: SparkSession, rawBattles: DataFrame, cardMeta: DataFrame): UserTables = {
    val normalized = Normalize(rawBattles)
      .withColumn("battle_key", monotonically_increasing_id())
    val withMy = DeckType.classifyDecks(normalized, cardMeta, "my_cards", "my_deck_type", Seq("battle_key"))
    val classified = DeckType.classifyDecks(withMy, cardMeta, "opp_cards", "opp_deck_type", Seq("battle_key"))
      .cache()
    UserTables(
      normalized = classified,
      summary = UserAnalytics.computeSummary(classified),
      summaryTable = UserAnalytics.summaryTable(classified),
      deckTypeSummary = UserAnalytics.summarizeDeckTypes(classified),
      deckTypeMatchups = UserAnalytics.deckTypeMatchups(classified),
      userDeckMatchups = UserAnalytics.userDeckMatchups(spark, classified),
      cardBest = UserAnalytics.cardPerformance(classified),
      cardWorst = UserAnalytics.cardPerformance(classified, worst = true),
      deckBest = UserAnalytics.deckPerformance(classified),
      deckWorst = UserAnalytics.deckPerformance(classified, worst = true))
  }
}

object MetaWorkflow {

  /** All Phase 0 outputs (meta_workflow.py:715-774 post-loop pipeline). */
  final case class MetaTables(
      battles: DataFrame,
      participants: DataFrame,
      matrix: DataFrame,
      deckSummary: DataFrame,
      matchupSummary: DataFrame,
      deckTypeCounts: DataFrame,
      converged: Boolean,
      loops: Int,
      totalBattles: Long)

  /** Convergence loop over classified-battle batches, then the post-loop
    * aggregation pipeline runs ONCE (the reference recomputes per
    * iteration; SURVEY §3.2 restructures to convergence-counts-only
    * in-loop). */
  def run(
      spark: SparkSession,
      batches: Iterator[DataFrame],
      minTotal: Long = 2000L,
      minPerType: Long = 200L,
      maxLoops: Int = 20,
      summaryMinGames: Int = 200,
      matchupMinGames: Int = 30): MetaTables = {
    val loop = MetaLoop.run(spark, batches, minTotal, minPerType, maxLoops)
    val participants = MetaAnalytics.participantTable(loop.battles).cache()
    val matrix = MetaAnalytics.symmetricMatchupMatrix(loop.battles)
    MetaTables(
      battles = loop.battles,
      participants = participants,
      matrix = matrix,
      deckSummary = MetaAnalytics.metaDeckSummary(participants, summaryMinGames),
      matchupSummary = MetaAnalytics.metaMatchupSummary(matrix, matchupMinGames),
      deckTypeCounts = MetaAnalytics.deckTypeCounts(spark, participants),
      converged = loop.converged,
      loops = loop.loops,
      totalBattles = loop.totalBattles)
  }

  /** Phase 0 END-TO-END from the REST source — the reference's full meta
    * graph including its API nodes (meta_workflow.py:192-207
    * fetch_top_players_node, :217-276 sample_initial/incremental with
    * used-index exclusion, battle-log fetch per cohort): leaderboard →
    * salted exact-k cohort sampling (tags never resampled across loops)
    * → battle-log fetch through the RestClient boundary → normalize →
    * two-sided classification → the convergence loop above.
    *
    * The per-loop cohort collect is bounded by cohortK (50 in the
    * reference) and mirrors its driver-side control flow; battle data
    * itself never leaves executors. */
  def runFromSource(
      spark: SparkSession,
      client: graft.sources.RestClient,
      cardMeta: DataFrame,
      topLimit: Int = 1000,
      cohortK: Int = 50,
      minTotal: Long = 2000L,
      minPerType: Long = 200L,
      maxLoops: Int = 20,
      summaryMinGames: Int = 200,
      matchupMinGames: Int = 30): MetaTables = {
    import graft.sources.RestBattleSource
    val top = RestBattleSource.fetchTopPlayers(spark, client, topLimit)
      .select(col("tag")).cache()
    val batches = new Iterator[DataFrame] {
      private var used: DataFrame = top.limit(0)
      private var loopNo = 0
      override def hasNext: Boolean = true // MetaLoop bounds via maxLoops
      override def next(): DataFrame = {
        loopNo += 1
        val cohort = PlayerSampler.sampleUnused(top, used, cohortK, "tag", s"loop$loopNo")
        val tags = cohort.collect().map(_.getString(0)).toSeq
        used = used.union(cohort)
        val raw = RestBattleSource.fetchBattles(spark, client, tags)
        val normalized = Normalize(raw)
          .withColumn("battle_key", monotonically_increasing_id())
        val withMy = DeckType.classifyDecks(normalized, cardMeta, "my_cards", "my_deck_type", Seq("battle_key"))
        DeckType.classifyDecks(withMy, cardMeta, "opp_cards", "opp_deck_type", Seq("battle_key"))
      }
    }
    run(spark, batches, minTotal, minPerType, maxLoops, summaryMinGames, matchupMinGames)
  }
}

/** Exact-k deterministic sampling with used-key exclusion — the Phase 0
  * cohort sampler (src/utils/sampling.py:5-31 + unused-index sampling
  * meta_workflow.py:263-276). The reference's unseeded random.sample is
  * replaced by a salted md5 value-order: pseudo-random, exact-k,
  * engine- and partitioning-independent (Spark's rand(seed) changes
  * with partition layout; df.sample is Bernoulli, not exact-k). */
object PlayerSampler {
  def sampleUnused(
      players: DataFrame,
      used: DataFrame,
      k: Int,
      keyCol: String,
      salt: String): DataFrame =
    players.join(used.select(col(keyCol)), Seq(keyCol), "left_anti")
      .orderBy(md5(concat(lit(salt), col(keyCol).cast("string"))), col(keyCol))
      .limit(k)
}
