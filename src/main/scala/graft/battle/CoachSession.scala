package graft.battle

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The combined coach flow (build_coach_graph,
  * phase2_qna_workflow.py:659-685) as a non-interactive session object:
  * ensure-meta once, analyze a user, answer questions over the computed
  * tables. The reference's human-interrupt/LLM boundaries become plain
  * method calls; an LLM-backed answerer can wrap `answer`'s context.
  */
final class CoachSession(
    spark: SparkSession,
    cardMeta: DataFrame,
    metaBatches: () => Iterator[DataFrame],
    minTotal: Long = 2000L,
    minPerType: Long = 200L,
    classifier: QuestionClassifier = QnaRouter) {

  /** ensure_meta (:557-570): Phase 0 runs once, lazily. */
  lazy val meta: MetaWorkflow.MetaTables =
    MetaWorkflow.run(spark, metaBatches(), minTotal, minPerType)

  /** ensure_user (:601-615): Phase 1 for one player's raw battle log. */
  def analyzeUser(rawBattles: DataFrame): UserWorkflow.UserTables =
    UserWorkflow.run(spark, rawBattles, cardMeta)

  /** qa_answer (:621-642): classify → select tables → assemble context
    * → health check. The returned context is what the expert LLM call
    * receives — render it with [[coach]] (LLM-backed via [[LlmExpert]],
    * or the deterministic [[EchoExpert]] for CI flows). */
  def answer(question: String, user: UserWorkflow.UserTables): CoachSession.Answer = {
    val (category, needs) = classifier.classify(question)
    val tables = Map(
      "user_summary" -> user.summaryTable,
      "user_deck_summary" -> user.deckTypeSummary,
      "user_matchups" -> user.deckTypeMatchups,
      "card_performance" -> user.cardBest,
      "meta_deck_summary" -> meta.deckSummary,
      "meta_matchups" -> meta.matchupSummary)
    val context = QnaRouter.buildContext(needs, tables)
    val games = user.summary.collect()(0).getAs[Long]("games")
    CoachSession.Answer(category, needs, context, QnaRouter.dataHealthWarning(category, games))
  }

  /** The full expert_answer flow (phase2_qna_workflow.py:328-433):
    * assemble the answer context, then render it through `expert`. */
  def coach(question: String, user: UserWorkflow.UserTables,
      expert: ExpertAnswerer): String =
    expert.answer(question, answer(question, user))
}

object CoachSession {
  final case class Answer(
      category: String,
      needs: Seq[String],
      context: String,
      warning: Option[String])
}
