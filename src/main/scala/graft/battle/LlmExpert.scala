package graft.battle

/** LLM boundary for the expensive coaching answer: [[CoachSession]]
  * assembles the context; an implementation turns it into prose. The
  * deterministic default used in CI-testable flows is
  * [[EchoExpert]]. */
trait ExpertAnswerer {
  def answer(question: String, a: CoachSession.Answer): String
}

/** Deterministic non-networked fallback: renders the assembled context
  * verbatim — what `CoachSession.answer` exposed before an HTTP-backed
  * answerer existed. */
object EchoExpert extends ExpertAnswerer {
  override def answer(question: String, a: CoachSession.Answer): String =
    a.warning.map(w => s"$w\n").getOrElse("") + a.context
}

/** Production [[ExpertAnswerer]]: the expensive coach call
  * (expert_answer_llm_node, phase2_qna_workflow.py:328-433) on the
  * shared [[LlmTransport]] — the reference's coach system prompt, the
  * same user-prompt template (question / category / warning / context
  * tables JSON, the 4000-char cap already applied by
  * QnaRouter.buildContext), EXPERT_MODEL with max_tokens=700
  * (phase2_constants.py:11). Errors never propagate: the reference's
  * graph answers with its apology string and carries on (:421-427),
  * and so does this client. */
final class LlmExpert(
    baseUrl: String,
    apiKey: String,
    model: String = "gpt-4.1-mini",
    timeoutMs: Int = 10000) extends ExpertAnswerer {

  override def answer(question: String, a: CoachSession.Answer): String =
    try {
      val reply = LlmTransport.post(baseUrl, apiKey,
        LlmTransport.requestBody(model, 700, LlmExpert.SystemPrompt,
          LlmExpert.userPrompt(question, a)), timeoutMs)
      LlmTransport.content(reply) match {
        case Some(text) => text
        case None => throw new RuntimeException("malformed completion reply")
      }
    } catch {
      case e: Exception =>
        s"I ran into an error calling the expert model. (internal note: ${e.getMessage})"
    }
}

object LlmExpert {

  /** The reference's coach system prompt (phase2_qna_workflow.py:377-389). */
  val SystemPrompt: String =
    """You are a Clash Royale coach.
      |You receive:
      |- A short text summary of available stats (user + meta).
      |- One or more tables in JSON form (user_summary, user_matchup_summary, meta_deck_summary, etc.).
      |- An optional data quality warning.
      |
      |Guidelines:
      |1) Always give a clear, concrete answer to the user's question using whatever data is available.
      |2) If user-specific stats are missing or sparse, lean more on the meta tables and general matchup principles.
      |3) Mention the data quality warning briefly once, but do NOT let it dominate the answer.
      |4) Prefer 2-4 short paragraphs with actionable tips.
      |5) Only say you 'can't tell' something if there is truly zero relevant data anywhere.""".stripMargin

  /** The reference's expert user-prompt template (:400-414). The
    * engine's context is the tables-JSON form (QnaRouter.buildContext
    * renders + caps it), so it fills the template's tables slot. */
  private[battle] def userPrompt(question: String, a: CoachSession.Answer): String =
    s"""User question:
       |$question
       |
       |Question category: ${a.category}
       |
       |Data quality warning (if any):
       |${a.warning.getOrElse("None.")}
       |
       |Context tables (JSON):
       |${if (a.context.nonEmpty) a.context else "{}"}""".stripMargin
}
