package graft.battle

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Production [[QuestionClassifier]]: an OpenAI-compatible
  * chat-completions client (phase2_qna_workflow.py:224-267 +
  * llm_client.py:39-49), the Phase-2 sibling of
  * [[graft.sources.UrlRestClient]]. POSTs the reference's classifier
  * prompt pair to `{baseUrl}/v1/chat/completions` with the reference's
  * budget (model + max_tokens=300, phase2_constants.py:8), then applies
  * the reference's validation cascade to the reply — every failure
  * lands on the documented fallback rather than throwing, because the
  * reference's graph keeps routing on LLM errors:
  *
  *  - transport error / non-200          → ("other", SEND_ALL)   (:238-242)
  *  - reply not JSON                     → ("other", SEND_ALL)   (:245-252)
  *  - category outside the allowed list  → ("other", SEND_ALL)   (:254-257)
  *  - data_needs filtered to known blocks; none left → category default (:259-261)
  *
  * "SEND_ALL" (the reference's fallback block) expands to the engine's
  * full table list, i.e. `DefaultNeeds("other")`. Like UrlRestClient
  * the transport is the JDK's HttpURLConnection — no added
  * dependencies, 10 s timeouts — and the sandbox has no egress, so
  * LlmClassifierSpec drives it against a local JDK HttpServer. */
final class LlmClassifier(
    baseUrl: String,
    apiKey: String,
    model: String = "gpt-4.1-nano",
    timeoutMs: Int = 10000) extends QuestionClassifier {

  private val fallback: (String, Seq[String]) =
    ("other", QnaRouter.DefaultNeeds("other"))

  /** Data blocks an LLM reply may request: the engine's table names
    * (lowercase DATANEEDS, phase2_constants.py:28-40) plus the
    * SEND_ALL marker. */
  private val knownBlocks: Set[String] =
    QnaRouter.DefaultNeeds.values.flatten.toSet

  override def classify(question: String): (String, Seq[String]) = {
    val reply =
      try LlmTransport.post(baseUrl, apiKey, LlmClassifier.requestBody(model, question), timeoutMs)
      catch { case _: Exception => return fallback }
    val parsed =
      try {
        LlmTransport.content(reply) match {
          case Some(c) => JsonMethods.parse(c)
          case None => return fallback
        }
      } catch { case _: Exception => return fallback }
    val category = parsed \ "category" match {
      case JString(c) if QnaRouter.Categories.contains(c) => c
      case _ => return fallback
    }
    val requested = parsed \ "data_needs" match {
      case JArray(vs) => vs.collect { case JString(v) => v }
      case _ => Nil
    }
    // SEND_ALL stays a valid block (phase2_constants.py:39) — it expands
    // to every table, the category keeps the LLM's routing
    if (requested.contains("SEND_ALL")) (category, QnaRouter.DefaultNeeds("other"))
    else {
      val cleaned = requested.filter(knownBlocks)
      (category, if (cleaned.nonEmpty) cleaned else QnaRouter.DefaultNeeds(category))
    }
  }

}

object LlmClassifier {

  /** The reference's routing system prompt, adapted to the engine's
    * lowercase block names (phase2_constants.py:58-107 — the uppercase
    * DATANEEDS constants map 1:1 onto QnaRouter's table keys). */
  val SystemPrompt: String =
    """You are a routing classifier for a Clash Royale analytics assistant.
      |Classify the user's question into ONE category (user, matchup, meta,
      |card, other) and choose the MINIMAL data blocks needed: user_summary,
      |user_deck_summary, user_matchups, meta_matchups, meta_deck_summary,
      |card_performance, SEND_ALL. If unclear: category="other",
      |data_needs=["SEND_ALL"]. Return ONLY valid JSON:
      |{"category": "...", "data_needs": ["..."]}""".stripMargin

  /** max_tokens=300: the classifier budget (phase2_constants.py:8). */
  private[battle] def requestBody(model: String, question: String): String =
    LlmTransport.requestBody(model, 300, SystemPrompt, question)
}
