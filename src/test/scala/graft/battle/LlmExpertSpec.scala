package graft.battle

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.scalatest.funsuite.AnyFunSuite

/** The production expert answerer against a local OpenAI-shaped stub:
  * request shape (auth, model, 700-token budget, the reference's
  * prompt template), the happy path, and the never-throws error
  * contract (phase2_qna_workflow.py:328-433). */
class LlmExpertSpec extends AnyFunSuite {

  private def withServer[T](status: Int, body: String)(
      f: (String, () => String, () => String) => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastBody: String = null
    @volatile var lastAuth: String = null
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastAuth = ex.getRequestHeaders.getFirst("Authorization")
        lastBody = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => lastBody, () => lastAuth)
    finally server.stop(0)
  }

  private def completion(content: String): String = {
    val esc = content.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    s"""{"choices": [{"message": {"role": "assistant", "content": "$esc"}}]}"""
  }

  private val ctx = CoachSession.Answer(
    category = "matchup",
    needs = Seq("user_matchups", "meta_matchups"),
    context = """{"user_matchups":[{"deck_type":"cycle","wins":3}]}""",
    warning = Some("Low data: only 7 ranked games (< 20)"))

  test("happy path: returns the model's prose, sends auth/model/budget/template") {
    withServer(200, completion("Play the cycle deck.\nPressure both lanes.")) {
      (base, lastBody, lastAuth) =>
        val text = new LlmExpert(base, "sk-exp").answer("why do I lose to beatdown?", ctx)
        assert(text === "Play the cycle deck.\nPressure both lanes.")
        assert(lastAuth() === "Bearer sk-exp")
        assert(lastBody().contains("\"model\": \"gpt-4.1-mini\""))
        assert(lastBody().contains("\"max_tokens\": 700"))
        // the reference's user-prompt template slots, escaped into JSON
        val body = lastBody()
        assert(body.contains("User question:\\nwhy do I lose to beatdown?"))
        assert(body.contains("Question category: matchup"))
        assert(body.contains("Low data: only 7 ranked games"))
        assert(body.contains("""{\"user_matchups\":"""))
        assert(body.contains("You are a Clash Royale coach."))
    }
  }

  test("no warning and empty context render the template's defaults") {
    withServer(200, completion("ok")) { (base, lastBody, _) =>
      val a = ctx.copy(warning = None, context = "")
      new LlmExpert(base, "k").answer("q", a)
      assert(lastBody().contains("Data quality warning (if any):\\nNone."))
      assert(lastBody().contains("Context tables (JSON):\\n{}"))
    }
  }

  test("non-200 yields the reference's apology string, never throws") {
    withServer(500, """{"error": "overloaded"}""") { (base, _, _) =>
      val text = new LlmExpert(base, "k").answer("q", ctx)
      assert(text.startsWith("I ran into an error calling the expert model."))
      assert(text.contains("internal note:"))
    }
  }

  test("malformed completion reply lands on the apology path") {
    withServer(200, """{"unexpected": true}""") { (base, _, _) =>
      val text = new LlmExpert(base, "k").answer("q", ctx)
      assert(text.startsWith("I ran into an error calling the expert model."))
    }
  }

  test("unreachable server lands on the apology path") {
    val text = new LlmExpert("http://127.0.0.1:1", "k", timeoutMs = 300).answer("q", ctx)
    assert(text.startsWith("I ran into an error calling the expert model."))
  }

  test("EchoExpert is deterministic: warning then context") {
    assert(EchoExpert.answer("q", ctx) ===
      "Low data: only 7 ranked games (< 20)\n" + ctx.context)
    assert(EchoExpert.answer("q", ctx.copy(warning = None)) === ctx.context)
  }
}
