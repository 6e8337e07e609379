package graft.battle

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import org.scalatest.funsuite.AnyFunSuite

/** The production LLM classifier against a local OpenAI-shaped stub:
  * request shape (auth, model, budget), the happy path, and every
  * branch of the reference's validation cascade
  * (phase2_qna_workflow.py:238-261). */
class LlmClassifierSpec extends AnyFunSuite {

  /** One-route stub server capturing the request body; responds with
    * `status` + `body`. */
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
    val esc = content.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"choices": [{"message": {"role": "assistant", "content": "$esc"}}]}"""
  }

  test("happy path: parses category + data_needs, sends auth/model/budget") {
    withServer(200, completion("""{"category": "card", "data_needs": ["card_performance"]}""")) {
      (base, lastBody, lastAuth) =>
        val c = new LlmClassifier(base, "sk-test")
        assert(c.classify("what are my best cards?") === ("card", Seq("card_performance")))
        assert(lastAuth() === "Bearer sk-test")
        assert(lastBody().contains("\"model\": \"gpt-4.1-nano\""))
        assert(lastBody().contains("\"max_tokens\": 300"))
        assert(lastBody().contains("what are my best cards?"))
    }
  }

  test("SEND_ALL expands to every table, category kept") {
    withServer(200, completion("""{"category": "meta", "data_needs": ["SEND_ALL"]}""")) {
      (base, _, _) =>
        val (cat, needs) = new LlmClassifier(base, "k").classify("?")
        assert(cat === "meta")
        assert(needs === QnaRouter.DefaultNeeds("other"))
    }
  }

  test("unknown data_needs are filtered; empty falls back to the category default") {
    withServer(200, completion("""{"category": "user", "data_needs": ["bogus_block"]}""")) {
      (base, _, _) =>
        assert(new LlmClassifier(base, "k").classify("how am I doing") ===
          ("user", QnaRouter.DefaultNeeds("user")))
    }
  }

  test("invalid category falls back to other + SEND_ALL") {
    withServer(200, completion("""{"category": "weather", "data_needs": []}""")) {
      (base, _, _) =>
        assert(new LlmClassifier(base, "k").classify("?") ===
          ("other", QnaRouter.DefaultNeeds("other")))
    }
  }

  test("non-JSON reply falls back to other + SEND_ALL") {
    withServer(200, completion("sorry, as a language model I route questions")) {
      (base, _, _) =>
        assert(new LlmClassifier(base, "k").classify("?") ===
          ("other", QnaRouter.DefaultNeeds("other")))
    }
  }

  test("transport error (non-200) falls back to other + SEND_ALL, never throws") {
    withServer(429, """{"error": {"message": "rate limited"}}""") { (base, _, _) =>
      assert(new LlmClassifier(base, "k").classify("?") ===
        ("other", QnaRouter.DefaultNeeds("other")))
    }
    // no server at all: connection refused must also land on the fallback
    assert(new LlmClassifier("http://127.0.0.1:1", "k", timeoutMs = 500).classify("?") ===
      ("other", QnaRouter.DefaultNeeds("other")))
  }

  test("drop-in for QnaRouter behind the same trait") {
    withServer(200, completion("""{"category": "matchup", "data_needs": ["user_matchups"]}""")) {
      (base, _, _) =>
        val impls: Seq[QuestionClassifier] = Seq(new LlmClassifier(base, "k"), QnaRouter)
        impls.foreach { impl =>
          val (cat, needs) = impl.classify("why do I lose against hog?")
          assert(cat === "matchup")
          assert(needs.nonEmpty)
        }
    }
  }
}
