package graft.battle

import graft.sources.UrlRestClient
import org.scalatest.funsuite.AnyFunSuite

/** testapi.py twin (testapi.py:27-77): env-gated LIVE connectivity
  * smoke for the two production endpoints. Each test CANCELS (not
  * fails) when its key is absent — the sandbox has no egress, so in CI
  * these report as canceled and the transport stays covered by the
  * local-HTTP specs (UrlRestClientSpec / LlmClassifierSpec). With real
  * keys exported they become "key → real 200" round-trips:
  *
  * {{{
  *   CR_API_KEY=... PLAYER_TAG='#ABC123' OPENAI_API_KEY=... \
  *     sbt "testOnly graft.battle.LiveEndpointsSpec"
  * }}}
  */
class LiveEndpointsSpec extends AnyFunSuite {

  test("Clash Royale battlelog endpoint answers 200 for the configured tag") {
    val key = sys.env.get("CR_API_KEY")
    val tag = sys.env.get("PLAYER_TAG")
    assume(key.isDefined, "CR_API_KEY not set — live smoke skipped")
    assume(tag.isDefined, "PLAYER_TAG not set — live smoke skipped")
    // the same tag normalization the distributed source applies
    // (battles.py:6-17): trim + uppercase + %23-encode the '#'
    val noHash = tag.get.trim.toUpperCase.stripPrefix("#")
    val client = new UrlRestClient("https://api.clashroyale.com/v1", key.get)
    val body = client.get(s"/players/%23$noHash/battlelog")
    // a 200 battlelog is a JSON array (or items wrapper) of battles
    assert(body.nonEmpty)
    assert(body.trim.startsWith("[") || body.trim.startsWith("{"),
      s"unexpected body shape: ${body.take(80)}")
  }

  test("OpenAI-compatible chat endpoint round-trips a completion") {
    val key = sys.env.get("OPENAI_API_KEY")
    assume(key.isDefined, "OPENAI_API_KEY not set — live smoke skipped")
    val base = sys.env.getOrElse("OPENAI_BASE_URL", "https://api.openai.com")
    val model = sys.env.getOrElse("OPENAI_MODEL", "gpt-4.1-nano")
    val reply = LlmTransport.post(base, key.get,
      LlmTransport.requestBody(model, 20,
        "You reply with exactly the requested text.", "Say 'keys working'"),
      timeoutMs = 15000)
    val content = LlmTransport.content(reply)
    assert(content.isDefined, s"no choices content in reply: ${reply.take(200)}")
    assert(content.get.nonEmpty)
  }
}
