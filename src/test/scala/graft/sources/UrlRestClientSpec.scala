package graft.sources

import graft.SparkSpec
import graft.battle.BattleFixtures
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** The PRODUCTION RestClient, tested offline against a local JDK
  * HttpServer (no egress needed): auth header delivery, body
  * round-trip, non-200 failure, and the whole distributed
  * fetchBattles path over real HTTP. */
class UrlRestClientSpec extends SparkSpec {

  private val battleArray = BattleFixtures.rawBattleJson.mkString("[", ",", "]")

  private def withServer[T](routes: Map[String, (Int, String)])(f: (String, () => String) => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastAuth: String = null
    // single root context routed on the RAW request URI: HttpServer's
    // per-context matching decodes %23 and would never match the
    // percent-encoded tag paths
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastAuth = ex.getRequestHeaders.getFirst("Authorization")
        val (status, body) = routes.getOrElse(ex.getRequestURI.toASCIIString,
          (404, """{"reason":"notFound"}"""))
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", () => lastAuth)
    finally server.stop(0)
  }

  test("GET returns the body and sends the bearer token") {
    withServer(Map("/ok" -> (200, """{"items":[]}"""))) { (base, lastAuth) =>
      val client = new UrlRestClient(base, "sekret")
      assert(client.get("/ok") === """{"items":[]}""")
      assert(lastAuth() === "Bearer sekret")
    }
  }

  test("non-200 throws with the status, mirroring cr_client.py") {
    withServer(Map("/denied" -> (403, """{"reason":"accessDenied"}"""))) { (base, _) =>
      val client = new UrlRestClient(base, "t")
      val e = intercept[RuntimeException](client.get("/denied"))
      assert(e.getMessage.contains("403"))
      assert(e.getMessage.contains("accessDenied"))
    }
  }

  test("distributed fetchBattles works end-to-end over real HTTP") {
    withServer(Map("/players/%23P1/battlelog" -> (200, battleArray))) { (base, _) =>
      val client = new UrlRestClient(base, "t")
      val battles = RestBattleSource.fetchBattles(spark, client, Seq("#p1"))
      assert(battles.count() === BattleFixtures.rawBattleJson.length)
    }
  }
}
