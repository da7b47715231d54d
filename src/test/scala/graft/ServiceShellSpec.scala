package graft

import graft.streaming.{EventStreamRegistry, ServiceShell, StreamCoordinator}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, WebSocket}
import java.util.concurrent.{CompletableFuture, LinkedBlockingQueue, TimeUnit}

/** Integration spec for the network service shell: the reference's REST +
  * WebSocket lifecycle (version / create / list / connect-and-receive /
  * delete) driven over real loopback sockets, with the JDK HTTP and
  * WebSocket CLIENTS on the other end — the engine side runs the same
  * Registry/StreamCoordinator/EventStreamPipeline objects the in-process
  * specs exercise.
  */
// companion-object case class: nested-in-class case classes capture an
// outer instance and break typed-encoder codegen (janino fallback storm)
object ServiceShellSpec {
  case class Msg(body: String, ordinal: Long, ts_ms: Long)
}

class ServiceShellSpec extends SparkSpec {
  import spark.implicits._
  import ServiceShellSpec.Msg

  test("service shell: reference lifecycle over loopback sockets") {
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    def base = s"http://127.0.0.1:${shell.httpPort}"
    def get(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(base + path)).GET.build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // GET /event-stream/version/ (app/app.py:596-604)
      val v = get("/event-stream/version/")
      assert(v.statusCode() === 200 && v.body.contains("DATAFRAME_STREAM"))

      // POST /event-stream/ -> id + ws location (app/app.py:606-649)
      val created = http.send(
        HttpRequest.newBuilder(URI.create(base + "/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-shell"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(created.statusCode() === 201, created.body)
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
      val id = """"id":(\d+)""".r.findFirstMatchIn(created.body).get.group(1)
      assert(loc.startsWith("ws://127.0.0.1:"))

      // GET /event-stream/ lists it (app/app.py:652-674)
      assert(get("/event-stream/").body.contains("rk-shell"))

      // WS connect -> the REAL pipeline starts and pushes enriched frames
      val received = new LinkedBlockingQueue[String]()
      val closed = new CompletableFuture[Integer]()
      val listener = new WebSocket.Listener {
        private val sb = new StringBuilder
        override def onText(ws: WebSocket, data: CharSequence,
                            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          sb.append(data)
          if (last) { received.add(sb.toString); sb.setLength(0) }
          ws.request(1)
          null
        }
        override def onClose(ws: WebSocket, statusCode: Int,
                             reason: String): java.util.concurrent.CompletionStage[_] = {
          closed.complete(statusCode); null
        }
        override def onError(ws: WebSocket, error: Throwable): Unit = {
          closed.complete(-1); ()
        }
      }
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), listener).join()
      try {
        // the consumer attaches asynchronously on the WS accept thread
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-shell").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        val q = coord.activeQuery("rk-shell").getOrElse(
          fail("consumer did not attach within 30 s"))
        stream.addData(
          Msg("""{"message_type": "t"}""", 1, 100L),
          Msg("cls|x: 1", 2, 200L),
          Msg("", 3, 300L)) // empty: guarded, never forwarded
        q.processAllAvailable()
        val first = received.poll(30, TimeUnit.SECONDS)
        val second = received.poll(30, TimeUnit.SECONDS)
        assert(first === """{"ess_ordinal": 1, "ess_timestamp": 100, "message_type": "t"}""")
        assert(second === "cls|x: 1|ordinal: 2|timestamp: 200")
        assert(received.isEmpty) // the empty body was not pushed

        // DELETE fences the consumer, removes the row, closes the socket
        val del = http.send(
          HttpRequest.newBuilder(URI.create(base + s"/event-stream/$id"))
            .DELETE().build(),
          HttpResponse.BodyHandlers.ofString())
        assert(del.statusCode() === 204)
        assert(closed.get(30, TimeUnit.SECONDS) !== null)
        assert(!get("/event-stream/").body.contains("rk-shell"))
        val fenceDeadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-shell").isDefined && System.nanoTime() < fenceDeadline)
          Thread.sleep(50)
        assert(coord.activeQuery("rk-shell").isEmpty)
      } finally {
        try ws.abort() catch { case _: Exception => }
      }

      // unknown uuid -> plain 404, no upgrade
      val bad = get("/event-stream/unknown-id-404")
      assert(bad.statusCode() === 404)
    } finally {
      shell.stop()
      coord.release("rk-shell")
    }
  }

  test("service shell: wss data plane over TLS loopback") {
    // Self-signed server cert via the JDK's own keytool (no new
    // dependency; cert generation is not a JDK public API). The client
    // trusts-all — the spec pins the TLS handshake + framing path, not
    // PKI hygiene.
    val ksDir = java.nio.file.Files.createTempDirectory("graft-tls")
    val ksPath = s"$ksDir/server.p12"
    val pw = "changeit"
    val gen = new ProcessBuilder("keytool", "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "1",
      "-storetype", "PKCS12", "-keystore", ksPath, "-storepass", pw,
      "-dname", "CN=127.0.0.1",
      // the JDK client verifies the hostname against the SAN regardless
      // of the trust manager — the cert must carry the loopback IP
      "-ext", "SAN=IP:127.0.0.1").redirectErrorStream(true).start()
    assert(gen.waitFor(60, TimeUnit.SECONDS) && gen.exitValue() == 0,
      "keytool keypair generation failed")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(ksPath)
    try ks.load(fis, pw.toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, pw.toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val trustAll = javax.net.ssl.SSLContext.getInstance("TLS")
    trustAll.init(null, Array[javax.net.ssl.TrustManager](
      new javax.net.ssl.X509TrustManager {
        override def checkClientTrusted(
          c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def checkServerTrusted(
          c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
        override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
          Array.empty
      }), null)

    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF(),
      tls = Some(serverCtx))
    shell.start()
    val http = HttpClient.newBuilder().sslContext(trustAll).build()
    try {
      val created = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-tls"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(created.statusCode() === 201, created.body)
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
      // the scheme switch the reference derives from X-Forwarded-Proto
      // (app/app.py:104-108): TLS on => wss://
      assert(loc.startsWith("wss://127.0.0.1:"), loc)

      val received = new LinkedBlockingQueue[String]()
      val listener = new WebSocket.Listener {
        private val sb = new StringBuilder
        override def onText(ws: WebSocket, data: CharSequence,
                            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          sb.append(data)
          if (last) { received.add(sb.toString); sb.setLength(0) }
          ws.request(1)
          null
        }
      }
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), listener).join()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-tls").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        val q = coord.activeQuery("rk-tls").getOrElse(
          fail("consumer did not attach within 30 s"))
        stream.addData(Msg("""{"message_type": "tls"}""", 1, 100L))
        q.processAllAvailable()
        val first = received.poll(30, TimeUnit.SECONDS)
        assert(first === """{"ess_ordinal": 1, "ess_timestamp": 100, "message_type": "tls"}""")
      } finally {
        try ws.abort() catch { case _: Exception => }
      }
    } finally {
      shell.stop()
      coord.release("rk-tls")
    }
  }
}
