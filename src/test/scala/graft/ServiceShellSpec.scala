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

  test("service shell: displaced consumer's socket closes; its EOF cannot kill the replacement") {
    // ADVICE r10 regression spec: a second consumer for the same stream
    // wins last-connect-wins fencing — the shell must (a) close the
    // DISPLACED socket so that client observes the takeover instead of
    // hanging on a dead query, and (b) scope the loser's teardown to its
    // OWN query, so the stale socket's EOF path cannot stop the
    // replacement's live query.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    try {
      val created = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-fence"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
      def mkListener(rec: LinkedBlockingQueue[String],
                     closed: CompletableFuture[Integer]) = new WebSocket.Listener {
        private val sb = new StringBuilder
        override def onText(ws: WebSocket, data: CharSequence,
                            last: Boolean): java.util.concurrent.CompletionStage[_] = {
          sb.append(data)
          if (last) { rec.add(sb.toString); sb.setLength(0) }
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
      val rec1 = new LinkedBlockingQueue[String]()
      val closed1 = new CompletableFuture[Integer]()
      val ws1 = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), mkListener(rec1, closed1)).join()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (coord.activeQuery("rk-fence").isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val q1 = coord.activeQuery("rk-fence").getOrElse(
        fail("first consumer did not attach"))

      // second consumer to the SAME stream displaces the first
      val rec2 = new LinkedBlockingQueue[String]()
      val closed2 = new CompletableFuture[Integer]()
      val ws2 = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), mkListener(rec2, closed2)).join()
      try {
        // (a) the displaced socket is closed by the shell
        assert(closed1.get(30, TimeUnit.SECONDS) !== null,
          "displaced consumer's socket was not closed on takeover")
        // the replacement holds the key with a DIFFERENT query
        val d2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while ((coord.activeQuery("rk-fence").isEmpty ||
                coord.activeQuery("rk-fence").exists(_.name == q1.name)) &&
               System.nanoTime() < d2)
          Thread.sleep(50)
        val q2 = coord.activeQuery("rk-fence").getOrElse(
          fail("replacement consumer did not attach"))
        assert(q2.name !== q1.name)
        // (b) give the stale socket's teardown path time to run its
        // scoped release — the replacement must survive it and deliver
        Thread.sleep(500)
        assert(coord.activeQuery("rk-fence").exists(_.name == q2.name),
          "stale consumer's EOF killed the replacement's query")
        stream.addData(Msg("""{"message_type": "after-takeover"}""", 1, 100L))
        q2.processAllAvailable()
        val got = rec2.poll(30, TimeUnit.SECONDS)
        assert(got != null && got.contains("after-takeover"),
          s"replacement did not receive after takeover: $got")
        assert(rec1.isEmpty, "displaced consumer must not receive post-takeover data")
      } finally {
        try ws2.abort() catch { case _: Exception => }
        try ws1.abort() catch { case _: Exception => }
      }
    } finally {
      shell.stop()
      coord.release("rk-fence")
    }
  }

  test("service shell: oversized client frame gets a 1009 close, not an allocation") {
    // drive the RFC 6455 parser directly with a raw socket: a crafted
    // header claiming a 2^31 payload must produce a 1009
    // (message-too-big) close frame and a dropped connection — never a
    // NegativeArraySizeException-sized allocation (ADVICE r10)
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    try {
      val rec = registry.create("rk-big")
      val sock = new java.net.Socket("127.0.0.1", shell.wsPort)
      try {
        sock.setSoTimeout(30000)
        val out = sock.getOutputStream
        val in = sock.getInputStream
        out.write((s"GET /event-stream/${rec.uuid} HTTP/1.1\r\n" +
          "Host: 127.0.0.1\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n" +
          "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
          "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
        out.flush()
        // read through the 101 response's blank line (exactly to the
        // CRLFCRLF, never a byte past it — the next bytes are the close
        // frame and only arrive after we send the oversized header)
        var tail = 0
        var done = false
        while (!done) {
          val c = in.read()
          assert(c >= 0, "EOF during handshake")
          tail = ((tail << 8) | c) & 0xFFFFFFFF
          if (tail == 0x0D0A0D0A) done = true
        }
        // binary frame header: FIN+binary, MASK bit + 127 (64-bit len),
        // length 2^31, mask 0 — no payload follows
        out.write(Array[Byte](0x82.toByte, 0xFF.toByte,
          0, 0, 0, 0, 0x80.toByte, 0, 0, 0, 0, 0, 0, 0))
        out.flush()
        // expect the close frame 0x88 0x02 0x03 0xF1 (status 1009)
        val h1 = in.read()
        val h2 = in.read(); val s1 = in.read(); val s2 = in.read()
        assert(h1 === 0x88, f"expected close opcode, got 0x$h1%02x")
        assert(h2 === 0x02 && ((s1 << 8) | s2) === 1009,
          f"expected 1009 close, got len=$h2 status=${(s1 << 8) | s2}")
        assert(in.read() === -1, "server must drop the connection after 1009")
      } finally sock.close()
    } finally {
      shell.stop()
      coord.release("rk-big")
    }
  }

  test("service shell: stream_from_ordinal replay param delivers from that ordinal") {
    // VERDICT r11 #1: the WS handshake's query string carries the replay
    // spec (app/app.py:215-266) — ?stream_from_ordinal=3 must deliver the
    // first message with ordinal >= 3 (README.md:200-203) instead of the
    // shell default NEXT.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    try {
      val created = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-replay"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
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
        .buildAsync(URI.create(loc + "?stream_from_ordinal=3"), listener).join()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-replay").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        val q = coord.activeQuery("rk-replay").getOrElse(
          fail("consumer did not attach within 30 s"))
        stream.addData(
          Msg("""{"message_type": "m1"}""", 1, 100L),
          Msg("""{"message_type": "m2"}""", 2, 200L),
          Msg("""{"message_type": "m3"}""", 3, 300L),
          Msg("""{"message_type": "m4"}""", 4, 400L))
        q.processAllAvailable()
        val first = received.poll(30, TimeUnit.SECONDS)
        val second = received.poll(30, TimeUnit.SECONDS)
        assert(first === """{"ess_ordinal": 3, "ess_timestamp": 300, "message_type": "m3"}""")
        assert(second === """{"ess_ordinal": 4, "ess_timestamp": 400, "message_type": "m4"}""")
        assert(received.isEmpty, "ordinals below the seek point must not be delivered")
      } finally {
        try ws.abort() catch { case _: Exception => }
      }
    } finally {
      shell.stop()
      coord.release("rk-replay")
    }
  }

  test("service shell: protocol errors close 1002; unknown uuid accepts then closes 1000") {
    // VERDICT r11 #1/#2: accept-then-close semantics — multi stream_from_
    // params and an unparseable datetime are WS close 1002
    // (app/app.py:268-277); an unknown uuid is ACCEPTED then closed 1000
    // (app.py:282-291), not an HTTP 404.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    def closeCodeFor(wsUri: String): Int = {
      val closed = new CompletableFuture[Integer]()
      val listener = new WebSocket.Listener {
        override def onClose(ws: WebSocket, statusCode: Int,
                             reason: String): java.util.concurrent.CompletionStage[_] = {
          closed.complete(statusCode); null
        }
        override def onError(ws: WebSocket, error: Throwable): Unit = {
          closed.complete(-1); ()
        }
      }
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(wsUri), listener).join()
      try closed.get(30, TimeUnit.SECONDS).intValue()
      finally { try ws.abort() catch { case _: Exception => } }
    }
    try {
      val created = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-close"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
      // two stream_from_ params -> 1002 (app.py:268-271)
      assert(closeCodeFor(loc + "?stream_from_ordinal=1&stream_from_timestamp=2") === 1002)
      // unparseable datetime -> 1002 (app.py:230-244)
      assert(closeCodeFor(loc + "?stream_from_datetime=not-a-date") === 1002)
      // non-integer ordinal -> 1002
      assert(closeCodeFor(loc + "?stream_from_ordinal=abc") === 1002)
      // unknown uuid: the upgrade is ACCEPTED (101) and the close is a
      // normal-closure 1000 frame — the reference's app.py:282-291 path
      val wsBase = loc.substring(0, loc.lastIndexOf('/'))
      assert(closeCodeFor(s"$wsBase/NoSuchUuid0000000000") === 1000)
      // a valid single param on a known uuid still connects (no close)
      val okClosed = new CompletableFuture[Integer]()
      val okWs = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc + "?stream_from_ordinal=0"), new WebSocket.Listener {
          override def onClose(ws: WebSocket, statusCode: Int,
                               reason: String): java.util.concurrent.CompletionStage[_] = {
            okClosed.complete(statusCode); null
          }
        }).join()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-close").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(coord.activeQuery("rk-close").isDefined,
          "stream_from_ordinal=0 must connect and start a consumer (README.md:200-203)")
        assert(!okClosed.isDone, "valid replay param must not close the socket")
      } finally {
        try okWs.abort() catch { case _: Exception => }
      }
    } finally {
      shell.stop()
      coord.release("rk-close")
    }
  }

  test("service shell: health probes flip 200 -> 503 when POISON is taken") {
    // VERDICT r11 #6: /health/live + /health/ready mirror
    // probes/liveness.sh / readiness.sh — healthy while RUNNING, dead once
    // any consumer takes the POISON pill (taken.poison analog).
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    def health(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${shell.httpPort}$path")).GET.build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      assert(health("/health/live").statusCode() === 200)
      assert(health("/health/ready").statusCode() === 200)

      val created = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-health"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), new WebSocket.Listener {}).join()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-health").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(coord.activeQuery("rk-health").isDefined)
        stream.addData(Msg("POISON", 1, 100L))
        // the poison stop is asynchronous (reaper thread): wait for the
        // query to die, then the health flip is immediate
        val d2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-health").isDefined && System.nanoTime() < d2)
          Thread.sleep(50)
        assert(coord.activeQuery("rk-health").isEmpty, "POISON must stop the consumer")
        assert(coord.poisonTaken)
        assert(health("/health/live").statusCode() === 503)
        assert(health("/health/ready").statusCode() === 503)
      } finally {
        try ws.abort() catch { case _: Exception => }
      }
    } finally {
      shell.stop()
      coord.release("rk-health")
    }
  }

  test("service shell: oversized ping control frame gets a 1002 close, not a corrupt pong") {
    // RFC 6455 §5.5: control-frame payloads cap at 125 bytes. A 126-byte
    // ping is a protocol violation — and echoing it back would set the
    // MASK bit in the pong's single length byte. Expect a 1002 close.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    try {
      val rec = registry.create("rk-jumbo-ping")
      val sock = new java.net.Socket("127.0.0.1", shell.wsPort)
      try {
        sock.setSoTimeout(30000)
        val out = sock.getOutputStream
        val in = sock.getInputStream
        out.write((s"GET /event-stream/${rec.uuid} HTTP/1.1\r\n" +
          "Host: 127.0.0.1\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n" +
          "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
          "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
        out.flush()
        var tail = 0
        var done = false
        while (!done) {
          val c = in.read()
          assert(c >= 0, "EOF during handshake")
          tail = ((tail << 8) | c) & 0xFFFFFFFF
          if (tail == 0x0D0A0D0A) done = true
        }
        // masked ping, 16-bit extended length 126, mask 0, zero payload
        out.write(Array[Byte](0x89.toByte, 0xFE.toByte, 0x00, 126.toByte,
          0, 0, 0, 0))
        out.write(new Array[Byte](126))
        out.flush()
        val h1 = in.read(); val h2 = in.read()
        val s1 = in.read(); val s2 = in.read()
        assert(h1 === 0x88 && h2 === 0x02 && ((s1 << 8) | s2) === 1002,
          f"expected 1002 close, got 0x$h1%02x len=$h2 status=${(s1 << 8) | s2}")
        assert(in.read() === -1, "server must drop the connection after 1002")
      } finally sock.close()
    } finally {
      shell.stop()
      coord.release("rk-jumbo-ping")
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

  test("service shell: pre-stop drains consumers, flips health 503, closes 1001") {
    // VERDICT r13 #1 (the last reference-surface item): the pre-stop hook
    // analog (hooks/pre-stop-hook.sh:8 + probes/liveness.sh:4-8). Order of
    // observables after POST /admin/prestop: every consumer latches
    // (poisonTaken, queries stopped), /health/* answer 503, live sockets
    // close 1001 (going away), and NEW connects accept-then-close-1001.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val hook = shell.installShutdownHook() // registered + removable (SIGTERM path)
    val http = HttpClient.newHttpClient()
    def base = s"http://127.0.0.1:${shell.httpPort}"
    def health(path: String): HttpResponse[String] =
      http.send(HttpRequest.newBuilder(URI.create(base + path)).GET.build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      val created = http.send(
        HttpRequest.newBuilder(URI.create(base + "/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-prestop"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)

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
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-prestop").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        val q = coord.activeQuery("rk-prestop").getOrElse(
          fail("consumer did not attach within 30 s"))
        stream.addData(Msg("""{"message_type": "pre"}""", 1, 100L))
        q.processAllAvailable()
        assert(received.poll(30, TimeUnit.SECONDS) ===
          """{"ess_ordinal": 1, "ess_timestamp": 100, "message_type": "pre"}""")
        assert(health("/health/live").statusCode() === 200)

        // the hook is POST-only (a GET must not drain the service)
        val wrongVerb = http.send(
          HttpRequest.newBuilder(URI.create(base + "/admin/prestop")).GET.build(),
          HttpResponse.BodyHandlers.ofString())
        assert(wrongVerb.statusCode() === 405)
        assert(health("/health/live").statusCode() === 200,
          "a rejected verb must not have triggered the drain")

        // the hook fires (kubelet-exec analog): 204, idempotent
        def prestop(): HttpResponse[String] = http.send(
          HttpRequest.newBuilder(URI.create(base + "/admin/prestop"))
            .POST(HttpRequest.BodyPublishers.noBody()).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(prestop().statusCode() === 204)

        // 1. all consumers latch: poison taken, query stopped + deregistered
        assert(coord.poisonTaken, "preStop must latch the poison-taken flag")
        val d2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-prestop").isDefined && System.nanoTime() < d2)
          Thread.sleep(50)
        assert(coord.activeQuery("rk-prestop").isEmpty,
          "preStop must stop every active consumer")
        assert(!q.isActive)

        // 2. both probes 503, with the stopping status
        val live = health("/health/live")
        assert(live.statusCode() === 503 && live.body.contains("stopping"))
        assert(health("/health/ready").statusCode() === 503)

        // 3. the live socket observed a 1001 close frame (going away)
        assert(closed.get(30, TimeUnit.SECONDS) === 1001)

        // idempotent second fire
        assert(prestop().statusCode() === 204)

        // 4. a NEW connect accepts (reference accepts unconditionally) and
        // immediately closes 1001 — no fresh consumer starts
        val closed2 = new CompletableFuture[Integer]()
        val ws2 = http.newWebSocketBuilder()
          .buildAsync(URI.create(loc), new WebSocket.Listener {
            override def onClose(w: WebSocket, code: Int,
                                 reason: String): java.util.concurrent.CompletionStage[_] = {
              closed2.complete(code); null
            }
            override def onError(w: WebSocket, error: Throwable): Unit = {
              closed2.complete(-1); ()
            }
          }).join()
        try {
          assert(closed2.get(30, TimeUnit.SECONDS) === 1001)
          assert(coord.activeQuery("rk-prestop").isEmpty,
            "post-preStop connect must not start a consumer")
        } finally { try ws2.abort() catch { case _: Exception => } }
      } finally {
        try ws.abort() catch { case _: Exception => }
      }
    } finally {
      shell.stop() // also removes the shutdown hook
      assert(!Runtime.getRuntime.removeShutdownHook(hook),
        "stop() must have deregistered the JVM shutdown hook")
      coord.release("rk-prestop")
    }
  }

  // StreamCoordinator whose identity-scoped release deregisters normally and
  // THEN throws — the TimeoutException shape a slow q.stop() raises under
  // spark.sql.streaming.stopTimeout (VERDICT r16: both shell teardown paths
  // must survive it — map removals, close frame, sock.close).
  private class ThrowingReleaseCoordinator extends StreamCoordinator {
    @volatile var releaseThrows = 0
    override def release(routingKey: String,
                         q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      super.release(routingKey, q)
      releaseThrows += 1
      throw new java.util.concurrent.TimeoutException("injected stop failure")
    }
  }

  test("service shell: throwing q.stop() on EOF teardown cannot leak socket-map entries") {
    val registry = new EventStreamRegistry
    val coord = new ThrowingReleaseCoordinator
    val stream = MemoryStream[Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    def base = s"http://127.0.0.1:${shell.httpPort}"
    try {
      val created = http.send(
        HttpRequest.newBuilder(URI.create(base + "/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-eofthrow"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)

      val received = new LinkedBlockingQueue[String]()
      val closed = new CompletableFuture[Integer]()
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), new WebSocket.Listener {
          override def onText(w: WebSocket, data: CharSequence,
                              last: Boolean): java.util.concurrent.CompletionStage[_] = {
            if (last) received.add(data.toString)
            w.request(1)
            null
          }
          override def onClose(w: WebSocket, code: Int,
                               reason: String): java.util.concurrent.CompletionStage[_] = {
            closed.complete(code); null
          }
          override def onError(w: WebSocket, error: Throwable): Unit = {
            closed.complete(-1); ()
          }
        }).join()
      try {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-eofthrow").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        val q = coord.activeQuery("rk-eofthrow").getOrElse(
          fail("consumer did not attach within 30 s"))
        stream.addData(Msg("""{"message_type": "eof"}""", 1, 100L))
        q.processAllAvailable()
        assert(received.poll(30, TimeUnit.SECONDS) ===
          """{"ess_ordinal": 1, "ess_timestamp": 100, "message_type": "eof"}""")

        // client-initiated close — the server's reader loop unwinds and the
        // EOF teardown runs with the injected throwing release
        ws.sendClose(WebSocket.NORMAL_CLOSURE, "bye").join()
        val d2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while ((shell.liveConnEntries > 0 || coord.releaseThrows == 0) &&
               System.nanoTime() < d2)
          Thread.sleep(50)
        assert(coord.releaseThrows === 1, "the injected release must have thrown")
        assert(shell.liveConnEntries === 0,
          "a throwing q.stop() must not leak conns/connsByKey entries")
        assert(coord.activeQuery("rk-eofthrow").isEmpty)
        // the server still answered the close handshake before the throw
        assert(closed.get(30, TimeUnit.SECONDS) === 1000)
      } finally { try ws.abort() catch { case _: Exception => } }
    } finally shell.stop()
  }

  test("service shell: throwing q.stop() in the stopping re-check still closes 1001 and cleans the maps") {
    // Pins the post-registration re-check window exactly: preStop's latch
    // lands between EventStreamPipeline.start and the re-check, so the
    // handler takes the stopping branch with a release that throws — the
    // 1001 frame must still reach the client and both maps must be clean
    // (VERDICT r16: before the guard, the throw skipped all three).
    val registry = new EventStreamRegistry
    val stream = MemoryStream[Msg](spark)
    @volatile var shellRef: ServiceShell = null
    val coord = new ThrowingReleaseCoordinator {
      override def registerWith(routingKey: String)(
          startQ: () => org.apache.spark.sql.streaming.StreamingQuery)
          : org.apache.spark.sql.streaming.StreamingQuery = {
        val q = super.registerWith(routingKey)(startQ)
        // the latch fires AFTER the query started + registered, BEFORE the
        // handler's re-check — the race window ADVICE r14 closed
        shellRef.beginStopping()
        q
      }
    }
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shellRef = shell
    shell.start()
    val http = HttpClient.newHttpClient()
    def base = s"http://127.0.0.1:${shell.httpPort}"
    try {
      val created = http.send(
        HttpRequest.newBuilder(URI.create(base + "/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-stopthrow"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)

      val closed = new CompletableFuture[Integer]()
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), new WebSocket.Listener {
          override def onClose(w: WebSocket, code: Int,
                               reason: String): java.util.concurrent.CompletionStage[_] = {
            closed.complete(code); null
          }
          override def onError(w: WebSocket, error: Throwable): Unit = {
            closed.complete(-1); ()
          }
        }).join()
      try {
        // the 1001 close frame must arrive DESPITE the throwing release
        assert(closed.get(30, TimeUnit.SECONDS) === 1001)
        // since the r18 finally-teardown, the release runs AFTER the 1001
        // frame (removals + guarded release are the unwind path) — poll
        // for it instead of asserting instantaneous ordering
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while ((shell.liveConnEntries > 0 || coord.releaseThrows == 0) &&
               System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(coord.releaseThrows === 1, "the stopping re-check must have released")
        assert(shell.liveConnEntries === 0,
          "the stopping teardown must remove both map entries")
        assert(coord.activeQuery("rk-stopthrow").isEmpty,
          "the re-check's release must still have stopped + deregistered the query")
      } finally { try ws.abort() catch { case _: Exception => } }
    } finally shell.stop()
  }

  /** Raw-socket WS handshake shared by the r18 review-pin tests: sends the
    * upgrade for `uuid` and consumes the response exactly through the
    * CRLFCRLF (same discipline as the older inline copies above).
    */
  private def rawHandshake(sock: java.net.Socket, uuid: String): Unit = {
    sock.setSoTimeout(30000)
    val out = sock.getOutputStream
    out.write((s"GET /event-stream/$uuid HTTP/1.1\r\n" +
      "Host: 127.0.0.1\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n" +
      "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
    out.flush()
    val in = sock.getInputStream
    var tail = 0
    var done = false
    while (!done) {
      val c = in.read()
      assert(c >= 0, "EOF during handshake")
      tail = ((tail << 8) | c) & 0xFFFFFFFF
      if (tail == 0x0D0A0D0A) done = true
    }
  }

  test("service shell: abortive disconnect (RST) still releases the query and the map entries") {
    // code-review r18: a peer RST raises SocketException out of the reader
    // loop instead of returning EOF — before the finally-teardown, the
    // unwind skipped coordinator.release, leaving a ZOMBIE query holding
    // the routing key forever plus both socket-map entries.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[ServiceShellSpec.Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    try {
      val rec = registry.create("rk-rst")
      val sock = new java.net.Socket("127.0.0.1", shell.wsPort)
      try {
        rawHandshake(sock, rec.uuid)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (coord.activeQuery("rk-rst").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(coord.activeQuery("rk-rst").isDefined, "consumer did not attach")
        // SO_LINGER 0 + close = TCP RST, the abortive-disconnect shape
        sock.setSoLinger(true, 0)
      } finally sock.close()
      val d2 = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while ((coord.activeQuery("rk-rst").isDefined || shell.liveConnEntries > 0) &&
             System.nanoTime() < d2)
        Thread.sleep(50)
      assert(coord.activeQuery("rk-rst").isEmpty,
        "RST must release the query — a zombie here holds the routing key forever")
      assert(shell.liveConnEntries === 0,
        "RST must not leak conns/connsByKey entries")
    } finally {
      shell.stop()
      coord.release("rk-rst")
    }
  }

  test("service shell: a throwing sourceFor closes 1011 and leaks neither map entries nor a query") {
    // code-review r18: a throw between the socket-map puts and a started
    // query previously unwound past the teardown — both map entries
    // leaked and the client saw a bare TCP drop instead of a close frame.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val shell = new ServiceShell(spark, registry, coord,
      _ => throw new RuntimeException("injected source failure"))
    shell.start()
    val http = HttpClient.newHttpClient()
    try {
      val created = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-srcboom"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
      val closed = new CompletableFuture[Integer]()
      val ws = http.newWebSocketBuilder()
        .buildAsync(URI.create(loc), new WebSocket.Listener {
          override def onClose(w: WebSocket, code: Int,
                               reason: String): java.util.concurrent.CompletionStage[_] = {
            closed.complete(code); null
          }
          override def onError(w: WebSocket, error: Throwable): Unit = {
            closed.complete(-1); ()
          }
        }).join()
      try {
        assert(closed.get(30, TimeUnit.SECONDS) === 1011,
          "start failure must be a 1011 close frame, not a bare TCP drop")
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (shell.liveConnEntries > 0 && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(shell.liveConnEntries === 0,
          "a throwing pipeline start must not leak conns/connsByKey entries")
        assert(coord.activeQuery("rk-srcboom").isEmpty)
      } finally { try ws.abort() catch { case _: Exception => } }
    } finally shell.stop()
  }

  test("service shell: concurrent connects to one stream end with the fencing winner owning the open socket") {
    // code-review r18 (admission serialization): unserialized, the
    // socket-map put order could invert the coordinator register order —
    // the fencing winner's socket was already closed by a later putter,
    // so its query silently dropped every record while the map's socket
    // hung on a dead query. With admission serialized the two orders
    // coincide: after a connect storm, exactly ONE client socket stays
    // open, and the active query delivers to exactly that client.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[ServiceShellSpec.Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    try {
      val created = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"routing_key": "rk-storm"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      val loc = """"location":"([^"]+)"""".r
        .findFirstMatchIn(created.body).get.group(1)
      val n = 4
      val queues = Array.fill(n)(new LinkedBlockingQueue[String]())
      val closes = Array.fill(n)(new CompletableFuture[Integer]())
      val sockets = (0 until n).map { i =>
        http.newWebSocketBuilder().buildAsync(URI.create(loc), new WebSocket.Listener {
          private val sb = new StringBuilder
          override def onText(w: WebSocket, data: CharSequence,
                              last: Boolean): java.util.concurrent.CompletionStage[_] = {
            sb.append(data)
            if (last) { queues(i).add(sb.toString); sb.setLength(0) }
            w.request(1)
            null
          }
          override def onClose(w: WebSocket, code: Int,
                               reason: String): java.util.concurrent.CompletionStage[_] = {
            closes(i).complete(code); null
          }
          override def onError(w: WebSocket, error: Throwable): Unit = {
            closes(i).complete(-1); ()
          }
        })
      }.map(_.join())
      try {
        // storm settles: n-1 displaced sockets closed, one query active
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while ((closes.count(_.isDone) < n - 1 ||
                coord.activeQuery("rk-storm").isEmpty) &&
               System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(closes.count(_.isDone) === n - 1,
          s"exactly one socket must survive the storm, ${n - closes.count(_.isDone)} still open")
        val q = coord.activeQuery("rk-storm").getOrElse(fail("no active query after storm"))
        // the winner's socket is open and DELIVERS — put-order/register-
        // order inversion would drop this record on a closed socket
        stream.addData(ServiceShellSpec.Msg("""{"message_type": "storm-winner"}""", 1, 100L))
        q.processAllAvailable()
        val survivor = closes.indexWhere(!_.isDone)
        val got = queues(survivor).poll(30, TimeUnit.SECONDS)
        assert(got != null && got.contains("storm-winner"),
          s"fencing winner's socket did not deliver: $got")
        assert(queues.zipWithIndex.filter(_._2 != survivor).forall(_._1.isEmpty),
          "a displaced socket received post-storm data")
        assert(shell.liveConnEntries === 2,
          s"exactly one uuid entry + one key entry must remain, got ${shell.liveConnEntries}")
      } finally sockets.foreach(w => try w.abort() catch { case _: Exception => })
    } finally {
      shell.stop()
      coord.release("rk-storm")
    }
  }

  test("service shell: a never-terminated oversized header is refused, not buffered") {
    // code-review r18: readHeader grew its buffer without bound — one
    // socket streaming an endless "header" could OOM the driver. Past the
    // 16 KiB cap the connection must be refused (404/DROP), never 101.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[ServiceShellSpec.Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    try {
      val sock = new java.net.Socket("127.0.0.1", shell.wsPort)
      try {
        sock.setSoTimeout(30000)
        val junk = new Array[Byte](17 * 1024)
        java.util.Arrays.fill(junk, 'a'.toByte)
        try { sock.getOutputStream.write(junk); sock.getOutputStream.flush() }
        catch { case _: java.io.IOException => () } // server may already have dropped us
        val resp = try {
          val buf = new Array[Byte](256)
          val m = sock.getInputStream.read(buf)
          if (m > 0) new String(buf, 0, m, "UTF-8") else ""
        } catch { case _: java.io.IOException => "" } // RST also = refused
        assert(!resp.contains("101"),
          s"an oversized header must never be accepted as an upgrade: $resp")
      } finally sock.close()
    } finally shell.stop()
  }

  test("service shell: control-plane request body past the cap answers 413") {
    // code-review r18: readAllBytes buffered an unbounded POST body
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[ServiceShellSpec.Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    try {
      val big = "x" * (2 * 1024 * 1024)
      val resp = http.send(
        HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${shell.httpPort}/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString(s"""{"routing_key": "$big"}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 413, s"expected 413, got ${resp.statusCode()}")
    } finally shell.stop()
  }

  test("service shell: malformed ids and escapes get HTTP answers, not dropped connections") {
    // code-review r18, two handler crashes: (a) DELETE with a Long-
    // overflowing id threw NumberFormatException out of the handler —
    // HttpServer dropped the connection with no status; (b) a routing key
    // whose \-escape has non-hex \u digits did the same in jsonUnescape.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[ServiceShellSpec.Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val http = HttpClient.newHttpClient()
    def base = s"http://127.0.0.1:${shell.httpPort}"
    try {
      val del = http.send(
        HttpRequest.newBuilder(
            URI.create(base + "/event-stream/99999999999999999999"))
          .DELETE().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(del.statusCode() === 404, s"overflowing id must 404, got ${del.statusCode()}")
      // "a\uZZZZb" with a literal backslash (built by concat so Scala's
      // own unicode-escape processing never sees it)
      val body = "{\"routing_key\": \"a\\" + "uZZZZb\"}"
      val post = http.send(
        HttpRequest.newBuilder(URI.create(base + "/event-stream/"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() === 201,
        s"non-hex \\u escape must still get a response, got ${post.statusCode()}")
    } finally shell.stop()
  }

  test("service shell: an unmasked client frame fails the connection with 1002") {
    // RFC 6455 §5.1 (code-review r18): client frames MUST be masked; the
    // server MUST fail the connection on an unmasked one.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[ServiceShellSpec.Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    try {
      val rec = registry.create("rk-unmasked")
      val sock = new java.net.Socket("127.0.0.1", shell.wsPort)
      try {
        rawHandshake(sock, rec.uuid)
        val out = sock.getOutputStream
        out.write(Array[Byte](0x89.toByte, 0x00)) // unmasked zero-payload ping
        out.flush()
        val in = sock.getInputStream
        val h1 = in.read(); val h2 = in.read()
        val s1 = in.read(); val s2 = in.read()
        assert(h1 === 0x88 && h2 === 0x02 && ((s1 << 8) | s2) === 1002,
          f"expected 1002 close, got 0x$h1%02x len=$h2 status=${(s1 << 8) | s2}")
        assert(in.read() === -1, "server must drop the connection after 1002")
      } finally sock.close()
    } finally {
      shell.stop()
      coord.release("rk-unmasked")
    }
  }

  test("service shell: malformed-frame conformance table closes with the RFC 6455 code") {
    // Autobahn-style regression net for the r17-r19 strict-parsing series
    // (VERDICT r18 #3 + stretch #8): one shell, a vector of crafted raw
    // frames, each asserting the exact close code. Mask bytes are zero so
    // payload bytes are literal. Positive controls at the end prove the
    // parser is strict, not just closed: a VALID ping still pongs and a
    // VALID close still echoes its code on the same code path.
    val registry = new EventStreamRegistry
    val coord = new StreamCoordinator
    val stream = MemoryStream[ServiceShellSpec.Msg](spark)
    val shell = new ServiceShell(spark, registry, coord, _ => stream.toDF())
    shell.start()
    val mask0 = Array[Byte](0, 0, 0, 0)
    // (case name, frame bytes, expected close status)
    val vectors: Seq[(String, Array[Byte], Int)] = Seq(
      ("RSV1 set on masked ping (§5.2)",
        Array[Byte](0xC9.toByte, 0x80.toByte) ++ mask0, 1002),
      ("RSV2 set on masked text (§5.2)",
        Array[Byte](0xA1.toByte, 0x80.toByte) ++ mask0, 1002),
      ("fragmented close FIN=0 (§5.5)",
        Array[Byte](0x08.toByte, 0x80.toByte) ++ mask0, 1002),
      ("fragmented ping FIN=0 (§5.5)",
        Array[Byte](0x09.toByte, 0x80.toByte) ++ mask0, 1002),
      ("reserved data opcode 0x3 (§5.2)",
        Array[Byte](0x83.toByte, 0x80.toByte) ++ mask0, 1002),
      ("reserved control opcode 0xB (§5.2)",
        Array[Byte](0x8B.toByte, 0x80.toByte) ++ mask0, 1002),
      ("control frame declaring 126 bytes (§5.5)",
        Array[Byte](0x89.toByte, 0xFE.toByte, 0x00, 126.toByte) ++ mask0, 1002),
      ("ping via 16-bit extended length 5 — minimal-encoding violation (§5.2)",
        Array[Byte](0x89.toByte, 0xFE.toByte, 0x00, 0x05) ++ mask0 ++
          Array[Byte](1, 2, 3, 4, 5), 1002),
      ("lone continuation FIN=1, no message in progress (§5.4)",
        Array[Byte](0x80.toByte, 0x80.toByte) ++ mask0, 1002),
      ("lone continuation FIN=0, no message in progress (§5.4)",
        Array[Byte](0x00.toByte, 0x80.toByte) ++ mask0, 1002),
      ("new text frame interleaved into a fragmented message (§5.4)",
        Array[Byte](0x01.toByte, 0x80.toByte) ++ mask0 ++
          Array[Byte](0x01.toByte, 0x80.toByte) ++ mask0, 1002),
      ("unmasked ping (§5.1)",
        Array[Byte](0x89.toByte, 0x00), 1002),
      ("close with 1-byte body (§5.5.1)",
        Array[Byte](0x88.toByte, 0x81.toByte) ++ mask0 ++ Array[Byte](0x03), 1002),
      ("close with forbidden code 1005 (§7.4.1)",
        Array[Byte](0x88.toByte, 0x82.toByte) ++ mask0 ++
          Array[Byte](0x03, 0xED.toByte), 1002),
      ("close with out-of-range code 999 (§7.4.2)",
        Array[Byte](0x88.toByte, 0x82.toByte) ++ mask0 ++
          Array[Byte](0x03, 0xE7.toByte), 1002),
      ("close 1000 with invalid-UTF-8 reason (§5.5.1)",
        Array[Byte](0x88.toByte, 0x83.toByte) ++ mask0 ++
          Array[Byte](0x03, 0xE8.toByte, 0xFF.toByte), 1007),
      ("data frame declaring 2^31 bytes (house cap, 1009)",
        Array[Byte](0x82.toByte, 0xFF.toByte,
          0, 0, 0, 0, 0x80.toByte, 0, 0, 0) ++ mask0, 1009),
      // r20 strict series: text-payload UTF-8 (§8.1, Autobahn §6.x),
      // data-frame minimal length encoding (§5.2), IANA close codes
      ("text frame with invalid-UTF-8 payload (§8.1)",
        Array[Byte](0x81.toByte, 0x81.toByte) ++ mask0 ++
          Array[Byte](0xFF.toByte), 1007),
      ("fragmented text finishing with invalid UTF-8 (§8.1)",
        Array[Byte](0x01.toByte, 0x81.toByte) ++ mask0 ++
          Array[Byte]('a'.toByte) ++
          Array[Byte](0x80.toByte, 0x81.toByte) ++ mask0 ++
          Array[Byte](0xFF.toByte), 1007),
      ("text message truncating a codepoint at message end (§8.1)",
        Array[Byte](0x81.toByte, 0x81.toByte) ++ mask0 ++
          Array[Byte](0xC3.toByte), 1007),
      ("text via 16-bit extended length 5 — minimal-encoding violation (§5.2)",
        Array[Byte](0x81.toByte, 0xFE.toByte, 0x00, 0x05) ++ mask0 ++
          Array[Byte](1, 2, 3, 4, 5), 1002),
      ("text via 64-bit extended length 300 — minimal-encoding violation (§5.2)",
        Array[Byte](0x81.toByte, 0xFF.toByte,
          0, 0, 0, 0, 0, 0, 0x01, 0x2C) ++ mask0, 1002),
      ("close with IANA registry code 1013 echoes it (§7.4, ADVICE r19)",
        Array[Byte](0x88.toByte, 0x82.toByte) ++ mask0 ++
          Array[Byte](0x03, 0xF5.toByte), 1013),
      ("64-bit length with MSB set — §5.2 violation, not the house cap",
        Array[Byte](0x82.toByte, 0xFF.toByte,
          0xFF.toByte, 0, 0, 0, 0, 0, 0, 0) ++ mask0, 1002)
    )
    try {
      vectors.zipWithIndex.foreach { case ((name, frame, want), i) =>
        val rec = registry.create(s"rk-conf-$i")
        val sock = new java.net.Socket("127.0.0.1", shell.wsPort)
        try {
          rawHandshake(sock, rec.uuid)
          val out = sock.getOutputStream
          out.write(frame); out.flush()
          val in = sock.getInputStream
          val h1 = in.read(); val h2 = in.read()
          val s1 = in.read(); val s2 = in.read()
          assert(h1 === 0x88 && h2 === 0x02 && ((s1 << 8) | s2) === want,
            f"$name: expected $want close, got 0x$h1%02x len=$h2 " +
              f"status=${(s1 << 8) | s2}")
          assert(in.read() === -1, s"$name: connection must drop after close")
        } finally sock.close()
        coord.release(s"rk-conf-$i")
      }
      // positive control 1: a conforming masked ping still gets a pong
      locally {
        val rec = registry.create("rk-conf-ok")
        val sock = new java.net.Socket("127.0.0.1", shell.wsPort)
        try {
          rawHandshake(sock, rec.uuid)
          val out = sock.getOutputStream
          val in = sock.getInputStream
          out.write(Array[Byte](0x89.toByte, 0x81.toByte) ++ mask0 ++
            Array[Byte](0x42)); out.flush()
          val p1 = in.read(); val p2 = in.read(); val p3 = in.read()
          assert(p1 === 0x8A && p2 === 0x01 && p3 === 0x42,
            f"valid ping must pong, got 0x$p1%02x len=$p2 body=0x$p3%02x")
          // positive control 2: a legal fragmented data message — FIN=0
          // text, a ping interleaved (control frames MAY interleave,
          // §5.4), the finishing continuation, then another ping — all
          // tolerated, both pings ponged
          out.write(Array[Byte](0x01.toByte, 0x80.toByte) ++ mask0 ++
            Array[Byte](0x89.toByte, 0x80.toByte) ++ mask0); out.flush()
          val q1 = in.read(); val q2 = in.read()
          assert(q1 === 0x8A && q2 === 0x00,
            f"ping inside a fragmented message must pong, got 0x$q1%02x len=$q2")
          out.write(Array[Byte](0x80.toByte, 0x80.toByte) ++ mask0 ++
            Array[Byte](0x89.toByte, 0x80.toByte) ++ mask0); out.flush()
          val q3 = in.read(); val q4 = in.read()
          assert(q3 === 0x8A && q4 === 0x00,
            f"ping after the finishing continuation must pong, got 0x$q3%02x len=$q4")
          // positive control 2b (r20): a codepoint SPLIT across fragments
          // is legal UTF-8 at message scope — FIN=0 text ending 0xC3, the
          // finishing continuation starting 0xA9 (é); and a binary frame
          // carrying invalid-UTF-8 bytes is exempt from validation. The
          // pong after both proves neither tripped the 1007 path.
          out.write(Array[Byte](0x01.toByte, 0x81.toByte) ++ mask0 ++
            Array[Byte](0xC3.toByte) ++
            Array[Byte](0x80.toByte, 0x81.toByte) ++ mask0 ++
            Array[Byte](0xA9.toByte) ++
            Array[Byte](0x82.toByte, 0x81.toByte) ++ mask0 ++
            Array[Byte](0xFF.toByte) ++
            Array[Byte](0x89.toByte, 0x80.toByte) ++ mask0); out.flush()
          val q5 = in.read(); val q6 = in.read()
          assert(q5 === 0x8A && q6 === 0x00,
            f"split-codepoint text + binary must be tolerated, got 0x$q5%02x len=$q6")
          // positive control 3: a conforming close 1000 echoes 1000
          out.write(Array[Byte](0x88.toByte, 0x82.toByte) ++ mask0 ++
            Array[Byte](0x03, 0xE8.toByte)); out.flush()
          val h1 = in.read(); val h2 = in.read()
          val s1 = in.read(); val s2 = in.read()
          assert(h1 === 0x88 && h2 === 0x02 && ((s1 << 8) | s2) === 1000,
            f"valid close must echo 1000, got status=${(s1 << 8) | s2}")
        } finally sock.close()
        coord.release("rk-conf-ok")
      }
    } finally shell.stop()
  }
}
