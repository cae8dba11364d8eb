package graft

import graft.api.{Channel, Node}
import graft.functions.Codecs
import graft.net._
import org.apache.spark.sql.functions._
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}

/** Inbound endpoints (contrib/http.py HTTPEndpoint/HttpChannel, contrib/
  * hl7.py MLLPChannel) and the SMTP transport — all driven against real
  * sockets bound to 127.0.0.1 (in-process, zero egress). */
class EndpointSpec extends SparkSpec {
  import spark.implicits._

  private def httpGet(url: String): (Int, String) = {
    val resp = JdkHttpTransport.send(HttpRequest("GET", url))
    (resp.status, resp.body)
  }
  private def httpPost(url: String, body: String): (Int, String) = {
    val resp = JdkHttpTransport.send(HttpRequest("POST", url, body = Some(body)))
    (resp.status, resp.body)
  }

  test("HttpChannel: request → channel → response, meta carries method/url/query") {
    val ep = new HttpEndpoint(spark)
    val chan = Channel("up").add(
      Node("fmt")(_.withColumn("payload",
        concat(upper(col("payload")), lit(" via "),
          element_at(col("meta"), "method"), lit(" q="),
          element_at(col("meta"), "get_params")))))
    ep.addChannel("/ingest", chan)
    ep.start()
    try {
      val (status, body) = httpPost(ep.url("/ingest?a=1"), "hello")
      assert(status == 200)
      assert(body == "HELLO via POST q=a=1")
    } finally ep.stop()
  }

  test("HttpChannel: status_code from meta, Dropped → 200, error → 503, log replayable") {
    val ep = new HttpEndpoint(spark)
    val created = Channel("created").add(Node("st")(
      _.withColumn("meta", map_concat(col("meta"), map(lit("status_code"), lit("201"))))))
    val dropper = Channel("dropper").dropWhen(lit(true))
    val boom = Channel("boom").add(graft.api.Nodes.RaiseError("kaput"))
    ep.addChannel("/created", created)
    ep.addChannel("/drop", dropper)
    ep.addChannel("/boom", boom)
    ep.start()
    try {
      assert(httpGet(ep.url("/created")) == ((201, "")))
      assert(httpGet(ep.url("/drop")) == ((200, "Dropped")))
      val (st, body) = httpGet(ep.url("/boom"))
      assert(st == 503 && body.contains("kaput"))
      // the ingest log recorded every request for bulk replay
      val log = ep.requestLog.select("method", "url").as[(String, String)].collect()
      assert(log.map(_._2).toSet == Set("/created", "/drop", "/boom"))
    } finally ep.stop()
  }

  test("MLLP endpoint: framed HL7 in, channel ACK out (contrib/hl7.py)") {
    val ack = Channel("ack").add(
      Node("ack")(_.withColumn("payload", Codecs.hl7Ack(col("payload"), "AA"))))
    val ep = new MllpEndpoint(spark, ack)
    ep.start()
    try {
      val sock = new Socket("127.0.0.1", ep.actualPort)
      try {
        val out = sock.getOutputStream
        val msg = "MSH|^~\\&|APP|FAC|||20240101||ADT^A01|MSG007|P|2.5"
        out.write(0x0b); out.write(msg.getBytes("UTF-8"))
        out.write(0x1c); out.write(0x0d); out.flush()
        val in = sock.getInputStream
        val buf = new StringBuilder
        var b = in.read()
        assert(b == 0x0b)
        b = in.read()
        while (b != 0x1c && b != -1) { buf.append(b.toChar); b = in.read() }
        val reply = buf.toString
        assert(reply.startsWith("MSH|"))
        assert(reply.contains("MSA|AA|MSG007"))
      } finally sock.close()
    } finally ep.stop()
  }

  test("CapturingMailTransport: Email node renders and 'sends' per row") {
    val t = CapturingMailTransport("box1")
    val in = Seq(("body one", "a@x", "b@y,c@z")).toDF("payload", "from", "to")
      .withColumn("meta", map().cast("map<string,string>"))
    val out = graft.api.Nodes.Email(lit("Hi"), col("from"), col("to"), t)(in)
    assert(out.select("payload").as[String].head().startsWith("Subject: Hi"))
    val sent = t.sent
    assert(sent.size == 1)
    assert(sent.head._1 == "a@x" && sent.head._2 == Seq("b@y", "c@z"))
    assert(sent.head._3.contains("body one"))
  }

  test("SmtpTransport speaks real SMTP against an in-process server") {
    // minimal single-connection SMTP server capturing the DATA section
    val server = new ServerSocket(0)
    @volatile var captured = ""
    val th = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new PrintWriter(sock.getOutputStream, true)
      def reply(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
      reply("220 test ESMTP")
      var inData = false
      val data = new StringBuilder
      var line = in.readLine()
      while (line != null) {
        if (inData) {
          if (line == ".") { inData = false; captured = data.toString; reply("250 OK") }
          else data.append(line).append("\n")
        } else line.split(" ", 2).head.toUpperCase match {
          case "EHLO" => reply("250-test"); reply("250 OK")
          case "MAIL" | "RCPT" => reply("250 OK")
          case "DATA" => inData = true; reply("354 go")
          case "QUIT" => reply("221 bye"); sock.close(); line = null
          case _ => reply("250 OK")
        }
        if (line != null) line = in.readLine()
      }
    })
    th.setDaemon(true); th.start()
    try {
      val t = SmtpTransport("127.0.0.1", server.getLocalPort)
      t.send("from@x", Seq("to@y"), "Subject: s\r\n\r\n.leading dot\r\nend")
      th.join(10000)
      assert(captured.contains("Subject: s"))
      assert(captured.contains(".leading dot")) // dot-stuffing round-trips
      assert(captured.contains("end"))
    } finally server.close()
  }
}
