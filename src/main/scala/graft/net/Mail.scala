package graft.net

import graft.api.Node
import graft.functions.Codecs
import org.apache.spark.sql.{Column, Encoders, Row}
import org.apache.spark.sql.functions._
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

/** Email sending — the reference Email node (nodes.py:857) does smtplib
  * I/O per message; graft splits rendering (pure columns, Codecs.emailFormat)
  * from the SMTP hop behind a pluggable [[MailTransport]], the same seam
  * pattern as [[HttpTransport]]. `SmtpTransport` is a real RFC 5321 client
  * over a plain socket (no dependencies), testable against an in-process
  * SMTP conversation; `CapturingMailTransport` is the no-socket test double.
  */
trait MailTransport extends Serializable {
  def send(from: String, to: Seq[String], message: String): Unit
}

/** Minimal ESMTP client: EHLO → MAIL FROM → RCPT TO → DATA (dot-stuffed)
  * → QUIT. One connection per send, matching the reference's smtplib use;
  * partition parallelism bounds concurrent connections. */
final case class SmtpTransport(host: String, port: Int) extends MailTransport {
  private def expect(in: BufferedReader, codes: Set[Int]): Unit = {
    var line = in.readLine()
    if (line == null) throw new java.io.IOException("SMTP connection closed")
    // multi-line replies: "250-..." continues, "250 ..." ends
    while (line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
    val code = line.take(3).toInt
    if (!codes.contains(code)) throw new java.io.IOException(s"SMTP error: $line")
  }

  def send(from: String, to: Seq[String], message: String): Unit = {
    val sock = new Socket(host, port)
    try {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new PrintWriter(sock.getOutputStream, true)
      def cmd(c: String, ok: Set[Int]): Unit = { out.print(c + "\r\n"); out.flush(); expect(in, ok) }
      expect(in, Set(220))
      cmd(s"EHLO graft", Set(250))
      cmd(s"MAIL FROM:<$from>", Set(250))
      to.foreach(r => cmd(s"RCPT TO:<${r.trim}>", Set(250, 251)))
      cmd("DATA", Set(354))
      val stuffed = message.linesWithSeparators
        .map(l => if (l.startsWith(".")) "." + l else l).mkString
      out.print(stuffed)
      if (!stuffed.endsWith("\n")) out.print("\r\n")
      cmd(".", Set(250))
      cmd("QUIT", Set(221))
    } finally sock.close()
  }
}

/** Test double: captures (from, to, message) into a JVM-local mailbox keyed
  * by id — works in local mode where executors share the JVM. */
final case class CapturingMailTransport(id: String) extends MailTransport {
  def send(from: String, to: Seq[String], message: String): Unit =
    CapturingMailTransport.append(id, (from, to, message))
  def sent: Seq[(String, Seq[String], String)] = CapturingMailTransport.sent(id)
}

object CapturingMailTransport {
  private val boxes =
    new java.util.concurrent.ConcurrentHashMap[String, List[(String, Seq[String], String)]]()
  private def append(id: String, m: (String, Seq[String], String)): Unit =
    boxes.merge(id, List(m), (a, b) => a ++ b)
  private def sent(id: String): Seq[(String, Seq[String], String)] =
    Option(boxes.get(id)).getOrElse(Nil)
}

object Mail {

  /** Render (RFC-822 headers + body, contrib parity with Nodes.Email) and
    * send each row over the transport, partition-parallel — the same
    * batched-side-effect shape as Http.request. `recipients` may be a
    * comma-separated list. */
  def send(
      transport: MailTransport,
      subject: Column,
      sender: Column,
      recipients: Column): Node = Node("EmailSend") { df =>
    val prep = df
      .withColumn("payload", Codecs.emailFormat(subject, sender, recipients, col("payload")))
      .withColumn("__mail_from", sender.cast("string"))
      .withColumn("__mail_to", recipients.cast("string"))
    val schema = prep.schema
    val fIdx = schema.fieldIndex("__mail_from")
    val tIdx = schema.fieldIndex("__mail_to")
    val pIdx = schema.fieldIndex("payload")
    prep.mapPartitions { rows =>
      rows.map { r =>
        transport.send(r.getString(fIdx),
          r.getString(tIdx).split(',').toSeq, r.getString(pIdx))
        r
      }
    }(Encoders.row(schema)).drop("__mail_from", "__mail_to")
  }
}
