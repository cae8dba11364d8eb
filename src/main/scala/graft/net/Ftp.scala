package graft.net

import graft.api.Node
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

/** Minimal RFC 959 FTP client — the real protocol hop behind the FTP file
  * nodes (reference: pypeman/contrib/ftp.py uses ftplib; graft speaks the
  * wire itself, no dependencies, spec-tested against an in-process FTP
  * server). Passive mode only (PASV), binary type, one control connection
  * per operation — the same connect-per-call shape as the reference's
  * `FTPHelper`, with partition parallelism bounding concurrent sessions.
  */
final case class FtpConfig(
    host: String,
    port: Int,
    user: String = "anonymous",
    password: String = "") extends Serializable {

  def withSession[A](f: FtpSession => A): A = {
    val s = new FtpSession(this)
    try f(s) finally s.close()
  }
}

final class FtpSession(cfg: FtpConfig) {
  private val sock = new Socket(cfg.host, cfg.port)
  private val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "ISO-8859-1"))
  private val out = new PrintWriter(sock.getOutputStream, true)

  expect(Set(220))
  cmd(s"USER ${cfg.user}", Set(230, 331))
  if (cfg.password.nonEmpty || true) cmd(s"PASS ${cfg.password}", Set(230, 202))
  cmd("TYPE I", Set(200))

  private def expect(codes: Set[Int]): String = {
    var line = in.readLine()
    if (line == null) throw new java.io.IOException("FTP connection closed")
    while (line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
    val code = line.take(3).toInt
    if (!codes.contains(code)) throw new java.io.IOException(s"FTP error: $line")
    line
  }

  private def cmd(c: String, ok: Set[Int]): String = {
    out.print(c + "\r\n"); out.flush(); expect(ok)
  }

  /** PASV: parse "227 ... (h1,h2,h3,h4,p1,p2)" into a data connection. */
  private def pasv(): Socket = {
    val reply = cmd("PASV", Set(227))
    val nums = "\\d+".r.findAllIn(reply.substring(reply.indexOf('('))).map(_.toInt).toSeq
    val host = nums.take(4).mkString(".")
    val port = nums(4) * 256 + nums(5)
    new Socket(host, port)
  }

  def retr(path: String): Array[Byte] = {
    val data = pasv()
    cmd(s"RETR $path", Set(125, 150))
    val bytes = try data.getInputStream.readAllBytes() finally data.close()
    expect(Set(226, 250))
    bytes
  }

  def stor(path: String, bytes: Array[Byte]): Unit = {
    val data = pasv()
    cmd(s"STOR $path", Set(125, 150))
    try { data.getOutputStream.write(bytes); data.getOutputStream.flush() }
    finally data.close()
    expect(Set(226, 250))
  }

  def dele(path: String): Unit = { cmd(s"DELE $path", Set(250)); () }

  def rnto(from: String, to: String): Unit = {
    cmd(s"RNFR $from", Set(350)); cmd(s"RNTO $to", Set(250)); ()
  }

  def nlst(dir: String = ""): Seq[String] = {
    val data = pasv()
    cmd(if (dir.isEmpty) "NLST" else s"NLST $dir", Set(125, 150))
    val listing = try new String(data.getInputStream.readAllBytes(), "UTF-8")
      finally data.close()
    expect(Set(226, 250))
    listing.split("\r?\n").toIndexedSeq.filter(_.nonEmpty)
  }

  def close(): Unit = {
    try { out.print("QUIT\r\n"); out.flush() } finally sock.close()
  }
}

/** FTP file nodes over the wire client (contrib/ftp.py FTPFileReader /
  * FTPFileWriter / FTPFileDeleter) — per-row protocol ops, partition-
  * parallel, one session per partition (amortized login, like the HTTP
  * client's per-executor state). */
object Ftp {

  /** Read each row's `pathCol` over FTP into `payload`. */
  def reader(cfg: FtpConfig, pathCol: String = "filepath"): Node =
    Node("FTPFileReader") { df =>
      val schema = df.withColumn("payload", lit("")).schema
      val pIdx = schema.fieldIndex("payload")
      val fIdx = schema.fieldIndex(pathCol)
      df.withColumn("payload", lit("")).mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else cfg.withSession { s =>
          rows.map { r =>
            val vals = r.toSeq.toArray
            vals(pIdx) = new String(s.retr(r.getString(fIdx)), "UTF-8")
            Row.fromSeq(vals.toIndexedSeq)
          }.toVector.iterator // materialize inside the session scope
        }
      }(Encoders.row(schema))
    }

  /** Write each row's payload to its `pathCol` over FTP; `safeFile` stores
    * to `<path>.part` then renames (ftp.py FTPFileWriter semantics). */
  def writer(cfg: FtpConfig, pathCol: String = "filepath", safeFile: Boolean = true): Node =
    Node("FTPFileWriter") { df =>
      val schema = df.schema
      val pIdx = schema.fieldIndex("payload")
      val fIdx = schema.fieldIndex(pathCol)
      df.mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else cfg.withSession { s =>
          rows.map { r =>
            val path = r.getString(fIdx)
            if (safeFile) {
              s.stor(path + ".part", r.getString(pIdx).getBytes("UTF-8"))
              s.rnto(path + ".part", path)
            } else s.stor(path, r.getString(pIdx).getBytes("UTF-8"))
            r
          }.toVector.iterator
        }
      }(Encoders.row(schema))
    }

  /** Delete each row's `pathCol` on the server after processing. */
  def deleter(cfg: FtpConfig, pathCol: String = "filepath"): Node =
    Node("FTPFileDeleter") { df =>
      val schema = df.schema
      val fIdx = schema.fieldIndex(pathCol)
      df.mapPartitions { rows =>
        if (rows.isEmpty) Iterator.empty
        else cfg.withSession { s =>
          rows.map { r => s.dele(r.getString(fIdx)); r }.toVector.iterator
        }
      }(Encoders.row(schema))
    }

  /** FTPWatcherChannel's poll step (ftp.py:61): list the remote dir and
    * return one row per file matching `regex` — feed it to `reader` and the
    * pipeline, then `deleter` or a rename for at-most-once pickup. The list
    * itself is a driver-side scalar fetch (directory listings are small);
    * the per-file reads fan out across partitions. */
  def list(spark: org.apache.spark.sql.SparkSession, cfg: FtpConfig,
      dir: String = "", regex: String = ".*"): DataFrame = {
    import spark.implicits._
    val names = cfg.withSession(_.nlst(dir)).filter(_.matches(regex)).sorted
    names.toDF("filepath")
  }
}
