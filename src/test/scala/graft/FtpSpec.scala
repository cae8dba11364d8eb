package graft

import graft.net.{Ftp, FtpConfig}
import org.apache.spark.sql.functions._
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import java.nio.file.{Files, Path}

/** Minimal in-process FTP server (passive mode, binary) over a temp dir —
  * enough of RFC 959 for the graft client: USER/PASS/TYPE/PASV/NLST/RETR/
  * STOR/DELE/RNFR/RNTO/QUIT. Runs on 127.0.0.1, zero egress. */
class FtpSpec extends SparkSpec {
  import spark.implicits._

  private final class MiniFtpServer(root: Path) {
    private val ctrl = new ServerSocket(0)
    @volatile private var running = true
    def port: Int = ctrl.getLocalPort

    def start(): Unit = {
      val t = new Thread(() => while (running) {
        try serve() catch { case _: Exception => () }
      }, "mini-ftp")
      t.setDaemon(true); t.start()
    }

    private def serve(): Unit = {
      val sock = ctrl.accept()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "ISO-8859-1"))
      val out = new PrintWriter(sock.getOutputStream, true)
      def reply(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
      var data: ServerSocket = null
      var rnfr: String = null
      def withData(f: java.net.Socket => Unit): Unit = {
        val d = data.accept()
        try f(d) finally { d.close(); data.close(); data = null }
      }
      reply("220 mini ftp")
      var line = in.readLine()
      while (line != null && running) {
        val (c, arg) = line.split(" ", 2) match {
          case Array(a, b) => (a.toUpperCase, b)
          case Array(a) => (a.toUpperCase, "")
        }
        c match {
          case "USER" => reply("331 pass")
          case "PASS" => reply("230 ok")
          case "TYPE" => reply("200 ok")
          case "PASV" =>
            data = new ServerSocket(0)
            val p = data.getLocalPort
            reply(s"227 ok (127,0,0,1,${p / 256},${p % 256})")
          case "NLST" =>
            reply("150 list")
            withData { d =>
              val names = root.toFile.listFiles().map(_.getName).sorted.mkString("\r\n")
              d.getOutputStream.write((names + "\r\n").getBytes("UTF-8"))
            }
            reply("226 done")
          case "RETR" =>
            reply("150 send")
            withData(_.getOutputStream.write(Files.readAllBytes(root.resolve(arg))))
            reply("226 done")
          case "STOR" =>
            reply("150 recv")
            withData(d => Files.write(root.resolve(arg), d.getInputStream.readAllBytes()))
            reply("226 done")
          case "DELE" => Files.delete(root.resolve(arg)); reply("250 deleted")
          case "RNFR" => rnfr = arg; reply("350 ok")
          case "RNTO" =>
            Files.move(root.resolve(rnfr), root.resolve(arg)); reply("250 renamed")
          case "QUIT" => reply("221 bye"); sock.close(); line = null
          case _ => reply("502 nope")
        }
        if (line != null) line = in.readLine()
      }
      if (!sock.isClosed) sock.close()
    }

    def stop(): Unit = { running = false; ctrl.close() }
  }

  test("FTP watcher → reader → writer → deleter against an in-process server") {
    val root = Files.createTempDirectory("graft_ftp")
    Files.write(root.resolve("in_a.txt"), "alpha".getBytes("UTF-8"))
    Files.write(root.resolve("in_b.txt"), "beta".getBytes("UTF-8"))
    Files.write(root.resolve("skip.dat"), "nope".getBytes("UTF-8"))
    val server = new MiniFtpServer(root)
    server.start()
    try {
      val cfg = FtpConfig("127.0.0.1", server.port, "u", "p")
      // watcher poll: list matching files (ftp.py FTPWatcherChannel regex)
      val files = Ftp.list(spark, cfg, regex = "in_.*\\.txt")
      assert(files.as[String].collect().toSeq == Seq("in_a.txt", "in_b.txt"))
      // read payloads over the wire, transform, write results back, delete inputs
      val read = Ftp.reader(cfg)(files)
      val processed = read.withColumn("payload", upper(col("payload")))
        .withColumn("filepath", concat(lit("out_"), col("filepath")))
      Ftp.writer(cfg)(processed).count() // safe-file: .part then rename
      Ftp.deleter(cfg)(files).count()
      assert(new String(Files.readAllBytes(root.resolve("out_in_a.txt")), "UTF-8") == "ALPHA")
      assert(new String(Files.readAllBytes(root.resolve("out_in_b.txt")), "UTF-8") == "BETA")
      assert(!Files.exists(root.resolve("in_a.txt")) && !Files.exists(root.resolve("in_b.txt")))
      assert(Files.exists(root.resolve("skip.dat"))) // regex filter respected
    } finally server.stop()
  }
}
