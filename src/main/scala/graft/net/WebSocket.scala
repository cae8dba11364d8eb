package graft.net

import java.io.{DataInputStream, DataOutputStream, InputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

/** RFC 6455 WebSocket framing + handshake over JDK sockets — zero
  * dependencies, same policy as [[HttpEndpoint]]/[[MllpEndpoint]].
  *
  * The reference serves its remote-admin JSON-RPC over websockets
  * (`websockets.serve`, remoteadmin.py:66) and BOTH its clients dial
  * `ws://` — the shell client (remoteadmin.py:231-341) and the Vue SPA.
  * [[WebSocketEndpoint]] is the transport that lets those stock clients
  * connect unmodified: one text frame in → dispatcher → one text frame
  * out. [[WebSocketClient]] is the operator-side counterpart.
  *
  * Scope: text/ping/pong/close opcodes, fragmented messages reassembled,
  * client-masked frames (required by the RFC), 64 MiB message cap as a
  * garbage guard. Permessage-deflate and subprotocols are not negotiated
  * (the reference clients don't require them).
  */
object WebSocket {

  /** Fixed GUID from RFC 6455 §1.3. */
  private val Magic = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  val MaxMessageBytes: Int = 64 * 1024 * 1024

  private[net] val ContinuationOp = 0x0
  private[net] val TextOp = 0x1
  private[net] val BinaryOp = 0x2
  private[net] val CloseOp = 0x8
  private[net] val PingOp = 0x9
  private[net] val PongOp = 0xa

  /** Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2). */
  def acceptKey(secWebSocketKey: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((secWebSocketKey + Magic).getBytes(UTF_8)))

  /** One raw frame: (fin, opcode, unmasked payload). None at EOF. */
  private[net] def readFrame(in: DataInputStream): Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 == -1) return None
    val fin = (b0 & 0x80) != 0
    val op = b0 & 0x0f
    val b1 = in.read()
    if (b1 == -1) return None
    val masked = (b1 & 0x80) != 0
    val len7 = b1 & 0x7f
    val len: Long =
      if (len7 == 126) ((in.read() & 0xff) << 8) | (in.read() & 0xff)
      else if (len7 == 127) in.readLong()
      else len7
    require(len >= 0 && len <= MaxMessageBytes, s"frame of $len bytes refused")
    val mask = if (masked) { val m = new Array[Byte](4); in.readFully(m); m } else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ mask(i & 3)).toByte; i += 1 }
    }
    Some((fin, op, payload))
  }

  /** Write one frame. Client→server frames MUST be masked (RFC 6455
    * §5.3); server→client frames MUST NOT be. */
  private[net] def writeFrame(
      out: DataOutputStream, op: Int, payload: Array[Byte], mask: Boolean): Unit = {
    out.write(0x80 | op) // FIN always set — we never fragment on write
    val maskBit = if (mask) 0x80 else 0
    if (payload.length < 126) out.write(maskBit | payload.length)
    else if (payload.length < 65536) {
      out.write(maskBit | 126)
      out.write(payload.length >>> 8); out.write(payload.length & 0xff)
    } else {
      out.write(maskBit | 127)
      out.writeLong(payload.length.toLong)
    }
    if (mask) {
      val m = new Array[Byte](4)
      java.util.concurrent.ThreadLocalRandom.current().nextBytes(m)
      out.write(m)
      val masked = new Array[Byte](payload.length)
      var i = 0
      while (i < payload.length) { masked(i) = (payload(i) ^ m(i & 3)).toByte; i += 1 }
      out.write(masked)
    } else out.write(payload)
    out.flush()
  }

  /** Read one complete MESSAGE (reassembling fragments), transparently
    * answering pings. Returns None on close/EOF. */
  private[net] def readMessage(
      in: DataInputStream, out: DataOutputStream, mask: Boolean): Option[(Int, Array[Byte])] = {
    var opcode = -1
    val buf = new java.io.ByteArrayOutputStream()
    while (true) {
      readFrame(in) match {
        case None => return None
        case Some((fin, op, payload)) =>
          op match {
            case CloseOp =>
              // echo the close (status code payload) then report EOF
              try writeFrame(out, CloseOp, payload, mask) catch { case _: Exception => () }
              return None
            case PingOp => writeFrame(out, PongOp, payload, mask)
            case PongOp => () // unsolicited pong — ignore (RFC 6455 §5.5.3)
            case o =>
              if (o != ContinuationOp) opcode = o
              buf.write(payload)
              require(buf.size() <= MaxMessageBytes, "fragmented message too large")
              if (fin) return Some((opcode, buf.toByteArray))
          }
      }
    }
    None // unreachable
  }

  /** Read HTTP-ish header lines until the blank line; returns them. */
  private[net] def readHeaders(in: InputStream): Seq[String] = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var prev = -1
    var b = in.read()
    while (b != -1) {
      if (prev == '\r' && b == '\n') {
        if (cur.isEmpty) return lines.toSeq
        lines += cur.toString
        cur.clear()
      } else if (b != '\r') cur.append(b.toChar)
      prev = b
      b = in.read()
    }
    lines.toSeq
  }

  private[net] def headerValue(headers: Seq[String], name: String): Option[String] =
    headers.collectFirst {
      case h if h.toLowerCase.startsWith(name.toLowerCase + ":") =>
        h.substring(name.length + 1).trim
    }
}

/** WebSocket server endpoint: each TEXT message is handed to `handler`,
  * the return value is sent back as one TEXT frame — the
  * request/response discipline the reference's JSON-RPC admin uses.
  * Handler exceptions reply with the exception message (mirroring
  * [[HttpEndpoint.addHandler]]'s 500 body); nothing is swallowed.
  *
  * Driver-side control plane by design (like the reference's asyncio
  * server): admin traffic is O(requests), never data-sized. */
final class WebSocketEndpoint(host: String = "127.0.0.1", port: Int = 0)(
    handler: String => String) {
  import WebSocket._

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress(host, port))
  @volatile private var running = false

  def actualPort: Int = server.getLocalPort
  def url(path: String = "/"): String = s"ws://$host:$actualPort$path"

  def start(): Unit = {
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serveConn(sock), "graft-ws-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: Exception if !running => ()
          case _: Exception => ()
        }
      }
    }, "graft-ws-accept")
    acceptor.setDaemon(true)
    acceptor.start()
  }

  private def serveConn(sock: Socket): Unit =
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      val headers = readHeaders(in)
      headerValue(headers, "Sec-WebSocket-Key") match {
        case None =>
          out.write(("HTTP/1.1 400 Bad Request\r\n\r\n").getBytes(UTF_8))
        case Some(key) =>
          out.write(
            ("HTTP/1.1 101 Switching Protocols\r\n" +
              "Upgrade: websocket\r\n" +
              "Connection: Upgrade\r\n" +
              s"Sec-WebSocket-Accept: ${acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
          out.flush()
          var live = true
          while (live) {
            readMessage(in, out, mask = false) match {
              case None => live = false
              case Some((_, payload)) =>
                val reply =
                  try handler(new String(payload, UTF_8))
                  catch { case e: Exception => String.valueOf(e.getMessage) }
                writeFrame(out, TextOp, reply.getBytes(UTF_8), mask = false)
            }
          }
      }
    } catch { case _: Exception => () }
    finally { try sock.close() catch { case _: Exception => () } }

  def stop(): Unit = { running = false; try server.close() catch { case _: Exception => () } }
}

/** Blocking WebSocket client — the operator-side `ws://` dialer
  * (reference shell client, remoteadmin.py:231). Handshake on
  * construction; [[sendText]]/[[recvText]] speak masked client frames;
  * pings are answered transparently inside [[recvText]]. */
final class WebSocketClient(host: String, port: Int, path: String = "/") {
  import WebSocket._

  private val sock = new Socket(host, port)
  private val in = new DataInputStream(sock.getInputStream)
  private val out = new DataOutputStream(sock.getOutputStream)

  locally {
    val keyBytes = new Array[Byte](16)
    java.util.concurrent.ThreadLocalRandom.current().nextBytes(keyBytes)
    val key = Base64.getEncoder.encodeToString(keyBytes)
    out.write(
      (s"GET $path HTTP/1.1\r\n" +
        s"Host: $host:$port\r\n" +
        "Upgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Key: $key\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
    out.flush()
    val headers = readHeaders(in)
    require(headers.headOption.exists(_.contains("101")),
      s"websocket handshake refused: ${headers.headOption.getOrElse("<eof>")}")
    val expect = acceptKey(key)
    require(headerValue(headers, "Sec-WebSocket-Accept").contains(expect),
      "websocket handshake: bad Sec-WebSocket-Accept")
  }

  def sendText(s: String): Unit =
    WebSocket.writeFrame(out, TextOp, s.getBytes(UTF_8), mask = true)

  /** Next text message, or None if the server closed. */
  def recvText(): Option[String] =
    readMessage(in, out, mask = true).map { case (_, p) => new String(p, UTF_8) }

  def close(): Unit = {
    try WebSocket.writeFrame(out, CloseOp, Array.emptyByteArray, mask = true)
    catch { case _: Exception => () }
    try sock.close() catch { case _: Exception => () }
  }
}
