package graft.api

import graft.functions.Codecs
import graft.ops.{CoreOps, JoinMapItem, MapItem}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reference-named node constructors — the migration surface for pypeman
  * users. Every node class from pypeman/nodes.py and the pypeman contrib
  * modules has a same-named constructor here returning a graft [[Node]];
  * pipelines port line-for-line:
  *
  * {{{
  *   // pypeman:  chan.add(JsonToPython(), Map(mapping=[...]), PythonToJson())
  *   Channel("c").add(Nodes.JsonToPython(), Nodes.Map(...), Nodes.PythonToJson())
  * }}}
  *
  * Payload convention: the message payload lives in the `payload` column
  * (string for text codecs, struct after typed parses — matching pypeman's
  * payload being str-or-dict).
  */
object Nodes {

  private def payload = col("payload")

  // ---- nodes.py core -----------------------------------------------------

  /** nodes.py:468 — parse JSON payload into a typed struct. */
  def JsonToPython(schema: StructType): Node =
    Node("JsonToPython")(_.withColumn("payload", from_json(payload, schema)))

  /** Untyped variant: payload stays a JSON string, use with JsonPath. */
  def JsonToPython(): Node = Node("JsonToPython")(identity)

  /** nodes.py:482 — serialize a struct payload to JSON text. */
  def PythonToJson(): Node =
    Node("PythonToJson")(_.withColumn("payload", to_json(payload)))

  /** nodes.py:495/507. */
  def Encode(encoding: String = "UTF-8"): Node =
    Node("Encode")(_.withColumn("payload", encode(payload, encoding)))
  def Decode(encoding: String = "UTF-8"): Node =
    Node("Decode")(_.withColumn("payload", decode(payload, encoding)))

  /** nodes.py:519/531. */
  def B64Encode(): Node = Node("B64Encode")(_.withColumn("payload", base64(payload)))
  def B64Decode(): Node = Node("B64Decode")(_.withColumn("payload", unbase64(payload)))

  /** nodes.py:358/371 — route to drop/reject side outputs via Channel. */
  def Drop(cond: Column): Channel => Channel = _.dropWhen(cond)
  def Reject(cond: Column): Channel => Channel = _.rejectWhen(cond)

  /** channels.py:494 — the generic-exception FAIL path as a predicate route
    * (distinct from Reject: fail → state `error`, reject → `rejected`). */
  def Fail(cond: Column): Channel => Channel = _.failWhen(cond)

  /** nodes.py:390. */
  def Empty(): Node = CoreOps.empty

  /** nodes.py:353 RaiseError — fails the job the moment any row reaches it
    * (per-row raise, matching the reference's per-message raise). Used by
    * fail-path tests; combine with `.withAutoRetry(cond)` to divert rows
    * into the retry flow instead of failing. */
  def RaiseError(message: String = "Test node"): Node =
    Node("RaiseError")(df =>
      df.withColumn("payload", raise_error(lit(message)).cast("string")))

  /** nodes.py:396 SetCtx / 114 store_*_as / contrib/ctx.py. */
  def SetCtx(name: String): Node = CoreOps.useCtx(name)
  def StoreAs(name: String): Node = CoreOps.setCtx(name)
  def CombineCtx(names: Map[String, String], metaFrom: String = null): Node =
    CoreOps.combineCtx(names, metaFrom)
  def UseMetaFromCtx(name: String): Node = CoreOps.useMetaFromCtx(name)
  def EmptyMeta(): Node = CoreOps.emptyMeta

  /** nodes.py:752 Map / 799 MappingNode (deprecated alias kept). */
  def Map(mapping: Seq[MapItem], joins: Seq[JoinMapItem] = Nil, recopy: Boolean = false): Node =
    CoreOps.mapFields(mapping, joins, recopy)
  def MappingNode(mapping: Seq[MapItem], joins: Seq[JoinMapItem] = Nil, recopy: Boolean = false): Node =
    Map(mapping, joins, recopy)

  /** nodes.py:805. */
  def ToOrderedDict(keys: Seq[String], defaults: scala.collection.Map[String, Any] = scala.collection.Map.empty): Node =
    CoreOps.project(keys, defaults.toMap)

  /** nodes.py:914. */
  def YielderNode(arrayCol: Column, as: String): Node = CoreOps.yielder(arrayCol, as)

  /** nodes.py:976/943 — arbitrary payload / whole-row rewrite. */
  def FuncNode(name: String)(f: Column => Column): Node = CoreOps.mapPayload(name)(f)
  def MsgFuncNode(name: String)(f: DataFrame => DataFrame): Node = Node(name)(f)

  /** nodes.py:430 Log — sampled peek (eager show at wiring time; debug aid,
    * keep out of production pipelines). */
  def Log(n: Int = 5): Node = Node("Log")(df => { df.show(n, 80); df })

  /** nodes.py:457 Sleep — batch no-op kept for API parity. */
  def Sleep(durationSec: Double = 1): Node = Node("Sleep")(identity)

  /** nodes.py:857 Email — render the message (payload gains RFC-822
    * headers); pass a transport to actually send (graft.net.SmtpTransport
    * speaks real SMTP; CapturingMailTransport for tests). */
  def Email(subject: Column, sender: Column, recipients: Column): Node =
    Node("Email")(df => df.withColumn("payload",
      Codecs.emailFormat(subject, sender, recipients, payload)))
  def Email(subject: Column, sender: Column, recipients: Column,
      transport: graft.net.MailTransport): Node =
    graft.net.Mail.send(transport, subject, sender, recipients)

  // ---- file nodes (nodes.py:619-749, contrib/ftp.py over staged dirs) ----

  def FileReader(pathCol: String = "filepath", binary: Boolean = false): Node =
    graft.sources.FileNodes.fileReader(pathCol, binary)
  def FileWriter(pathCol: String = "filepath", safeFile: Boolean = true,
      createValidFile: Boolean = false, validationExtension: String = ".ok"): Node =
    graft.sources.FileNodes.fileWriter(pathCol, "payload", safeFile,
      if (createValidFile) Some(validationExtension) else None)
  def FileMover(destPath: String, pathCol: String = "filepath"): Node =
    graft.sources.FileNodes.fileMover(destPath, pathCol)
  def FileCleaner(extensionsToRm: Seq[String] = Nil, pathCol: String = "filepath"): Node =
    graft.sources.FileNodes.fileCleaner(pathCol, extensionsToRm)
  /** FTP file nodes (contrib/ftp.py). With an FtpConfig they speak the real
    * wire protocol (graft.net.Ftp, RFC 959 client, spec-tested against an
    * in-process server); the config-less forms run the same per-row ops
    * over a staged transfer directory. */
  def FTPFileReader(cfg: graft.net.FtpConfig, pathCol: String): Node =
    graft.net.Ftp.reader(cfg, pathCol)
  def FTPFileWriter(cfg: graft.net.FtpConfig, pathCol: String): Node =
    graft.net.Ftp.writer(cfg, pathCol)
  def FTPFileDeleter(cfg: graft.net.FtpConfig, pathCol: String): Node =
    graft.net.Ftp.deleter(cfg, pathCol)
  def FTPFileReader(pathCol: String = "filepath", binary: Boolean = false): Node =
    FileReader(pathCol, binary)
  def FTPFileWriter(pathCol: String = "filepath"): Node = FileWriter(pathCol)
  def FTPFileDeleter(pathCol: String = "filepath"): Node = FileCleaner(Nil, pathCol)

  /** Save (nodes.py:592): persist the message stream to a store. */
  def Save(store: graft.store.MessageStore): Node =
    Node("Save") { df => store.save(df); df }

  // ---- contrib/csv.py ----------------------------------------------------

  def CSV2Python(schema: StructType, delimiter: String = ","): Node =
    Node("CSV2Python")(_.withColumn("payload", Codecs.csvParse(payload, schema, delimiter)))
  def CSVstr2Python(delimiter: String = ","): Node =
    Node("CSVstr2Python")(_.withColumn("payload", Codecs.csvSplit(payload, delimiter)))
  def Python2CSVstr(fields: Seq[Column], delimiter: String = ","): Node =
    Node("Python2CSVstr")(_.withColumn("payload", Codecs.csvFormat(delimiter, fields: _*)))

  // ---- contrib/xml.py ----------------------------------------------------

  def XMLToPython(paths: scala.collection.Map[String, String]): Node =
    Node("XMLToPython") { df =>
      val fields = paths.toSeq.map { case (name, p) =>
        Codecs.xmlExtract(payload, p).as(name)
      }
      df.withColumn("payload", struct(fields: _*))
    }
  def PythonToXML(root: String, fields: Seq[(String, Column)]): Node =
    Node("PythonToXML")(_.withColumn("payload", Codecs.xmlFormat(root, fields: _*)))

  // ---- contrib/hl7.py ----------------------------------------------------

  def HL7ToPython(): Node =
    Node("HL7ToPython")(_.withColumn("payload", Codecs.hl7Parse(payload)))
  def PythonToHL7(segments: Seq[Seq[Column]]): Node =
    Node("PythonToHL7")(_.withColumn("payload", Codecs.hl7Format(segments)))

  // ---- contrib/http.py ---------------------------------------------------

  /** HttpRequest (contrib/http.py:185). The transported form does the full
    * exchange — URL templating, partition-parallel send over a pluggable
    * transport (graft.net.JdkHttpTransport for real calls, MockTransport
    * in tests), response → payload/meta. The URL-only form keeps the pure
    * request-construction surface (no I/O). */
  def HttpRequest(transport: graft.net.HttpTransport, url: String,
      params: (String, Column)*): Node =
    graft.net.Http.request(transport, url = url, params = params.toSeq)
  def HttpRequest(base: String, params: (String, Column)*): Node =
    Node("HttpRequest")(_.withColumn("payload", Codecs.httpUrl(base, params: _*)))
  def RequestNode(base: String, params: (String, Column)*): Node =
    HttpRequest(base, params: _*)
}
