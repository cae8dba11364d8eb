package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Codec column functions — the Spark-first re-expression of pypeman's
  * converter nodes (reference: pypeman/nodes.py JsonToPython/PythonToJson/
  * Encode/Decode/B64*, contrib/csv.py, contrib/xml.py, contrib/hl7.py,
  * contrib/http.py). All are built from `org.apache.spark.sql.functions`
  * (whole-stage codegen); none are UDFs.
  */
object Codecs {

  // ---- JSON (nodes.py:468 JsonToPython / 482 PythonToJson) ---------------

  /** Parse a JSON payload into a typed struct column. */
  def jsonParse(payload: Column, schema: StructType): Column =
    from_json(payload, schema)

  /** Extract one JSON path as string without full parse (scan-friendly when
    * only one field is needed). */
  def jsonGet(payload: Column, path: String): Column =
    get_json_object(payload, path)

  /** Serialize columns to a JSON object payload. */
  def jsonFormat(fields: Column*): Column = to_json(struct(fields: _*))

  // ---- charset / base64 (nodes.py:495-541) -------------------------------

  def encodeText(payload: Column, charset: String = "UTF-8"): Column =
    encode(payload, charset)

  def decodeText(payload: Column, charset: String = "UTF-8"): Column =
    decode(payload, charset)

  def b64Encode(payload: Column): Column = base64(payload)

  def b64Decode(payload: Column): Column = unbase64(payload)

  // ---- CSV (contrib/csv.py) ----------------------------------------------

  /** Python2CSVstr: one CSV line from columns. */
  def csvFormat(delimiter: String, fields: Column*): Column =
    concat_ws(delimiter, fields: _*)

  /** CSVstr2Python (typed): parse one CSV line into a struct via schema. */
  def csvParse(line: Column, schema: StructType, delimiter: String = ","): Column =
    from_csv(line, schema, Map("sep" -> delimiter))

  /** CSVstr2Python (untyped): split a CSV line into a string array. */
  def csvSplit(line: Column, delimiter: String = ","): Column =
    split(line, java.util.regex.Pattern.quote(delimiter))

  // ---- XML (contrib/xml.py) ----------------------------------------------

  /** PythonToXML: build `<root><k>v</k>…</root>` from (tag, value) pairs. */
  def xmlFormat(root: String, fields: (String, Column)*): Column = {
    val inner = fields.map { case (tag, v) =>
      concat(lit(s"<$tag>"), v.cast("string"), lit(s"</$tag>"))
    }
    concat(lit(s"<$root>") +: inner :+ lit(s"</$root>"): _*)
  }

  /** XMLToPython: extract one element text via XPath (native expression). */
  def xmlExtract(xml: Column, path: String): Column = xpath_string(xml, lit(path))

  // ---- HL7 (contrib/hl7.py) ----------------------------------------------

  /** PythonToHL7: segments joined by CR, fields by `|`. */
  def hl7Format(segments: Seq[Seq[Column]]): Column =
    concat_ws("\r", segments.map(fs => concat_ws("|", fs: _*)): _*)

  /** HL7ToPython: message → array of segments, each an array of fields. */
  def hl7Parse(message: Column): Column =
    transform(split(message, "\r"), seg => split(seg, "\\|"))

  /** One HL7 field: segment index (0-based), field index (0-based). */
  def hl7Field(message: Column, segment: Int, field: Int): Column =
    element_at(element_at(hl7Parse(message), segment + 1), field + 1)

  /** HL7 ACK for an inbound message (reference: contrib/hl7.py:148
    * `_create_ack_from_hl7`): echo sender/receiver swapped, answer the
    * message control id with the given ack status (AA/AE/AR). */
  def hl7Ack(message: Column, status: String): Column = {
    val msh = element_at(hl7Parse(message), 1)
    val sendingApp = element_at(msh, 3)
    val receivingApp = element_at(msh, 5)
    val controlId = element_at(msh, 10)
    concat_ws("\r",
      concat_ws("|", lit("MSH"), lit("^~\\&"),
        receivingApp, lit(""), sendingApp, lit(""), lit(""), lit(""),
        lit("ACK"), controlId, lit("P"), lit("2.5")),
      concat_ws("|", lit("MSA"), lit(status), controlId))
  }

  // ---- HTTP (contrib/http.py HttpRequest url building) -------------------

  /** Build a request URL with URL-encoded query params from columns. */
  def httpUrl(base: String, params: (String, Column)*): Column = {
    val qs = params.map { case (k, v) =>
      concat(lit(k + "="), url_encode(v.cast("string")))
    }
    concat(lit(base + "?"), concat_ws("&", qs: _*))
  }

  // ---- Email (nodes.py:857 Email) ----------------------------------------

  /** Render the RFC-822 text the Email node sends (SMTP I/O itself is a
    * deploy-side connector; zero-egress here). */
  def emailFormat(subject: Column, sender: Column, recipients: Column, body: Column): Column =
    concat(
      lit("Subject: "), subject, lit("\r\n"),
      lit("From: "), sender, lit("\r\n"),
      lit("To: "), recipients, lit("\r\n\r\n"),
      body)
}
