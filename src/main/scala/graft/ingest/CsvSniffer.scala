package graft.ingest

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Driver-side encoding + delimiter detection over the HEAD of the file.
  *
  * Reproduces the reference's observable sniffing semantics
  * (s3_service.py:66-94 encoding cascade; s3_service.py:107-239 delimiter
  * probe) without its anti-optimization of re-parsing the ENTIRE file per
  * candidate delimiter (SURVEY.md §4): a bounded head sample is sufficient
  * because the acceptance predicate only inspects the header and the first
  * non-empty data row.
  *
  * Encoding: the reference tries utf-8 -> latin-1 -> cp1252 -> iso-8859-1 ->
  * windows-1252, but latin-1 decodes ANY byte string, so the cascade is
  * effectively "utf-8 if valid, else latin-1" — which is exactly what we
  * implement.
  *
  * Delimiter: try ';' then ',' then '\t' (European-format priority,
  * ADR-004); accept the first where the cleaned header has >1 field, the
  * first non-empty cleaned row has >=1 non-empty value, and no field name
  * contains a rival delimiter; fall back to ','.
  */
object CsvSniffer {

  case class Sniff(encoding: String, delimiter: Char, rawHeader: Seq[String])

  val Delimiters: Seq[Char] = Seq(';', ',', '\t')
  val DefaultHeadBytes: Int = 256 * 1024

  /** Read up to `maxBytes` of the object head via the Hadoop FS API (works
    * for file://, hdfs://, s3a://). */
  def headBytes(path: String, conf: Configuration, maxBytes: Int = DefaultHeadBytes): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](maxBytes)
      var off = 0
      var n = 0
      while (off < maxBytes && { n = in.read(buf, off, maxBytes - off); n > 0 }) off += n
      java.util.Arrays.copyOfRange(buf, 0, off)
    } finally in.close()
  }

  /** "utf-8 if it decodes, else latin-1". A multi-byte char truncated by the
    * head window must not force latin-1: malformed input within the last 3
    * bytes of the sample is treated as a truncation artifact. */
  def detectEncoding(head: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(ByteBuffer.wrap(head)); "UTF-8" }
    catch {
      case _: CharacterCodingException =>
        // Retry without the last 3 bytes (max UTF-8 continuation run).
        val trimmed = head.dropRight(3)
        val dec2 = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.REPORT)
          .onUnmappableCharacter(CodingErrorAction.REPORT)
        try { dec2.decode(ByteBuffer.wrap(trimmed)); "UTF-8" }
        catch { case _: CharacterCodingException => "ISO-8859-1" }
    }
  }

  /** Minimal RFC-4180-style line split honoring double quotes (enough to
    * mirror csv.reader's treatment of quoted delimiters in the header and
    * first rows). */
  private[ingest] def splitLine(line: String, delim: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQuotes = false
        } else cur += c
      } else c match {
        case '"' => inQuotes = true
        case `delim` => out += cur.result(); cur.clear()
        case other => cur += other
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  private def lines(text: String): Seq[String] =
    text.split("\n", -1).toSeq.map(l => if (l.endsWith("\r")) l.dropRight(1) else l)

  /** The reference's per-delimiter acceptance predicate
    * (s3_service.py:176-239), evaluated on the head sample. */
  private[ingest] def delimiterWorks(headText: String, d: Char): Boolean = {
    val ls = lines(headText)
    if (ls.isEmpty) return false
    val rawHeader = splitLine(ls.head, d)
    val cleanedHeader = rawHeader.map(_.trim).filter(_.nonEmpty)
    if (cleanedHeader.length <= 1) return false

    // field_names_look_valid: no rival delimiter inside a field name
    val rivals: Seq[Char] = d match {
      case ';' => Seq(',')
      case ',' => Seq(';')
      case _ => Seq(',', ';')
    }
    if (cleanedHeader.exists(fn => rivals.exists(r => fn.contains(r)))) return false

    // first cleaned non-empty data row must have >=1 non-empty value
    val firstRow = ls.tail.iterator
      .map { l =>
        val vals = splitLine(l, d)
        rawHeader.zipAll(vals, "", "").collect {
          case (k, v) if k.trim.nonEmpty => v.trim
        }
      }
      .find(row => row.exists(_.nonEmpty))
    firstRow.isDefined
  }

  def detectDelimiter(headText: String): Char =
    Delimiters.find(delimiterWorks(headText, _)).getOrElse(',')

  /** Full sniff of a CSV object head: encoding, delimiter, raw header row. */
  def sniff(path: String, conf: Configuration, maxBytes: Int = DefaultHeadBytes): Sniff = {
    val head = headBytes(path, conf, maxBytes)
    val enc = detectEncoding(head)
    val text = new String(head, enc)
    val delim = detectDelimiter(text)
    Sniff(enc, delim, lines(text).headOption.map(splitLine(_, delim)).getOrElse(Nil))
  }
}
