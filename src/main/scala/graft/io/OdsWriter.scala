package graft.io

import java.io.{FileOutputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal ODS (OpenDocument Spreadsheet) writer — the sink counterpart of
  * [[OdsReader]] (SURVEY.md §2.1 S4; the reference treats ODS as its
  * primary ingest format, /root/reference/main.py:259-276, so the engine
  * must round-trip it, not merely parse it).
  *
  * Emits a standards-shaped zip: `mimetype` first and STORED (per the ODF
  * packaging spec), `META-INF/manifest.xml`, and a single-sheet
  * `content.xml` whose every cell is a string — matching the all-string
  * read contract on the other side. Driver-side like the reader:
  * spreadsheets are an exchange format for small reference data, not a
  * data-lake format.
  */
object OdsWriter {

  private val Mimetype = "application/vnd.oasis.opendocument.spreadsheet"

  /** Escape for element text. XML 1.0 cannot represent the C0 control
    * range (except tab/newline/CR) even as character references — those
    * are DROPPED so a hostile string cannot produce an unparseable
    * content.xml. `\r` is encoded as a character reference because a
    * conforming XML parser normalizes literal CR to LF, which would
    * silently break exact round-trips. Lone UTF-16 surrogates (not part
    * of a valid pair) cannot be encoded as UTF-8 at all — they become
    * U+FFFD, the standard replacement, instead of emitting malformed
    * bytes.
    */
  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        case '"'  => sb.append("&quot;")
        case '\r' => sb.append("&#13;")
        case _ if c < 0x20 && c != '\t' && c != '\n' => ()
        case _ if Character.isHighSurrogate(c) =>
          if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) {
            sb.append(c).append(s.charAt(i + 1)); i += 1
          } else sb.append('�')
        case _ if Character.isLowSurrogate(c) => sb.append('�')
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** content.xml for one sheet. Null cells become empty cells (no
    * text:p); empty strings become a string cell with an empty text:p —
    * the reader distinguishes the two, so both round-trip exactly.
    */
  def contentXml(rows: Seq[Seq[String]], sheetName: String = "Sheet1"): String = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""").append('\n')
    sb.append(
      """<office:document-content""" +
        """ xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"""" +
        """ xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"""" +
        """ xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"""" +
        """ office:version="1.2">""")
    sb.append("<office:body><office:spreadsheet>")
    sb.append(s"""<table:table table:name="${xmlEscape(sheetName)}">""")
    rows.foreach { row =>
      sb.append("<table:table-row>")
      row.foreach { cell =>
        if (cell == null) sb.append("<table:table-cell/>")
        else {
          sb.append("""<table:table-cell office:value-type="string">""")
          sb.append("<text:p>").append(xmlEscape(cell)).append("</text:p>")
          sb.append("</table:table-cell>")
        }
      }
      sb.append("</table:table-row>")
    }
    sb.append("</table:table>")
    sb.append("</office:spreadsheet></office:body></office:document-content>")
    sb.toString
  }

  private val ManifestXml: String =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">
      | <manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.spreadsheet"/>
      | <manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
      |</manifest:manifest>
      |""".stripMargin

  /** Write `rows` (header + data, all strings, nulls allowed) as a valid
    * single-sheet .ods file at `path`.
    */
  def write(rows: Seq[Seq[String]], path: String): Unit = {
    val out = new FileOutputStream(path)
    try writeTo(rows, out) finally out.close()
  }

  def writeTo(rows: Seq[Seq[String]], out: OutputStream): Unit = {
    val zip = new ZipOutputStream(out)
    try {
      // mimetype must be the FIRST entry and uncompressed (ODF 1.2 §3.3)
      val mimeBytes = Mimetype.getBytes("UTF-8")
      val mime = new ZipEntry("mimetype")
      mime.setMethod(ZipEntry.STORED)
      mime.setSize(mimeBytes.length.toLong)
      mime.setCrc { val c = new java.util.zip.CRC32; c.update(mimeBytes); c.getValue }
      zip.putNextEntry(mime)
      zip.write(mimeBytes)
      zip.closeEntry()

      zip.putNextEntry(new ZipEntry("META-INF/manifest.xml"))
      zip.write(ManifestXml.getBytes("UTF-8"))
      zip.closeEntry()

      zip.putNextEntry(new ZipEntry("content.xml"))
      zip.write(contentXml(rows).getBytes("UTF-8"))
      zip.closeEntry()
    } finally zip.close()
  }
}
