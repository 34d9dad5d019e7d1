package graft.text

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Text extraction matching the reference's per-extension parsers
  * (`/root/reference/src/main.rs:21-108`).
  *
  * Row-level rule for the web-page corpus (SURVEY.md §2.1 S8): a row with a
  * non-null `html` column is extracted as XML/XHTML (S5); otherwise the
  * `text` column passes through verbatim (S6, `main.rs:45-53`).
  *
  * S5 semantics (`main.rs:28-41`, xml-rs 0.8.26 default config):
  *   - every `Characters` event's content is appended followed by ONE space;
  *   - whitespace-only text nodes surface as `Whitespace` events — ignored;
  *   - CDATA sections surface as `CData` events — ignored;
  *   - attributes, comments, PIs, element names contribute nothing;
  *   - any parse error aborts the WHOLE document (`Err` → the file is
  *     skipped, `main.rs:196-202`) — extraction returns None.
  *
  * StAX may split one logical text node into several CHARACTERS events, so
  * consecutive CHARACTERS are coalesced into one buffer that is flushed at
  * the next non-characters event; a flushed buffer that is entirely XML
  * whitespace is dropped (xml-rs classifies it as `Whitespace`).
  */
object Extract {

  private val factory: ThreadLocal[XMLInputFactory] =
    ThreadLocal.withInitial { () =>
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.FALSE)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
      f.setProperty(
        XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES,
        java.lang.Boolean.FALSE)
      // CDATA must surface as CDATA events (ignored, matching xml-rs),
      // not CHARACTERS: the JDK's built-in SJSXP defaults report-cdata-
      // event to false and would otherwise INCLUDE CDATA text. Woodstox
      // (shipped with Spark) already reports CDATA; set the property
      // explicitly so any StAX provider behaves identically.
      try f.setProperty(
        "http://java.sun.com/xml/stream/properties/report-cdata-event",
        java.lang.Boolean.TRUE)
      catch { case _: IllegalArgumentException => () } // provider lacks it
      f
    }

  /** XML whitespace per the XML spec (what xml-rs uses to classify a text
    * node as a `Whitespace` event).
    */
  private def isXmlWhitespace(s: java.lang.StringBuilder): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != ' ' && c != '\t' && c != '\r' && c != '\n') return false
      i += 1
    }
    true
  }

  // per-thread reusable text buffers — the extractor runs once per XHTML
  // doc in the build hot path; fresh StringBuilders per doc were a
  // measurable share of its allocation rate
  private val bufs: ThreadLocal[(java.lang.StringBuilder,
      java.lang.StringBuilder)] =
    ThreadLocal.withInitial(() =>
      (new java.lang.StringBuilder(1 << 12), new java.lang.StringBuilder(256)))

  /** S5: extract text from XML/XHTML bytes; None ⇒ malformed, skip doc. */
  def extractXml(html: Array[Byte]): Option[String] = {
    var reader: XMLStreamReader = null
    try {
      reader = factory.get().createXMLStreamReader(
        new ByteArrayInputStream(html))
      val (content, buf) = bufs.get()
      content.setLength(0)
      buf.setLength(0)
      def flush(): Unit = {
        if (buf.length > 0) {
          if (!isXmlWhitespace(buf)) {
            content.append(buf)
            content.append(' ')
          }
          buf.setLength(0)
        }
      }
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.CHARACTERS =>
            buf.append(
              reader.getTextCharacters, reader.getTextStart,
              reader.getTextLength)
          case XMLStreamConstants.ENTITY_REFERENCE =>
            // unresolved entity in non-DTD mode would be an error upstream;
            // resolved ones arrive as CHARACTERS. Treat defensively as text.
            if (reader.getText != null) buf.append(reader.getText)
          case _ =>
            flush() // CDATA / comments / elements break a text run
        }
      }
      flush()
      Some(content.toString)
    } catch {
      case _: Exception => None
    } finally {
      if (reader != null) {
        try reader.close()
        catch { case _: Exception => }
      }
    }
  }

  /** S8 row rule (the table analog of the reference's extension dispatch,
    * `main.rs:93-108`): a non-null `html` column is dispatched on CONTENT
    * — `%PDF-` magic → S7 PDF extraction ([[Pdf.extractText]]), else S5
    * XML extraction; a null `html` passes `text` through verbatim (S6).
    * Returns None when the doc must be skipped (malformed payload, or
    * both columns null) — `main.rs:196-202`.
    */
  def extractText(html: Array[Byte], text: String): Option[String] =
    if (html != null) {
      if (Pdf.looksLikePdf(html)) Pdf.extractText(html)
      else extractXml(html)
    } else Option(text)
}
