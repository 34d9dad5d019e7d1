package graft.text

import java.nio.charset.StandardCharsets

/** PDF text extraction (SURVEY.md §2.1 S7, `/root/reference/src/main.rs:
  * 55-84`): the reference feeds the whole file to poppler and concatenates
  * `page.text()` over all pages; any failure to parse skips the document
  * (`main.rs:196-202`).
  *
  * This is a from-scratch SUBSET extractor (no PDF library exists in the
  * build environment, and none may be added): it decodes the document's
  * content streams and evaluates the text-showing operators. Supported —
  * which covers machine-generated single-column text PDFs, the kind a web
  * crawl's text pipeline can actually use:
  *
  *   - plain and `/FlateDecode` content streams (zlib via
  *     `java.util.Inflater`);
  *   - text blocks `BT … ET` with `Tj`, `'`, `"` (show string) and `TJ`
  *     (array show — kerning numbers ignored);
  *   - line moves `Td`, `TD`, `T*`, `'`, `"` → newline between text lines
  *     (poppler's per-line `\n`);
  *   - literal strings `(…)` with the full escape set (\n \r \t \b \f
  *     \( \) \\ \ooo octal, backslash-newline continuation, balanced
  *     nested parens) and hex strings `<…>`;
  *   - one-byte string encoding read as Latin-1 (≈ PDFDocEncoding for
  *     printable text) and UTF-16BE strings via their BOM.
  *
  * Documented divergences from poppler (COVERAGE.md): no font/CMap
  * (`/ToUnicode`) resolution — subsetted or CID-keyed fonts whose string
  * bytes are glyph ids extract garbage there (poppler maps them); no
  * layout analysis (poppler orders text spatially; this extractor follows
  * content-stream order, which coincides for generated single-column
  * documents); streams are processed in FILE order, which equals page
  * order for sequentially-written and linearized files. A document with
  * no recognizable PDF header, or whose streams all fail to decode, is
  * skipped (None) — the reference's error path.
  */
object Pdf {

  private val HeaderMagic = "%PDF-".getBytes(StandardCharsets.US_ASCII)

  def looksLikePdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > HeaderMagic.length &&
      HeaderMagic.indices.forall(i => bytes(i) == HeaderMagic(i))

  /** All text shown by the document's content streams, lines joined with
    * `\n`, streams concatenated in file order; None when `bytes` is not a
    * readable PDF (reference: parse error → document skipped).
    */
  def extractText(bytes: Array[Byte]): Option[String] = {
    if (!looksLikePdf(bytes)) return None
    try {
      val out = new java.lang.StringBuilder()
      var foundAnyTextOp = false
      var nStreams = 0
      var nDecoded = 0
      var i = 0
      while (i >= 0 && i < bytes.length) {
        val s = indexOf(bytes, "stream", i)
        if (s < 0) i = -1
        else {
          // the stream's WHOLE object header (from the enclosing "obj"
          // keyword), not just the innermost "<<": a nested dict operand
          // like /DecodeParms << … >> sits closest to "stream" and would
          // otherwise hide the outer dict's /Filter and /Subtype keys
          val objStart = lastIndexOf(bytes, "obj", s)
          val dictStart =
            if (objStart >= 0) objStart else lastIndexOf(bytes, "<<", s)
          val dict =
            if (dictStart >= 0)
              new String(bytes, dictStart, s - dictStart,
                StandardCharsets.ISO_8859_1)
            else ""
          // stream data begins after the EOL following the keyword
          var dataStart = s + "stream".length
          if (dataStart < bytes.length && bytes(dataStart) == '\r')
            dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\n')
            dataStart += 1
          val dataEnd = indexOf(bytes, "endstream", dataStart)
          if (dataEnd < 0) i = -1
          else {
            val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            // skip streams that cannot hold page text operators:
            // /Subtype/Image (image XObjects), /Length1 (embedded font
            // PROGRAMS carry their decompressed length there — /FontFile
            // lives in the FontDescriptor object, not the stream's own
            // dict), /ObjStm·/XRef (binary cross-reference containers)
            val isImageOrFont = dict.contains("/Subtype/Image") ||
              dict.contains("/Subtype /Image") ||
              dict.contains("/Length1") ||
              dict.contains("/Type/ObjStm") || dict.contains("/Type /ObjStm") ||
              dict.contains("/Type/XRef") || dict.contains("/Type /XRef")
            if (!isImageOrFont) {
              nStreams += 1
              val decoded =
                if (dict.contains("/FlateDecode")) inflate(raw)
                else Some(raw)
              decoded.foreach { d =>
                nDecoded += 1
                // binary guard: real content streams open with ASCII
                // operators; font/image/object data starts with struct
                // bytes. A NUL in the first 64 decoded bytes marks the
                // stream binary — scanning it could only inject garbage
                // "text" from accidental BT…Tj byte patterns.
                val probe = math.min(64, d.length)
                var bin = false
                var k = 0
                while (k < probe && !bin) { bin = d(k) == 0; k += 1 }
                if (!bin && appendContentText(d, out)) foundAnyTextOp = true
              }
            }
            i = dataEnd + "endstream".length
          }
        }
      }
      if (foundAnyTextOp) Some(out.toString)
      // candidate streams present but NONE decoded → corrupt document:
      // treat as a parse error (reference: Err → doc skipped, the OLD
      // indexed version survives M1/M2), NOT as legitimately empty text
      // (which would REMOVE the doc on re-index)
      else if (nStreams > 0 && nDecoded == 0) None
      else Some(out.toString) // text-free but readable PDF → empty text
    } catch {
      case _: Exception => None
    }
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(StandardCharsets.US_ASCII)
    var i = math.max(0, from)
    val limit = hay.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val n = needle.getBytes(StandardCharsets.US_ASCII)
    var i = math.min(before, hay.length) - n.length
    while (i >= 0) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i -= 1
    }
    -1
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) throw new Exception("dict")
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Evaluates the text operators of one decoded content stream into `out`;
    * returns true when at least one text-showing operator was found.
    */
  private def appendContentText(
      data: Array[Byte], out: java.lang.StringBuilder): Boolean = {
    var found = false
    var inText = false
    var lineHasText = false
    var i = 0
    val n = data.length
    val pendingStrings = new scala.collection.mutable.ArrayBuffer[String]()

    def newline(): Unit = {
      if (lineHasText) { out.append('\n'); lineHasText = false }
    }
    def show(s: String): Unit = {
      if (inText && s.nonEmpty) { out.append(s); lineHasText = true }
      if (inText) found = true
    }

    while (i < n) {
      val c = data(i) & 0xff
      if (c == '(') {
        val (s, next) = parseLiteralString(data, i)
        pendingStrings += s
        i = next
      } else if (c == '<' && i + 1 < n && (data(i + 1) & 0xff) != '<') {
        val (s, next) = parseHexString(data, i)
        pendingStrings += s
        i = next
      } else if (c == '<' && i + 1 < n && (data(i + 1) & 0xff) == '<') {
        i += 2 // dict open inside stream (inline image params) — skip
      } else if (c == '%') {
        while (i < n && data(i) != '\n' && data(i) != '\r') i += 1
      } else if (c == '/') {
        // name token = OPERAND (font/gstate selectors): skip it whole —
        // it must neither act as an operator nor clear pending strings
        i += 1
        while (i < n && isRegular(data(i) & 0xff)) i += 1
      } else if (isRegular(c)) {
        val start = i
        while (i < n && isRegular(data(i) & 0xff)) i += 1
        val op = new String(data, start, i - start,
          StandardCharsets.US_ASCII)
        // numeric tokens are OPERANDS (Td coordinates, TJ kerning): they
        // must not clear the strings accumulated for the next TJ/Tj
        val isNumber = op.nonEmpty && op.forall(ch =>
          (ch >= '0' && ch <= '9') || ch == '-' || ch == '+' || ch == '.')
        if (isNumber) () else op match {
          case "BT" => inText = true; pendingStrings.clear()
          case "ET" => newline(); inText = false; pendingStrings.clear()
          case "Tj" | "TJ" =>
            pendingStrings.foreach(show)
            pendingStrings.clear()
          case "'" =>
            newline()
            pendingStrings.foreach(show)
            pendingStrings.clear()
          case "\"" =>
            newline()
            pendingStrings.foreach(show)
            pendingStrings.clear()
          case "Td" | "TD" | "T*" =>
            newline()
            pendingStrings.clear()
          case _ =>
            // any other operator consumes its operands
            pendingStrings.clear()
        }
      } else i += 1
    }
    newline()
    found
  }

  private def isRegular(c: Int): Boolean =
    !(c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' ||
      c == 0 || c == '(' || c == ')' || c == '<' || c == '>' ||
      c == '[' || c == ']' || c == '{' || c == '}' || c == '/' || c == '%')

  /** `(…)` literal string starting at `start`; returns (decoded, index
    * after the closing paren). Handles nesting, the escape set, and octal.
    */
  private def parseLiteralString(
      data: Array[Byte], start: Int): (String, Int) = {
    val bytes = new java.io.ByteArrayOutputStream()
    var depth = 1
    var i = start + 1
    val n = data.length
    while (i < n && depth > 0) {
      val c = data(i) & 0xff
      if (c == '\\' && i + 1 < n) {
        val e = data(i + 1) & 0xff
        e match {
          case 'n' => bytes.write('\n'); i += 2
          case 'r' => bytes.write('\r'); i += 2
          case 't' => bytes.write('\t'); i += 2
          case 'b' => bytes.write('\b'); i += 2
          case 'f' => bytes.write('\f'); i += 2
          case '(' => bytes.write('('); i += 2
          case ')' => bytes.write(')'); i += 2
          case '\\' => bytes.write('\\'); i += 2
          case '\r' => // line continuation (swallow optional \n)
            i += 2
            if (i < n && data(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0
            var k = 0
            i += 1
            while (k < 3 && i < n && data(i) >= '0' && data(i) <= '7') {
              v = v * 8 + (data(i) - '0')
              i += 1
              k += 1
            }
            bytes.write(v & 0xff)
          case other => bytes.write(other); i += 2 // unknown escape: verbatim
        }
      } else if (c == '(') { depth += 1; bytes.write(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) bytes.write(c)
        i += 1
      } else { bytes.write(c); i += 1 }
    }
    (decodeStringBytes(bytes.toByteArray), i)
  }

  /** `<…>` hex string; returns (decoded, index after '>'). */
  private def parseHexString(data: Array[Byte], start: Int): (String, Int) = {
    val bytes = new java.io.ByteArrayOutputStream()
    var i = start + 1
    val n = data.length
    var hi = -1
    while (i < n && data(i) != '>') {
      val c = data(i) & 0xff
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { bytes.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) bytes.write(hi << 4) // odd digit count: low nibble = 0
    (decodeStringBytes(bytes.toByteArray), math.min(n, i + 1))
  }

  /** PDF string bytes → text: UTF-16BE when BOM-prefixed, else Latin-1
    * (≈ PDFDocEncoding for the printable range).
    */
  private def decodeStringBytes(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else new String(b, StandardCharsets.ISO_8859_1)
}
