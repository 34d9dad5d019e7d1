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
  *   - `/ToUnicode` CMaps for SIMPLE (non-CID) fonts: `beginbfchar` /
  *     `beginbfrange` sections (incl. the array form) are parsed from the
  *     CMap stream, bound to font names through the page resources'
  *     `/Font` dicts (inline `<< /Fx N 0 R >>` or indirect `M 0 R`) and
  *     the font objects' `/ToUnicode` refs, and applied to the strings
  *     shown while that font is selected
  *     (`Tf`) — so subsetted fonts whose string bytes are glyph ids
  *     extract real text instead of garbage. 1- and 2-byte code widths
  *     are supported (from the codespacerange or the entry hex widths);
  *     unmapped 1-byte codes fall back to Latin-1, unmapped multi-byte
  *     codes are dropped.
  *
  *   - font/resource dicts packed in `/Type/ObjStm` object streams
  *     (PDF 1.5+ writers) are unpacked for the binding scan, so
  *     `/ToUnicode` refs inside object streams resolve too.
  *
  * Documented divergences from poppler (COVERAGE.md): CID-keyed composite
  * fonts with encoding CMaps (not just ToUnicode) are out of scope; no
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
      // ---- pass A: LOCATE every candidate stream in file order. Metadata
      // only — no decode yet, so peak memory is one decoded stream at a
      // time below, not every inflated stream of the document at once.
      // (obj, dataStart, dataEnd, isFlate)
      val locs =
        new scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Boolean)]()
      // /Type/ObjStm containers: (dict, dataStart, dataEnd, isFlate)
      val objStmLocs =
        new scala.collection.mutable.ArrayBuffer[(String, Int, Int, Boolean)]()
      // data spans of EVERY stream (content, image, font, ObjStm, XRef) —
      // the complement is the file's STRUCTURAL text (object headers,
      // dicts, xref), the only part the binding scans below may read
      val streamSpans = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var i = 0
      while (i >= 0 && i < bytes.length) {
        val s = indexOf(bytes, "stream", i)
        if (s < 0) i = -1
        else if (s >= 3 && bytes(s - 3) == 'e' && bytes(s - 2) == 'n' &&
            bytes(s - 1) == 'd') {
          // the "stream" SUFFIX of an "endstream" keyword — a rejected
          // candidate's rescan must never re-anchor here (the byte after
          // "endstream" is usually an EOL, which would pass the check
          // below and mis-span into the next object)
          i = s + "stream".length
        } else if ({
          // the spec mandates an EOL after the keyword — without this
          // check, the bytes "stream" inside a dict's literal string
          // (e.g. /Title (audio stream handling)) mis-anchor a bogus span
          // that swallows the NEXT real stream's keyword, silently losing
          // its content. Horizontal whitespace before the EOL is
          // tolerated ("stream \n" — sloppy writers); a multi-line
          // literal containing "stream\n" remains a residual mis-anchor
          // (full string-literal tracking would need a real tokenizer).
          var j = s + "stream".length
          while (j < bytes.length && (bytes(j) == ' ' || bytes(j) == '\t'))
            j += 1
          j >= bytes.length || (bytes(j) != '\n' && bytes(j) != '\r')
        }) {
          i = s + 1 // not the keyword — keep scanning
        } else {
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
          // (tolerated horizontal whitespace skipped first, matching the
          // acceptance check above)
          var dataStart = s + "stream".length
          while (dataStart < bytes.length &&
              (bytes(dataStart) == ' ' || bytes(dataStart) == '\t'))
            dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\r')
            dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\n')
            dataStart += 1
          val dataEnd = indexOf(bytes, "endstream", dataStart)
          if (dataEnd < 0) i = -1
          else {
            streamSpans += ((dataStart, dataEnd))
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
              locs += ((
                if (objStart >= 0) objNumberAt(bytes, objStart) else -1,
                dataStart, dataEnd, dict.contains("/FlateDecode")))
            } else if (dict.contains("/ObjStm")) {
              objStmLocs +=
                ((dict, dataStart, dataEnd, dict.contains("/FlateDecode")))
            }
            i = dataEnd + "endstream".length
          }
        }
      }
      def decodeLoc(l: (Int, Int, Int, Boolean)): Option[Array[Byte]] = {
        val raw = java.util.Arrays.copyOfRange(bytes, l._2, l._3)
        val d = if (l._4) inflate(raw) else Some(raw)
        d.foreach(_ => nDecoded += 1)
        d
      }
      // binary guard: real content streams open with ASCII operators;
      // font/image/object data starts with struct bytes. A NUL in the
      // first 64 decoded bytes marks the stream binary — scanning it
      // could only inject garbage "text" from accidental BT…Tj patterns.
      def looksBinary(d: Array[Byte]): Boolean = {
        val probe = math.min(64, d.length)
        var bin = false
        var k = 0
        while (k < probe && !bin) { bin = d(k) == 0; k += 1 }
        bin
      }
      // ---- /Type/ObjStm expansion: PDF 1.5+ writers pack non-stream
      // objects (font dicts, page resources) into compressed object
      // streams, invisible to a raw-byte scan. Decode each ObjStm once
      // and re-serialize its packed objects as top-level "N 0 obj …
      // endobj" text, appended to the binding scans below. Stream
      // objects can never live inside an ObjStm (spec), so content/CMap
      // stream discovery above is unaffected.
      val objStmText: String = objStmLocs.iterator.map {
        case (dict, a, b, fl) =>
          val raw = java.util.Arrays.copyOfRange(bytes, a, b)
          (if (fl) inflate(raw) else Some(raw))
            .map(expandObjStm(dict, _)).getOrElse("")
      }.mkString
      // ---- structural text: the file MINUS every stream's data span,
      // plus the re-serialized ObjStm contents. All binding scans below
      // read ONLY this: (a) peak memory stays proportional to the
      // object/dict skeleton, not the file (a 100 MB scanned PDF has KBs
      // of structure — the old whole-file String was ~2× the file size
      // per task); (b) bytes INSIDE streams can't forge references — a
      // content stream that literally SHOWS "/ToUnicode 4 0 R" (a
      // document about PDF internals) must not reclassify stream 4.
      val structuralText: String = {
        val sb = new java.lang.StringBuilder()
        var prev = 0
        streamSpans.foreach { case (a, b) =>
          sb.append(new String(bytes, prev, a - prev,
            StandardCharsets.ISO_8859_1))
          prev = b
        }
        sb.append(new String(bytes, prev, bytes.length - prev,
          StandardCharsets.ISO_8859_1))
        if (objStmText.nonEmpty) sb.append('\n').append(objStmText)
        sb.toString
      }
      // ---- ToUnicode CMaps + font-name binding. A stream is a CMap
      // because a font's /ToUnicode points AT it — never because its data
      // happens to contain "beginbfchar" (a content stream legitimately
      // SHOWS that literal when the document is about PDF internals, and
      // must not be dropped from extraction for it).
      val cmapObjs: Set[Int] = toUnicodeRefs(
        structuralText.getBytes(StandardCharsets.ISO_8859_1))
      // keyed on the STREAM's own span, not its object number: an
      // incrementally-updated file can hold several generations of the
      // same object number, and only the stream that actually PARSES as
      // a CMap may be excluded from content extraction — a superseded
      // content stream sharing the number must keep extracting
      val cmapBySpan: Map[(Int, Int), (Int, CMap)] = locs.iterator
        .filter(l => l._1 >= 0 && cmapObjs.contains(l._1))
        .flatMap { l =>
          decodeLoc(l)
            .filterNot(looksBinary)
            .flatMap(d =>
              parseCMap(new String(d, StandardCharsets.ISO_8859_1)))
            .map(cm => (l._2, l._3) -> (l._1, cm))
        }
        .toMap
      // LAST generation in FILE order wins (incremental updates append
      // newer objects after older ones) — iterating cmapBySpan.values
      // would pick an arbitrary hash-order generation
      val cmapByObj: Map[Int, CMap] = {
        val m = scala.collection.mutable.LinkedHashMap.empty[Int, CMap]
        locs.foreach(l =>
          cmapBySpan.get((l._2, l._3)).foreach { case (o, cm) => m(o) = cm })
        m.toMap
      }
      val fontCMaps: Map[String, CMap] =
        if (cmapByObj.isEmpty) Map.empty
        else bindFonts(structuralText, cmapByObj)
      // ---- pass B: decode + evaluate content streams ONE AT A TIME
      // (streams that parsed as referenced CMaps excluded — a CMap's hex
      // tokens are operands of cmap operators, never page text). Font
      // state threads ACROSS streams: a /Contents array's parts form one
      // logical stream per spec, so a Tf at the end of part 1 governs
      // part 2.
      val st = new TextState
      locs.foreach { l =>
        if (!cmapBySpan.contains((l._2, l._3)))
          decodeLoc(l).foreach { d =>
            if (!looksBinary(d) && appendContentText(d, out, fontCMaps, st))
              foundAnyTextOp = true
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

  /** Object numbers referenced as `/ToUnicode N G R` in the given
    * STRUCTURAL bytes (stream data excised by the caller, so shown text
    * can't forge a reference) — the authoritative "this stream is a
    * CMap" set for [[extractText]]'s classification.
    */
  private def toUnicodeRefs(bytes: Array[Byte]): Set[Int] = {
    val out = Set.newBuilder[Int]
    var i = indexOf(bytes, "/ToUnicode", 0)
    while (i >= 0) {
      var j = i + "/ToUnicode".length
      def skipWs(): Unit =
        while (j < bytes.length && (bytes(j) == ' ' || bytes(j) == '\t' ||
          bytes(j) == '\r' || bytes(j) == '\n')) j += 1
      def readNum(): Int = {
        val s = j
        while (j < bytes.length && bytes(j) >= '0' && bytes(j) <= '9') j += 1
        // >9 digits cannot be a real object number and would overflow Int
        if (j == s || j - s > 9) -1
        else Integer.parseInt(
          new String(bytes, s, j - s, StandardCharsets.US_ASCII))
      }
      skipWs()
      val num = readNum()
      skipWs()
      val gen = readNum()
      skipWs()
      if (num >= 0 && gen >= 0 && j < bytes.length && bytes(j) == 'R')
        out += num
      i = indexOf(bytes, "/ToUnicode", i + 1)
    }
    out.result()
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

  /** Object number of the `N G obj` header whose "obj" keyword starts at
    * `objIdx` (-1 when unparsable).
    */
  private def objNumberAt(bytes: Array[Byte], objIdx: Int): Int = {
    var i = objIdx - 1
    def skipWs(): Unit =
      while (i >= 0 && (bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\r' || bytes(i) == '\n')) i -= 1
    def readNum(): Int = {
      val e = i
      while (i >= 0 && bytes(i) >= '0' && bytes(i) <= '9') i -= 1
      // a >9-digit run is not a real object number (and would overflow)
      if (e == i || e - i > 9) -1
      else Integer.parseInt(
        new String(bytes, i + 1, e - i, StandardCharsets.US_ASCII))
    }
    skipWs()
    if (readNum() < 0) return -1 // generation number
    skipWs()
    readNum()
  }

  /** A parsed `/ToUnicode` CMap: fixed code width (1 or 2 bytes for the
    * supported simple/one-CMap shapes) and code → unicode-string entries.
    */
  private final case class CMap(codeLen: Int, map: Map[Int, String]) {
    def decode(b: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder(b.length)
      var i = 0
      while (i + codeLen <= b.length) {
        var code = 0
        var j = 0
        while (j < codeLen) { code = (code << 8) | (b(i + j) & 0xff); j += 1 }
        map.get(code) match {
          case Some(s) => sb.append(s)
          case None =>
            // partial CMaps are common; a 1-byte code is still a
            // character code (Latin-1 ≈ the unmapped simple-font default),
            // a multi-byte code is a bare glyph id — drop it
            if (codeLen == 1) sb.append((code & 0xff).toChar)
        }
        i += codeLen
      }
      sb.toString
    }
  }

  private val hexTok = "<([0-9A-Fa-f]+)>|(\\[)|(\\])".r

  private def hexToBytes(h: String): Array[Byte] = {
    val s = if (h.length % 2 == 1) h + "0" else h
    Array.tabulate(s.length / 2)(k =>
      Integer.parseInt(s.substring(2 * k, 2 * k + 2), 16).toByte)
  }

  private def utf16(hex: String): String =
    new String(hexToBytes(hex), StandardCharsets.UTF_16BE)

  /** `beginbfchar`/`beginbfrange` sections of a ToUnicode CMap stream →
    * code → unicode map. Code width from the codespacerange when present,
    * else the widest source-code hex seen; widths > 2 (CID composite
    * encodings) are unsupported → None. Range expansion capped at 64k
    * entries (a ToUnicode map is at most one entry per glyph).
    */
  private def parseCMap(s: String): Option[CMap] = {
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    var codeLen = 0
    def sections(begin: String, end: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var from = 0
      var b = s.indexOf(begin, from)
      while (b >= 0) {
        val e = s.indexOf(end, b + begin.length)
        if (e < 0) b = -1
        else {
          out += s.substring(b + begin.length, e)
          from = e + end.length
          b = s.indexOf(begin, from)
        }
      }
      out.result()
    }
    sections("begincodespacerange", "endcodespacerange").foreach { sec =>
      "<([0-9A-Fa-f]+)>".r.findFirstMatchIn(sec).foreach(m =>
        codeLen = math.max(codeLen, (m.group(1).length + 1) / 2))
    }
    def noteSrc(hex: String): Int = {
      codeLen = math.max(codeLen, (hex.length + 1) / 2)
      // >4 hex digits already forces codeLen > 2 → the CMap is rejected
      // below; parse defensively so a corrupt wide code can't throw past
      // that check and (via extractText's catch-all) skip the whole doc
      if (hex.length > 8) 0 else java.lang.Long.parseLong(hex, 16).toInt
    }
    sections("beginbfchar", "endbfchar").foreach { sec =>
      val toks = "<([0-9A-Fa-f]+)>".r.findAllMatchIn(sec)
        .map(_.group(1)).toVector
      var k = 0
      while (k + 1 < toks.length) {
        map(noteSrc(toks(k))) = utf16(toks(k + 1))
        k += 2
      }
    }
    sections("beginbfrange", "endbfrange").foreach { sec =>
      val toks = hexTok.findAllMatchIn(sec).toVector
      var k = 0
      while (k + 2 < toks.length) { // a triple needs lo, hi, dst/bracket
        val loHex = toks(k).group(1)
        val hiHex = toks(k + 1).group(1)
        if (loHex == null || hiHex == null) k += 1 // malformed: resync
        else {
          val lo = noteSrc(loHex)
          val hi = noteSrc(hiHex)
          val t2 = toks(k + 2)
          if (t2.group(2) != null) {
            // array form: [ <d0> <d1> … ] — one destination per code
            var j = k + 3
            var code = lo
            while (j < toks.length && toks(j).group(1) != null) {
              if (map.size < 65536) map(code) = utf16(toks(j).group(1))
              code += 1
              j += 1
            }
            k = j + 1 // past the ']'
          } else if (t2.group(1) != null) {
            // contiguous form: dst starts at the value and increments in
            // the LAST UTF-16 code unit (the spec's bfrange rule)
            val dstBytes = hexToBytes(t2.group(1))
            val span = math.min(hi - lo, 65535)
            var c = 0
            while (c <= span && map.size < 65536) {
              val db = dstBytes.clone()
              if (db.length >= 2) {
                val last = (((db(db.length - 2) & 0xff) << 8) |
                  (db(db.length - 1) & 0xff)) + c
                db(db.length - 2) = ((last >> 8) & 0xff).toByte
                db(db.length - 1) = (last & 0xff).toByte
              }
              map(lo + c) = new String(db, StandardCharsets.UTF_16BE)
              c += 1
            }
            k += 3
          } else k += 3 // stray ']' — skip the triple
        }
      }
    }
    if (map.isEmpty || codeLen < 1 || codeLen > 2) None
    else Some(CMap(codeLen, map.toMap))
  }

  private val objStmNRe = """/N\s+(\d+)""".r
  private val objStmFirstRe = """/First\s+(\d+)""".r

  /** Packed objects of one decoded `/Type/ObjStm` stream, re-serialized
    * as `N 0 obj … endobj\n` text (layout per PDF 1.5+ §7.5.7: `/N`
    * pairs of "objnum offset" integers up to `/First`, then the objects
    * at First+offset in pair order). Any malformation degrades to ""
    * (no bindings gained) — never an exception that would skip the
    * document's otherwise-extractable content streams.
    */
  private def expandObjStm(dict: String, data: Array[Byte]): String =
    try {
      val n = objStmNRe.findFirstMatchIn(dict)
        .map(m => safeInt(m.group(1))).getOrElse(-1)
      val first = objStmFirstRe.findFirstMatchIn(dict)
        .map(m => safeInt(m.group(1))).getOrElse(-1)
      if (n <= 0 || first <= 0 || first > data.length) return ""
      val header =
        new String(data, 0, first, StandardCharsets.ISO_8859_1)
      val nums = header.split("\\s+").iterator
        .filter(t => t.nonEmpty && t.length <= 9 &&
          t.forall(c => c >= '0' && c <= '9'))
        .map(_.toInt).toArray
      val sb = new java.lang.StringBuilder()
      val pairs = math.min(n, nums.length / 2)
      var k = 0
      while (k < pairs) {
        val objNum = nums(2 * k)
        val start = first + nums(2 * k + 1)
        val end =
          if (k + 1 < pairs) math.min(data.length, first + nums(2 * k + 3))
          else data.length
        if (start >= first && start < end && end <= data.length)
          sb.append(objNum).append(" 0 obj ")
            .append(new String(data, start, end - start,
              StandardCharsets.ISO_8859_1))
            .append(" endobj\n")
        k += 1
      }
      sb.toString
    } catch { case _: Exception => "" }

  /** `\d+`-group → Int without NumberFormatException on absurd widths
    * (a corrupt file's 10+-digit "object number" must degrade to no
    * binding, not abort extraction of the whole document).
    */
  private def safeInt(s: String): Int = if (s.length > 9) -1 else s.toInt

  private val objHeaderRe = """(\d+)\s+\d+\s+obj""".r
  private val toUniRefRe = """/ToUnicode\s+(\d+)\s+\d+\s+R""".r
  private val fontDictRe = """(?s)/Font\s*<<([^>]*)>>""".r
  private val fontRefRe = """/Font\s+(\d+)\s+\d+\s+R""".r
  private val fontEntryRe = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r

  /** Font NAME → CMap: resource `/Font` dicts — both the inline
    * `/Font << /Fx N 0 R >>` form and the indirect `/Font M 0 R` form
    * (entries read from object M's body, a layout many writers emit) —
    * resolve to font objects, whose `/ToUnicode M 0 R` refs resolve to
    * the parsed CMap streams. Scans the file's STRUCTURAL text (stream
    * data excised, ObjStm contents re-serialized in), so fonts and
    * resources packed into object streams bind too; a name bound on
    * several pages keeps the last binding.
    */
  private def bindFonts(
      whole: String,
      cmaps: Map[Int, CMap]): Map[String, CMap] = {
    val headers = objHeaderRe.findAllMatchIn(whole)
      .map(m => (m.start, safeInt(m.group(1)))).toArray
    def enclosing(pos: Int): Int = {
      var res = -1
      var k = 0
      while (k < headers.length && headers(k)._1 < pos) {
        res = headers(k)._2
        k += 1
      }
      res
    }
    val fontToUni: Map[Int, Int] = toUniRefRe.findAllMatchIn(whole)
      .flatMap { m =>
        val o = enclosing(m.start)
        val tu = safeInt(m.group(1))
        if (o >= 0 && tu >= 0) Some(o -> tu) else None
      }
      .toMap
    val out = scala.collection.mutable.HashMap.empty[String, CMap]
    def bindEntries(dictBody: String): Unit =
      for {
        em <- fontEntryRe.findAllMatchIn(dictBody)
        tu <- fontToUni.get(safeInt(em.group(2)))
        cm <- cmaps.get(tu)
      } out(em.group(1)) = cm
    fontDictRe.findAllMatchIn(whole).foreach(fd => bindEntries(fd.group(1)))
    // indirect form: object M's whole body is the font dict; entries are
    // exclusively name → font-object refs per spec, and any stray
    // ref-shaped match dies in the fontToUni/cmaps resolution anyway
    if (fontRefRe.findFirstIn(whole).isDefined) {
      val bodyByNum: Map[Int, (Int, Int)] = headers.indices.map { k =>
        val (pos, num) = headers(k)
        val end = if (k + 1 < headers.length) headers(k + 1)._1
          else whole.length
        num -> (pos, end)
      }.toMap // duplicate object numbers: the LAST body wins, as above
      for {
        m <- fontRefRe.findAllMatchIn(whole)
        bb <- bodyByNum.get(safeInt(m.group(1)))
      } bindEntries(whole.substring(bb._1, bb._2))
    }
    out.toMap
  }

  /** Decompression-bomb guard: a hostile/corrupt Flate stream of a few KB
    * can inflate to many GB; unbounded growth dies as OutOfMemoryError — an
    * Error, NOT an Exception — which would escape extractText's
    * parse-error-→-skip contract and kill the whole build task. No real
    * text content stream approaches this.
    */
  private val MaxInflatedBytes: Int = 64 << 20

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(64, data.length) * 4L, 1L << 20).toInt)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) {
          if (out.size().toLong + n > MaxInflatedBytes)
            throw new Exception("inflated size cap exceeded")
          out.write(buf, 0, n)
        } else if (n == 0 && inf.needsDictionary())
          throw new Exception("dict")
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Font state carried ACROSS content streams of one document: the font
    * is GRAPHICS state that persists across BT/ET and — because a page's
    * `/Contents` array parts concatenate into one logical stream per
    * spec — across stream boundaries too (a `Tf` at the end of part 1
    * governs the show operators at the start of part 2). One instance
    * per document, created by [[extractText]].
    */
  private final class TextState {
    var curCMap: Option[CMap] = None
    var lastName: String = ""
    // BT…ET can straddle a part boundary too (BT at the end of part 1,
    // its shows and ET in part 2) — one logical stream, one flag
    var inText: Boolean = false
  }

  /** Evaluates the text operators of one decoded content stream into `out`;
    * returns true when at least one text-showing operator was found.
    * Strings stay RAW BYTES until a show operator consumes them: the
    * decode depends on the font selected by the preceding `Tf` (ToUnicode
    * CMap when bound, else BOM/Latin-1).
    */
  private def appendContentText(
      data: Array[Byte],
      out: java.lang.StringBuilder,
      fontCMaps: Map[String, CMap],
      st: TextState): Boolean = {
    var found = false
    var lineHasText = false
    var i = 0
    val n = data.length
    val pendingStrings =
      new scala.collection.mutable.ArrayBuffer[Array[Byte]]()

    def newline(): Unit = {
      if (lineHasText) { out.append('\n'); lineHasText = false }
    }
    def show(b: Array[Byte]): Unit = {
      if (st.inText) {
        val s = st.curCMap match {
          case Some(cm) => cm.decode(b)
          case None => decodeStringBytes(b)
        }
        if (s.nonEmpty) { out.append(s); lineHasText = true }
        found = true
      }
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
        // it must neither act as an operator nor clear pending strings.
        // Remember it: a following Tf binds it as the current font.
        i += 1
        val nameStart = i
        while (i < n && isRegular(data(i) & 0xff)) i += 1
        st.lastName = new String(data, nameStart, i - nameStart,
          StandardCharsets.ISO_8859_1)
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
          case "BT" => st.inText = true; pendingStrings.clear()
          case "ET" => newline(); st.inText = false; pendingStrings.clear()
          case "Tf" =>
            st.curCMap = fontCMaps.get(st.lastName)
            pendingStrings.clear()
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

  /** `(…)` literal string starting at `start`; returns (raw bytes, index
    * after the closing paren). Handles nesting, the escape set, and octal.
    */
  private def parseLiteralString(
      data: Array[Byte], start: Int): (Array[Byte], Int) = {
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
    (bytes.toByteArray, i)
  }

  /** `<…>` hex string; returns (raw bytes, index after '>'). */
  private def parseHexString(
      data: Array[Byte], start: Int): (Array[Byte], Int) = {
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
    (bytes.toByteArray, math.min(n, i + 1))
  }

  /** PDF string bytes → text: UTF-16BE when BOM-prefixed, else Latin-1
    * (≈ PDFDocEncoding for the printable range).
    */
  private def decodeStringBytes(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else new String(b, StandardCharsets.ISO_8859_1)
}
