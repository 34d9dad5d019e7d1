package graft.text

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.index.{IndexBuilder, Schema}
import graft.query.Search

/** S7: PDF text extraction (subset extractor, `text/Pdf.scala`) — content
  * streams built by hand so every byte of the fixture is understood, plus
  * the S8 content dispatch and an end-to-end index-and-search pass over a
  * corpus row whose `html` column carries a PDF.
  */
class PdfSpec extends AnyFunSuite {

  /** Minimal single-page PDF around the given content stream. `flate`
    * compresses the stream with zlib (`/FlateDecode`).
    */
  private def pdf(content: String, flate: Boolean = false): Array[Byte] = {
    val raw = content.getBytes(StandardCharsets.ISO_8859_1)
    val data =
      if (!flate) raw
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(raw)
        d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head =
      ("%PDF-1.4\n" +
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/MediaBox [0 0 612 792] >> endobj\n" +
        s"4 0 obj << /Length ${data.length}$filter >>\nstream\n")
        .getBytes(StandardCharsets.ISO_8859_1)
    val tail = "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head)
    out.write(data)
    out.write(tail)
    out.toByteArray
  }

  test("Tj + ' show text with per-line newlines") {
    val b = pdf("BT /F1 12 Tf 72 720 Td (Hello pdf world) Tj " +
      "(second line text) ' ET")
    assert(Pdf.extractText(b).contains("Hello pdf world\nsecond line text\n"))
  }

  test("TJ array concatenates strings, ignores kerning numbers") {
    val b = pdf("BT 72 720 Td [(tex) -20 (ture) 5 ( shader)] TJ ET")
    assert(Pdf.extractText(b).contains("texture shader\n"))
  }

  test("literal-string escapes, octal, nesting, hex strings") {
    val b = pdf("""BT (a\(b\)c\\d \101\102) Tj (nested (parens) ok) Tj """ +
      "<48454C4C4F> Tj ET")
    assert(Pdf.extractText(b).contains("a(b)c\\d ABnested (parens) okHELLO\n"))
  }

  test("UTF-16BE strings decode via BOM") {
    // FEFF 0054 0065 0078 0074 = "Text"
    val b = pdf("BT <FEFF0054006500780074> Tj ET")
    assert(Pdf.extractText(b).contains("Text\n"))
  }

  test("FlateDecode stream extracts identically to plain") {
    val content = "BT 72 720 Td (compressed payload words) Tj ET"
    assert(Pdf.extractText(pdf(content, flate = true)) ==
      Pdf.extractText(pdf(content)))
    assert(Pdf.extractText(pdf(content, flate = true))
      .contains("compressed payload words\n"))
  }

  test("two content streams concatenate in file order (page order for " +
      "sequentially written documents)") {
    val one = pdf("BT (page one text) Tj ET")
    val twoStream = ("5 0 obj << /Length 24 >>\nstream\n" +
      "BT (page two text) Tj ET\nendstream endobj\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(one)
    out.write(twoStream)
    val text = Pdf.extractText(out.toByteArray)
    assert(text.contains("page one text\npage two text\n"))
  }

  test("image/font streams are skipped, not decoded as text") {
    val one = pdf("BT (real text) Tj ET")
    val img = ("6 0 obj << /Subtype /Image /Length 12 >>\nstream\n" +
      "(fake) Tj ET\nendstream endobj\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(one)
    out.write(img)
    assert(Pdf.extractText(out.toByteArray).contains("real text\n"))
    assert(!Pdf.extractText(out.toByteArray).get.contains("fake"))
  }

  test("nested dict operands don't hide the outer /Filter: FlateDecode " +
      "with /DecodeParms still decodes") {
    val content = "BT (nested dict payload) Tj ET"
    val raw = content.getBytes(StandardCharsets.ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out0 = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out0.write(buf, 0, d.deflate(buf))
    d.end()
    val data = out0.toByteArray
    val b = new java.io.ByteArrayOutputStream()
    b.write(("%PDF-1.4\n4 0 obj << /Length " + data.length +
      " /Filter /FlateDecode /DecodeParms << /Columns 4 >> >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1))
    b.write(data)
    b.write("\nendstream endobj\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1))
    assert(Pdf.extractText(b.toByteArray).contains("nested dict payload\n"))
  }

  test("embedded font programs (/Length1) and binary streams never " +
      "inject garbage text") {
    // binary blob that happens to contain a plausible BT (x) Tj ET run
    val binary = Array[Byte](0, 1, 2, 3) ++
      "BT (sfnt garbage) Tj ET".getBytes(StandardCharsets.ISO_8859_1) ++
      Array[Byte](0, 0)
    val one = pdf("BT (real content here) Tj ET")
    val font = new java.io.ByteArrayOutputStream()
    font.write(one)
    font.write((s"7 0 obj << /Length1 34000 /Length ${binary.length} >>" +
      "\nstream\n").getBytes(StandardCharsets.ISO_8859_1))
    font.write(binary)
    font.write("\nendstream endobj\n".getBytes(StandardCharsets.ISO_8859_1))
    val text = Pdf.extractText(font.toByteArray).get
    assert(text.contains("real content here"))
    assert(!text.contains("sfnt garbage"))
    // and a NUL-leading stream without /Length1 is caught by the binary
    // probe
    val noMark = new java.io.ByteArrayOutputStream()
    noMark.write(one)
    noMark.write((s"8 0 obj << /Length ${binary.length} >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1))
    noMark.write(binary)
    noMark.write("\nendstream endobj\n".getBytes(StandardCharsets.ISO_8859_1))
    assert(!Pdf.extractText(noMark.toByteArray).get.contains("sfnt garbage"))
  }

  /** Full document with a subsetted simple font: content shows GLYPH IDS
    * (<0102030304>), the font's /ToUnicode CMap (obj 6) maps them back to
    * text via bfchar + a contiguous bfrange, bound through the page
    * resources' /Font dict.
    */
  private def subsettedFontPdf(
      glyphHex: String, fontName: String = "F7"): Array[Byte] = {
    val cmap =
      "/CIDInit /ProcSet findresource begin\n" +
        "begincmap\n" +
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "3 beginbfchar\n<01> <0048>\n<02> <0065>\n<04> <006F>\nendbfchar\n" +
        "1 beginbfrange\n<03> <03> <006C>\nendbfrange\n" +
        "endcmap\nend\n"
    val content = s"BT /$fontName 12 Tf 72 720 Td <$glyphHex> Tj " +
      "/Unbound 10 Tf (plain latin) Tj ET"
    (s"""%PDF-1.4
       |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
       |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
       |3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /$fontName 5 0 R >> >> /Contents 4 0 R >> endobj
       |4 0 obj << /Length ${content.length} >>
       |stream
       |$content
       |endstream endobj
       |5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /ABCDEF+Subset /ToUnicode 6 0 R >> endobj
       |6 0 obj << /Length ${cmap.length} >>
       |stream
       |$cmap
       |endstream endobj
       |trailer << /Root 1 0 R >>
       |%%EOF
       |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
  }

  test("/ToUnicode CMap: subsetted simple font extracts real text where " +
      "glyph ids were garbage; unbound fonts still decode Latin-1") {
    // glyph ids 01 02 03 03 04 → H e l l o via bfchar + bfrange
    val text = Pdf.extractText(subsettedFontPdf("0102030304")).get
    assert(text.contains("Hello"), s"got: $text")
    // the Tf switch to an unbound font restores the default decode
    assert(text.contains("plain latin"))
    // the CMap stream's own hex tokens never leak into the text
    assert(!text.contains("Hel") || text.contains("Hello"))
    // unmapped codes under the SAME font fall back to Latin-1, one char
    // per byte (partial CMaps are the common real-world case)
    val partial = Pdf.extractText(subsettedFontPdf("015A")).get
    assert(partial.contains("HZ"), s"got: $partial") // 5A unmapped → 'Z'
  }

  test("/ToUnicode bfrange array form and 2-byte codes") {
    val cmap =
      "begincmap\n" +
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "1 beginbfrange\n<0010> <0012> [<0057> <006F> <0077>]\nendbfrange\n" +
        "endcmap\n"
    val content = "BT /G1 9 Tf <001000110012> Tj ET"
    val b =
      (s"""%PDF-1.4
         |3 0 obj << /Type /Page /Resources << /Font << /G1 5 0 R >> >> /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream endobj
         |5 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${cmap.length} >>
         |stream
         |$cmap
         |endstream endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    assert(Pdf.extractText(b).get.contains("Wow"))
  }

  test("error semantics: non-PDF bytes and corrupt-only streams → None " +
      "(doc skipped, old version survives); text-free PDF → empty text") {
    assert(Pdf.extractText("not a pdf".getBytes).isEmpty)
    assert(Pdf.extractText(null).isEmpty)
    // corrupt flate: declared FlateDecode, garbage bytes
    val corrupt = ("%PDF-1.4\n1 0 obj << /Length 9 /Filter /FlateDecode >>" +
      "\nstream\nGARBAGE!!\nendstream endobj\n%%EOF\n").getBytes
    assert(Pdf.extractText(corrupt).isEmpty)
    // readable but no text operators at all
    assert(Pdf.extractText("%PDF-1.4\ntrailer << >>\n%%EOF\n".getBytes)
      .contains(""))
  }

  test("S8 content dispatch: %PDF- html routes to the PDF extractor, XML " +
      "html still routes to StAX, text rows pass through") {
    val p = pdf("BT (dispatched pdf content) Tj ET")
    assert(Extract.extractText(p, null)
      .contains("dispatched pdf content\n"))
    assert(Extract.extractText(
      "<r><a>xml here</a></r>".getBytes(StandardCharsets.UTF_8), null)
      .contains("xml here "))
    assert(Extract.extractText(null, "plain text").contains("plain text"))
  }

  test("end-to-end: a corpus row carrying a PDF html column is indexed " +
      "and searchable") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pdfidx_").toString
    val ts = new java.sql.Timestamp(1700000000000L)
    val rows = Seq(
      Schema.Page("https://x.example/1/doc.pdf", ts,
        pdf("BT (pdfuniqueterm inside document) Tj ET", flate = true),
        null, "en"),
      Schema.Page("https://x.example/2/page.txt", ts, null,
        "ordinary text document", "en"))
    IndexBuilder.build(spark, spark.createDataset(rows).toDF(), dir,
      IndexBuilder.BuildConf(partitions = 4, postingGroups = 2,
        queryBuckets = 4))
    val hits = Search
      .searchTop(spark, dir, "pdfuniqueterm", Search.Bm25, 5)
      .select($"url").as[String].collect()
    assert(hits.sameElements(Array("https://x.example/1/doc.pdf")))
  }

  test("a content stream SHOWING the literal 'beginbfchar' is page text, " +
      "not a CMap: classification follows /ToUnicode refs") {
    val b = pdf("BT (use beginbfchar and beginbfrange to build cmaps) Tj ET")
    assert(Pdf.extractText(b).get
      .contains("use beginbfchar and beginbfrange to build cmaps"))
  }

  test("font and BT state persist across /Contents parts: Tf + BT in " +
      "part 1 govern the glyph show in part 2") {
    val cmap =
      "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "3 beginbfchar\n<01> <0048>\n<02> <0065>\n<04> <006F>\nendbfchar\n" +
        "1 beginbfrange\n<03> <03> <006C>\nendbfrange\nendcmap\n"
    val part1 = "BT /F7 12 Tf 72 720 Td"
    val part2 = "<0102030304> Tj ET"
    val b =
      (s"""%PDF-1.4
         |3 0 obj << /Type /Page /Resources << /Font << /F7 5 0 R >> >> /Contents [4 0 R 7 0 R] >> endobj
         |4 0 obj << /Length ${part1.length} >>
         |stream
         |$part1
         |endstream endobj
         |7 0 obj << /Length ${part2.length} >>
         |stream
         |$part2
         |endstream endobj
         |5 0 obj << /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${cmap.length} >>
         |stream
         |$cmap
         |endstream endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val text = Pdf.extractText(b).get
    assert(text.contains("Hello"), s"got: $text")
  }

  test("corrupt CMap with an oversized hex code degrades to an unbound " +
      "font; the rest of the document still extracts") {
    val cmap = "begincmap\n" +
      "1 beginbfchar\n<FFFFFFFFFF> <0041>\nendbfchar\nendcmap\n"
    val content = "BT /F7 12 Tf <4142> Tj (plain latin) Tj ET"
    val b =
      (s"""%PDF-1.4
         |3 0 obj << /Type /Page /Resources << /Font << /F7 5 0 R >> >> /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream endobj
         |5 0 obj << /Type /Font /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${cmap.length} >>
         |stream
         |$cmap
         |endstream endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    // the 5-byte source code forces codeLen > 2 → CMap rejected (no
    // binding), NOT a NumberFormatException that skips the whole doc
    val text = Pdf.extractText(b).get
    assert(text.contains("ABplain latin"), s"got: $text")
  }

  test("fonts bound through a /Type/ObjStm object stream resolve: " +
      "packed page + font dicts bind the top-level ToUnicode CMap") {
    val cmap =
      "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "3 beginbfchar\n<01> <0048>\n<02> <0065>\n<04> <006F>\nendbfchar\n" +
        "1 beginbfrange\n<03> <03> <006C>\nendbfrange\nendcmap\n"
    val content = "BT /F7 12 Tf <0102030304> Tj ET"
    // objects 3 (page w/ resources) and 5 (font) packed in an ObjStm —
    // the modern-writer layout where a raw-byte scan sees NO font dicts
    val o3 = "<< /Type /Page /Resources << /Font << /F7 5 0 R >> >> " +
      "/Contents 4 0 R >>"
    val o5 = "<< /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >>"
    val hdr = s"3 0 5 ${o3.length + 1} "
    val body = (hdr + o3 + "\n" + o5)
      .getBytes(StandardCharsets.ISO_8859_1)
    val defl = new java.util.zip.Deflater()
    defl.setInput(body); defl.finish()
    val packedOut = new java.io.ByteArrayOutputStream()
    val pbuf = new Array[Byte](4096)
    while (!defl.finished()) packedOut.write(pbuf, 0, defl.deflate(pbuf))
    defl.end()
    val packed = packedOut.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write((s"%PDF-1.5\n2 0 obj << /Type /ObjStm /N 2 " +
      s"/First ${hdr.length} /Length ${packed.length} " +
      "/Filter /FlateDecode >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1))
    out.write(packed)
    out.write(("\nendstream endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\n" +
      "endstream endobj\n" +
      s"6 0 obj << /Length ${cmap.length} >>\nstream\n$cmap\n" +
      "endstream endobj\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1))
    val text = Pdf.extractText(out.toByteArray).get
    assert(text.contains("Hello"), s"got: $text")
  }

  test("an absurd 11-digit object number degrades to an unnumbered " +
      "stream; its content still extracts") {
    val content = "BT (survives huge objnum) Tj ET"
    val b = (s"%PDF-1.4\n99999999999 0 obj << /Length ${content.length} " +
      s">>\nstream\n$content\nendstream endobj\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(Pdf.extractText(b).get.contains("survives huge objnum"))
  }

  private val helloCmap =
    "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
      "3 beginbfchar\n<01> <0048>\n<02> <0065>\n<04> <006F>\nendbfchar\n" +
      "1 beginbfrange\n<03> <03> <006C>\nendbfrange\nendcmap\n"

  test("indirect /Font M 0 R resource form binds the ToUnicode CMap " +
      "(the font dict lives in its own object, not inline)") {
    val content = "BT /F7 12 Tf <0102030304> Tj ET"
    val b =
      (s"""%PDF-1.4
         |3 0 obj << /Type /Page /Resources << /Font 9 0 R >> /Contents 4 0 R >> endobj
         |9 0 obj << /F7 5 0 R >> endobj
         |4 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream endobj
         |5 0 obj << /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${helloCmap.length} >>
         |stream
         |$helloCmap
         |endstream endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val text = Pdf.extractText(b).get
    assert(text.contains("Hello"), s"got: $text")
  }

  test("reused object number across generations: a superseded content " +
      "stream sharing the CMap's object number still extracts") {
    // incrementally-updated file: obj 6 appears TWICE — first as an old
    // generation's content stream, later as the font's ToUnicode CMap.
    // Only the stream that PARSES as a CMap may be excluded from
    // extraction; a number-keyed exclusion would silently drop the text.
    val oldGen = "BT (old generation text) Tj ET"
    val content = "BT /F7 12 Tf <0102030304> Tj ET"
    val b =
      (s"""%PDF-1.4
         |6 0 obj << /Length ${oldGen.length} >>
         |stream
         |$oldGen
         |endstream endobj
         |3 0 obj << /Type /Page /Resources << /Font << /F7 5 0 R >> >> /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream endobj
         |5 0 obj << /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${helloCmap.length} >>
         |stream
         |$helloCmap
         |endstream endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val text = Pdf.extractText(b).get
    assert(text.contains("old generation text"), s"got: $text")
    assert(text.contains("Hello"), s"got: $text")
    assert(!text.contains("begincodespacerange"))
  }

  test("a content stream SHOWING the literal '/ToUnicode 4 0 R' cannot " +
      "reclassify stream 4: binding scans read structural text only") {
    val shown = "BT (docs say use /ToUnicode 4 0 R here) Tj ET"
    val target = "BT (object four page text) Tj ET"
    val b =
      (s"""%PDF-1.4
         |4 0 obj << /Length ${target.length} >>
         |stream
         |$target
         |endstream endobj
         |7 0 obj << /Length ${shown.length} >>
         |stream
         |$shown
         |endstream endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val text = Pdf.extractText(b).get
    assert(text.contains("object four page text"), s"got: $text")
    assert(text.contains("docs say use /ToUnicode 4 0 R here"))
  }

  test("the bytes 'stream' inside a dict's literal string do not anchor " +
      "a span: the real content stream after it still extracts") {
    // spec: the stream keyword is followed by an EOL — 'stream' inside
    // /Title (…) is not. Pre-fix, the bogus span swallowed the real
    // stream's keyword and its content was lost or garbled.
    val content = "BT 72 720 Td (real content survives) Tj ET"
    val b =
      (s"""%PDF-1.4
         |1 0 obj << /Title (audio stream handling notes) >> endobj
         |4 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream endobj
         |trailer << /Root 1 0 R >>
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    assert(Pdf.extractText(b) == Some("real content survives\n"))
  }

  test("sloppy writer: horizontal whitespace between the stream keyword " +
      "and its EOL is tolerated (plain and Flate)") {
    def sloppy(b: Array[Byte]): Array[Byte] =
      new String(b, StandardCharsets.ISO_8859_1)
        .replaceFirst("stream\n", "stream \t\n")
        .getBytes(StandardCharsets.ISO_8859_1)
    assert(Pdf.extractText(sloppy(pdf("BT (sloppy eol ok) Tj ET")))
      == Some("sloppy eol ok\n"))
    assert(Pdf.extractText(
      sloppy(pdf("BT (sloppy flate ok) Tj ET", flate = true)))
      == Some("sloppy flate ok\n"))
  }

  test("decompression bomb: a Flate stream inflating past the cap is a " +
      "parse error (doc skipped), not an executor OOM") {
    // 80 MB of 'A' deflates to ~80 KB; inflating it unbounded would hold
    // the whole payload (and worse for deeper ratios) in one task —
    // OutOfMemoryError is an Error, which the parse-error contract's
    // `catch Exception` never sees
    val bomb = pdf("A" * (80 << 20), flate = true)
    assert(Pdf.extractText(bomb).isEmpty)
    // a sane flate stream of the same shape still round-trips
    assert(Pdf.extractText(pdf("BT (small flate ok) Tj ET", flate = true))
      .contains("small flate ok\n"))
  }

  test("two generations of the same CMap object number: the LAST in file " +
      "order wins (incremental updates append the newer object)") {
    // old generation of obj 6 maps <01> → 'X'; the newer generation maps
    // <01>…<04> → Hello. Hash-order selection picked arbitrarily.
    val oldCmap =
      "begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "1 beginbfchar\n<01> <0058>\nendbfchar\nendcmap\n"
    val content = "BT /F7 12 Tf <0102030304> Tj ET"
    val b =
      (s"""%PDF-1.4
         |6 0 obj << /Length ${oldCmap.length} >>
         |stream
         |$oldCmap
         |endstream endobj
         |3 0 obj << /Type /Page /Resources << /Font << /F7 5 0 R >> >> /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${content.length} >>
         |stream
         |$content
         |endstream endobj
         |5 0 obj << /Type /Font /Subtype /TrueType /ToUnicode 6 0 R >> endobj
         |6 0 obj << /Length ${helloCmap.length} >>
         |stream
         |$helloCmap
         |endstream endobj
         |%%EOF
         |""").stripMargin.getBytes(StandardCharsets.ISO_8859_1)
    val text = Pdf.extractText(b).get
    assert(text.contains("Hello"), s"got: $text")
    assert(!text.contains("X"), s"stale generation leaked: $text")
  }
}
