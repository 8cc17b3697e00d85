package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PDF text extraction: writer→reader round trips (escapes, Unicode,
  * multi-page order), HAND-BUILT foreign structures the writer never
  * emits (uncompressed streams, TJ kerning arrays, T* line breaks, hex
  * strings, indirect /Length, comments), and loud damage errors. */
class PdfSpec extends SparkSpec {

  test("round trip: escapes (parens, backslash, newline), page split, " +
      "page-tree order, .pdf connector dispatch") {
    import spark.implicits._
    val dir = tmpDir("pdf_rt")
    val text = "hello (world) \\ backslash\nsecond line " + ("x" * 300)
    val n = PdfSource.write(Seq(("doc1", text)).toDF("name", "text"),
      dir, "name", "text", pageChars = 200)
    assert(n == 1)
    val pages = PdfSource.readText(spark, dir)
      .orderBy("page").collect()
      .map(r => (r.getInt(1), r.getString(2)))
    assert(pages.length == 2)
    assert(pages(0)._1 == 1 && pages(1)._1 == 2)
    assert(pages.map(_._2).mkString == text, "byte-exact reassembly")
    // connector dispatch on the file path
    val viaFactory = Connectors.read(spark, s"$dir/doc1.pdf")
    assert(viaFactory.columns.toSeq ==
      Seq("file", "page", "text", "decode_confident"))
    assert(viaFactory.count() == 2)
    // writer emits Helvetica (simple Type1): every page is confident
    assert(viaFactory.select("decode_confident").collect()
      .forall(_.getBoolean(0)))
  }

  test("non-Latin-1 text rides the UTF-16BE hex-string path exactly") {
    import spark.implicits._
    val dir = tmpDir("pdf_utf16")
    val text = "naïve ünïcode — ✓ 日本語"
    PdfSource.write(Seq(("u", text)).toDF("name", "text"),
      dir, "name", "text")
    val got = PdfSource.readText(spark, dir).collect().head.getString(2)
    assert(got == text)
    // and the operand really is a hex string, not mojibake'd literal
    assert(PdfSource.pdfString(text).startsWith("<FEFF"))
  }

  test("foreign structures the writer never emits: uncompressed " +
      "stream, TJ kerning array, T* breaks, hex string, comments, " +
      "indirect /Length (endstream search)") {
    val dir = tmpDir("pdf_foreign")
    val content =
      "BT /F1 12 Tf 72 720 Td [(Hel) -120 (lo)] TJ T* (line2) Tj " +
        "% a comment\n <576F726C64> Tj ET"
    val pdf =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length 5 0 R >>
         |stream
         |$content
         |endstream
         |endobj
         |5 0 obj ${content.length} endobj
         |trailer << /Size 6 /Root 1 0 R >>
         |%%EOF
         |""".stripMargin
    Files.write(Paths.get(dir, "foreign.pdf"),
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    val got = PdfSource.readText(spark, dir).collect().head.getString(2)
    // TJ concatenates ignoring kerning; T* breaks the line; the hex
    // string follows ANOTHER show with no line-move → no break
    assert(got == "Hello\nline2World", s"got '$got'")
  }

  test("multi-page /Kids order wins over object numbering, and a " +
      "/Contents ARRAY concatenates in order") {
    val dir = tmpDir("pdf_order")
    def page(num: Int, contents: String) =
      s"$num 0 obj << /Type /Page /Parent 2 0 R /Contents $contents >> endobj\n"
    def cstream(num: Int, t: String) = {
      val c = s"BT ($t) Tj ET"
      s"$num 0 obj << /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"
    }
    // page objects 5 then 3 in the tree; page 3's contents = [6, 7]
    val pdf = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >> endobj\n" +
      page(3, "[6 0 R 7 0 R]") + page(5, "4 0 R") +
      cstream(4, "first-page") + cstream(6, "second") + cstream(7, "-page") +
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n"
    Files.write(Paths.get(dir, "order.pdf"),
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    val got = PdfSource.readText(spark, dir).orderBy("page").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == Seq((1, "first-page"), (2, "second-page")), s"got $got")
  }

  test("the at-scale composition: PDFs inside a WebDataset tar shard " +
      "extract via pagesFrom on the content bytes (no loose files)") {
    import spark.implicits._
    val dir = tmpDir("pdf_in_tar")
    val entries = (0 until 8).map(i =>
      (f"doc$i%03d", "pdf",
        PdfSource.render(s"packed document $i body", pageChars = 0)))
      .toDF("k", "e", "c")
    TarSource.write(entries, dir, "k", "e", "c", gzip = true)
    val shard = TarSource.read(spark, dir)
      .filter(col("ext") === "pdf")
    val pages = PdfSource.pagesFrom(shard, "key", "content")
    val got = pages.select("file", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == (0 until 8).map(i =>
      (f"doc$i%03d", s"packed document $i body")).toSet, s"got $got")
  }

  /** zlib-wrapped deflate (what PdfSource's Inflater default expects). */
  private def deflate(s: String): Array[Byte] =
    deflate(s.getBytes(StandardCharsets.ISO_8859_1))

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** A PDF 1.5-style file whose catalog/pages/page dicts live INSIDE a
    * FlateDecoded /Type /ObjStm (ISO 32000-1 §7.5.7) — the shape most
    * post-2005 writers emit; only the ObjStm container and the content
    * stream are top-level. `mangle` lets the damage test break the
    * container dict. */
  private def objStmPdf(mangle: String => String = identity): Array[Byte] = {
    val members = Seq(
      3 -> "<< /Type /Catalog /Pages 4 0 R >>",
      4 -> "<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
      5 -> "<< /Type /Page /Parent 4 0 R /Contents 2 0 R >>")
    val bodies = members.map(_._2)
    val offsets = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = members.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + " "
    val data = header + bodies.mkString(" ")
    val packed = deflate(data)
    val content = "BT (hidden in an objstm) Tj ET"
    val head = mangle(s"<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${packed.length} /Filter /FlateDecode >>")
    val buf = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit = buf.write(t.getBytes(StandardCharsets.ISO_8859_1))
    w(s"%PDF-1.5\n1 0 obj $head\nstream\n")
    buf.write(packed)
    w("\nendstream\nendobj\n")
    w(s"2 0 obj << /Length ${content.length} >>\nstream\n$content\n" +
      "endstream\nendobj\n")
    w("trailer << /Size 6 /Root 3 0 R >>\n%%EOF\n")
    buf.toByteArray
  }

  test("/ObjStm compressed object streams index their members: a page " +
      "tree living entirely inside an object stream extracts (the " +
      "post-2005 writer shape the top-level scan alone cannot see)") {
    val dir = tmpDir("pdf_objstm")
    Files.write(Paths.get(dir, "objstm.pdf"), objStmPdf())
    val got = PdfSource.readText(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getInt(1) == 1)
    assert(got.head.getString(2) == "hidden in an objstm",
      s"got '${got.head.getString(2)}'")
    assert(got.head.getBoolean(3)) // no Type0 font anywhere
  }

  test("render(objStm = true) emits the PDF 1.5 writer shape (page " +
      "tree inside a compressed object stream) and reads back " +
      "identically to the classic form — pages, splits, Unicode") {
    val text = "objstm rendering across pages " + ("y" * 300) + " naïve ✓"
    val dirP = tmpDir("pdf_render_objstm")
    Files.write(Paths.get(dirP, "a.pdf"),
      PdfSource.render(text, pageChars = 150, objStm = true))
    val packed = PdfSource.readText(spark, dirP).orderBy("page").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getBoolean(3))).toSeq
    assert(packed.map(_._2).mkString == text, "byte-exact reassembly")
    assert(packed.forall(_._3), "Helvetica pages stay confident")
    val dirC = tmpDir("pdf_render_classic")
    Files.write(Paths.get(dirC, "a.pdf"),
      PdfSource.render(text, pageChars = 150))
    val classic = PdfSource.readText(spark, dirC).orderBy("page").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(packed.map(t => (t._1, t._2)) == classic,
      "both shapes must extract the same rows")
  }

  test("render(objStm, predictor = true) writes the container through " +
      "PNG Up predictor-12 rows (the pdftex shape) and reads back " +
      "identically to the classic form") {
    val text = "predictor-rendered objstm " + ("p" * 260) + " fin"
    val b = PdfSource.render(text, pageChars = 120, objStm = true,
      predictor = true)
    val s = new String(b, StandardCharsets.ISO_8859_1)
    assert(s.contains("/DecodeParms << /Predictor 12"), "parms present")
    val dir = tmpDir("pdf_render_pred")
    Files.write(Paths.get(dir, "p.pdf"), b)
    val got = PdfSource.readText(spark, dir).orderBy("page").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    val dirC = tmpDir("pdf_render_pred_classic")
    Files.write(Paths.get(dirC, "c.pdf"),
      PdfSource.render(text, pageChars = 120))
    val classic = PdfSource.readText(spark, dirC).orderBy("page").collect()
      .map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(got == classic, s"got $got")
    assert(got.map(_._2).mkString == text)
    // predictor without objStm is a caller bug, loudly rejected
    intercept[IllegalArgumentException] {
      PdfSource.render("x", 0, objStm = false, predictor = true)
    }
  }

  test("a top-level object SUPERSEDES an ObjStm member with the same " +
      "number (the incremental-update direction)") {
    val dir = tmpDir("pdf_objstm_update")
    // append an updated page 5 whose /Contents points at a new stream 7
    val base = objStmPdf()
    val extra = ("5 0 obj << /Type /Page /Parent 4 0 R /Contents 7 0 R " +
      ">> endobj\n" +
      "7 0 obj << /Length 24 >>\nstream\nBT (updated page) Tj ET\n" +
      "endstream\nendobj\n").getBytes(StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base); out.write(extra)
    Files.write(Paths.get(dir, "upd.pdf"), out.toByteArray)
    val got = PdfSource.readText(spark, dir).collect().head.getString(2)
    assert(got == "updated page", s"got '$got'")
  }

  test("damaged ObjStm framing is LOUD: missing /First, short header") {
    val d1 = tmpDir("pdf_objstm_bad1")
    Files.write(Paths.get(d1, "nofirst.pdf"),
      objStmPdf(_.replaceAll("/First \\d+ ", "")))
    val e1 = intercept[Exception] { PdfSource.readText(spark, d1).count() }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("/First"), e1.getMessage)
    val d2 = tmpDir("pdf_objstm_bad2")
    Files.write(Paths.get(d2, "shorthdr.pdf"),
      objStmPdf(_.replace("/N 3", "/N 9")))
    val e2 = intercept[Exception] { PdfSource.readText(spark, d2).count() }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString)
      .matches("(?s).*(header|ObjStm).*"), e2.getMessage)
  }

  test("a /Subtype /Type0 (CID) font WITHOUT a usable ToUnicode flips " +
      "decode_confident to false for ITS page only — no CMap means " +
      "mojibake, and the flag marks it instead of shipping silently") {
    val dir = tmpDir("pdf_type0")
    def cstream(num: Int, t: String) = {
      val c = s"BT ($t) Tj ET"
      s"$num 0 obj << /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"
    }
    val pdf = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      cstream(4, "cid-font page") +
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /NotoCJK " +
      "/Encoding /Identity-H >> endobj\n" +
      "6 0 obj << /Type /Page /Parent 2 0 R /Contents 7 0 R " +
      "/Resources 9 0 R >> endobj\n" +
      cstream(7, "simple-font page") +
      "8 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> " +
      "endobj\n" +
      // page 2's resources ride an INDIRECT ref (both paths covered)
      "9 0 obj << /Font << /F2 8 0 R >> >> endobj\n" +
      "trailer << /Size 10 /Root 1 0 R >>\n%%EOF\n"
    Files.write(Paths.get(dir, "type0.pdf"),
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    val got = PdfSource.readText(spark, dir).orderBy("page").collect()
      .map(r => (r.getString(2), r.getBoolean(3))).toSeq
    assert(got == Seq(("cid-font page", false), ("simple-font page", true)),
      s"got $got")
  }

  test("parseToUnicode: bfchar pairs, continuous bfrange (last unit " +
      "increments), array bfrange, code width from codespacerange, " +
      "multi-unit destinations, damaged-hi clamp") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0001> <0048>
        |<0002> <00660066006C>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <0061>
        |endbfrange
        |1 beginbfrange
        |<0020> <0021> [<2713> <00E9>]
        |endbfrange
        |endcmap""".stripMargin
    val (m, width) = PdfSource.parseToUnicode(cmap)
    assert(width == 2)
    assert(m(1) == "H")
    assert(m(2) == "ffl") // multi-unit destination (ligature expansion)
    assert(m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c")
    assert(m(0x20) == "✓" && m(0x21) == "é")
    assert(!m.contains(0x13) && !m.contains(0x22))
    // one-byte codespace
    val (m1, w1) = PdfSource.parseToUnicode(
      "begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "1 beginbfchar\n<41> <0042>\nendbfchar")
    assert(w1 == 1 && m1(0x41) == "B")
    // a damaged hi clamps instead of allocating the heap
    val (mBig, _) = PdfSource.parseToUnicode(
      "1 beginbfrange\n<0000> <7FFFFFF0> <0041>\nendbfrange")
    assert(mBig.size == 0x10000)
  }

  test("Type0 fonts WITH a ToUnicode CMap decode CID codes to real " +
      "Unicode (Tf font tracking, per-show decode) and the page stays " +
      "decode_confident; unmapped codes surface as U+FFFD") {
    val dir = tmpDir("pdf_tounicode")
    val cmap =
      "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "2 beginbfchar\n<0001> <0048>\n<0002> <00E9>\nendbfchar\n" +
        "1 beginbfrange\n<0003> <0004> <006C>\nendbfrange\n" +
        "1 beginbfrange\n<0005> <0005> [<2713>]\nendbfrange\n"
    // shows: mapped codes 1..5 then the unmapped 0099, through ONE
    // Type0 font; a second simple-font show on the same page must
    // stay on the Latin-1 path (Tf switches back)
    val content = "BT /F1 12 Tf <000100020003000400050099> Tj " +
      "/F2 12 Tf (plain) Tj ET"
    val pdf = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\n" +
      "endstream\nendobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Embedded " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >> endobj\n" +
      s"6 0 obj << /Length ${cmap.length} >>\nstream\n$cmap" +
      "endstream\nendobj\n" +
      "7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> " +
      "endobj\n" +
      "trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n"
    Files.write(Paths.get(dir, "cid.pdf"),
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "Hélm✓�plain", s"got '${got.getString(2)}'")
    assert(got.getBoolean(3), "ToUnicode-mapped Type0 must stay confident")
  }

  /** Minimal single-page PDF around a pre-encoded content stream. */
  private def onePagePdf(filterSpec: String,
                         encoded: Array[Byte]): Array[Byte] = {
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${encoded.length} $filterSpec >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val tail = ("\nendstream\nendobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    head ++ encoded ++ tail
  }

  /** Test-side ASCII85 encoder (§7.4.3) to build real fixtures. */
  private def a85(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      (0 until 4).foreach(j =>
        v = (v << 8) | (if (i + j < data.length) data(i + j) & 0xff else 0))
      if (n == 4 && v == 0) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var rem = v
        (4 to 0 by -1).foreach { j => cs(j) = ('!' + (rem % 85)).toChar; rem /= 85 }
        sb.appendAll(cs, 0, n + 1)
      }
      i += 4
    }
    sb.append("~>")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Test-side PDF LZW encoder (§7.4.4, EarlyChange=1) — mirrors the
    * decoder's width schedule so round trips prove the bit protocol. */
  private def lzw(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap[Seq[Byte], Int]()
    var next = 258
    emit(256) // leading clear, as real writers emit
    var w = Vector.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (w.isEmpty || (wb.length == 1) || dict.contains(wb)) w = wb
      else {
        emit(if (w.length == 1) w.head & 0xff else dict(w))
        if (next < 4096) {
          dict(wb) = next; next += 1
          // the DECODER's table runs one entry behind: it bumps after
          // its (next-1)th add, so the encoder bumps on next >= 2^w
          if (next >= (1 << width) && width < 12) width += 1
        }
        w = Vector(b)
      }
    }
    if (w.nonEmpty) emit(if (w.length == 1) w.head & 0xff else dict(w))
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("/ASCIIHexDecode and /ASCII85Decode content streams extract; " +
      "a filter CHAIN [/ASCII85Decode /FlateDecode] applies in order") {
    val d1 = tmpDir("pdf_hex")
    val content = "BT (hex filtered text) Tj ET"
    val hex = content.getBytes(StandardCharsets.ISO_8859_1)
      .map(b => f"${b & 0xff}%02X").mkString
      .grouped(16).mkString(" \n") + ">"
    Files.write(Paths.get(d1, "hex.pdf"), onePagePdf(
      "/Filter /ASCIIHexDecode",
      hex.getBytes(StandardCharsets.ISO_8859_1)))
    assert(PdfSource.readText(spark, d1).collect().head.getString(2) ==
      "hex filtered text")
    val d2 = tmpDir("pdf_a85")
    val c2 = "BT (ascii85 \u0000 binary-safe) Tj ET" // a NUL rides through
      .getBytes(StandardCharsets.ISO_8859_1)
    Files.write(Paths.get(d2, "a85.pdf"),
      onePagePdf("/Filter /ASCII85Decode", a85(c2)))
    assert(PdfSource.readText(spark, d2).collect().head.getString(2) ==
      "ascii85 \u0000 binary-safe")
    val d3 = tmpDir("pdf_chain")
    val c3 = "BT (chained filters work) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(c3); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    Files.write(Paths.get(d3, "chain.pdf"), onePagePdf(
      "/Filter [/ASCII85Decode /FlateDecode]", a85(deflated)))
    assert(PdfSource.readText(spark, d3).collect().head.getString(2) ==
      "chained filters work")
  }

  test("/LZWDecode round-trips through a spec-mirroring encoder: " +
      "width bumps at 511/1023 (EarlyChange=1), the KwKwK case, and " +
      "a seeded random-bytes property") {
    val d1 = tmpDir("pdf_lzw")
    // repetitive head forces KwKwK; varied tail crosses the 511-entry
    // width bump (9→10 bits)
    val body = "aaaaaaaaaa " + (0 until 600).map(i => s"w$i").mkString(" ")
    val content = s"BT ($body) Tj ET"
    Files.write(Paths.get(d1, "lzw.pdf"), onePagePdf(
      "/Filter /LZWDecode",
      lzw(content.getBytes(StandardCharsets.ISO_8859_1))))
    val got = PdfSource.readText(spark, d1).collect().head.getString(2)
    assert(got == body, s"LZW mismatch: got ${got.take(60)}…")
    // property: random byte streams survive encode→(reader-internal)
    // decode byte-exactly, via a hex-string operand (binary-safe)
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val raw = new Array[Byte](3000 + trial * 997)
      rnd.nextBytes(raw)
      // bias toward repetition so the dictionary genuinely grows
      (0 until raw.length / 3).foreach(i => raw(i * 3) = (i % 7).toByte)
      val hexOperand = raw.map(b => f"${b & 0xff}%02X").mkString
      val c = s"BT <$hexOperand> Tj ET"
      val dir = tmpDir(s"pdf_lzw_p$trial")
      Files.write(Paths.get(dir, "p.pdf"), onePagePdf(
        "/Filter /LZWDecode",
        lzw(c.getBytes(StandardCharsets.ISO_8859_1))))
      val back = PdfSource.readText(spark, dir).collect().head.getString(2)
      // hex operand decodes Latin-1: compare codepoints to bytes
      assert(back.length == raw.length &&
        back.toCharArray.zip(raw).forall { case (ch, b) =>
          ch.toInt == (b & 0xff) }, s"trial $trial mismatch")
    }
  }

  test("a page WITHOUT its own /Resources inherits the /Pages " +
      "ancestor's (§7.7.3.4): an inherited Type0-without-ToUnicode " +
      "still flips decode_confident") {
    val dir = tmpDir("pdf_inherit")
    def cstream(num: Int, t: String) = {
      val c = s"BT ($t) Tj ET"
      s"$num 0 obj << /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"
    }
    val pdf = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      cstream(4, "inherited resources") +
      "5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /X " +
      "/Encoding /Identity-H >> endobj\n" +
      "trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n"
    Files.write(Paths.get(dir, "inh.pdf"),
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "inherited resources")
    assert(!got.getBoolean(3),
      "the inherited Type0 font must flip decode_confident")
  }

  /** Single-page PDF with a SIMPLE font carrying `encDict` as its
    * /Encoding value (name, inline dict, or indirect ref via extra
    * objects appended verbatim). Content shows `operand` through it. */
  private def simpleFontPdf(encDict: String, operand: String,
                            extra: String = ""): Array[Byte] = {
    val content = s"BT /F1 12 Tf $operand Tj ET"
    ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >>\nstream\n$content\n" +
      "endstream\nendobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Custom " +
      s"/Encoding $encDict >> endobj\n" + extra +
      "trailer << /Size 10 /Root 1 0 R >>\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
  }

  test("simple-font /WinAnsiEncoding decodes the CP1252 high band " +
      "(curly quotes, Euro) and the page stays decode_confident") {
    val dir = tmpDir("pdf_winansi")
    // 0x93/0x94 curly quotes, 0x80 Euro, 0x97 em-dash around ASCII
    Files.write(Paths.get(dir, "w.pdf"),
      simpleFontPdf("/WinAnsiEncoding", "<934142942080209748>"))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "“AB” € —H", s"got '${got.getString(2)}'")
    assert(got.getBoolean(3), "a known base encoding stays confident")
  }

  test("simple-font /MacRomanEncoding decodes the classic Mac high " +
      "half (é at 0x8E, the fi ligature at 0xDE, NBSP at 0xCA)") {
    val dir = tmpDir("pdf_macroman")
    Files.write(Paths.get(dir, "m.pdf"),
      simpleFontPdf("/MacRomanEncoding", "<8EDECA41>"))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "éﬁ A", s"got '${got.getString(2)}'")
    assert(got.getBoolean(3))
  }

  test("a /Differences array remaps codes through the AGL glyph table " +
      "(names assign consecutive codes after each integer; uniXXXX " +
      "resolves algorithmically); base WinAnsi still applies elsewhere") {
    val dir = tmpDir("pdf_differences")
    // 65→eacute, 66→bullet (consecutive), 97→Euro, 98→uni0142 (ł);
    // 0x93 comes from the /BaseEncoding WinAnsi table untouched
    Files.write(Paths.get(dir, "d.pdf"), simpleFontPdf(
      "<< /BaseEncoding /WinAnsiEncoding " +
        "/Differences [65 /eacute /bullet 97 /Euro /uni0142] >>",
      "(ABab) Tj <93>"))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "é•€ł“", s"got '${got.getString(2)}'")
    assert(got.getBoolean(3), "fully-mapped differences stay confident")
  }

  test("an /Encoding riding an INDIRECT ref resolves like an inline " +
      "dict (both spellings are common in the wild)") {
    val dir = tmpDir("pdf_enc_indirect")
    Files.write(Paths.get(dir, "i.pdf"), simpleFontPdf(
      "9 0 R", "(A)",
      extra = "9 0 obj << /Differences [65 /copyright] >> endobj\n"))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "©", s"got '${got.getString(2)}'")
    assert(got.getBoolean(3))
  }

  test("an indirect /Encoding resolving to a bare NAME object decodes " +
      "through that base table (not silent Latin-1), and an indirect " +
      "/Encoding resolving to garbage flags unconfident") {
    val d1 = tmpDir("pdf_enc_indirect_name")
    Files.write(Paths.get(d1, "n.pdf"), simpleFontPdf(
      "9 0 R", "<93>",
      extra = "9 0 obj /WinAnsiEncoding endobj\n"))
    val g1 = PdfSource.readText(spark, d1).collect().head
    assert(g1.getString(2) == "“", s"got '${g1.getString(2)}'")
    assert(g1.getBoolean(3))
    val d2 = tmpDir("pdf_enc_indirect_junk")
    Files.write(Paths.get(d2, "j.pdf"), simpleFontPdf(
      "9 0 R", "(AB)",
      extra = "9 0 obj 1234 endobj\n"))
    val g2 = PdfSource.readText(spark, d2).collect().head
    assert(g2.getString(2) == "AB", "junk encoding still decodes Latin-1")
    assert(!g2.getBoolean(3),
      "a declared-but-unreadable /Encoding must flip the flag")
  }

  test("a /Differences integer beyond the byte range flags " +
      "unconfident instead of crashing the task with a raw " +
      "NumberFormatException") {
    val dir = tmpDir("pdf_diff_huge")
    Files.write(Paths.get(dir, "h.pdf"), simpleFontPdf(
      "<< /Differences [99999999999 /a 66 /eacute] >>", "(AB)"))
    val got = PdfSource.readText(spark, dir).collect().head
    // code 66 ('B') still remaps; the hostile integer only flags
    assert(got.getString(2) == "Aé", s"got '${got.getString(2)}'")
    assert(!got.getBoolean(3))
  }

  test("an INDIRECT /DecodeParms resolves before predictor " +
      "unfiltering, and a dangling parms ref is LOUD (skipping it " +
      "would ship every row as garbage)") {
    val dir = tmpDir("pdf_parms_indirect")
    val rowLen = 10
    val body = "indirect decode parms rows"
    val content0 = s"BT ($body) Tj ET"
    val content = content0 + " " * ((rowLen - content0.length % rowLen)
      % rowLen)
    val filtered = pngPredict(
      content.getBytes(StandardCharsets.ISO_8859_1), rowLen)
    val enc = deflate(filtered)
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${enc.length} /Filter /FlateDecode " +
      "/DecodeParms 5 0 R >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ enc ++
      ("\nendstream\nendobj\n" +
        s"5 0 obj << /Predictor 12 /Columns $rowLen >> endobj\n" +
        "trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n")
        .getBytes(StandardCharsets.ISO_8859_1)
    Files.write(Paths.get(dir, "i.pdf"), pdf)
    assert(PdfSource.readText(spark, dir).collect().head.getString(2)
      == body)
    // dangling: same file without object 5
    val d2 = tmpDir("pdf_parms_dangling")
    val bad = new String(pdf, StandardCharsets.ISO_8859_1)
      .replace(s"5 0 obj << /Predictor 12 /Columns $rowLen >> endobj\n", "")
    Files.write(Paths.get(d2, "d.pdf"),
      bad.getBytes(StandardCharsets.ISO_8859_1))
    val e = intercept[Exception] { PdfSource.readText(spark, d2).count() }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
      .contains("DecodeParms"), e.getMessage)
  }

  test("simple-font mojibake NEVER ships silently: an unknown base " +
      "encoding name and an unmapped /Differences glyph both flip " +
      "decode_confident to false (the unmapped code shows as U+FFFD)") {
    val d1 = tmpDir("pdf_enc_unknown")
    Files.write(Paths.get(d1, "u.pdf"),
      simpleFontPdf("/FontSpecificEncoding", "(AB)"))
    val g1 = PdfSource.readText(spark, d1).collect().head
    assert(g1.getString(2) == "AB", "unknown base still decodes Latin-1")
    assert(!g1.getBoolean(3), "unknown base encoding must flip the flag")
    val d2 = tmpDir("pdf_enc_unmapped")
    Files.write(Paths.get(d2, "g.pdf"), simpleFontPdf(
      "<< /Differences [65 /g123456 66 /eacute] >>", "(AB)"))
    val g2 = PdfSource.readText(spark, d2).collect().head
    assert(g2.getString(2) == "�é", s"got '${g2.getString(2)}'")
    assert(!g2.getBoolean(3), "an unmapped glyph name must flip the flag")
  }

  /** PNG-predicts `data` (§7.4.4.4 shape: every row = 1 filter-type
    * byte + rowLen filtered bytes), cycling filter types 0..4 across
    * rows so one fixture exercises None/Sub/Up/Average/Paeth. */
  private def pngPredict(data: Array[Byte], rowLen: Int): Array[Byte] = {
    require(data.length % rowLen == 0)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val rows = data.length / rowLen
    val out = new java.io.ByteArrayOutputStream((rowLen + 1) * rows)
    (0 until rows).foreach { r =>
      val ft = r % 5
      out.write(ft)
      (0 until rowLen).foreach { i =>
        val raw = data(r * rowLen + i) & 0xff
        val left = if (i > 0) data(r * rowLen + i - 1) & 0xff else 0
        val up = if (r > 0) data((r - 1) * rowLen + i) & 0xff else 0
        val ul = if (r > 0 && i > 0) data((r - 1) * rowLen + i - 1) & 0xff
                 else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        out.write((raw - pred) & 0xff)
      }
    }
    out.toByteArray
  }

  test("/Predictor 12 (PNG family) unfilters FlateDecode content — " +
      "all five PNG row filters — and TIFF /Predictor 2 undoes " +
      "horizontal differencing") {
    val d1 = tmpDir("pdf_pred_png")
    val rowLen = 10
    val body = "predicted rows of text through every PNG filter type"
    val content0 = s"BT ($body) Tj ET"
    val content = content0 + " " * ((rowLen - content0.length % rowLen)
      % rowLen)
    val filtered = pngPredict(
      content.getBytes(StandardCharsets.ISO_8859_1), rowLen)
    Files.write(Paths.get(d1, "png.pdf"), onePagePdf(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 " +
        s"/Columns $rowLen >>", deflate(filtered)))
    assert(PdfSource.readText(spark, d1).collect().head.getString(2)
      == body)
    val d2 = tmpDir("pdf_pred_tiff")
    val c2 = ("BT (tiff differencing) Tj ET" + "  ").take(30) // 3×10 rows
    val raw = c2.getBytes(StandardCharsets.ISO_8859_1)
    val diffed = raw.clone()
    (0 until raw.length / rowLen).foreach { r =>
      (rowLen - 1 to 1 by -1).foreach { i =>
        diffed(r * rowLen + i) =
          ((raw(r * rowLen + i) & 0xff) - (raw(r * rowLen + i - 1) & 0xff))
            .toByte
      }
    }
    Files.write(Paths.get(d2, "tiff.pdf"), onePagePdf(
      s"/Filter /FlateDecode /DecodeParms << /Predictor 2 " +
        s"/Columns $rowLen >>", deflate(diffed)))
    assert(PdfSource.readText(spark, d2).collect().head.getString(2)
      == "tiff differencing")
  }

  test("a predictor-12 /ObjStm (the pdftex-family shape that used to " +
      "reject wholesale) extracts its packed page tree") {
    val dir = tmpDir("pdf_pred_objstm")
    val members = Seq(
      3 -> "<< /Type /Catalog /Pages 4 0 R >>",
      4 -> "<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
      5 -> "<< /Type /Page /Parent 4 0 R /Contents 2 0 R >>")
    val bodies = members.map(_._2)
    val offsets = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = members.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + " "
    val rowLen = 16
    val data0 = header + bodies.mkString(" ")
    val data = data0 + " " * ((rowLen - data0.length % rowLen) % rowLen)
    val packed = deflate(pngPredict(
      data.getBytes(StandardCharsets.ISO_8859_1), rowLen))
    val content = "BT (predicted objstm) Tj ET"
    val buf = new java.io.ByteArrayOutputStream()
    def w(t: String): Unit = buf.write(t.getBytes(StandardCharsets.ISO_8859_1))
    w(s"%PDF-1.5\n1 0 obj << /Type /ObjStm /N 3 " +
      s"/First ${header.length} /Length ${packed.length} " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 " +
      s"/Columns $rowLen >> >>\nstream\n")
    buf.write(packed)
    w("\nendstream\nendobj\n")
    w(s"2 0 obj << /Length ${content.length} >>\nstream\n$content\n" +
      "endstream\nendobj\n")
    w("trailer << /Size 6 /Root 3 0 R >>\n%%EOF\n")
    Files.write(Paths.get(dir, "pred.pdf"), buf.toByteArray)
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "predicted objstm",
      s"got '${got.getString(2)}'")
  }

  test("predictor damage is LOUD: unknown PNG filter-type byte, " +
      "non-whole rows, undefined predictor numbers 3-9") {
    def pdfWith(parms: String, payload: Array[Byte]): Array[Byte] =
      onePagePdf(s"/Filter /FlateDecode /DecodeParms << $parms >>",
        deflate(payload))
    val d1 = tmpDir("pdf_pred_badft")
    Files.write(Paths.get(d1, "b.pdf"), pdfWith("/Predictor 12 /Columns 4",
      Array[Byte](7, 1, 2, 3, 4))) // filter type 7 does not exist
    val e1 = intercept[Exception] { PdfSource.readText(spark, d1).count() }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("filter type"), e1.getMessage)
    val d2 = tmpDir("pdf_pred_short")
    Files.write(Paths.get(d2, "s.pdf"), pdfWith("/Predictor 12 /Columns 4",
      Array[Byte](0, 1, 2))) // 3 bytes ≠ k×(1+4)
    val e2 = intercept[Exception] { PdfSource.readText(spark, d2).count() }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString)
      .contains("whole number"), e2.getMessage)
    val d3 = tmpDir("pdf_pred_undef")
    Files.write(Paths.get(d3, "u.pdf"), pdfWith("/Predictor 5 /Columns 4",
      Array[Byte](1, 2, 3, 4)))
    val e3 = intercept[Exception] { PdfSource.readText(spark, d3).count() }
    assert((e3.getMessage + Option(e3.getCause).map(_.getMessage).mkString)
      .contains("not defined"), e3.getMessage)
    // a hostile /Columns may not overflow into a negative row length —
    // the typed error names the row/stream sizes instead
    val d4 = tmpDir("pdf_pred_huge")
    Files.write(Paths.get(d4, "h.pdf"), pdfWith(
      "/Predictor 12 /Columns 2000000000 /Colors 3",
      Array[Byte](0, 1, 2)))
    val e4 = intercept[Exception] { PdfSource.readText(spark, d4).count() }
    assert((e4.getMessage + Option(e4.getCause).map(_.getMessage).mkString)
      .contains("exceeds"), e4.getMessage)
  }

  test("an ASCII85 full group whose value exceeds 2^32 - 1 is LOUD " +
      "(never truncated to the low 32 bits)") {
    val dir = tmpDir("pdf_a85_overflow")
    Files.write(Paths.get(dir, "o.pdf"), onePagePdf(
      "/Filter /ASCII85Decode",
      "uuuuu~>".getBytes(StandardCharsets.ISO_8859_1)))
    val e = intercept[Exception] { PdfSource.readText(spark, dir).count() }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).mkString)
      .contains("2^32"), e.getMessage)
  }

  test("between colliding ObjStm members the HIGHEST-numbered " +
      "container wins (the documented newest-update heuristic)") {
    val dir = tmpDir("pdf_objstm_collide")
    def container(num: Int, members: Seq[(Int, String)]): String = {
      val bodies = members.map(_._2)
      val offs = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
      val header = members.map(_._1).zip(offs)
        .map { case (n, o) => s"$n $o" }.mkString(" ") + " "
      val packed = deflate(header + bodies.mkString(" "))
      val sb = new StringBuilder
      sb ++= s"$num 0 obj << /Type /ObjStm /N ${members.length} " +
        s"/First ${header.length} /Length ${packed.length} " +
        "/Filter /FlateDecode >>\nstream\n"
      sb ++= new String(packed, StandardCharsets.ISO_8859_1)
      sb ++= "\nendstream\nendobj\n"
      sb.toString
    }
    def cstream(num: Int, t: String) = {
      val c = s"BT ($t) Tj ET"
      s"$num 0 obj << /Length ${c.length} >>\nstream\n$c\nendstream\nendobj\n"
    }
    // container 1 carries the ORIGINAL page 5 → contents 2; the
    // incremental update appends container 8 re-packing page 5 → 7
    val pdf = "%PDF-1.5\n" +
      container(1, Seq(
        3 -> "<< /Type /Catalog /Pages 4 0 R >>",
        4 -> "<< /Type /Pages /Kids [5 0 R] /Count 1 >>",
        5 -> "<< /Type /Page /Parent 4 0 R /Contents 2 0 R >>")) +
      cstream(2, "stale original") +
      container(8, Seq(
        5 -> "<< /Type /Page /Parent 4 0 R /Contents 7 0 R >>")) +
      cstream(7, "updated in a new objstm") +
      "trailer << /Size 9 /Root 3 0 R >>\n%%EOF\n"
    Files.write(Paths.get(dir, "c.pdf"),
      pdf.getBytes(StandardCharsets.ISO_8859_1))
    val got = PdfSource.readText(spark, dir).collect().head.getString(2)
    assert(got == "updated in a new objstm", s"got '$got'")
  }

  test("parseToUnicode is token-stream, not line-oriented: several " +
      "bfchar pairs on ONE line all land, and an array-form bfrange " +
      "destination list WRAPPED across lines is not dropped") {
    val (m, _) = PdfSource.parseToUnicode(
      "1 beginbfchar <0001> <0041> <0002> <0042> <0003> <0043> endbfchar\n" +
        "1 beginbfrange\n<0010> <0013> [<0044>\n<0045>\n<0046> <0047>]\n" +
        "endbfrange\n" +
        // continuous range split across lines too
        "1 beginbfrange\n<0020>\n<0021>\n<0061>\nendbfrange")
    assert(m(1) == "A" && m(2) == "B" && m(3) == "C",
      s"one-line bfchar pairs: $m")
    assert(m(0x10) == "D" && m(0x11) == "E" && m(0x12) == "F" &&
      m(0x13) == "G", s"wrapped array bfrange: $m")
    assert(m(0x20) == "a" && m(0x21) == "b")
  }

  test("render(objStm = true) emits a CONFORMING cross-reference: a " +
      "/Type /XRef stream with type-2 entries for the packed members, " +
      "no classic trailer keyword") {
    val b = PdfSource.render("conforming xref stream", 0, objStm = true)
    val s = new String(b, StandardCharsets.ISO_8859_1)
    assert(!s.contains("trailer"), "no classic trailer in the 1.5 shape")
    assert(s.contains("/Type /XRef"))
    // startxref points at the XRef stream object
    val sx = s.indexOf("startxref")
    val xrefPos = s.substring(sx + 9).trim.split("\\s+")(0).toInt
    val xrefHead = """^(\d+) 0 obj""".r
      .findFirstMatchIn(s.substring(xrefPos))
    assert(xrefHead.isDefined, "startxref must land on the XRef object")
    // decode the W [1 4 2] table: object 1 (the catalog, packed) must
    // be a type-2 entry addressing the ObjStm container
    val stmNum = """(\d+) 0 obj\n<< /Type /ObjStm""".r
      .findFirstMatchIn(s).get.group(1).toInt
    val dictEnd = s.indexOf("stream\n", xrefPos)
    val table = java.util.Arrays.copyOfRange(b, dictEnd + 7,
      dictEnd + 7 + """/Length (\d+)""".r
        .findFirstMatchIn(s.substring(xrefPos)).get.group(1).toInt)
    def entry(n: Int): (Int, Int, Int) = {
      val o = n * 7
      (table(o) & 0xff,
        ((table(o + 1) & 0xff) << 24) | ((table(o + 2) & 0xff) << 16) |
          ((table(o + 3) & 0xff) << 8) | (table(o + 4) & 0xff),
        ((table(o + 5) & 0xff) << 8) | (table(o + 6) & 0xff))
    }
    assert(entry(0)._1 == 0, "object 0 is the free-list head")
    val e1 = entry(1)
    assert(e1._1 == 2 && e1._2 == stmNum && e1._3 == 0,
      s"catalog must be type-2 at index 0 of the container, got $e1")
    // a content stream (object 4) must be type-1 at its real offset
    val e4 = entry(4)
    assert(e4._1 == 1 && s.startsWith("4 0 obj", e4._2),
      s"content stream entry must carry its byte offset, got $e4")
  }

  test("damage is LOUD: non-PDF bytes, unsupported filter, truncated " +
      "FlateDecode stream; writer rejects unsafe names") {
    import spark.implicits._
    val d1 = tmpDir("pdf_bad1")
    Files.write(Paths.get(d1, "not.pdf"), "HTML, not PDF".getBytes)
    val e1 = intercept[Exception] { PdfSource.readText(spark, d1).count() }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("%PDF"), e1.getMessage)
    val d2 = tmpDir("pdf_bad2")
    val dct = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 3 /Filter /DCTDecode >>\nstream\nabc\nendstream\nendobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
    Files.write(Paths.get(d2, "dct.pdf"),
      dct.getBytes(StandardCharsets.ISO_8859_1))
    val e2 = intercept[Exception] { PdfSource.readText(spark, d2).count() }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString)
      .contains("DCTDecode"), e2.getMessage)
    val d3 = tmpDir("pdf_bad3")
    val trunc = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 4 /Filter /FlateDecode >>\nstream\n\nendstream\nendobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
    Files.write(Paths.get(d3, "trunc.pdf"),
      trunc.getBytes(StandardCharsets.ISO_8859_1))
    val e3 = intercept[Exception] { PdfSource.readText(spark, d3).count() }
    assert((e3.getMessage + Option(e3.getCause).map(_.getMessage).mkString)
      .matches("(?s).*(truncated|corrupt).*"), e3.getMessage)
    val e4 = intercept[Exception] {
      PdfSource.write(Seq(("bad/name", "t")).toDF("name", "text"),
        tmpDir("pdf_bad4"), "name", "text")
    }
    assert((e4.getMessage + Option(e4.getCause).map(_.getMessage).mkString)
      .contains("path-safe"), e4.getMessage)
  }

  private def allMsg(e: Throwable): String =
    e.getMessage + Option(e.getCause).map(_.getMessage).mkString

  test("a DANGLING indirect /Encoding decodes Latin-1 UNCONFIDENT — " +
      "declared-but-unreadable, same policy as a Type0 missing its " +
      "ToUnicode (it used to fall through to confident no-/Encoding)") {
    val dir = tmpDir("pdf_enc_dangling")
    // '/Encoding 9 0 R' with NO object 9 anywhere
    Files.write(Paths.get(dir, "d.pdf"), simpleFontPdf("9 0 R", "(AB)"))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "AB", s"got '${got.getString(2)}'")
    assert(!got.getBoolean(3),
      "a dangling /Encoding ref must flip decode_confident")
  }

  test("/Differences names running past code 255 by consecutive " +
      "assignment flag unconfident instead of dropping silently — " +
      "the glyph is unmapped, which is what the flag exists for") {
    val dir = tmpDir("pdf_diff_overrun")
    // 255 -> eacute; /bullet would land on code 256: unmappable
    Files.write(Paths.get(dir, "o.pdf"), simpleFontPdf(
      "<< /Differences [255 /eacute /bullet] >>", "<FF41>"))
    val got = PdfSource.readText(spark, dir).collect().head
    assert(got.getString(2) == "éA", s"got '${got.getString(2)}'")
    assert(!got.getBoolean(3),
      "an overrun /Differences glyph must flip the flag")
  }

  test("a /DecodeParms ARRAY aligns with the /Filter chain: a " +
      "final-entry predictor applies (null slots skip), a ref entry " +
      "resolves, and a NON-final predictor is LOUD instead of " +
      "silently misapplied after the whole chain") {
    val rowLen = 10
    val body = "decode parms array rows"
    val content0 = s"BT ($body) Tj ET"
    val content = content0 + " " * ((rowLen - content0.length % rowLen)
      % rowLen)
    val filtered = pngPredict(
      content.getBytes(StandardCharsets.ISO_8859_1), rowLen)
    // decode order [/ASCII85Decode /FlateDecode]: encode as
    // a85(deflate(predicted))
    val enc = a85(deflate(filtered))
    val d1 = tmpDir("pdf_parms_array")
    Files.write(Paths.get(d1, "a.pdf"), onePagePdf(
      "/Filter [/ASCII85Decode /FlateDecode] " +
        s"/DecodeParms [null <</Predictor 12 /Columns $rowLen>>]", enc))
    assert(PdfSource.readText(spark, d1).collect().head.getString(2)
      == body)
    // a REF entry in the array resolves through the object index
    val d2 = tmpDir("pdf_parms_array_ref")
    val withRef = new String(onePagePdf(
      "/Filter [/ASCII85Decode /FlateDecode] /DecodeParms [null 5 0 R]",
      enc), StandardCharsets.ISO_8859_1)
      .replace("trailer <<",
        s"5 0 obj << /Predictor 12 /Columns $rowLen >> endobj\ntrailer <<")
    Files.write(Paths.get(d2, "r.pdf"),
      withRef.getBytes(StandardCharsets.ISO_8859_1))
    assert(PdfSource.readText(spark, d2).collect().head.getString(2)
      == body)
    // predictor attached to the NON-final filter: loud, names it
    val d3 = tmpDir("pdf_parms_nonfinal")
    Files.write(Paths.get(d3, "n.pdf"), onePagePdf(
      "/Filter [/ASCII85Decode /FlateDecode] " +
        s"/DecodeParms [<</Predictor 12 /Columns $rowLen>> null]", enc))
    val e = intercept[Exception] { PdfSource.readText(spark, d3).count() }
    assert(allMsg(e).contains("non-final"), allMsg(e))
    // a dangling ref inside the array stays loud too
    val d4 = tmpDir("pdf_parms_array_dangling")
    Files.write(Paths.get(d4, "g.pdf"), onePagePdf(
      "/Filter [/ASCII85Decode /FlateDecode] /DecodeParms [null 9 0 R]",
      enc))
    val e2 = intercept[Exception] { PdfSource.readText(spark, d4).count() }
    assert(allMsg(e2).contains("missing"), allMsg(e2))
  }

  test("an ENCRYPTED PDF is rejected with a typed error naming " +
      "encryption — both trailer spellings — instead of the misleading " +
      "'FlateDecode stream corrupt' it used to die with") {
    // classic trailer carrying /Encrypt
    val d1 = tmpDir("pdf_encrypt_classic")
    val classic = new String(simpleFontPdf("/WinAnsiEncoding", "(AB)"),
      StandardCharsets.ISO_8859_1)
      .replace("trailer << /Size 10 /Root 1 0 R >>",
        "trailer << /Size 10 /Root 1 0 R /Encrypt 9 0 R >>")
    Files.write(Paths.get(d1, "e.pdf"),
      classic.getBytes(StandardCharsets.ISO_8859_1))
    val e1 = intercept[Exception] { PdfSource.readText(spark, d1).count() }
    assert(allMsg(e1).contains("encrypted"), allMsg(e1))
    assert(!allMsg(e1).contains("corrupt"), allMsg(e1))
    // xref-STREAM trailer (/Type /XRef dict holds the trailer entries)
    val d2 = tmpDir("pdf_encrypt_xrefstream")
    val xref = "%PDF-1.5\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 13 >>\nstream\nBT (x) Tj ET\nendstream\nendobj\n" +
      "6 0 obj << /Type /XRef /Size 7 /W [1 1 1] /Root 1 0 R " +
      "/Encrypt 9 0 R /Length 0 >>\nstream\n\nendstream\nendobj\n" +
      "startxref\n0\n%%EOF\n"
    Files.write(Paths.get(d2, "x.pdf"),
      xref.getBytes(StandardCharsets.ISO_8859_1))
    val e2 = intercept[Exception] { PdfSource.readText(spark, d2).count() }
    assert(allMsg(e2).contains("encrypted"), allMsg(e2))
    // an un-encrypted sibling with the same shapes still reads fine
    val d3 = tmpDir("pdf_encrypt_none")
    Files.write(Paths.get(d3, "p.pdf"),
      simpleFontPdf("/WinAnsiEncoding", "(AB)"))
    assert(PdfSource.readText(spark, d3).collect().head.getString(2)
      == "AB")
  }
}
