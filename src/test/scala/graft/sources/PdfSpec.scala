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
  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
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
}
