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
    assert(viaFactory.columns.toSeq == Seq("file", "page", "text"))
    assert(viaFactory.count() == 2)
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
