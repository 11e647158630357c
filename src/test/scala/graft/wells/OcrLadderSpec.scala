package graft.wells

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

/** S3's OCR leg beyond the bare trait seam: [[PdfText.imagesPerPage]]
  * pulls each page's embedded scan images (the scanned-PDF shape — no
  * text operators, one full-page /Subtype /Image XObject per page) and
  * [[Extraction.OcrExtractor]] routes them through the [[Extraction
  * .OcrEngine]] seam, under the same S4 fallback ladder the reference
  * runs (pdfplumber-fails→OCR, pdf_extraction.py:73-81). The ENGINE is
  * a deterministic fake here (no OCR library ships in this container —
  * the payload carries its own text behind a magic prefix); everything
  * around it — image extraction, metadata, page assembly, the ladder,
  * the Spark scan — is the real path a Tess4J-backed engine would ride
  * unchanged. */
class OcrLadderSpec extends AnyFunSuite with graft.SparkSpec {

  // ------------------------------------------- scanned-PDF writer
  /** A scanned-style PDF: per page one image XObject (filter `filt`,
    * payload = FAKESCAN1 + the page text) drawn by a text-free content
    * stream — exactly the shape a scanner/printer driver emits.
    * `inheritResources` hangs ONE shared /Resources off the /Pages node
    * (the inheritable-attribute layout, ISO 32000-1 §7.7.3.4 — only
    * sound for the single-page shape where all pages share an image);
    * `indirectWidth` routes /Width through a bare-integer object. */
  private def scannedPdf(pages: Seq[String], filt: String = "DCTDecode",
      inheritResources: Boolean = false, indirectWidth: Boolean = false)
      : Array[Byte] = {
    val p = pages.length
    // numbering known up front (no patching): image i → 2i+1, content
    // i → 2i+2 (0-based i), pages node → 2p+1, page i → 2p+2+i,
    // catalog → 3p+2, optional width int → 3p+3
    val pagesN = 2 * p + 1
    val catN = 3 * p + 2
    val widthN = 3 * p + 3
    val width = if (indirectWidth) s"$widthN 0 R" else "2550"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    pages.zipWithIndex.foreach { case (text, i) =>
      val payload0 = ("FAKESCAN1\n" + text).getBytes("UTF-8")
      // a `filt` starting with '[' is written as a literal /Filter ARRAY
      // (the multi-element chain shape); payload deflated when the
      // effective FIRST filter is FlateDecode — matching what a real
      // writer stores for that chain
      val payload =
        if (filt == "FlateDecode" || filt.startsWith("[ /FlateDecode"))
          deflate(payload0)
        else payload0
      val filterTok = if (filt.startsWith("[")) filt else s"/$filt"
      w(s"${2 * i + 1} 0 obj\n<< /Type /XObject /Subtype /Image /Width $width " +
        s"/Height 3300 /BitsPerComponent 8 /ColorSpace /DeviceGray " +
        s"/Filter $filterTok /Length ${payload.length} >>\nstream\n")
      out.write(payload)
      w("\nendstream\nendobj\n")
      val draw = "q 612 0 0 792 0 0 cm /Im0 Do Q" // no text operators
      w(s"${2 * i + 2} 0 obj\n<< /Length ${draw.length} >>\nstream\n$draw\nendstream\nendobj\n")
    }
    val sharedRes =
      if (inheritResources) s" /Resources << /XObject << /Im0 1 0 R >> >>"
      else ""
    w(s"$pagesN 0 obj\n<< /Type /Pages /Kids ${
      (0 until p).map(i => s"${2 * p + 2 + i} 0 R").mkString("[", " ", "]")
    } /Count $p$sharedRes >>\nendobj\n")
    pages.indices.foreach { i =>
      val pageRes =
        if (inheritResources) "" // inherited from the /Pages node
        else s"/Resources << /XObject << /Im0 ${2 * i + 1} 0 R >> >> "
      w(s"${2 * p + 2 + i} 0 obj\n<< /Type /Page /Parent $pagesN 0 R " +
        s"/MediaBox [0 0 612 792] " + pageRes +
        s"/Contents ${2 * i + 2} 0 R >>\nendobj\n")
    }
    w(s"$catN 0 obj\n<< /Type /Catalog /Pages $pagesN 0 R >>\nendobj\n")
    if (indirectWidth) w(s"$widthN 0 obj\n2550\nendobj\n")
    w(s"trailer\n<< /Size ${widthN + 1} /Root $catN 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] =
    PdfTestUtil.deflate(data)

  /** The deterministic engine: "recognizes" payloads carrying the fake
    * scan magic; anything else (a real JPEG, junk) yields nothing —
    * the honest behavior of an engine pointed at pixels it can't read. */
  private object FakeOcr extends Extraction.OcrEngine {
    def recognize(img: PdfText.PdfImage): String = {
      val s = new String(img.data, "UTF-8")
      if (s.startsWith("FAKESCAN1\n")) s.drop("FAKESCAN1\n".length) else ""
    }
  }

  private val hdrPage =
    """Well Operator: NANCE PETROLEUM CORPORATION
      |Well Name: THORVALD 1-30H
      |API # 33-053-06057
      |Latitude: 48° 4' 29.5" N
      |Longitude: 103° 36' 11.4" W""".stripMargin
  private val stimPage =
    """Date Stimulated
      |9/22/2011
      |Stimulated Formation
      |Bakken
      |Lbs Proppant
      |2,293,000""".stripMargin
  private val fixture = Seq(hdrPage, "page two filler", stimPage)

  test("imagesPerPage: one image per page with metadata; FlateDecode inflates, DCTDecode stays verbatim") {
    val dct = PdfText.imagesPerPage(scannedPdf(fixture))
    assert(dct.length == 3)
    assert(dct.forall(_.length == 1))
    val img = dct.head.head
    assert((img.name, img.width, img.height, img.bitsPerComponent,
        img.colorSpace, img.filter) ==
      ("Im0", 2550, 3300, 8, "DeviceGray", "DCTDecode"))
    assert(new String(img.data, "UTF-8") == "FAKESCAN1\n" + hdrPage,
      "DCTDecode payload must be the stored bytes verbatim")
    val fl = PdfText.imagesPerPage(scannedPdf(fixture, filt = "FlateDecode"))
    assert(new String(fl.head.head.data, "UTF-8") == "FAKESCAN1\n" + hdrPage,
      "FlateDecode image must arrive inflated to raw samples")
    // junk input: empty, never a throw
    assert(PdfText.imagesPerPage("not a pdf".getBytes("UTF-8")).isEmpty)
    assert(PdfText.imagesPerPage(scannedPdf(fixture).take(40)).forall(_.isEmpty))
  }

  test("/Resources inherits from the /Pages node; indirect /Width resolves") {
    // scanner drivers commonly hang one shared /Resources off the page
    // TREE — the page dicts carry none, and a page-dict-only reader
    // loses every image (single-page doc: all pages sharing one image
    // is only sound with one page)
    val inh = PdfText.imagesPerPage(scannedPdf(Seq(hdrPage), inheritResources = true))
    assert(inh.length == 1 && inh.head.length == 1,
      s"inherited /Resources lost the image: $inh")
    assert(new String(inh.head.head.data, "UTF-8") == "FAKESCAN1\n" + hdrPage)
    // ...and the full ladder recovers the scan through the inherited dict
    val ladder = Extraction.withFallback(PdfText, new Extraction.OcrExtractor(FakeOcr))
    assert(ladder.extract(scannedPdf(Seq(hdrPage), inheritResources = true)) ==
      Seq(hdrPage))
    // /Width as a reference to a bare-integer object (spec-legal)
    val ind = PdfText.imagesPerPage(scannedPdf(fixture, indirectWidth = true))
    assert(ind.head.head.width == 2550,
      s"indirect /Width did not resolve: ${ind.head.head.width}")
  }

  test("indirect /Width resolves through the objs map, not a first-textual-match decoy") {
    // the image payload spells "<widthN> 0 obj 777" INSIDE its stream
    // bytes, earlier in the document than the real bare-integer object
    // (widthN = 6 for the one-page shape): a whole-document regex as the
    // primary resolution path matched the decoy first and reported 777;
    // the objs-map path is immune (scanObjects skips matches inside
    // stream extents, and the real object's intVal wins)
    val decoyPage = "before 6 0 obj 777 after"
    val got = PdfText.imagesPerPage(scannedPdf(Seq(decoyPage), indirectWidth = true))
    assert(got.length == 1 && got.head.length == 1)
    assert(got.head.head.width == 2550,
      s"the in-stream decoy won over the real object: ${got.head.head.width}")
  }

  test("multi-element /Filter chain: joined names preserved, leading FlateDecode applied") {
    // [/FlateDecode /DCTDecode] — spec-legal for a compressed JPEG: the
    // stored bytes are deflate(JPEG). The leading FlateDecode (the one
    // filter this codec implements) is applied, and PdfImage.filter
    // carries the WHOLE space-joined chain so an engine that only
    // understands single names refuses loudly instead of misreading
    val chain = PdfText.imagesPerPage(
      scannedPdf(Seq(hdrPage), filt = "[ /FlateDecode /DCTDecode ]"))
    assert(chain.length == 1 && chain.head.length == 1)
    val img = chain.head.head
    assert(img.filter == "FlateDecode DCTDecode", s"chain lost: ${img.filter}")
    assert(new String(img.data, "UTF-8") == "FAKESCAN1\n" + hdrPage,
      "leading FlateDecode in the chain was not applied")
    // a chain NOT starting with FlateDecode: bytes stay verbatim, the
    // full chain is still visible to the engine
    val raw = PdfText.imagesPerPage(
      scannedPdf(Seq(hdrPage), filt = "[ /DCTDecode /FlateDecode ]"))
    val img2 = raw.head.head
    assert(img2.filter == "DCTDecode FlateDecode", s"chain lost: ${img2.filter}")
    assert(new String(img2.data, "UTF-8") == "FAKESCAN1\n" + hdrPage,
      "non-Flate-first chain bytes must pass through verbatim")
  }

  test("an engine that returns null degrades that image to blank, never an exception") {
    val nullish = new Extraction.OcrEngine {
      def recognize(img: PdfText.PdfImage): String = null
    }
    val pages = new Extraction.OcrExtractor(nullish).extract(scannedPdf(fixture))
    assert(pages.length == 3 && pages.forall(_.isEmpty))
  }


  test("the S4 ladder routes a scanned PDF to OCR and a text-layer PDF past it") {
    val scanned = scannedPdf(fixture)
    // the text layer sees no text operators: all-blank, the fallback signal
    assert(PdfText.extract(scanned).forall(_.trim.isEmpty))
    val ladder = Extraction.withFallback(PdfText, new Extraction.OcrExtractor(FakeOcr))
    assert(ladder.extract(scanned) == fixture, "OCR leg did not recover the scan")
    // parse banks run end-to-end over the OCR'd pages — same rows as the
    // text-layer path over the same logical document
    val viaOcr = ladder.extract(scanned)
    val h = Extraction.parseHeader(viaOcr, "W1.pdf")
    assert(h.operator.contains("NANCE PETROLEUM CORPORATION"))
    assert(h.api.contains("33-053-06057"))
    val st = Extraction.parseStimulation(viaOcr, "W1.pdf")
    assert(st.lbs_proppant.contains("2293000"))
    // preferFallback (the --prefer-ocr flag): OCR first; a text-layer
    // document has no images, so OCR is all-blank and the ladder falls
    // BACK to the text layer — no document is lost either way round
    val textPdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Length 44 >>\nstream\nBT (Operator: TEXTCO) Tj 0 -14 Td ET\nendstream\nendobj\n" +
      "2 0 obj\n<< /Type /Page /Parent 3 0 R /Contents 1 0 R >>\nendobj\n" +
      "3 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n" +
      "4 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n" +
      "trailer\n<< /Root 4 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    val preferOcr = Extraction.withFallback(PdfText,
      new Extraction.OcrExtractor(FakeOcr), preferFallback = true)
    assert(preferOcr.extract(scanned) == fixture)
    assert(preferOcr.extract(textPdf).exists(_.contains("Operator: TEXTCO")))
  }

  test("an engine that throws degrades that image to blank, never an exception") {
    val bomb = new Extraction.OcrEngine {
      def recognize(img: PdfText.PdfImage): String = sys.error("engine crash")
    }
    val pages = new Extraction.OcrExtractor(bomb).extract(scannedPdf(fixture))
    assert(pages.length == 3 && pages.forall(_.isEmpty))
  }

  test("fuzz: 150 deterministic mutations of a scanned PDF never throw out of the OCR leg") {
    val rnd = new scala.util.Random(0xD00D) // fixed seed — reproducible
    val base = scannedPdf(fixture)
    val ladder = Extraction.withFallback(PdfText, new Extraction.OcrExtractor(FakeOcr))
    for (trial <- 1 to 150) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(8)) rnd.nextInt(3) match {
        case 0 => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        case 1 =>
          val at = rnd.nextInt(b.length)
          java.util.Arrays.fill(b, at, math.min(b.length, at + rnd.nextInt(64)), 0.toByte)
        case 2 =>
          val kw = Seq("endobj", "stream", "/XObject", "/Image", "0 0 obj", "<<")(rnd.nextInt(6))
            .getBytes(ISO_8859_1)
          val at = rnd.nextInt(math.max(1, b.length - kw.length))
          System.arraycopy(kw, 0, b, at, kw.length)
      }
      val cut = if (rnd.nextBoolean()) b.take(rnd.nextInt(b.length + 1)) else b
      // both the image surface and the full ladder: return, never throw
      assert(PdfText.imagesPerPage(cut) != null, s"trial $trial imagesPerPage")
      assert(ladder.extract(cut) != null, s"trial $trial ladder")
    }
  }

  test("S1+S3 end-to-end: a mixed directory with a scanned PDF extracts through Spark") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ocr-scan")
    Files.write(dir.resolve("A_scanned.pdf"), scannedPdf(fixture))
    Files.write(dir.resolve("B_fixture.pdf"),
      "Operator: TEXTCO\nWell Name: FIX 1".getBytes("UTF-8"))
    val ladder = Extraction.withFallback(PdfText.AutoDetect,
      new Extraction.OcrExtractor(FakeOcr))
    val docs = Extraction.scanDocuments(spark, dir.toString, ladder).cache()
    val (header, _) = Extraction.extractAll(docs)
    val rows = header.collect().map(r =>
      (r.getAs[String]("pdf_name"), r.getAs[String]("operator"))).toSeq
    assert(rows == Seq(
      ("A_scanned.pdf", "NANCE PETROLEUM CORPORATION"),
      ("B_fixture.pdf", "TEXTCO")),
      s"mixed scanned/text directory drifted: $rows")
  }
}
