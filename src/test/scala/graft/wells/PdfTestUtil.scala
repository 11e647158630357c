package graft.wells

/** Shared helpers for the in-test PDF writers (PdfTextSpec's text-layer
  * documents, OcrLadderSpec's scanned documents): one Deflater loop so
  * the two writers' compression shape cannot silently diverge. */
private[wells] object PdfTestUtil {
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }
}
