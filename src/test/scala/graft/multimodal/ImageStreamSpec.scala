package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the partition-scoped reusable image streams (the
  * PngCodec plumbing). MultimodalSpec covers decode(encode(b)) == b
  * end-to-end through Spark; these tests pin the stream contracts the
  * JDK PNG reader/writer rely on — seek, reuse, high-water length —
  * directly, so a contract break fails here with a readable message
  * rather than as a corrupt-image mystery three layers up. */
class ImageStreamSpec extends AnyFunSuite {

  test("input stream: sequential and bulk reads, EOF, length") {
    val iis = new ByteArrayImageInputStream
    iis.setBytes(Array[Byte](1, 2, 3, 4, 5))
    assert(iis.length() == 5L)
    assert(iis.read() == 1)
    val buf = new Array[Byte](3)
    assert(iis.read(buf, 0, 3) == 3)
    assert(buf.toSeq == Seq[Byte](2, 3, 4))
    assert(iis.read() == 5)
    assert(iis.read() == -1)
    assert(iis.read(buf, 0, 3) == -1)
  }

  test("input stream: seek rewinds and setBytes resets to a new payload") {
    val iis = new ByteArrayImageInputStream
    iis.setBytes(Array[Byte](10, 20, 30))
    assert(iis.read() == 10)
    iis.seek(0L)
    assert(iis.read() == 10)
    iis.seek(2L)
    assert(iis.read() == 30)
    // reuse: shorter payload, position must rewind
    iis.setBytes(Array[Byte](42))
    assert(iis.getStreamPosition == 0L)
    assert(iis.read() == 42)
    assert(iis.read() == -1)
  }

  test("output stream: writes, seek-back patch, high-water length, reuse") {
    val ios = new ByteArrayImageOutputStream
    ios.write(Array[Byte](1, 2, 3, 4), 0, 4)
    // seek back and patch one byte (the chunk-header pattern PNG
    // writers are allowed to use) — length stays at the high-water mark
    ios.seek(1L)
    ios.write(9)
    assert(ios.length() == 4L)
    assert(ios.toByteArray.toSeq == Seq[Byte](1, 9, 3, 4))
    // writing past the patch point must not truncate
    ios.seek(4L)
    ios.write(5)
    assert(ios.toByteArray.toSeq == Seq[Byte](1, 9, 3, 4, 5))
    // reuse across frames
    ios.resetBuffer()
    assert(ios.length() == 0L)
    ios.write(7)
    assert(ios.toByteArray.toSeq == Seq[Byte](7))
  }

  test("output stream grows past the initial capacity") {
    val ios = new ByteArrayImageOutputStream
    val big = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    ios.write(big, 0, big.length)
    assert(ios.length() == 5000L)
    assert(ios.toByteArray.toSeq == big.toSeq)
  }

  test("streams round-trip a real PNG through the JDK reader/writer") {
    val bytes = Array.tabulate[Byte](64)(i => (i * 3).toByte)
    val png = Multimodal.encodePng(bytes, width = 16) // writer side uses the custom output stream
    val iis = new ByteArrayImageInputStream
    iis.setBytes(png)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    reader.setInput(iis, true, true)
    val img = reader.read(0)
    assert(img.getWidth == 16 && img.getHeight == 4)
    val back = Array.tabulate[Byte](64)(i =>
      img.getRaster.getSample(i % 16, i / 16, 0).toByte)
    assert(back.toSeq == bytes.toSeq)
    // reader + stream reuse on a second, different payload
    val png2 = Multimodal.encodePng(bytes.map(b => (b ^ 0x55).toByte), width = 16)
    iis.setBytes(png2)
    reader.setInput(iis, true, true)
    val img2 = reader.read(0)
    assert(img2.getRaster.getSample(0, 0, 0) == (bytes(0) ^ 0x55))
  }
}
