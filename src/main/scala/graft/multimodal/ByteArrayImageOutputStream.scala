package graft.multimodal

/** Reusable growable `ImageOutputStream` over a byte array — the
  * output side of the partition-scoped PNG codec (see
  * [[ByteArrayImageInputStream]] for why per-frame
  * `MemoryCacheImageOutputStream` instances are a convoy at high
  * parallelism: finalizable, internally locked, one allocated per
  * frame). One instance per partition; [[resetBuffer]] rewinds it for
  * the next frame, [[toByteArray]] snapshots the finished PNG.
  *
  * Supports the full seek-back contract (`ImageOutputStream` extends
  * `ImageInputStream`) — writes land at `streamPos`, the logical
  * length is the high-water mark — so a writer patching earlier
  * chunk headers works unchanged. */
final class ByteArrayImageOutputStream extends javax.imageio.stream.ImageOutputStreamImpl {
  private var buf = new Array[Byte](1024)
  private var count = 0

  /** Rewind for the next frame (buffer capacity is retained). */
  def resetBuffer(): Unit = {
    count = 0
    streamPos = 0L
    bitOffset = 0
    flushedPos = 0L
  }

  /** Snapshot of the bytes written so far. */
  def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, count)

  private def ensure(cap: Int): Unit =
    if (cap > buf.length)
      buf = java.util.Arrays.copyOf(buf, math.max(cap, buf.length * 2))

  override def write(b: Int): Unit = {
    checkClosed()
    flushBits()
    ensure(streamPos.toInt + 1)
    buf(streamPos.toInt) = b.toByte
    streamPos += 1
    if (streamPos > count) count = streamPos.toInt
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    checkClosed()
    flushBits()
    ensure(streamPos.toInt + len)
    System.arraycopy(b, off, buf, streamPos.toInt, len)
    streamPos += len
    if (streamPos > count) count = streamPos.toInt
  }

  override def read(): Int = {
    checkClosed()
    bitOffset = 0
    if (streamPos >= count) -1
    else { val b = buf(streamPos.toInt) & 0xff; streamPos += 1; b }
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    checkClosed()
    bitOffset = 0
    if (streamPos >= count) -1
    else {
      val n = math.min(len, count - streamPos.toInt)
      System.arraycopy(buf, streamPos.toInt, b, off, n)
      streamPos += n
      n
    }
  }

  override def length(): Long = count.toLong
  override def isCached: Boolean = true
  override def isCachedMemory: Boolean = true
}
