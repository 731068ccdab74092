package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min sketch over 64-bit keys — mergeable approximate FREQUENCY
  * counts in fixed memory, the point-query sibling of the Misra-Gries
  * heavy-hitters summary ([[graft.topk.FreqItemsAgg]]): MG returns the
  * top items with an undercount bound; CMS answers "how often did THIS
  * key occur" for any key, with a one-sided OVERcount bound.
  *
  *  - [[CountMinAgg]] BUILDS the sketch as an aggregate: depth×width
  *    long counters; each task increments a local matrix, partial
  *    aggregation merges by elementwise ADD (associative/commutative →
  *    map-side combine), final state is one binary blob. At 100 TB the
  *    sketch rides the same ObjectHashAggregate machinery as the other
  *    sketch states: counters ship once per task, never the key stream.
  *  - [[CountMinEstimate]] PROBES it as a codegen'd scalar: the blob
  *    arrives as a broadcast-scalar column and the estimate (min over
  *    the depth counters) evaluates scan-side.
  *
  * Row hashing is splitmix64(x ⊕ row·φ64) — independent-enough row
  * functions from one cheap mix, same family the bloom uses.
  * Guarantees: estimate ≥ true count ALWAYS (counters only ever add);
  * estimate ≤ true + εN with probability 1−(1/2)^depth per query,
  * ε ≈ e/width — the classic CM bound. Exactly-mergeable: the blob of
  * a corpus equals the merged blobs of any partition of it, which is
  * what makes the sketch a valid incremental/streaming state.
  */
object CountMin {

  private final val Phi64 = 0x9e3779b97f4a7c15L

  /** Max counters (128 MiB of longs). */
  val MaxCells: Int = 1 << 24

  @inline private def row(x: Long, d: Int): Long =
    graft.util.Hashing.splitmix64(x ^ (d.toLong * Phi64))

  /** Increment key `x` in a depth×width counter matrix (row-major). */
  def add(cells: Array[Long], depth: Int, width: Int, x: Long): Unit = {
    var d = 0
    while (d < depth) {
      val idx = (((row(x, d) % width) + width) % width).toInt
      cells(d * width + idx) += 1L
      d += 1
    }
  }

  /** Min-over-rows point estimate from the packed byte form written by
    * [[CountMinAgg]]. Width is derived from the blob size. */
  def estimate(blob: Array[Byte], depth: Int, x: Long): Long = {
    val cells = blob.length >>> 3
    if (cells == 0 || depth <= 0 || cells % depth != 0) return 0L
    val width = cells / depth
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = (((row(x, d) % width) + width) % width).toInt
      val base = (d * width + idx) << 3
      var w = 0L
      var b = 0
      while (b < 8) { w |= (blob(base + b) & 0xffL) << (b << 3); b += 1 }
      if (w < est) est = w
      d += 1
    }
    est
  }

  /** Counter-wise SUM of two packed blobs — the linear-sketch merge:
    * CMS(A ⊎ B) == addBlobs(CMS(A), CMS(B)) exactly (counters are
    * sums), which is what lets a stream maintain the whole-history
    * sketch by adding per-batch deltas. Either side may be empty
    * (zero-length — the empty-input aggregate); otherwise the layouts
    * must match. NOTE the length check is necessary but NOT sufficient:
    * a 4×8192 and an 8×4096 sketch have identical blob sizes and would
    * merge into a corrupted state — geometry (depth, width) is not
    * recoverable from the blob, so callers must pin it per state
    * lineage. [[graft.streaming.StreamingIngest.maintainSketchState]]
    * does this with a `_blob_geometry` sidecar asserted at start().
    * Constant work: blob size is depth×width×8 bytes
    * regardless of corpus size. */
  def addBlobs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"blob layouts differ: ${a.length} vs ${b.length} bytes")
    val out = new Array[Byte](a.length)
    var base = 0
    while (base < a.length) {
      var wa = 0L; var wb = 0L; var i = 0
      while (i < 8) {
        wa |= (a(base + i) & 0xffL) << (i << 3)
        wb |= (b(base + i) & 0xffL) << (i << 3)
        i += 1
      }
      val s = wa + wb
      i = 0
      while (i < 8) { out(base + i) = (s >>> (i << 3)).toByte; i += 1 }
      base += 8
    }
    out
  }

  /** Column API: build a CMS blob from a LongType key column. */
  def cm_agg(key: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(CountMinAgg(
      GraftSqlBridge.expression(key), depth, width).toAggregateExpression())

  /** Column API: point-estimate a LongType key against a CMS blob. */
  def cm_estimate(key: Column, blob: Column, depth: Int): Column =
    GraftSqlBridge.column(CountMinEstimate(
      GraftSqlBridge.expression(key), GraftSqlBridge.expression(blob), depth))
}

/** CMS build aggregate: LongType keys → BinaryType blob of depth×width
  * little-endian longs (row-major). Nulls are skipped. */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width >= 16 && depth.toLong * width <= CountMin.MaxCells,
    s"width must be >= 16 with depth*width <= ${CountMin.MaxCells}, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cm_agg requires bigint input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.add(buf, depth, width, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Byte](buf.length << 3)
    var i = 0
    while (i < buf.length) {
      val w = buf(i)
      val base = i << 3
      var b = 0
      while (b < 8) { out(base + b) = (w >>> (b << 3)).toByte; b += 1 }
      i += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length << 3)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bytes.length >>> 3)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c(0))
  override def prettyName: String = "cm_agg"
}

/** Scan-side CMS point estimate: `cm_estimate(key, blob)` — codegen'd,
  * null key or blob → null. */
case class CountMinEstimate(left: Expression, right: Expression, depth: Int)
  extends BinaryExpression {

  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cm_estimate requires (bigint, binary), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cm_estimate"

  override def nullSafeEval(key: Any, blob: Any): Any =
    CountMin.estimate(blob.asInstanceOf[Array[Byte]], depth, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (keyC, blobC) =>
      s"${ev.value} = graft.sketch.CountMin.estimate($blobC, $depth, $keyC);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}
