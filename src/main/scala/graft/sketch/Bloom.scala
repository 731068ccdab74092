package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Distributed Bloom filter over 64-bit keys — the semi-join pruning
  * sketch for "drop the 99.99% of rows that can't possibly match"
  * before any shuffle happens (the same idea Spark's own runtime
  * row-level filtering applies to join pushdown, here exposed as a
  * first-class, composable pair of operators):
  *
  *  - [[BloomAgg]] BUILDS the filter as an aggregate: each task ORs
  *    its rows into a local bitset, partial aggregation merges bitsets
  *    by OR (associative + commutative, so map-side combine works),
  *    and the final state is one `numBits/8`-byte binary blob. At
  *    100 TB the build side (a contamination/benchmark key set) ships
  *    ONE blob per task — never the key stream.
  *  - [[BloomMightContain]] PROBES it as a codegen'd scalar predicate:
  *    the blob arrives as a broadcast-scalar column (crossJoin of a
  *    1-row frame — the repo's standard broadcast-scalar shape), so the
  *    probe runs scan-side inside whole-stage codegen, BEFORE the
  *    shuffle of a confirming exact join.
  *
  * Bit addressing uses double hashing (Kirsch–Mitzenmacher): with
  * h1 = splitmix64(x) and h2 = splitmix64(x ^ φ64) | 1, probe i hits
  * bit (h1 + i·h2) mod numBits — k probes from two hash evaluations,
  * with h2 forced odd so strides never collapse on the power-of-two
  * bit-space. False-positive rate for n keys follows the classic
  * (1 − e^(−kn/m))^k; false NEGATIVES are impossible, which is what
  * lets an exact confirm join downstream restore exact semantics.
  */
object Bloom {

  /** Max bits accepted (128 MiB of bitset) — an aggregate state above
    * this should be a repartitioned build, not a bigger scalar. */
  val MaxBits: Int = 1 << 30

  private final val Phi64 = 0x9e3779b97f4a7c15L

  /** Set the k double-hashed bits of `x` in `bits` (long-array bitset). */
  def add(bits: Array[Long], numBits: Int, k: Int, x: Long): Unit = {
    val h1 = graft.util.Hashing.splitmix64(x)
    val h2 = graft.util.Hashing.splitmix64(x ^ Phi64) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val bit = ((h % numBits) + numBits) % numBits
      bits((bit >>> 6).toInt) |= 1L << (bit & 63L)
      i += 1
      h += h2
    }
  }

  /** Probe the packed little-endian byte form written by [[BloomAgg]].
    * Static + branch-light: called from generated code per row. */
  def mightContain(blob: Array[Byte], k: Int, x: Long): Boolean = {
    val numBits = blob.length.toLong << 3
    if (numBits == 0L) return false
    val h1 = graft.util.Hashing.splitmix64(x)
    val h2 = graft.util.Hashing.splitmix64(x ^ Phi64) | 1L
    var i = 0
    var h = h1
    while (i < k) {
      val bit = ((h % numBits) + numBits) % numBits
      if ((blob((bit >>> 3).toInt) & (1 << (bit & 7L).toInt)) == 0) return false
      i += 1
      h += h2
    }
    true
  }

  /** Bitwise OR of two packed blobs — the Bloom merge: OR is
    * associative, commutative, and IDEMPOTENT, so
    * bloom(A ⊎ B) == orBlobs(bloom(A), bloom(B)) exactly, and a
    * stream maintains the whole-history filter by OR-ing per-batch
    * deltas (replays are harmless). Either side may be empty (the
    * empty-input aggregate); otherwise layouts must match. Constant
    * work: blob size is numBits/8 regardless of corpus size. */
  def orBlobs(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"blob layouts differ: ${a.length} vs ${b.length} bytes")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
    out
  }

  /** Column API: build a bloom blob from a LongType key column. */
  def bloom_agg(key: Column, numBits: Int, k: Int): Column =
    GraftSqlBridge.column(BloomAgg(
      GraftSqlBridge.expression(key), numBits, k).toAggregateExpression())

  /** Column API: probe a bloom blob column with a LongType key column. */
  def might_contain(key: Column, blob: Column, k: Int): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(key), GraftSqlBridge.expression(blob), k))
}

/** Bloom-filter build aggregate: LongType keys → BinaryType blob
  * (numBits/8 bytes, little-endian within each byte: bit j lives in
  * byte j>>>3, mask 1<<(j&7) — the addressing [[Bloom.mightContain]]
  * reads). Nulls are skipped (a null key matches nothing). */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= Bloom.MaxBits,
    s"numBits must be a positive multiple of 64 <= ${Bloom.MaxBits}, got $numBits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires bigint input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, numBits, k, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = pack(buf)

  private def pack(buf: Array[Long]): Array[Byte] = {
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

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0))
  override def prettyName: String = "bloom_agg"
}

/** Scan-side bloom probe: `might_contain(key, blob)` — codegen'd so the
  * prefilter stays inside the WholeStageCodegen span of the scan that
  * feeds it. Null key or null blob → null (three-valued logic, so a
  * `filter` drops those rows, matching semi-join semantics for nulls). */
case class BloomMightContain(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"might_contain requires (bigint, binary), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain"

  override def nullSafeEval(key: Any, blob: Any): Any =
    Bloom.mightContain(blob.asInstanceOf[Array[Byte]], k, key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (keyC, blobC) =>
      s"${ev.value} = graft.sketch.Bloom.mightContain($blobC, $k, $keyC);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
