package graft.topk

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters: approximate frequent items in one pass
  * with a FIXED k-counter summary per group — the streaming/sketch
  * answer to "top tokens by count" when an exact groupBy-per-item is
  * the thing you can't afford.
  *
  * Guarantees (classic MG): every item with true count > N/(k+1)
  * survives; reported count undercounts the truth by at most the total
  * decrement amount (tracked and emitted as `max_undercount`).
  * Summaries merge by counter addition + joint decrement (Agarwal et
  * al.'s mergeable-summaries result), so partial aggregation works
  * map-side: at 100 TB each mapper ships k counters per group, never
  * the item stream.
  *
  * Exact-recovery property used by the spec AND the oracle pairing: if
  * a group has at most k distinct items, no decrements ever happen and
  * the summary IS the exact per-item count table — which is how fq01
  * stays hash-checkable against a plain SQL GROUP BY.
  */
case class FreqItemsAgg(
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqItemsAgg.Summary] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("min_count", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("max_undercount", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = itemExpr.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"freq_items requires string input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): FreqItemsAgg.Summary =
    new FreqItemsAgg.Summary(k)

  override def update(buf: FreqItemsAgg.Summary, input: InternalRow): FreqItemsAgg.Summary = {
    val v = itemExpr.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: FreqItemsAgg.Summary, b: FreqItemsAgg.Summary): FreqItemsAgg.Summary = {
    a.mergeIn(b)
    a
  }

  override def eval(buf: FreqItemsAgg.Summary): Any = {
    val items = buf.sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }
    InternalRow(new GenericArrayData(items), buf.undercount)
  }

  override def serialize(buf: FreqItemsAgg.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.sorted
    out.writeLong(buf.undercount)
    out.writeInt(items.length)
    items.foreach { case (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsAgg.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new FreqItemsAgg.Summary(k)
    s.undercount = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { s.add(in.readUTF(), in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(itemExpr = c(0))
  override def prettyName: String = "freq_items"
}

object FreqItemsAgg {

  /** Mutable Misra-Gries summary: at most k counters. `undercount` is
    * the cumulative decrement — an upper bound on how far any reported
    * count is below the true count. */
  final class Summary(k: Int) {
    private val counts = new java.util.HashMap[String, Long]()
    var undercount: Long = 0L

    /** Add `w` occurrences of `item` (w ≥ 1; merge uses w > 1). */
    def add(item: String, w: Long): Unit = {
      val cur = counts.getOrDefault(item, 0L)
      if (cur > 0L) counts.put(item, cur + w)
      else if (counts.size < k) counts.put(item, w)
      else decrementAll(w, item)
    }

    /** The MG decrement: reduce every counter by the smaller of (w, min
      * counter); re-add the remainder of the incoming item if any. */
    private def decrementAll(w: Long, item: String): Unit = {
      var minC = Long.MaxValue
      counts.forEach((_, c) => if (c < minC) minC = c)
      val dec = math.min(w, minC)
      undercount += dec
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nc = e.getValue - dec
        if (nc == 0L) it.remove() else e.setValue(nc)
      }
      if (w > dec) add(item, w - dec)
    }

    def mergeIn(other: Summary): Unit = {
      other.counts.forEach((s, c) => add(s, c))
      undercount += other.undercount
    }

    def sorted: Array[(String, Long)] = {
      val arr = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach((s, c) => { arr(i) = (s, c); i += 1 })
      arr.sortBy { case (s, c) => (-c, s) }
    }
  }

  /** Column API: Misra-Gries k-counter frequent-items summary. */
  def freq_items(item: Column, k: Int): Column =
    GraftSqlBridge.column(FreqItemsAgg(
      GraftSqlBridge.expression(item), k).toAggregateExpression())
}
