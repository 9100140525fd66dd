package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k DISTINCT strings as a bounded aggregation buffer — the
  * KMV-sketch building block (SURVEY §2.2 row 99).
  *
  * `distinct().orderBy(h).limit(k)` answers the same question, but
  * its Distinct is a CORPUS-sized hash shuffle (every distinct hash
  * crosses the wire) before TakeOrdered sees anything. This
  * aggregate keeps an ordered set capped at k per partition — a row
  * beyond the current k-th minimum is rejected in O(1) against the
  * max — so the exchange carries at most k strings per partition NO
  * MATTER the corpus cardinality: the correct sketch-pass plan at
  * 100 TB. Output: the ≤k smallest distinct values, ascending
  * (byte-lexicographic UTF8 order — for md5 hex that is unsigned
  * digest order on any engine, which keeps the DuckDB oracle
  * replayable exactly).
  */
case class BottomKDistinct(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bottom_k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "graft_bottom_k requires k >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bottom_k requires a string column, got $other")
  }

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  override def update(buf: java.util.TreeSet[UTF8String],
                      input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      if (buf.size < k) buf.add(s.clone()) // clone: input buffers are reused
      else if (s.compareTo(buf.last()) < 0 && buf.add(s.clone()))
        buf.pollLast()
    }
    buf
  }

  override def merge(a: java.util.TreeSet[UTF8String],
                     b: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = b.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val s = it.next()
      if (a.size < k) a.add(s)
      else if (s.compareTo(a.last()) < 0) { if (a.add(s)) a.pollLast() }
      else continue = false // b is ascending: the rest can't qualify
    }
    a
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val b = it.next().getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      set.add(UTF8String.fromBytes(b))
      i += 1
    }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren.head)
}
