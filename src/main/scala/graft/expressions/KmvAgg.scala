package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftShim => ExpressionUtils}

/** Custom Catalyst AGGREGATE FUNCTION: the k-minimum-values sketch
  * (Beyer et al.) as a TypedImperativeAggregate — keep the k smallest
  * DISTINCT hash values per group.
  *
  * Why an aggregate and not a window: `ROW_NUMBER() OVER (PARTITION BY
  * src ORDER BY h) <= k` must shuffle EVERY row to its source's
  * reducer before discarding any. KMV is mergeable — the k smallest of
  * a union is the k smallest of the per-part k-smallests — so a
  * k-bounded buffer discards inside the scan: partial aggregation
  * keeps ≤ k distinct longs per group per map task and the exchange
  * carries kilobytes regardless of row count. The same property makes
  * the persisted sketch store (sources.KmvStore) append-only: re-agg
  * over appended sketch rows IS the merge.
  *
  * Distinctness is inherent (a duplicate hash never enters the
  * buffer), so callers feed raw per-row hashes — no pre-distinct pass
  * over the corpus. Buffer ops are O(k) scans on a tiny array (k ≤
  * 4096 by contract); output is the ascending-sorted array<long>, so
  * results are deterministic and oracle-checkable.
  */
case class KmvAgg(hash: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]]
  with ExpectsInputTypes {

  require(k > 0 && k <= 4096, s"k must be in 1..4096, got $k")

  override def inputTypes = Seq(LongType)
  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[Long], h: Long): Unit = {
    var worst = 0
    var i = 0
    while (i < buf.size) {
      if (buf(i) == h) return // distinct: already sketched
      if (buf(i) > buf(worst)) worst = i
      i += 1
    }
    if (buf.size < k) buf += h
    else if (h < buf(worst)) buf(worst) = h
  }

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val h = hash.eval(input)
    if (h != null) insert(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.sorted.toArray[Any])

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
  override def prettyName: String = "kmv_agg"
}

object KmvAgg {
  /** Column API: ascending array<long> of the k smallest distinct
    * hash values per group.
    */
  def kmv(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvAgg(ExpressionUtils.expression(hash), k).toAggregateExpression())
}
