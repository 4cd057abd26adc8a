package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftShim => ExpressionUtils}

/** Custom Catalyst AGGREGATE FUNCTION: bounded per-group top-k as a
  * TypedImperativeAggregate — the map-side-pruning alternative to the
  * window row_number() top-k.
  *
  * Why it matters at 100 TB: `row_number() OVER (PARTITION BY g ORDER
  * BY v)` must shuffle EVERY row of the fact to its group's reducer
  * before any row can be discarded. An aggregate with a k-bounded
  * buffer discards inside the scan: partial aggregation keeps at most
  * k (value, id) pairs per group per map task, so the exchange
  * carries ≤ k·groups·tasks tiny rows — the same partial-agg property
  * sum() has, applied to a ranking. This is the faiss bounded-heap
  * idea (the engine's CosineTopKExec uses it physically) lifted into
  * a reusable declarative aggregate any groupBy can call.
  *
  * Semantics: keep the k largest by (value DESC, id ASC) — the id is
  * both the tiebreak and the payload, so results are deterministic
  * and oracle-checkable. Buffer ops are O(k) inserts on a tiny
  * ArrayBuffer (k ≪ 100 by contract); serialization is a flat
  * (double, long) stream.
  */
case class TopKAgg(value: Expression, tie: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with ExpectsInputTypes {

  require(k > 0 && k <= 100, s"k must be in 1..100, got $k")

  // analysis-time typing: a non-double value / non-long tie column is
  // an AnalysisException (with an implicit cast where one is safe),
  // never an executor-side ClassCastException
  // (no annotation: AbstractDataType is private[sql] in Spark 4;
  // Seq[DataType] conforms covariantly)
  override def inputTypes = Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(value, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** (v1, id1) outranks (v2, id2)? — larger value, then smaller id. */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: ArrayBuffer[(Double, Long)], p: (Double, Long)): Unit =
    if (buf.size < k) buf += p
    else {
      // replace the current worst if the newcomer outranks it
      var worst = 0
      var i = 1
      while (i < buf.size) { if (beats(buf(worst), buf(i))) worst = i; i += 1 }
      if (beats(p, buf(worst))) buf(worst) = p
    }

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val t = tie.eval(input)
    if (v != null && t != null)
      insert(buf, (v.asInstanceOf[Double], t.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)],
                     b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      buf.sortWith(beats).map(p => InternalRow(p._1, p._2)).toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, id) => out.writeDouble(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), tie = newChildren(1))
  override def prettyName: String = "topk_agg"
}

object TopKAgg {
  /** Column API: array<struct<v, id>> of the k largest (value, id)
    * pairs per group, value DESC then id ASC.
    */
  def topK(value: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAgg(ExpressionUtils.expression(value),
        ExpressionUtils.expression(id), k).toAggregateExpression())
}
