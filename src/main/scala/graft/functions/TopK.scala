package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a raw
  * Catalyst [[TypedImperativeAggregate]] — the bounded-memory way to ask
  * "what are the hot domains / tokens / URLs" over 100 TB: a plain
  * `groupBy(token).count().orderBy(desc).limit(k)` shuffles one row per
  * DISTINCT token (billions for web text), while this sketch keeps at
  * most `capacity` counters per partial buffer, map-side combines like
  * any aggregate, and ships `capacity` rows per partition to the merge.
  *
  * Guarantees (the standard SpaceSaving bounds, preserved under Spark's
  * arbitrary partial-merge order per Agarwal et al. 2012 "Mergeable
  * Summaries"): every reported `cnt` is an overestimate with
  * `cnt - err <= true <= cnt`, total overestimation per summary is
  * bounded by N/capacity, and any item with true count > N/capacity is
  * guaranteed present. With `capacity` >= distinct-count the sketch
  * degenerates to EXACT top-k — the regime the q98 DuckDB oracle
  * verifies hash-exactly; the approximate regime's bounds are asserted
  * in OperatorsSpec.
  *
  * SQL surface: `topk_sketch(item, k, capacity)` returns
  * `array<struct<item string, cnt long, err long>>` sorted by
  * (cnt DESC, item) — deterministic output on any cluster layout in the
  * exact regime.
  */
case class SpaceSavingTopK(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with UnaryLike[Expression] {

  require(k > 0 && capacity >= k, s"need k > 0 and capacity >= k, got k=$k capacity=$capacity")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v == null) return buf
    // copy out of the (reused) unsafe row buffer before storing
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some((c, e)) => buf.update(key, (c + 1, e))
      case None if buf.size < capacity => buf.update(key, (1L, 0L))
      case None =>
        // evict the minimum counter; the newcomer inherits its count as
        // the classic SpaceSaving overestimate, with err = that count
        val (mk, (mc, _)) = buf.minBy { case (ik, (ic, _)) => (ic, ik) }
        buf.remove(mk)
        buf.update(key, (mc + 1, mc))
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, (Long, Long)],
      other: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    // an item absent from a FULL summary may still have occurred up to
    // that summary's minimum counter times — add that bound (and the
    // same err); absent from a non-full summary genuinely means zero
    def minIfFull(m: mutable.HashMap[String, (Long, Long)]): Long =
      if (m.size < capacity) 0L else m.valuesIterator.map(_._1).min
    val minBuf = minIfFull(buf)
    val minOther = minIfFull(other)
    val keys = buf.keySet ++ other.keySet
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    keys.foreach { key =>
      val (c1, e1) = buf.getOrElse(key, (minBuf, minBuf))
      val (c2, e2) = other.getOrElse(key, (minOther, minOther))
      merged.update(key, (c1 + c2, e1 + e2))
    }
    if (merged.size <= capacity) merged
    else {
      val kept = merged.toSeq
        .sortBy { case (ik, (ic, _)) => (-ic, ik) }
        .take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq
      .sortBy { case (ik, (ic, _)) => (-ic, ik) }
      .take(k)
      .map { case (ik, (ic, ie)) =>
        InternalRow(UTF8String.fromString(ik), ic, ie)
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, (c, e)) =>
      val b = key.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

object SpaceSavingTopK {
  /** Builder for SQL registration: `topk_sketch(item, k, capacity)` —
    * k/capacity must be literals. */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "topk_sketch(item, k, capacity)")
    val k = exprs(1).eval().asInstanceOf[Number].intValue()
    val cap = exprs(2).eval().asInstanceOf[Number].intValue()
    SpaceSavingTopK(exprs(0), k, cap)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_sketch", builder, "scala_udf")
}
