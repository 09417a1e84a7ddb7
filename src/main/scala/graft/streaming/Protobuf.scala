package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf codec (SURVEY.md §2.5; reference: codec/protobuf.rs:43-122,
  * processor/protobuf.rs:44-120) as native Catalyst expressions.
  *
  * No spark-protobuf connector ships in this environment, so this is a
  * self-contained wire-format (proto3 scalar subset) decoder/encoder for
  * the field types the reference maps: int32/int64/uint32/uint64 (varint),
  * double (fixed64), float (fixed32), bool (varint), string/bytes
  * (length-delimited). Unknown fields are skipped per proto semantics.
  *
  * Registered as SQL functions so plans stay declarative:
  *   Protobuf.register(spark, "sensor", schema)
  *   df.selectExpr("proto_decode_sensor(__value__) AS m").select("m.*")
  */
final case class ProtoField(number: Int, name: String, ftype: String) {
  def sparkType: DataType = ftype match {
    case "int32" => IntegerType
    // unsigned widths map UP so no value wraps (the reference's
    // no-unsigned-wrap contract): uint32 fits a long, uint64 a decimal.
    case "uint32" => LongType
    case "int64" => LongType
    case "uint64" => DecimalType(20, 0)
    case "double" => DoubleType
    case "float" => FloatType
    case "bool" => BooleanType
    case "string" => StringType
    case "bytes" => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported proto type $other")
  }
}

object ProtoWire {
  /** Reads (value, nextPos) varint at pos. */
  def readVarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var p = pos
    while ({
      val x = b(p) & 0xff
      v |= (x & 0x7fL) << shift
      shift += 7; p += 1
      (x & 0x80) != 0
    }) ()
    (v, p)
  }

  def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Parse one message into fieldNumber -> raw value (last wins). */
  def parse(bytes: Array[Byte]): Map[Int, Any] = {
    var pos = 0
    val out = scala.collection.mutable.Map[Int, Any]()
    while (pos < bytes.length) {
      val (tag, p1) = readVarint(bytes, pos)
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 0 =>
          val (v, p2) = readVarint(bytes, p1); out(field) = v; pos = p2
        case 1 =>
          val bb = java.nio.ByteBuffer.wrap(bytes, p1, 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out(field) = bb.getLong; pos = p1 + 8
        case 2 =>
          val (len, p2) = readVarint(bytes, p1)
          out(field) = java.util.Arrays.copyOfRange(bytes, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case 5 =>
          val bb = java.nio.ByteBuffer.wrap(bytes, p1, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          out(field) = bb.getInt.toLong; pos = p1 + 4
        case other => throw new IllegalArgumentException(s"wire type $other")
      }
    }
    out.toMap
  }
}

/** bytes -> struct(fields). Missing fields decode to proto3 defaults. */
case class ProtoDecode(child: Expression, fields: Seq[ProtoField])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    StructType(fields.map(f => StructField(f.name, f.sparkType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any = {
    val raw = ProtoWire.parse(input.asInstanceOf[Array[Byte]])
    val values = fields.map { f =>
      val v = raw.get(f.number)
      f.ftype match {
        case "int32" => v.map(_.asInstanceOf[Long].toInt).getOrElse(0)
        case "uint32" => v.map(_.asInstanceOf[Long] & 0xffffffffL).getOrElse(0L)
        case "int64" => v.map(_.asInstanceOf[Long]).getOrElse(0L)
        case "uint64" =>
          val bits = v.map(_.asInstanceOf[Long]).getOrElse(0L)
          val unsigned =
            if (bits >= 0) java.math.BigDecimal.valueOf(bits)
            else new java.math.BigDecimal(
              java.math.BigInteger.valueOf(bits).add(java.math.BigInteger.ONE.shiftLeft(64)))
          Decimal(unsigned, 20, 0)
        case "bool" => v.exists(_.asInstanceOf[Long] != 0L)
        case "double" =>
          v.map(x => java.lang.Double.longBitsToDouble(x.asInstanceOf[Long])).getOrElse(0.0)
        case "float" =>
          v.map(x => java.lang.Float.intBitsToFloat(x.asInstanceOf[Long].toInt)).getOrElse(0.0f)
        case "string" =>
          UTF8String.fromBytes(v.map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.emptyByteArray))
        case "bytes" => v.map(_.asInstanceOf[Array[Byte]]).getOrElse(Array.emptyByteArray)
      }
    }
    InternalRow.fromSeq(values)
  }
  override protected def withNewChildInternal(newChild: Expression): ProtoDecode =
    copy(child = newChild)
}

/** struct(fields) -> bytes (proto3: default values are skipped). */
case class ProtoEncode(child: Expression, fields: Seq[ProtoField])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val out = new java.io.ByteArrayOutputStream()
    fields.zipWithIndex.foreach { case (f, i) =>
      def tag(wire: Int): Unit = ProtoWire.writeVarint(out, (f.number.toLong << 3) | wire)
      f.ftype match {
        case "int32" =>
          val v = row.getInt(i); if (v != 0) { tag(0); ProtoWire.writeVarint(out, v.toLong) }
        case "uint32" | "int64" =>
          val v = row.getLong(i); if (v != 0) { tag(0); ProtoWire.writeVarint(out, v) }
        case "uint64" =>
          val bits = row.getDecimal(i, 20, 0).toJavaBigDecimal.toBigInteger.longValue()
          if (bits != 0L) { tag(0); ProtoWire.writeVarint(out, bits) }
        case "bool" =>
          val v = row.getBoolean(i); if (v) { tag(0); ProtoWire.writeVarint(out, 1L) }
        case "double" =>
          val v = row.getDouble(i)
          if (v != 0.0) {
            tag(1)
            val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.putLong(java.lang.Double.doubleToLongBits(v)); out.write(bb.array())
          }
        case "float" =>
          val v = row.getFloat(i)
          if (v != 0.0f) {
            tag(5)
            val bb = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.putInt(java.lang.Float.floatToIntBits(v)); out.write(bb.array())
          }
        case "string" =>
          val v = row.getUTF8String(i).getBytes
          if (v.nonEmpty) { tag(2); ProtoWire.writeVarint(out, v.length.toLong); out.write(v) }
        case "bytes" =>
          val v = row.getBinary(i)
          if (v.nonEmpty) { tag(2); ProtoWire.writeVarint(out, v.length.toLong); out.write(v) }
      }
    }
    out.toByteArray
  }
  override protected def withNewChildInternal(newChild: Expression): ProtoEncode =
    copy(child = newChild)
}

object Protobuf {
  /** Register proto_decode_<name> / proto_encode_<name> SQL functions for
    * a message schema. */
  def register(spark: SparkSession, name: String, fields: Seq[ProtoField]): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"proto_decode_$name", exprs => ProtoDecode(exprs.head, fields), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"proto_encode_$name", exprs => ProtoEncode(exprs.head, fields), "scala_udf")
  }
}
