package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro object-container file input (SURVEY.md §2.1 file row; reference
  * input/file.rs:199-249 `register_avro`). No spark-avro DATASOURCE jar
  * ships in this environment, but avro core + avro-mapred do — so this is
  * a minimal distributed reader on public pieces only: `binaryFiles`
  * partitions the file set across executors, each task streams its files
  * through avro's `DataFileStream` (never materializing a file in
  * memory), and the avro schema (read once, driver-side, from the first
  * container header) maps to a Spark schema.
  *
  * Scope: flat records of primitive types with optional
  * `union(null, T)` nullability — the shape the reference's file input
  * handles; nested records would route through spark-avro in a
  * full-jar deployment.
  */
object AvroInput {

  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.sparkContext.binaryFiles(path)
    val headOpt = bin.keys.take(1).headOption
    require(headOpt.isDefined, s"avro input: no files under $path")
    val avroSchema = {
      val in = bin.lookup(headOpt.get).head.open()
      try new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]()).getSchema
      finally in.close()
    }
    val struct = toStructType(avroSchema)
    val fieldNames = struct.fields.map(_.name)
    val rows = bin.values.flatMap { pds =>
      val in = pds.open()
      val reader = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = reader.hasNext
          if (!h) { reader.close(); in.close() }
          h
        }
        override def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(fieldNames.toSeq.map(n => fromAvro(rec.get(n))))
        }
      }
    }
    spark.createDataFrame(rows, struct)
  }

  /** avro record schema -> Spark StructType (primitives + nullable unions). */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"avro input expects a record schema, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toDataType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toDataType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union ${s}")
      (toDataType(nonNull.head)._1, branches.size > nonNull.size)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case other => throw new IllegalArgumentException(
      s"avro input: unsupported type $other (flat primitive records only)")
  }

  private def fromAvro(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes); bytes
    case other => other
  }
}
