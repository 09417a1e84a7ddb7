package graft.streaming

import org.apache.spark.sql.{GraftArrowPipe, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The python processor's Arrow interchange (processor/python.rs:27-140):
  * real python3+pyarrow workers fed per-partition Arrow IPC streams.
  * Gated on the probe — hosts without pyarrow skip rather than fail.
  */
class PythonPipeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("python processor transforms arrow batches in a python worker") {
    assume(GraftArrowPipe.pythonArrowAvailable, "no python3+pyarrow on this host")
    val out = Processors.PythonProcessor(
      """    import pyarrow.compute as pc
        |    return batch.set_column(0, 'x', pc.add(batch.column('x'), 1))""".stripMargin,
      "x BIGINT")(
      spark.range(1, 101).toDF("x").repartition(4))
    assert(out.as[Long].collect().sorted.toSeq == (2L to 101L).toSeq)
  }

  test("python processor can reshape the schema (derive new columns)") {
    assume(GraftArrowPipe.pythonArrowAvailable, "no python3+pyarrow on this host")
    val out = Processors.PythonProcessor(
      """    import pyarrow as pa
        |    words = [len(s.as_py().split()) for s in batch.column('text')]
        |    return pa.RecordBatch.from_arrays(
        |        [batch.column('doc_id'), pa.array(words, type=pa.int64())],
        |        names=['doc_id', 'n_words'])""".stripMargin,
      "doc_id BIGINT, n_words BIGINT")(
      Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 2L)))
  }

  test("empty partitions skip the worker entirely") {
    assume(GraftArrowPipe.pythonArrowAvailable, "no python3+pyarrow on this host")
    val out = Processors.PythonProcessor(
      "    return batch",
      "x BIGINT")(spark.range(0).toDF("x").repartition(3))
    assert(out.count() == 0)
  }
}
