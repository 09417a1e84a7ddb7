package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostics: prints the formatted physical plan of named queries
  * (all, if none named) so pushdown/broadcast/codegen can be audited.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    // GraftSession with the plan-dump core count: 4 cores keeps the
    // printed initial plans small and matches the pre-r18 dumps.
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
