package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries are materialized through the noop sink (not count()) so the
  * full physical plan — sorts, projections, window functions — executes
  * exactly as a real consumer would see it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM + parquet footers so query #1 doesn't absorb startup.
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // SPARK_GRAFT_ONLY=q87,q53 restricts the run (substring match) for
    // iterating on one query. Every query runs SPARK_GRAFT_REPS times
    // (default 2) back-to-back and records the MINIMUM — a single
    // contended rep on a noisy host can no longer masquerade as a
    // regression across the whole sweep (the round-4 lesson: one
    // machine-contended driver run poisoned all 114 numbers at once).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    // A failed rep must NOT enter the min — a query that throws quickly
    // would otherwise record its fast failure as the benchmark number.
    // Queries whose reps ALL fail are omitted and the run flagged partial.
    var failed = List.empty[String]
    val results = selected.flatMap { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      if (times.isEmpty) { failed ::= name; None } else Some(name -> times.min)
    }
    if (failed.nonEmpty)
      System.err.println(s"[bench] PARTIAL RUN — queries with zero successful reps: ${failed.sorted.mkString(",")}")
    // Outlier retry pass: back-to-back reps share any machine-contention
    // window (the round-4/round-5 lesson — a multi-minute noisy-neighbor
    // burst poisoned a CONSECUTIVE block of queries, and both reps of each
    // sat inside it). A retry at the END of the sweep lands minutes later,
    // outside the window. Retry only genuine outliers — recorded min both
    // > 2 s and > 4× the sweep median — and keep the min, so a real
    // regression (slow on every attempt) still reports slow.
    // queries whose recorded number came from the retry pass, surfaced
    // in the JSON — a sweep consumer must be able to tell a retried min
    // from a clean-run min (the asymmetric retry can understate a real
    // regression that first presents as a >4x-median time)
    var retriedNames = List.empty[String]
    val finalResults =
      if (results.size < 8) results
      else {
        val sortedT = results.map(_._2).sorted
        val median = sortedT(sortedT.size / 2)
        results.map { case (name, t) =>
          if (t > 2.0 && t > 4 * median) {
            val t0 = System.nanoTime()
            val retried =
              try { SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
                    Some((System.nanoTime() - t0) / 1e9) }
              catch { case _: Throwable => None }
            retried match {
              case Some(rt) if rt < t =>
                System.err.println(f"[bench] $name outlier retry: $t%.2f -> $rt%.2f s")
                retriedNames ::= name
                name -> rt
              case _ => name -> t
            }
          } else name -> t
        }
      }
    // the partial marker must ride IN the JSON: a consumer of
    // bench_full.json cannot see stderr, and a partial sweep's lower
    // total would otherwise read as a misleadingly fast clean run
    val partial = failed.sorted.map(n => "\"" + n + "\"")
      .mkString(""","partial":[""", ",", "]") +
      retriedNames.sorted.map(n => "\"" + n + "\"")
        .mkString(""","retried":[""", ",", "]")
    val qs = finalResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = finalResults.map(_._2).sum
    // The driver keeps only the LAST ~2000 chars of output, and 80+ queries at
    // full precision overflow that window — so (a) persist the full-precision
    // line to bench_full.json, (b) print a compact line with per-query values
    // at 3 decimals and the headline fields LAST, so truncation (which eats
    // the start of the window) can only cost early per-query entries, never
    // the total.
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$partial,"sf":"$sfDir"}"""
    if (only.isEmpty) try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] persist failed: $e") }
    def d3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs3 = finalResults.map { case (k, v) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","queries":$qs3,"sf":"$sfDir","n":${finalResults.size}$partial,"unit":"sec","value":${d3(total)}}""")
    spark.stop()
  }
}
