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

  /** Materialize `sfDir` as an N-file-per-table copy under /tmp (once;
    * marker-guarded) so scans parallelize like a real multi-file dataset.
    * The driver's single-file tables put every scan on ONE task at
    * local[32], which made scan-bound queries look artificially serial
    * and hid the row-local operators' parallelism (BASELINE.md round-3
    * experiment; SCALING.md carried the caveat through round 9). The
    * copy is raw parquet → parquet (no Tables.load normalization), so
    * `Tables.load` sees the same logical types either way. Materialization
    * happens BEFORE the warm-up pass — none of it lands in any query's
    * time. */
  def multiFileDir(spark: SparkSession, sfDir: String, parts: Int): String = {
    val dst = s"/tmp/graft_bench_${new java.io.File(sfDir).getName}_${parts}f"
    val marker = new java.io.File(dst, "_COMPLETE")
    if (!marker.exists()) {
      Tables.names.foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").repartition(parts)
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      marker.createNewFile()
      ()
    }
    dst
  }

  def main(args: Array[String]): Unit = {
    val rawSfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Multi-file fixture (SPARK_GRAFT_MULTIFILE parts, default 8; "0"
    // disables and benches the raw dir): only a SINGLE-FILE source layout
    // is rewritten — a dir whose tables are already directories benches
    // as-is.
    val multi = sys.env.getOrElse("SPARK_GRAFT_MULTIFILE", "8").toInt
    val singleFileLayout = new java.io.File(s"$rawSfDir/region.parquet").isFile
    val sfDir =
      if (multi > 0 && singleFileLayout) multiFileDir(spark, rawSfDir, multi)
      else rawSfDir
    val layout = if (sfDir == rawSfDir) "as-is" else s"multifile-$multi"
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
      def rep(): Option[Double] = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      val base = (1 to reps).flatMap(_ => rep())
      // Sub-2s queries get a THIRD rep (min-of-3): at that scale the
      // measurement is dominated by scheduler/JIT/GC jitter, and min-of-2
      // produced 1.7-2.1x phantom "movers" on UNCHANGED code in rounds
      // 8-9 — every round's baseline comparison then wastes audit effort
      // on noise. One extra sub-2s rep costs ~a second each; the expensive
      // queries (where reps are costly) keep the configured count.
      val times =
        if (base.nonEmpty && base.min < 2.0 && base.size < 3) base ++ rep()
        else base
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
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$partial,"sf":"$rawSfDir","layout":"$layout"}"""
    if (only.isEmpty) try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] persist failed: $e") }
    def d3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs3 = finalResults.map { case (k, v) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","queries":$qs3,"sf":"$rawSfDir","layout":"$layout","n":${finalResults.size}$partial,"unit":"sec","value":${d3(total)}}""")
    spark.stop()
  }
}
