package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Per-entry JOB accounting for the sweep's fixed-cost floor (round-18,
  * guide §1.2 "don't compute things you throw away" applied to ACTIONS):
  * at sf0.1, 247 of 275 entries run under 1 s and their sum dominates the
  * sweep, so the lever is fewer Spark jobs per entry — construction-time
  * `.count()`/`head()` calls, eager checkpoints, broadcast builds — not
  * faster stages. This runs every entry once (after the same warm-up the
  * bench does) and prints name, wall, jobs, stages, tasks so the
  * multi-job entries are visible. Diagnostic only; not part of the bench
  * contract.
  *
  * Usage: runMain graft.JobAudit [substringFilter]
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_JOB_DETAIL=1: print each job's first-stage callsite so
    // a 13-job trivial query can be attributed line by line
    val detail = sys.env.get("SPARK_GRAFT_JOB_DETAIL").contains("1")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (detail) {
          val s = e.stageInfos.map(si => s"${si.name} [${si.numTasks}t]").mkString(" | ")
          println(s"    job ${e.jobId}: $s")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    Bench.calibrate(spark)
    val only = args.headOption
    val selected = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(n.contains) }
      .sortBy(_._1)
    println(f"${"query"}%-36s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s")
    val rows = selected.map { case (name, fn) =>
      Bench.quiesce(spark)
      Thread.sleep(200) // let the listener bus drain the previous entry
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[audit] $name failed: ${e.getMessage}"); false }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // jobs/stages land on the async bus
      val r = (name, wall, jobs.get, stages.get, tasks.get, ok)
      println(f"$name%-36s $wall%8.2f ${r._3}%5d ${r._4}%7d ${r._5}%6d" + (if (ok) "" else "  FAILED"))
      r
    }
    val byJobs = rows.sortBy(-_._3).take(25)
    println("\n== top by job count ==")
    byJobs.foreach { case (n, w, j, s, t, _) =>
      println(f"$n%-36s jobs=$j%-4d wall=$w%6.2f stages=$s%-4d tasks=$t") }
    val totJobs = rows.map(_._3).sum
    println(f"\ntotal: ${rows.size} entries, $totJobs jobs, ${rows.map(_._2).sum}%.1f s wall")
    spark.stop()
  }
}
