package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** One-off diagnostic main: run one query N times, print wall time plus
  * aggregate task metrics (executor run/GC/deserialize/shuffle) so a
  * machine-level slowdown can be attributed. Not part of the bench. */
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q102_gopher_rules")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // same session config as the bench (GraftSession) so probe A/Bs
    // measure under identical AQE/shuffle settings
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val run = new AtomicLong; val gc = new AtomicLong; val deser = new AtomicLong
    val swrite = new AtomicLong; val sread = new AtomicLong; val tasks = new AtomicLong
    val resSer = new AtomicLong; val sched = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          tasks.incrementAndGet()
          run.addAndGet(m.executorRunTime)
          gc.addAndGet(m.jvmGCTime)
          deser.addAndGet(m.executorDeserializeTime)
          resSer.addAndGet(m.resultSerializationTime)
          swrite.addAndGet(m.shuffleWriteMetrics.writeTime / 1000000)
          sread.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
        }
      }
    })
    val fn = SparkEntry.queries(name)
    for (i <- 1 to args.lift(1).map(_.toInt).getOrElse(3)) {
      Seq(run, gc, deser, swrite, sread, tasks, resSer, sched).foreach(_.set(0))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain listener bus
      println(f"[probe] $name rep$i wall=$wall%.2f s tasks=${tasks.get} " +
        f"execRun=${run.get / 1000.0}%.1f s gc=${gc.get / 1000.0}%.1f s " +
        f"deser=${deser.get / 1000.0}%.1f s shufWrite=${swrite.get / 1000.0}%.1f s " +
        f"fetchWait=${sread.get / 1000.0}%.1f s resSer=${resSer.get / 1000.0}%.1f s")
    }
    spark.stop()
  }
}
