package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Deterministic cost probe for the forward-geocode join path: sums shuffle
  * read/write bytes and task CPU time across one batched forward() call.
  * Unlike wall-clock pairs, these numbers do not move with host load, so
  * they are the honest A/B metric for plan-shape changes (e.g. the
  * narrow-cover cogroup in the verify re-rank).
  *
  * Usage: runMain graft.ProbeShuffle [cpus] [nQueries]
  */
object ProbeShuffle {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val n = if (args.length > 1) args(1).toInt else 10000
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nPlaces = sys.env.getOrElse("SPARK_GRAFT_SCALE_PLACES", "22000").toInt
    val index = graft.index.BigGazetteer.buildIndex(spark, nPlaces)
    index.layers.foreach { l =>
      l.postings.count(); l.tileFeatures.count(); l.features.count()
    }
    index.candByQsig.values.foreach { case (d, p, pd) =>
      d.count(); p.count(); pd.count()
    }
    index.allPostingsQsig.count()
    index.allFeaturesWide.count()
    index.allTileFeatures.count()

    // Total bytes allocated across live JVM threads (HotSpot
    // com.sun.management.ThreadMXBean) — task threads are pooled in local
    // mode, so a before/after delta over the measured run captures its
    // allocation volume. Unlike task CPU (inflated 1.4x run-to-run by host
    // contention on this box), the allocation delta is deterministic per
    // plan shape, so it is the primary A/B number for allocation work.
    def allocatedBytes(): Long =
      java.lang.management.ManagementFactory.getThreadMXBean match {
        case tmx: com.sun.management.ThreadMXBean =>
          tmx.getAllThreadIds.map(id =>
            math.max(0L, tmx.getThreadAllocatedBytes(id))).sum
        case _ => 0L
      }

    val shufWrite = new LongAdder; val shufRead = new LongAdder
    val cpuNs = new LongAdder; val tasks = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
          shufRead.add(m.shuffleReadMetrics.totalBytesRead)
          cpuNs.add(m.executorCpuTime)
          tasks.increment()
        }
      }
    }

    def run(): Long = {
      val qs = graft.index.BigGazetteer.forwardQueries(spark, n, nPlaces)
      graft.query.Forward.forward(spark, index, qs).count()
    }
    run() // warm (codegen + caches), unmeasured

    spark.sparkContext.addSparkListener(listener)
    val alloc0 = allocatedBytes()
    val t0 = System.nanoTime()
    val rows = run()
    val wall = (System.nanoTime() - t0) / 1e9
    val allocGb = (allocatedBytes() - alloc0) / 1e9
    // drain queued listener events before reading the adders (listenerBus
    // is spark-private; a short sleep suffices — task-end events for a
    // completed job flush within milliseconds)
    Thread.sleep(3000)
    println(f"""{"metric":"forward_shuffle_probe","cpus":"$cpus","queries":$n,"rows":$rows,"shuffle_write_mb":${shufWrite.sum / 1e6}%.1f,"shuffle_read_mb":${shufRead.sum / 1e6}%.1f,"task_cpu_sec":${cpuNs.sum / 1e9}%.1f,"tasks":${tasks.sum},"alloc_gb":$allocGb%.1f,"wall_sec":$wall%.1f}""")
    spark.stop()
  }
}
