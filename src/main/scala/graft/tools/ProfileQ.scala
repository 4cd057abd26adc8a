package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Dev profiler: run the named queries N times each against
  * SPARK_GRAFT_SF_DIR, report min/median seconds. Min-of-N is robust
  * against host CPU-steal spikes that make single full-bench runs
  * vary 3× on this box. Usage: ProfileQ q1 q2 ... (default: all).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // print any stage that takes > 1s wall-clock, to localize bimodal
    // slowdowns to a specific exchange/scan
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val secs = (for {s <- i.submissionTime; c <- i.completionTime}
                    yield (c - s) / 1e3).getOrElse(-1.0)
        if (secs > 1.0) {
          System.err.println(f"[stage ${i.stageId}%4d] $secs%6.1fs tasks=${i.numTasks} " +
            i.rddInfos.map(r => r.name + "#" + r.id).mkString(" <- ").take(200))
          if (secs > 5.0)
            System.err.println("  details: " +
              i.details.linesIterator.filter(_.contains("graft")).take(4).mkString(" | "))
        }
      }
    })
    val names = if (args.nonEmpty) args.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-20s " + times.map(t => f"$t%6.2f").mkString(" "))
    }
    spark.stop()
  }
}
