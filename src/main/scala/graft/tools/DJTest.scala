package graft.tools
import graft.GraftSession

/** Throwaway repro for the bimodal d_jaccard timing (see ProfileQ). */
object DJTest {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (rep <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = graft.operators.Dedup.dJaccard(spark, "/root/testdata/sf0.1")
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep: $secs%6.2f s")
      val p = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/dj_plan_$rep.txt"), p)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
