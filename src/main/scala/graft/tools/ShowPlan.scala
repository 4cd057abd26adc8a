package graft.tools
import graft.{GraftSession, SparkEntry}

/** Dev tool: print the final (adaptive) physical plan of a query. */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() on THIS df (not a noop-write clone, which executes a
      // separate QueryExecution) so AdaptiveSparkPlan finalizes and the
      // printed tree is what actually ran (isFinalPlan=true)
      df.collect()
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
