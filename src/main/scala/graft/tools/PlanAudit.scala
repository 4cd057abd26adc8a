package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: plan audit across all queries — reports, per query, the
  * number of shuffle exchanges, broadcast exchanges, whether any scan
  * reads more columns than needed (full-schema reads of wide tables),
  * and non-codegen (interpreted) projections in the plan. Usage:
  * PlanAudit [query...] (default all).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save() // finalize AQE
        val plan = df.queryExecution.executedPlan.toString
        val shuffles = "Exchange (hash|range|RoundRobin|SinglePartition)".r
          .findAllIn(plan).size
        val bcasts = "BroadcastExchange".r.findAllIn(plan).size
        val wideScans = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
          .map(_.group(1).count(_ == ':')).filter(_ > 8).toSeq
        val fallback = if (plan.contains("CodegenFallback")) " FALLBACK" else ""
        println(f"$name%-18s shuffles=$shuffles%2d broadcasts=$bcasts%d" +
          (if (wideScans.nonEmpty) s" WIDE_SCAN(${wideScans.mkString(",")}cols)" else "") +
          fallback)
        spark.sharedState.cacheManager.clearCache()
      } catch { case e: Throwable =>
        println(s"$name AUDIT_FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
