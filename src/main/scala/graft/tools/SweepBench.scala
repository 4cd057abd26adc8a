package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scale-factor sweep: times every registered query at two scale
  * factors and reports the per-query growth ratio — the cheap local
  * detector for super-linear operators. A query whose time grows much
  * faster than the data (> FlagRatio for a 10× data step, with a
  * floor to ignore fixed-overhead noise on sub-second queries) is
  * flagged: it would hit a wall on a cluster long before the VM does.
  *
  * Usage: runMain graft.tools.SweepBench <smallSfDir> <bigSfDir>
  * Writes sweep.json: {"small":…, "big":…, "flag_ratio":…,
  * "queries":{name:{"small":s,"big":s,"ratio":r}}, "flagged":[…]}.
  */
object SweepBench {

  val FlagRatio = 15.0
  /** Queries faster than this at the BIG scale are never flagged: a
    * 0.05s→0.9s "18×" is job-overhead jitter, not an operator trend.
    */
  val MinBigSecs = 0.5

  def main(args: Array[String]): Unit = {
    val Array(smallDir, bigDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runAll(dir: String): Map[String, Double] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[sweep] $name failed at $dir: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        name -> secs
      }.toMap

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def minOfN(dir: String): Map[String, Double] = {
      runAll(dir) // same-SF warm-up (codegen/JIT — see Bench)
      val passes = (1 to reps).map(_ => runAll(dir))
      passes.head.keys.map(k => k -> passes.map(_(k)).min).toMap
    }

    val small = minOfN(smallDir)
    val big = minOfN(bigDir)

    def r3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val names = small.keys.toSeq.sorted
    val rows = names.map { n =>
      val ratio = if (small(n) > 0) big(n) / small(n) else Double.PositiveInfinity
      (n, small(n), big(n), ratio)
    }
    val flagged = rows.filter(r => r._4 > FlagRatio && r._3 >= MinBigSecs).map(_._1)
    val qs = rows.map { case (n, s, b, r) =>
      s"""\"$n\":{\"small\":${r3(s)},\"big\":${r3(b)},\"ratio\":${r3(r)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"small":"$smallDir","big":"$bigDir","flag_ratio":$FlagRatio,
         |"flagged":${flagged.map("\"" + _ + "\"").mkString("[", ",", "]")},
         |"queries":$qs}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get("sweep.json"),
      json.getBytes("UTF-8"))
    println(s"""{"sweep":"done","flagged":${flagged.size},"n":${names.size}}""")
    flagged.foreach(n => println(s"[sweep] FLAGGED $n: " +
      s"${r3(small(n))}s -> ${r3(big(n))}s (${r3(big(n) / small(n))}x)"))
    spark.stop()
  }
}
