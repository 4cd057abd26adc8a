package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Goes through
  * GraftSession so the engine's session defaults — including the
  * SPARK_GRAFT_MATERIALIZE cluster-mode switch — apply to the gate.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: dump only these query names (fast local
    // iteration on a new operator — the driver always runs the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.StoreFs.mkdirs(outDir)
    // the reliable-checkpoint strategy needs a checkpoint dir — a
    // SIBLING of outDir, not inside it (the result checker treats
    // every outDir child as a query dump)
    if (spark.conf.get(Materialize.ConfKey, "local") == "checkpoint")
      spark.sparkContext.setCheckpointDir(s"$outDir.ckpt")
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators materialize shared subplans (cache/localCheckpoint);
      // release both kinds of blocks between queries so they don't
      // accumulate across the 70+ dumps
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Spark never auto-deletes reliable checkpoints, and the v_*_store
    // gates leave per-applicationId index dirs under target/ — clean
    // both so repeated verify runs don't accumulate disk
    import graft.sources.StoreFs
    StoreFs.delete(StoreFs.fsOf(StoreFs.qualified(s"$outDir.ckpt")),
      StoreFs.qualified(s"$outDir.ckpt"))
    val t = StoreFs.qualified("target")
    StoreFs.list(StoreFs.fsOf(t), t)
      .filter(s => s.isDirectory &&
        s.getPath.getName.matches("[a-z0-9_]+_store_.*"))
      .foreach(s => StoreFs.delete(StoreFs.fsOf(t), s.getPath))
  }
}
