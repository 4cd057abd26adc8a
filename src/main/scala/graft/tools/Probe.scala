package graft.tools

import org.apache.spark.sql.functions._
import graft._

/** Ad-hoc perf probe: times individual queries or expressions against
  * a sf dir. Usage: runMain graft.tools.Probe <sfDir> <name>...
  * where name is a SparkEntry query or a built-in probe below.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(n: String)(f: => Unit): Unit = {
      val t = System.nanoTime
      f
      println(f"[probe] $n%-24s ${(System.nanoTime - t) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val builtins: Map[String, () => Unit] = Map(
      "docs_scan" -> (() => noop(Tables.documents(spark, dir))),
      "md5_only" -> (() => noop(Tables.documents(spark, dir).select(md5(col("text"))))),
      "norm_only" -> (() => noop(Tables.documents(spark, dir).select(
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))))),
      "explain" -> (() => SparkEntry.queries(names.head)(spark, dir).explain("formatted"))
    )

    names.foreach { n =>
      if (builtins.contains(n)) time(n)(builtins(n)())
      else time(n)(noop(SparkEntry.queries(n)(spark, dir)))
    }
    spark.stop()
  }
}
