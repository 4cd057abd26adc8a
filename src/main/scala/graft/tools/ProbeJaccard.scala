package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.operators.Dedup

/** Piecewise timing of the d_jaccard pipeline. */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(n: String)(f: => Unit): Unit = {
      val t = System.nanoTime
      f
      println(f"[probe] $n%-24s ${(System.nanoTime - t) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sig = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 5)
      .withColumn("sig", graft.expressions.TextHashExprs.minhashSig(col("text"), 5))
    time("signatures")(noop(sig))
    time("tokens")(noop(Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(Dedup.tokens(col("text"))).as("toks"))))
    time("full d_jaccard 1")(noop(SparkEntry.queries("d_jaccard")(spark, dir)))
    time("full d_jaccard 2")(noop(SparkEntry.queries("d_jaccard")(spark, dir)))
    spark.stop()
  }
}
