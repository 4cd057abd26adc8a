package graft.operators

import org.apache.spark.sql.functions._
import graft.GraftSession


/** Scratch probe for v_hybrid_weighted design (r15): dumps both legs'
  * top-10 SCORES on the family-aligned corpora plus the exact truth,
  * so the normalization / weighting choice is measured, not guessed.
  */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (nq, legK) = (3, 10)
    val cdir = dir + "#clustered"
    println("== vector leg (LSH ANN top-10, clustered corpus) ==")
    Knn.annLshRanked(spark, cdir, nq, legK)
      .orderBy("query_id", "rnk").show(30, false)
    println("== lexical leg (BM25 top-10, neardup docs) ==")
    TextAnalysis.bm25RankedDocs(Knn.nearDupDocs(spark, dir), nq, legK)
      .orderBy("q_id", "rnk").show(30, false)
    println("== exact truth (cosine top-5, clustered corpus) ==")
    val e = Knn.corpus(spark, cdir)
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val sims = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(graft.functions.VectorFns.cosinePre(
          graft.functions.VectorFns.dot(col("qv"), col("v")),
          col("qn"), col("nrm")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .orderBy("query_id", "rnk").show(15, false)
    spark.stop()
  }
}
