package graft

import org.apache.spark.sql.functions._
import graft.expressions.{TextHashExprs, VectorExprs}
import graft.functions.{HashFns => H}

/** The custom codegen expressions must be value-identical to the
  * composed higher-order-function formulations they replaced (that is
  * what the DuckDB oracles were validated against).
  */
class ExprParitySpec extends SparkSpec {

  test("DotProductD == aggregate(zip_with(...)) on real embeddings") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = e.select((VectorExprs.dotD(col("v"), col("v")) - hof).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, "codegen dot must be bit-identical (same fold order)")
  }

  test("ShingleHashesExpr == composed md5/conv shingle hashing") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 5)
    val mismatches = docs.select(
        TextHashExprs.shingleHashes(col("text"), 5).as("fast"),
        H.shingleHashes(col("text"), 5).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("MinHashSigExpr == array_min(transform(...)) per permutation") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 5)
      .withColumn("sh", H.shingleHashes(col("text"), 5))
    val slowSig = array((0 until H.numPerms).map(i =>
      array_min(transform(col("sh"), h => H.minhashPerm(h, i)))): _*)
    val mismatches = docs.select(
        TextHashExprs.minhashSig(col("text"), 5).as("fast"),
        slowSig.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("unicode shingles: code-point indexing matches Spark substring") {
    import spark.implicits._
    // multi-byte text exercises the UTF-8 offset walk
    val df = Seq("héllo wörld ✓ done", "普通话汉语普通话").toDF("text")
    val mismatches = df.select(
        TextHashExprs.shingleHashes(col("text"), 5).as("fast"),
        H.shingleHashes(col("text"), 5).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatches == 0)
  }
}
