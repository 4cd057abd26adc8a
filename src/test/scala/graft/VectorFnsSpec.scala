package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashFns, VectorFns => V}

class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 2.0f, 0.0f)),
    (3L, Array(3.0f, 4.0f, 0.0f))).toDF("id", "v")

  test("norm2 / dot / cosine basics") {
    val r = vecDf.select(col("id"), V.norm2(V.toDouble(col("v"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(r(1L) - 1.0) < 1e-12)
    assert(math.abs(r(2L) - 2.0) < 1e-12)
    assert(math.abs(r(3L) - 5.0) < 1e-12)

    val cos = vecDf.select(
      V.cosine(V.toDouble(col("v")), V.toDouble(col("v"))).as("c"))
      .collect().map(_.getDouble(0))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("l2Normalize produces unit vectors") {
    val norms = vecDf
      .select(V.norm2(V.l2Normalize(V.toDouble(col("v")))).as("n"))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-12))
  }

  test("quantize + signedIntDot is exact integer arithmetic") {
    val signs = Array(1, -1, 1)
    val d = vecDf.select(
      V.signedIntDot(V.quantize(V.toDouble(col("v"))), signs).as("d"))
      .collect().map(_.getLong(0))
    assert(d.sameElements(Array(1000L, -2000L, -1000L)))
  }

  test("JVM md5Hex matches Spark md5") {
    val sparkMd5 = Seq("hp_0_1").toDF("s").select(md5(col("s"))).collect()(0).getString(0)
    assert(sparkMd5 == HashFns.md5Hex("hp_0_1"))
  }

  test("shingleHashes: count and range") {
    val df = Seq(("abcdefgh", 1)).toDF("text", "i")
    val hs = df.select(HashFns.shingleHashes(col("text"), 5).as("h"))
      .collect()(0).getSeq[Long](0)
    assert(hs.length == 4) // 8 - 5 + 1
    assert(hs.forall(h => h >= 0 && h < HashFns.P31))
    // shorter than k → empty, not a descending-sequence artifact
    val short = Seq(("abc", 1)).toDF("text", "i")
      .select(HashFns.shingleHashes(col("text"), 5).as("h"))
      .collect()(0).getSeq[Long](0)
    assert(short.isEmpty)
  }
}
