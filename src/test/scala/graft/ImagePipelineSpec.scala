package graft

import org.apache.spark.sql.functions._
import graft.operators.ImagePipeline

class ImagePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("binary payload plumbing: meta struct + decode + preprocess + embed") {
    val df = Seq(
      (1L, "imgbytes-one".getBytes("UTF-8"), 640, 480),
      (2L, "imgbytes-two".getBytes("UTF-8"), 512, 512))
      .toDF("id", "bytes", "w", "h")
    val imgs = ImagePipeline.withImageColumns(
      df, col("bytes"), col("w"), col("h"), lit("jpg"))
    assert(imgs.schema("payload").dataType.typeName == "binary")
    assert(imgs.schema("img_meta").dataType == ImagePipeline.imageMetaSchema)

    val out = imgs
      .withColumn("digest", ImagePipeline.preprocessStub(ImagePipeline.decodeStub(col("payload"))))
      .withColumn("emb", ImagePipeline.fakeEmbedding(col("digest"), 8))
      .select(col("id"), col("digest"), col("emb"))
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      val emb = r.getSeq[Double](2)
      assert(emb.length == 8)
      assert(emb.forall(x => x >= 0.0 && x < 1.0))
    }
    // determinism: same payload → same embedding
    assert(out.map(_.getString(1)).distinct.length == 2)
  }

  test("gamma LUT matches the reference's table shape") {
    val lut = ImagePipeline.gammaLut(1.5)
    assert(lut.length == 256)
    assert(lut(0) == 0 && lut(255) == 255)
    assert(lut.sliding(2).forall(p => p(0) <= p(1))) // monotone
  }

  test("yoloBbox reproduces python int() truncation math") {
    val df = Seq((0.5, 0.5, 0.25, 0.25)).toDF("xc", "yc", "w", "h")
    val r = df.select(ImagePipeline.yoloBbox(
      col("xc"), col("yc"), col("w"), col("h"), lit(640), lit(480)).as("bb"))
      .select("bb.x1", "bb.y1", "bb.x2", "bb.y2", "bb.w_abs", "bb.h_abs")
      .collect()(0)
    // w_abs=160, h_abs=120, x1=320-80=240, y1=240-60=180
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      == ((240L, 180L, 400L, 300L, 160L, 120L)))
  }
}
