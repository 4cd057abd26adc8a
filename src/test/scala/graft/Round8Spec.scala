package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{BatchInference, ConvNet}

/** Round-8 invariants: the REAL convnet forward pass through the
  * batched inference scaffold.
  */
class Round8Spec extends SparkSpec {

  private def payloadOf(w: Int, h: Int, px: Array[Int]): Array[Byte] =
    s"$w,$h:${px.mkString(",")}".getBytes("UTF-8")

  test("ConvNet.forward: hand-computed network output on a tiny constant input") {
    // constant input c: every conv activation is c·Σw(f); ReLU keeps
    // the non-negative filters; pooling over equal values is identity;
    // the dense output is then exactly derivable by hand
    val c = 2
    val px = Array.fill(ConvNet.InSize * ConvNet.InSize)(c)
    val filterSums = (0 until ConvNet.NFilters).map { f =>
      (for (ky <- 0 until 3; kx <- 0 until 3) yield ConvNet.convW(f, ky, kx)).sum
    }
    val act = filterSums.map(s => math.max(0, c * s))
    val expected = (0 until ConvNet.Dim).map { o =>
      (o + 1) + (for (f <- 0 until ConvNet.NFilters;
                      py <- 0 until ConvNet.PoolOut;
                      px2 <- 0 until ConvNet.PoolOut)
        yield ConvNet.fcW(o, f, py, px2) * act(f)).sum
    }.map(_.toDouble)
    assert(ConvNet.forward(ConvNet.InSize, ConvNet.InSize, px).toSeq == expected)
  }

  test("ConvNet.resize: nearest-neighbor source index is (t·src) div 8") {
    val (w, h) = (5, 3)
    val px = Array.tabulate(w * h)(identity)
    val out = ConvNet.resize(w, h, px)
    for (ty <- 0 until 8; tx <- 0 until 8) {
      assert(out(ty * 8 + tx) == (ty * h / 8) * w + (tx * w / 8))
    }
  }

  test("convnet through the Arrow scaffold is bit-equal to a driver-side forward") {
    // the gate for the batched path itself: same payloads through
    // embedStageArrow (per-partition load, columnar batches) and
    // through a plain driver loop must agree on every bit
    val payloads = (0 until 13).map { i =>
      val w = 3 + i % 5
      val h = 2 + i % 7
      (i.toLong, payloadOf(w, h, Array.tabulate(w * h)(j => (i * 37 + j * 11) % 256)))
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map(p => Row(p._1, p._2)), 3), schema)
    val got = BatchInference
      .embedStageArrow(df, "payload", new ConvNet.ArrowLoader, batchSize = 4)
      .select("id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rowPath = BatchInference
      .embedStage(df, "payload", new ConvNet.Loader, batchSize = 4)
      .select("id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    payloads.foreach { case (id, bytes) =>
      val want = ConvNet.forwardPayload(bytes).toSeq
      assert(got(id) == want, s"arrow path diverged for id=$id")
      assert(rowPath(id) == want, s"row path diverged for id=$id")
    }
  }

  /** Fixed 8×6 JPEG fixture (encoded by this JVM's javax.imageio from
    * the gray ramp (17 + 7y + 13x) mod 256) and its decoded BT.601
    * luma grid, precomputed once. JPEG is lossy, so the gate is this
    * spec (exact decode reproducibility + closeness to the pre-encode
    * ramp), not a DuckDB oracle — closing the reference's jpg/jpeg
    * upload format (app.py:100) alongside the PNG/BMP oracle paths.
    */
  private val jpegFixtureB64 =
    "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAGAAgDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDk/C+nJ8nSiiigD//Z"

  private val jpegFixtureLuma = Array(
    17, 27, 42, 56, 68, 81, 96, 107,
    24, 34, 49, 63, 75, 88, 103, 114,
    31, 42, 57, 71, 82, 96, 111, 122,
    38, 48, 63, 77, 89, 102, 117, 128,
    45, 55, 70, 84, 96, 109, 124, 135,
    51, 62, 77, 91, 102, 116, 131, 142)

  test("ImageDecode.pixelFrame decodes the JPEG fixture to the precomputed luma grid") {
    val bytes = java.util.Base64.getDecoder.decode(jpegFixtureB64)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, bytes)), 1), schema)
    val got = graft.operators.ImageDecode.pixelFrame(df, "doc_id", "payload")
      .collect().map(r => ((r.getInt(1), r.getInt(2)), r.getInt(3))).toMap
    assert(got.size == 48, "8x6 JPEG must decode to 48 pixels")
    for (y <- 0 until 6; x <- 0 until 8) {
      assert(got((y, x)) == jpegFixtureLuma(y * 8 + x),
        s"JPEG decode drifted at ($y,$x)")
      // lossy but SEMANTIC: every value stays near the pre-encode ramp
      val ramp = (17 + 7 * y + 13 * x) % 256
      assert(math.abs(got((y, x)) - ramp) <= 8,
        s"decoded luma at ($y,$x) strayed ${got((y, x))} vs ramp $ramp")
    }
  }

  test("keptPairCells prunes cross-cluster cells on structured data, keeps all when τ̂ is unknowable") {
    import spark.implicits._
    import graft.operators.Knn
    def frame(rows: Seq[(Long, Seq[Double], Int)]) =
      rows.toDF("vec_id", "v", "grp")
        .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
        .select("vec_id", "v", "nrm", "grp")
    // two tight orthogonal clusters, >100 diagonal pairs each → τ̂ ≈ 1
    // and the cross cell's cone bound cannot reach it
    val clustered = frame(
      (0 until 60).map(i => (i.toLong, Seq(1.0, i * 1e-4, 0.0, 0.0), 0)) ++
      (0 until 60).map(i => ((100 + i).toLong, Seq(0.0, 0.0, 1.0, i * 1e-4), 1)))
    val kept = Knn.keptPairCells(clustered, spark)
    assert(kept.contains((0, 0)) && kept.contains((1, 1)),
      "diagonal cells must always survive")
    assert(!kept.contains((0, 1)),
      s"the orthogonal cross cell must be pruned, kept=$kept")
    // too few diagonal pairs to establish τ̂ → every cell is kept
    val tiny = frame(
      (0 until 5).map(i => (i.toLong, Seq(1.0, i * 1e-4, 0.0, 0.0), 0)) ++
      (0 until 5).map(i => ((100 + i).toLong, Seq(0.0, 0.0, 1.0, i * 1e-4), 1)))
    assert(Knn.keptPairCells(tiny, spark).toSet == Set((0, 0), (0, 1), (1, 1)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("m_pipeline_real embeds every crop with nonzero norm and votes for each query") {
    val df = SparkEntry.queries("m_pipeline_real")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val queries = rows.map(_.getLong(0)).distinct
    assert(queries.length == 3, s"expected 3 query docs, got ${queries.toSeq}")
    // top-5 per query, rnk dense from 1
    queries.foreach { q =>
      val rnks = rows.filter(_.getLong(0) == q).map(_.getLong(1)).sorted.toSeq
      assert(rnks == (1L to rnks.length).toSeq && rnks.length <= 5)
    }
    // sims are finite (a zero-norm embedding would NaN the cosine)
    assert(rows.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
