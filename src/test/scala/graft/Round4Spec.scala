package graft

import org.apache.spark.sql.functions._
import graft.operators.BatchInference
import graft.sources.IndexStore

/** Round-4 invariants: the pluggable batched-inference scaffold and
  * the full reference ingest flow driven through it.
  */
class Round4Spec extends SparkSpec {

  test("embedStage: per-partition model load, batched forwards, exhaust-time close") {
    val loads = spark.sparkContext.longAccumulator("loads")
    val closes = spark.sparkContext.longAccumulator("closes")
    val batches = spark.sparkContext.longAccumulator("batches")
    val loader = new BatchInference.EmbedLoader {
      val dim = 4
      def load(): BatchInference.EmbedModel = {
        loads.add(1)
        new BatchInference.EmbedModel {
          def embedBatch(ps: Array[Array[Byte]]): Array[Array[Double]] = {
            batches.add(1)
            assert(ps.length <= 3, "batch must respect the batchSize knob")
            ps.map(p => Array.tabulate(4)(d => (p.length + d).toDouble))
          }
          override def close(): Unit = closes.add(1)
        }
      }
    }
    val base = Tables.documents(spark, sf).filter(col("doc_id") < 10)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .repartition(2)
    val out = BatchInference.embedStage(base, "payload", loader, batchSize = 3)
    assert(out.count() == 10)
    assert(loads.value == 2, "one model load per partition, not per row/batch")
    assert(closes.value == loads.value, "every loaded model is closed")
    assert(batches.value >= 4, "10 rows / batchSize 3 over 2 partitions => >= 4 forwards")
    val row = out.filter(col("doc_id") === 0).collect().head
    val vec = row.getAs[scala.collection.Seq[Double]]("embedding")
    assert(vec.length == 4 && vec(1) == vec(0) + 1.0)
  }

  test("full reference ingest through the scaffold: detect -> embed -> index -> search") {
    import BatchInference._
    val dim = 8
    // stage 1: payload carrier + decode stub (build_faiss_db.py:40-107)
    val assets = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    // stage 2: pluggable detector (app.py:112-124)
    val det = detectStage(assets, "payload", new Md5DetectLoader, batchSize = 16)
      .select(col("doc_id"), col("payload"),
        posexplode(col("detections")).as(Seq("det_id", "dt")))
    assert(det.count() > 60, "1-3 detections per asset")
    // stage 3: pluggable featurizer over the cropped region —
    // the fake embeds payload+box identity (a real model embeds pixels)
    val crops = det.select(col("doc_id"), col("det_id"),
      concat(col("payload"),
        col("dt.x1").cast("string").cast("binary")).as("payload"))
    val embedded = embedStage(crops, "payload", new Md5EmbedLoader(dim), batchSize = 16)
      .withColumn("crop_id", col("doc_id") * 10 + col("det_id"))
    // stage 4: persist index + metadata sidecar (faiss.write_index +
    // metadata.pkl, build_faiss_db.py:218-226)
    val path = java.nio.file.Files.createTempDirectory("ingest_idx").toString + "/idx"
    IndexStore.write(embedded, "crop_id", "embedding", path, dim)
    IndexStore.writeMetadata(
      embedded.select(col("crop_id"), col("doc_id"), col("det_id")), path)
    // stage 5: query flow (app.py:138-160) — search with the first
    // 5 crops as queries, join metadata back
    val index = IndexStore.read(spark, path)
    assert(index.count() == embedded.count())
    val queries = embedded.filter(col("doc_id") < 3)
      .select(col("crop_id"), col("embedding"))
    val hits = IndexStore.search(index, queries, "crop_id", "embedding", k = 5)
    val meta = IndexStore.readMetadata(spark, path)
    val joined = hits.join(meta, hits("neighbor_id") === meta("crop_id"))
    assert(joined.count() == hits.count(), "every neighbor resolves metadata")
    val perQ = hits.groupBy("query_id").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getAs[Long]("count") == 5L))
  }

  test("m_embed_scaffold equals the expression-only m_fake_embed formula") {
    val viaScaffold = SparkEntry.queries("m_embed_scaffold")(spark, sf).collect()
    val viaExpr = SparkEntry.queries("m_fake_embed")(spark, sf).collect()
    assert(viaScaffold.length == viaExpr.length && viaScaffold.length == 80)
    viaScaffold.zip(viaExpr).foreach { case (a, b) =>
      assert(a.getAs[Long]("doc_id") == b.getAs[Long]("doc_id"))
      assert(a.getAs[Double]("f") == b.getAs[Double]("f"),
        "scaffold model and Catalyst expression must agree bit-for-bit")
    }
  }

  test("PqIndexStore.append: frozen-codebook add(); append+search == rebuild+search") {
    import graft.sources.PqIndexStore
    val emb = Tables.embeddings(spark, sf)
    // new vectors with ids outside the vec_id<500 training sample, so a
    // rebuild on the union trains the SAME (deterministic) codebooks —
    // making append-vs-rebuild exactly comparable
    val extra = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val p1 = java.nio.file.Files.createTempDirectory("pq_append").toString + "/idx"
    val p2 = java.nio.file.Files.createTempDirectory("pq_rebuild").toString + "/idx"
    PqIndexStore.write(emb, "vec_id", "embedding", p1)
    val baseCodes = spark.read.parquet(s"$p1.codes").collect().map(_.toString).sorted
    PqIndexStore.append(extra, "vec_id", "embedding", p1)
    val after = spark.read.parquet(s"$p1.codes")
    assert(after.count() == baseCodes.length + 20, "one codes row per appended vector")
    assert(after.filter(col("vec_id") < 1000).collect().map(_.toString).sorted
      .sameElements(baseCodes), "append must not touch existing code rows")
    val union = emb.select(col("vec_id"), col("embedding")).union(extra)
    PqIndexStore.write(union, "vec_id", "embedding", p2)
    val queries = emb.filter(col("vec_id") < 5).select(col("vec_id"), col("embedding"))
    def run(p: String): Array[String] =
      PqIndexStore.search(spark, p, queries, "vec_id", "embedding", 5)
        .collect().map(_.toString).sorted
    assert(run(p1).sameElements(run(p2)),
      "searching the appended store must equal searching a rebuilt union store")
  }

  test("materialize strategies are result-identical (cluster-mode switch)") {
    val qs = Seq("d_minhash_pairs", "v_ivf")
    def run(q: String): Array[String] =
      SparkEntry.queries(q)(spark, sf).collect().map(_.toString).sorted
    val local = qs.map(q => q -> run(q)).toMap
    spark.conf.set(Materialize.ConfKey, "replicated")
    try qs.foreach { q =>
      assert(run(q).sameElements(local(q)),
        s"$q must not change under replicated (cluster-safe) materialization")
    } finally {
      spark.conf.unset(Materialize.ConfKey)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }

  test("m_detect: boxes are consistent with their YOLO normalized origin") {
    SparkEntry.queries("m_detect")(spark, sf).collect().foreach { r =>
      val (x1, y1, x2, y2) = (r.getAs[Long]("x1"), r.getAs[Long]("y1"),
        r.getAs[Long]("x2"), r.getAs[Long]("y2"))
      assert(x2 >= x1 && y2 >= y1)
      assert(x2 - x1 <= 160 && y2 - y1 <= 120, "w,h are <= 1/4 of the frame")
      assert(r.getAs[Double]("score") >= 0.0 && r.getAs[Double]("score") < 1.0)
      assert(r.getAs[Long]("class_id") >= 0 && r.getAs[Long]("class_id") < 5)
    }
  }
}
