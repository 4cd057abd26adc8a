package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{IndexStore, PqIndexStore}

class IndexStoreSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_index").toString

  test("write → read → exact search round-trips and matches direct k-NN") {
    val emb = Tables.embeddings(spark, sf)
    IndexStore.write(emb, "vec_id", "embedding", s"$tmp/idx", dim = 64)
    IndexStore.writeMetadata(
      emb.select(col("vec_id"), col("label")), s"$tmp/idx")

    val index = IndexStore.read(spark, s"$tmp/idx")
    assert(index.columns.toSet == Set("id", "v", "nrm", "band0", "band1"))

    val queries = emb.filter(col("vec_id") < 10)
    val viaIndex = IndexStore.search(index, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = SparkEntry.queries("v_knn_exact")(spark, sf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).toSet
    assert(viaIndex == direct,
      "search over the persisted index must equal the in-memory exact k-NN")

    val meta = IndexStore.readMetadata(spark, s"$tmp/idx")
    val joined = IndexStore.search(index, queries, "vec_id", "embedding", 5)
      .join(meta, col("neighbor_id") === col("vec_id"))
    assert(joined.filter(col("label").isNull).count() == 0)
  }

  test("ANN search prunes to band partitions and finds bucket-local neighbors") {
    val emb = Tables.embeddings(spark, sf)
    val index = IndexStore.read(spark, s"$tmp/idx")
    val queries = emb.filter(col("vec_id") < 10)
    val ann = IndexStore.searchAnn(index, queries, "vec_id", "embedding", 3, dim = 64)
    val rows = ann.collect()
    assert(rows.nonEmpty)
    // every ANN hit must also be in the same band0 bucket as its query
    val plan = ann.queryExecution.executedPlan.toString
    assert(plan.contains("band0"), "band filter should reach the scan")
  }

  test("incremental append: new vectors are searchable without a rebuild") {
    import spark.implicits._
    val path = s"$tmp/idx_inc"
    val emb = Tables.embeddings(spark, sf)
    IndexStore.write(emb, "vec_id", "embedding", path, dim = 64)
    val before = IndexStore.read(spark, path).count()
    // append a synthetic vector identical to vec_id 0 but with a new id
    val v0 = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val extra = Seq((100000L, v0)).toDF("vec_id", "embedding")
    IndexStore.append(extra, "vec_id", "embedding", path, dim = 64)
    val index = IndexStore.read(spark, path)
    assert(index.count() == before + 1)
    // the clone must surface as vec_id 0's top neighbor (cosine 1.0)
    val q = emb.filter(col("vec_id") === 0)
    val top = IndexStore.search(index, q, "vec_id", "embedding", 1).collect()
    assert(top.length == 1 && top.head.getLong(2) == 100000L)
  }

  test("PQ index: write → load → ADC search equals the in-memory v_pq") {
    val path = s"$tmp/idx_pq"
    val emb = Tables.embeddings(spark, sf)
    PqIndexStore.write(emb, "vec_id", "embedding", path)
    // codes persist as ONE row per vector holding all M codes (the
    // faiss code-blob layout)
    val codes = spark.read.parquet(s"$path.codes")
    assert(codes.columns.toSet == Set("vec_id", "codes"))
    assert(codes.count() == emb.count())
    assert(codes.head.getSeq[Int](codes.columns.indexOf("codes")).length
      == graft.operators.Knn.PqSubspaces)
    // deterministic training → the persisted index serves the same
    // ranking as the in-memory operator
    val queries = emb.filter(col("vec_id") < 10)
    val viaStore = PqIndexStore.search(spark, path, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = SparkEntry.queries("v_pq")(spark, sf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toSet
    assert(viaStore == direct,
      "ADC search over the persisted PQ index must equal v_pq")
  }
}
