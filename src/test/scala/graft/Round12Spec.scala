package graft

import org.apache.spark.sql.functions._

/** Round-12 additions: the residual-encoding scale guard on batch
  * serving, purge's untouched-partition byte-identity, and the
  * natural-key sessionizer the s_sessionize gate runs on.
  */
class Round12Spec extends SparkSpec {

  test("searchBatch residual encodings: literal map ≡ broadcast centroid join") {
    import graft.sources.IvfPqIndexStore
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("ivfpqres_lit").toString
    val store = s"$base/res"
    IvfPqIndexStore.write(emb, "vec_id", "embedding", store, byResidual = true)
    val q = emb.filter(col("vec_id") < 5)
    // default path at gate nlist: the literal map
    val viaLiteral = IvfPqIndexStore.searchBatch(spark, store, q,
        "vec_id", "embedding", 5)
      .orderBy("query_id", "rnk").collect().map(_.toString)
    // literalMax=0 forces the production-nlist broadcast-join derivation
    val viaJoin = IvfPqIndexStore.searchBatchImpl(spark, store, q,
        "vec_id", "embedding", 5, graft.operators.Knn.IvfNprobe, literalMax = 0)
      .orderBy("query_id", "rnk").collect().map(_.toString)
    assert(viaLiteral.nonEmpty)
    assert(viaJoin.sameElements(viaLiteral),
      "the two residual encodings must rank identically")
  }

  test("purge rewrites ONLY hit partitions; untouched files stay byte-identical") {
    import graft.sources.{IndexStore, StoreMaintenance}
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("purge_bytes").toString
    val store = s"$base/idx"
    IndexStore.write(emb, "vec_id", "embedding", store, dim = 64)
    // one victim → at most a few band0 dirs are hit
    val victim = 42L
    def fileDigests(): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(store))
        .filter(f => f.getName.endsWith(".parquet"))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
          (f.getAbsolutePath,
            md.digest(java.nio.file.Files.readAllBytes(f.toPath))
              .map("%02x".format(_)).mkString)
        }.toMap
    }
    val before = fileDigests()
    val hitDirs = spark.read.parquet(store).filter(col("id") === victim)
      .select(input_file_name()).collect()
      .map(r => new java.io.File(new java.net.URI(r.getString(0))).getParent).toSet
    val (rewritten, removed) = StoreMaintenance.purge(spark, store, "id", Seq(victim))
    assert(removed == 1L, s"exactly the victim row must go (removed=$removed)")
    assert(rewritten == hitDirs.size,
      "rewritten partition count must equal the victim's partition count")
    val after = fileDigests()
    // every file OUTSIDE a hit dir must survive byte-identical
    val untouchedBefore = before.filter { case (p, _) =>
      !hitDirs.contains(new java.io.File(p).getParent)
    }
    untouchedBefore.foreach { case (p, digest) =>
      assert(after.get(p).contains(digest),
        s"untouched file rewritten or removed: $p")
    }
    assert(untouchedBefore.nonEmpty, "fixture must have untouched partitions")
    // and the victim is gone while everything else survives
    assert(spark.read.parquet(store).filter(col("id") === victim).count() == 0)
    assert(spark.read.parquet(store).count() == emb.count() - 1)
  }

  test("v_sql_store_mih: live DPP on blk, one broadcast bucket join, no cartesian") {
    val df = graft.operators.Knn.vSqlStoreMih(spark, sf)
    val plan = assertLiveDpp(df, "v_sql_store_mih")
    assert(plan.contains("BroadcastHashJoin"),
      "bucket probe must be a broadcast hash join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the radius contract must never degrade to a pair scan")
    assert(!plan.contains("SortMergeJoin"),
      "the tiny probe side must never force a shuffle join")
  }

  test("existence-guarded gate stores are keyed per corpus dir") {
    import graft.streaming.EventStreams
    // one session, two corpus dirs: the second call must BUILD its own
    // store (different row universe), not serve the first dir's store
    val a = EventStreams.sSessionize(spark, sf).count() // sf0.001
    val b = EventStreams.sSessionize(spark, "/root/testdata/sf0.01").count()
    assert(a != b,
      s"two scale factors returned the same sessionization ($a rows) — " +
        "the guarded store leaked across corpus dirs")
  }

  test("sessionizeStreamNat: timeout eviction keeps the natural key replayable") {
    import spark.implicits._
    import graft.streaming.EventStreams
    // a user whose sessions straddle a wave boundary AND whose first
    // session times out between the waves — the ordinal form would
    // restart numbering after the eviction; the natural key must not
    // collide or drift
    val base = java.nio.file.Files.createTempDirectory("sessnat").toString
    val (src, ckpt, out) = (s"$base/in", s"$base/ckpt", s"$base/out")
    def ev(id: Long, user: Long, minute: Long) =
      (id, new java.sql.Timestamp(1700000000000L + minute * 60000L),
        user, "view", 0.0, "")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    // wave 1: two events 5 min apart (one session)
    Seq(ev(1, 7, 0), ev(2, 7, 5)).toDF(cols: _*)
      .write.mode("overwrite").parquet(src)
    EventStreams.runSessionizeIngest(spark, src, ckpt, out)
    // wave 2: 100 min later (the watermark passes 5+30 → session 1
    // times out and evicts), then a second session, then a flush
    // sentinel closing it
    Seq(ev(3, 7, 105), ev(4, 7, 110), ev(5, -1, 500)).toDF(cols: _*)
      .write.mode("append").parquet(src)
    EventStreams.runSessionizeIngest(spark, src, ckpt, out)
    val got = spark.read.parquet(out).filter(col("user_id") >= 0)
      .orderBy("session_start_ms")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_start_ms"), r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_s")))
    assert(got.toSeq == Seq(
      (7L, 1700000000000L, 2L, 300L),
      (7L, 1700000000000L + 105 * 60000L, 2L, 300L)),
      s"natural-key sessions drifted: ${got.toSeq}")
  }
}
