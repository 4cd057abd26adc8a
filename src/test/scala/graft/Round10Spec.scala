package graft

import org.apache.spark.sql.functions._
import graft.sources.{BqIndexStore, StoreMaintenance}

/** Round-10 invariants: delete-by-key on the unpartitioned (flat)
  * binary tier, nested-partition-layout maintenance, and
  * recover-before-compact (a crashed committed swap must never be
  * destroyed by the next maintenance pass).
  */
class Round10Spec extends SparkSpec {

  private def md5(f: java.io.File): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(f.toPath))
      .map("%02x".format(_)).mkString
  }

  private def dataFiles(path: String): Array[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("BqIndexStore.purge: flat delete-by-key, clean files byte-identical, idempotent") {
    val base = java.nio.file.Files.createTempDirectory("bq_purge").toString
    val path = s"$base/idx"
    val emb = Tables.embeddings(spark, sf)
    // several files so "rewrites only hit files" is observable
    BqIndexStore.write(emb.repartition(4, col("vec_id")), "vec_id", "embedding", path)
    val before = dataFiles(path)
    assert(before.length >= 3, s"need a multi-file store, got ${before.length}")
    val victims = Seq(3L, 7L)
    // which files hold a victim row — recomputed independently of purge
    val victimFiles = before.filter(f =>
      spark.read.parquet(f.getAbsolutePath)
        .filter(col("id").isin(victims: _*)).count() > 0).map(_.getName).toSet
    assert(victimFiles.nonEmpty)
    val beforeHash = before.map(f => f.getName -> md5(f)).toMap
    val total = spark.read.parquet(path).count()

    val (nFiles, nRows) = BqIndexStore.purge(spark, path, victims)
    assert(nRows == victims.size.toLong, s"expected ${victims.size} rows removed, got $nRows")
    assert(nFiles == victimFiles.size, s"must rewrite only the ${victimFiles.size} hit files")

    val after = dataFiles(path).map(f => f.getName -> md5(f)).toMap
    beforeHash.foreach { case (name, h) =>
      if (victimFiles.contains(name))
        assert(!after.contains(name), s"hit file $name must have been retired")
      else
        assert(after(name) == h, s"clean file $name must stay byte-identical")
    }
    val idx = spark.read.parquet(path)
    assert(idx.count() == total - victims.size)
    assert(idx.filter(col("id").isin(victims: _*)).count() == 0)
    // the serving surface stops returning the purged ids
    val res = BqIndexStore.search(spark, path, emb,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
    assert(res.count() > 0 &&
      res.filter(col("neighbor_id").isin(victims: _*)).count() == 0,
      "purged ids must never surface in Hamming search again")
    // idempotence: re-purging the same ids touches nothing
    val (r2, n2) = BqIndexStore.purge(spark, path, victims)
    val after2 = dataFiles(path).map(f => f.getName -> md5(f)).toMap
    assert(r2 == 0 && n2 == 0L && after2 == after,
      "re-purge must be a byte-level no-op")
  }

  test("BqIndexStore.purgeMih: radius search stops returning the purged id") {
    val base = java.nio.file.Files.createTempDirectory("mih_purge").toString
    val path = s"$base/idx"
    val emb = Tables.embeddings(spark, sf)
    BqIndexStore.writeMih(emb, "vec_id", "embedding", path)
    val victim = 7L
    // the victim's own code as the query: radius 0 must find it before
    // the purge and nothing after
    val qc = spark.read.parquet(path).filter(col("id") === victim)
      .select(col("id").as("query_id"), col("code_lo").as("qlo"), col("code_hi").as("qhi"))
      .limit(1).cache()
    assert(BqIndexStore.searchRadius(spark, path, qc, radius = 0)
      .filter(col("neighbor_id") === victim).count() == 1)
    val (nParts, nRows) = BqIndexStore.purgeMih(spark, path, Seq(victim))
    assert(nRows == 8L, s"MIH fans each id into 8 bucket rows, removed $nRows")
    assert(nParts > 0)
    assert(BqIndexStore.searchRadius(spark, path, qc, radius = 0).count() == 0,
      "purged id must be gone from every blk bucket")
    qc.unpersist()
  }

  test("purge reaches nested partition layouts (r9 keyed dirs wrong: silent no-op)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("nested_purge").toString
    val path = s"$base/idx"
    (0 until 400).map(i => (i.toLong, i % 4, if (i % 2 == 0) "ev" else "od"))
      .toDF("id", "p", "q")
      .repartition(2).write.partitionBy("p", "q").parquet(path)
    val victims = Seq(5L, 10L) // land in p=1/q=od and p=2/q=ev
    val (rewritten, removed) = StoreMaintenance.purge(spark, path, "id", victims)
    assert(removed == 2L, s"nested-layout purge must remove both rows, got $removed")
    assert(rewritten == 2, s"exactly the two hit leaf dirs rewrite, got $rewritten")
    val t = spark.read.parquet(path)
    assert(t.count() == 398)
    assert(t.filter(col("id").isin(victims: _*)).count() == 0)
    // idempotent on the nested layout too
    assert(StoreMaintenance.purge(spark, path, "id", victims) == ((0, 0L)))
  }

  test("searchAnnProbed: static probed partition filter, recall lift over band0-only") {
    import graft.sources.IndexStore
    val base = java.nio.file.Files.createTempDirectory("annmp").toString
    val path = s"$base/idx"
    val emb = Tables.embeddings(spark, sf)
    IndexStore.write(emb, "vec_id", "embedding", path, dim = 64)
    val queries = emb.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
    val probed = IndexStore.searchAnnProbed(spark, path, queries,
      "vec_id", "embedding", k = 5, dim = 64)
    probed.collect()
    // pruning check on a 2-query probe set (10 queries' probes cover
    // all 16 buckets at this sf, which would make "< on disk" vacuous):
    // the probed bucket set re-derived independently — each query's
    // stored band0 plus its 4 single-bit flips
    val q2 = emb.filter(col("vec_id") < 2).select(col("vec_id"), col("embedding"))
    val probed2 = IndexStore.searchAnnProbed(spark, path, q2,
      "vec_id", "embedding", k = 5, dim = 64)
    probed2.collect()
    val qb = spark.read.parquet(path).filter(col("id") < 2)
      .select("band0").distinct().collect().map(_.getInt(0))
    val probedSet = qb.flatMap(b => b +: (0 until IndexStore.BandBits)
      .map(r => b ^ (1 << r))).toSet
    val onDisk = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("band0="))
      .map(_.getName.stripPrefix("band0=").toInt).toSet
    val expectedRead = probedSet.intersect(onDisk).size.toLong
    // the scan carries a STATIC band0 IN filter and its runtime
    // partitions-read metric equals exactly the probed buckets
    val scans = executedFileScans(probed2).filter(f =>
      f.partitionFilters.nonEmpty && f.toString.contains("band0"))
    assert(scans.nonEmpty, "store scan must carry a band0 partition filter")
    assert(scans.map(_.metrics("numPartitions").value).forall(_ == expectedRead),
      s"probed scan must read exactly the $expectedRead probed band0 dirs " +
        s"(got ${scans.map(_.metrics("numPartitions").value)})")
    assert(expectedRead < onDisk.size,
      "the 2-query probe set must prune some buckets")
    // recall lift: Hamming-1 probing strictly beats band0-only on the
    // exact top-5 (the structural-miss class it exists to recover)
    val exact = operators.Knn.vKnnExact(spark, sf)
      .select("query_id", "neighbor_id")
    val nExact = exact.count().toDouble
    def recallOf(res: org.apache.spark.sql.DataFrame): Double =
      exact.join(res.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count() / nExact
    val band0Only = IndexStore.searchAnn(IndexStore.read(spark, path),
      queries, "vec_id", "embedding", k = 5, dim = 64)
    val (r0, r1) = (recallOf(band0Only), recallOf(probed))
    assert(r1 > r0,
      s"probing Hamming-1 buckets must lift serving recall ($r1 vs $r0)")
  }

  test("Materialize.release ledgers the dropped leaf (contract-violation post-mortem)") {
    import spark.implicits._
    val f = Materialize.forceCached(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val rddId = f.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      case other => fail(s"forceCached(local) must return a LogicalRDD leaf, got $other")
    }
    assert(Materialize.releaseSiteOf(rddId).isEmpty)
    Materialize.release(f)
    val site = Materialize.releaseSiteOf(rddId)
    assert(site.isDefined && site.get.contains("Round10Spec"),
      s"release must ledger the caller site for rdd $rddId, got $site")
  }

  test("BPE fuse equals HF's list-walk merge on the divergence corpus") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // reference list-walk (the HF merge loop): greedy left-to-right,
    // merged pair consumes both symbols, continue after them
    def hfMerge(syms: List[String], x: String, y: String): List[String] = syms match {
      case a :: b :: rest if a == x && b == y => (x + y) :: hfMerge(rest, x, y)
      case a :: rest => a :: hfMerge(rest, x, y)
      case Nil => Nil
    }
    // the cases where the r8 single-pass replace diverged: adjacent
    // repeats (even and odd), same-symbol runs (pairing from the
    // left), mixed, and symbols that embed each other
    val cases = Seq(
      ("a b a b", "a", "b"), ("a b a b a b", "a", "b"),
      ("a a a", "a", "a"), ("a a a a", "a", "a"), ("a a a a a", "a", "a"),
      ("a b b a b", "a", "b"), ("ab a b ab", "a", "b"),
      ("b a b a b", "a", "b"), ("x a b a b y", "a", "b"),
      ("ba a ba a ba", "ba", "a"), ("aa aa aa", "aa", "aa"))
    val fused = cases.map { case (s, _, _) => s" $s " }.toDF("sp")
      .withColumn("i", monotonically_increasing_id())
    cases.zipWithIndex.foreach { case ((s, x, y), i) =>
      val got = fused.filter(col("i") === i)
        .select(TextAnalysis.bpeFuse(col("sp"), x, y).as("sp"))
        .collect()(0).getString(0)
      val want = " " + hfMerge(s.split(" ").toList, x, y).mkString(" ") + " "
      assert(got == want, s"pair ($x,$y) on [$s]: engine [$got] != HF [$want]")
    }
  }

  test("compact settles a crashed committed swap before rewriting (no data loss)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("crash_compact").toString
    val path = s"$base/idx"
    (0 until 100).map(i => (i.toLong, 0)).toDF("id", "p")
      .repartition(2).write.partitionBy("p").parquet(path)
    val pdir = new java.io.File(path, "p=0")
    val live = pdir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(live.length == 2)
    // hand-build the crashed state: a COMMITTED compact temp (full
    // content, _SUCCESS + manifest) whose swap already retired one of
    // the two live files — the temp now holds the ONLY copy of the
    // retired rows
    val tmp = new java.io.File(path, ".compact_p=0")
    spark.read.parquet(pdir.getAbsolutePath).coalesce(1)
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    java.nio.file.Files.write(new java.io.File(tmp, "manifest").toPath,
      java.util.Arrays.asList(live.map(_.getName): _*))
    live.head.delete()
    new java.io.File(pdir, "." + live.head.getName + ".crc").delete()
    // a compact at this point used to overwrite .compact_p=0 with a
    // rewrite of the PARTIAL dir, destroying the retired rows forever;
    // it must recover the swap first
    StoreMaintenance.compact(spark, path)
    val t = spark.read.parquet(path)
    assert(t.count() == 100,
      "compact after a crashed committed swap must preserve every row")
    assert(t.select(sum("id")).collect()(0).getLong(0) == (0L until 100L).sum)
  }

  test("residual IVF-PQ: k rows per query, a genuinely different metric than raw ADC") {
    val res = graft.operators.Knn.vIvfPqRes(spark, sf).collect()
    val raw = graft.operators.Knn.vIvfPq(spark, sf).collect()
    assert(res.groupBy(_.getLong(0)).values.forall(_.length == 5),
      "residual tier must return exactly k rows per query")
    res.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRnk = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRnk.zip(byRnk.tail).forall { case (a, b) => a <= b },
        "adc_dist must be non-decreasing in rnk")
    }
    // residual distances come from codebooks trained on v − centroid:
    // if the (query, neighbor, dist) set matched raw ADC exactly, the
    // residual path would be raw renamed, not a second encoding
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(2), r.getDouble(3))
    assert(res.map(key).toSet != raw.map(key).toSet,
      "residual ADC must differ from raw ADC somewhere")
  }

  test("compactIfNeeded: lock-free no-op under budget, bounded rewrite over it") {
    import graft.sources.{IndexStore, StoreMaintenance}
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("autocompact").toString
    val store = s"$base/idx"
    IndexStore.write(emb.filter(col("vec_id") < 100), "vec_id", "embedding",
      store, dim = 64)
    def maxFilesPerDir(): Int = new java.io.File(store).listFiles()
      .filter(d => d.isDirectory && d.getName.contains("="))
      .map(_.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet")))
      .max
    val q = emb.filter(col("vec_id") < 5)
    def results(): Set[String] = IndexStore.search(
      IndexStore.read(spark, store), q, "vec_id", "embedding", 5)
      .collect().map(_.toString).toSet
    val r0 = results()
    val budget = maxFilesPerDir() + 2 // appends below won't reach it yet
    // the no-op path must not touch the lock: a held lock is invisible
    // to a maintainer that has nothing to do
    val lock = new java.io.File(store, StoreMaintenance.LockName)
    java.nio.file.Files.createFile(lock.toPath)
    assert(StoreMaintenance.compactIfNeeded(spark, store, budget).isEmpty,
      "under budget: must be a lock-free no-op")
    // trip the budget with append waves
    (1 to budget).foreach { i =>
      IndexStore.append(emb.filter(col("vec_id") >= i * 100 &&
        col("vec_id") < (i + 1) * 100), "vec_id", "embedding", store, 64)
    }
    assert(maxFilesPerDir() > budget, "appends must have tripped the budget")
    // over budget + held lock: now it must refuse loudly, not skip
    intercept[graft.sources.ConcurrentMaintenanceException] {
      StoreMaintenance.compactIfNeeded(spark, store, budget)
    }
    lock.delete()
    val preCompact = results()
    val done = StoreMaintenance.compactIfNeeded(spark, store, budget)
    assert(done.nonEmpty, "over budget: must rewrite")
    assert(maxFilesPerDir() <= budget,
      s"rewritten dirs must be back inside the budget, got ${maxFilesPerDir()}")
    assert(results() == preCompact, "search results unchanged by maintenance")
    assert(StoreMaintenance.compactIfNeeded(spark, store, budget).isEmpty,
      "second call is a no-op: the debt is settled")
  }

  test("residual store: brand round-trips, frozen append equals one write, differs from raw") {
    import graft.sources.IvfPqIndexStore
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("ivfpq_res_store").toString
    IvfPqIndexStore.write(emb, "vec_id", "embedding", s"$base/one", byResidual = true)
    assert(IvfPqIndexStore.isResidual(s"$base/one"), "brand must persist")
    IvfPqIndexStore.write(emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      s"$base/two",
      ivfModel = Some(graft.sources.IvfIndexStore.readCentroids(spark, s"$base/one")),
      pqModel = Some(graft.sources.PqIndexStore.readBooks(spark, s"$base/one")),
      byResidual = true)
    // append consults the store's brand, NOT a caller flag: wave-2 rows
    // must come back residual-encoded or ranks shift
    IvfPqIndexStore.append(emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
      s"$base/two")
    val q = emb.filter(col("vec_id") < 3).select(col("vec_id"), col("embedding"))
    def res(p: String) = IvfPqIndexStore
      .search(spark, p, q, "vec_id", "embedding", k = 3)
      .orderBy("query_id", "rnk").collect().map(_.toString)
    assert(res(s"$base/one").sameElements(res(s"$base/two")),
      "appended residual store must rank identically to a one-shot write")
    // and the residual store is genuinely a different index than raw
    IvfPqIndexStore.write(emb, "vec_id", "embedding", s"$base/raw")
    assert(!IvfPqIndexStore.isResidual(s"$base/raw"))
    assert(!res(s"$base/one").sameElements(res(s"$base/raw")),
      "residual and raw stores must differ somewhere (distances at minimum)")
  }

  test("MMR: picks are distinct, seed is the relevance argmax, diversity binds") {
    val mmr = graft.operators.Knn.vMmr(spark, sf).collect()
    val exact = graft.operators.Knn.vKnnExact(spark, sf).collect()
      .groupBy(_.getLong(0))
    mmr.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(2)).distinct.length == 5,
        s"query $qid: MMR must never pick the same candidate twice")
      val seed = rows.find(_.getLong(1) == 1L).get.getLong(2)
      val top1 = exact(qid).find(_.getLong(1) == 1L).get.getLong(2)
      assert(seed == top1,
        s"query $qid: MMR's first pick must be the plain relevance argmax")
    }
    // diversity must actually bind somewhere: if MMR's selection were
    // the exact top-5 for every query, the penalty term did nothing
    val mmrSets = mmr.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    val exactSets = exact.view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    assert(mmrSets.exists { case (q, s) => s != exactSets(q) },
      "MMR selected exactly the relevance top-5 everywhere — λ-penalty inert")
  }

  test("runIvfPqIngest: two-wave streamed IVF-PQ store searches like one write") {
    import graft.sources.IvfPqIndexStore
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("ivfpq_ingest").toString
    val (src, ckpt, store) = (s"$base/in", s"$base/ckpt", s"$base/ivfpq")
    // wave 1 must carry the training prefix intact (seed init reads
    // the first PqCodes vec_ids) — split by range, not parity
    emb.filter(col("vec_id") < 250).write.parquet(src)
    graft.streaming.EventStreams.runIvfPqIngest(spark, src, ckpt, store,
      autoCompactMaxFiles = Some(2))
    emb.filter(col("vec_id") >= 250).write.mode("append").parquet(src)
    graft.streaming.EventStreams.runIvfPqIngest(spark, src, ckpt, store,
      autoCompactMaxFiles = Some(2))
    // batch twin trained on wave 1's rows (the maintainer's training set)
    val batchStore = s"$base/batch"
    IvfPqIndexStore.write(emb.filter(col("vec_id") < 250), "vec_id", "embedding",
      batchStore,
      ivfModel = Some(graft.sources.IvfIndexStore.readCentroids(spark, store)),
      pqModel = Some(graft.sources.PqIndexStore.readBooks(spark, store)))
    IvfPqIndexStore.append(emb.filter(col("vec_id") >= 250), "vec_id", "embedding",
      batchStore)
    val q = emb.filter(col("vec_id") < 3)
    def res(p: String) = IvfPqIndexStore.search(spark, p, q, "vec_id", "embedding", 3)
      .orderBy("query_id", "rnk").collect().map(_.toString)
    assert(res(store).sameElements(res(batchStore)),
      "streamed two-wave IVF-PQ store must search identically to frozen batch writes")
    assert(res(store).nonEmpty)
  }

  test("span excise: keeper keeps its copy, the duplicate doc loses exactly the span") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo" // one 5-word span
    val docs = Seq(
      (1L, s"intro words here then $shared and a tail"),
      (2L, s"different opening $shared closing remark now"),
      (3L, "completely unique text with no shared span at all yes")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.spanExcise(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 is the keeper (min doc_id): nothing excised
    assert(out(1L).getLong(2) == 0, "keeper must keep its copy")
    // doc 2 loses the covered words: every position the duplicated
    // 5-gram covers (the span's 5 words) disappears
    assert(out(2L).getLong(2) == 5,
      s"duplicate doc must lose the 5 covered words, lost ${out(2L).getLong(2)}")
    // doc 3 untouched
    assert(out(3L).getLong(2) == 0, "unique doc must be untouched")
    // and the rewritten keeper text hashes like the original
    val origMd5 = docs.filter(col("doc_id") === 1)
      .select(org.apache.spark.sql.functions.md5(col("text").cast("binary")))
      .collect()(0).getString(0)
    assert(out(1L).getString(3) == origMd5, "keeper text must be byte-identical")
  }

  test("mix sample: the most under-represented language keeps everything") {
    val out = graft.operators.TextAnalysis.tMixSample(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_kept <= n_docs (downsample only)")
      val rate = r.getDouble(5)
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range: $rate")
    }
    val full = out.filter(_.getDouble(5) == 1.0)
    assert(full.nonEmpty, "some language must anchor the normalization at rate 1")
    full.foreach(r => assert(r.getLong(2) == r.getLong(1),
      "rate-1 language must keep every doc"))
    assert(out.exists(r => r.getLong(2) < r.getLong(1)),
      "over-represented languages must actually thin")
  }

  test("cluster sample: caps every cluster, keeps the longest docs, totals exact") {
    val out = graft.operators.Dedup.dClusterSample(spark, sf).collect()
    val byCid = out.groupBy(_.getInt(0))
    assert(byCid.nonEmpty)
    byCid.foreach { case (cid, rows) =>
      val nTotal = rows.head.getLong(1)
      assert(rows.length == math.min(graft.operators.Dedup.ClusterCap, nTotal),
        s"cluster $cid: kept ${rows.length} of $nTotal")
      val chars = rows.sortBy(_.getLong(2)).map(_.getLong(4))
      assert(chars.zip(chars.tail).forall { case (a, b) => a >= b },
        s"cluster $cid: kept docs must be ordered by n_chars desc")
    }
    val totalAcross = byCid.map(_._2.head.getLong(1)).sum
    assert(totalAcross == Tables.embeddings(spark, sf).count(),
      "per-cluster totals must partition the corpus")
  }
}
