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
    // constant input c: bilinear of a constant is the constant,
    // Normalize maps it to nf = normalizeFp(c), every conv activation
    // is nf·Σw(f); ReLU keeps the non-negative products; pooling over
    // equal values is identity; the dense output is then exactly
    // derivable by hand
    val c = 2
    val px = Array.fill(ConvNet.InSize * ConvNet.InSize)(c)
    val nf = ConvNet.normalizeFp(c)
    val filterSums = (0 until ConvNet.NFilters).map { f =>
      (for (ky <- 0 until 3; kx <- 0 until 3) yield ConvNet.convW(f, ky, kx)).sum
    }
    val act = filterSums.map(s => math.max(0L, nf * s))
    val expected = (0 until ConvNet.Dim).map { o =>
      (o + 1) + (for (f <- 0 until ConvNet.NFilters;
                      py <- 0 until ConvNet.PoolOut;
                      px2 <- 0 until ConvNet.PoolOut)
        yield ConvNet.fcW(o, f, py, px2) * act(f)).sum
    }.map(_.toDouble)
    assert(ConvNet.forward(ConvNet.InSize, ConvNet.InSize, px).toSeq == expected)
  }

  test("ConvNet.preprocess: shortest-side bilinear + center-crop + normalize, exact") {
    // dims: short side lands on 10, long side rounds half-up
    assert(ConvNet.bilinearDims(5, 10) == (10, 20))
    assert(ConvNet.bilinearDims(12, 4) == (30, 10))
    assert(ConvNet.bilinearDims(3, 5) == (10, 17)) // 50/3 = 16.67 → 17
    assert(ConvNet.bilinearDims(8, 8) == (10, 10))
    // constant image: bilinear is exact, output is normalizeFp(c) everywhere
    val flat = ConvNet.preprocess(7, 5, Array.fill(35)(113))
    assert(flat.toSeq.distinct == Seq(ConvNet.normalizeFp(113).toInt))
    // full check against an independent scalar evaluation of the
    // closed form on irregular inputs (both up- and down-scales)
    for (seed <- 0 until 6) {
      val w = 2 + (seed * 5) % 12
      val h = 2 + (seed * 7) % 11
      val px = Array.tabulate(w * h)(k => (seed * 41 + k * 13) % 256)
      val got = ConvNet.preprocess(w, h, px)
      val (nw, nh) = ConvNet.bilinearDims(w, h)
      for (i <- 0 until 8; j <- 0 until 8) {
        def ax(t: Int, tgt: Int, src: Int): (Int, Int, Int) = {
          val num = (2 * t + 1) * src - tgt
          if (num < 0) (0, 0, 0)
          else (num / (2 * tgt), math.min(num / (2 * tgt) + 1, src - 1),
            num - (num / (2 * tgt)) * (2 * tgt))
        }
        val (y0, y1, fy) = ax((nh - 8) / 2 + i, nh, h)
        val (x0, x1, fx) = ax((nw - 8) / 2 + j, nw, w)
        val (dy, dx) = (2L * nh, 2L * nw)
        val v = (dy - fy) * ((dx - fx) * px(y0 * w + x0) + fx * px(y0 * w + x1)) +
          fy * ((dx - fx) * px(y1 * w + x0) + fx * px(y1 * w + x1))
        assert(got(i * 8 + j) == ConvNet.normalizeFp(v / (dy * dx)).toInt,
          s"seed=$seed ($w x $h) at ($i,$j)")
      }
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

  test("gaussBlur3 is cv2's 3x3/sigma=0 blur: kernel, reflect-101, round-half-up") {
    import graft.operators.ImageDecode
    def frame(w: Int, h: Int, px: (Int, Int) => Int) = {
      import spark.implicits._
      (for (y <- 0 until h; x <- 0 until w)
        yield (0L, y, x, px(y, x).toLong)).toDF("doc_id", "y", "x", "px")
    }
    def outMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getInt(1), r.getInt(2)), r.getLong(3))).toMap
    // impulse at the center of a 5x5 zero frame: interior outputs see
    // no reflection, so they are exactly (w(dy,dx)*16 + 8) div 16 —
    // the raw kernel [1,2,1]x[1,2,1] — and outputs beyond the 3x3
    // support round to 0
    val imp = outMap(ImageDecode.gaussBlur3(
      frame(5, 5, (y, x) => if (y == 2 && x == 2) 16 else 0), 5, 5))
    assert(imp((2, 2)) == 4L && imp((1, 2)) == 2L && imp((2, 1)) == 2L
      && imp((1, 1)) == 1L && imp((3, 3)) == 1L && imp((0, 2)) == 0L)
    // 2x2 frame [1,2;3,4]: reflect-101 makes every tap weight 4, so
    // each output is (4*(1+2+3+4) + 8) div 16 = 3 — hand-derived
    val refl = outMap(ImageDecode.gaussBlur3(
      frame(2, 2, (y, x) => y * 2 + x + 1), 2, 2))
    assert(refl.values.toSet == Set(3L) && refl.size == 4)
  }

  // ---- persisted curation sketch stores --------------------------------

  private def eventWaves(n: Int) = {
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    (0 until n).map(i => ev.filter(col("user_id") % n === i))
  }

  private def hashRows(df: org.apache.spark.sql.DataFrame): String =
    df.collect().map(_.toString).sorted.mkString("\n")

  test("BitmapStore: three-append + merge-compact equals the one-shot build") {
    import graft.sources.BitmapStore
    val base = java.nio.file.Files.createTempDirectory("bitmap_store").toString
    val Seq(w0, w1, w2) = eventWaves(3)
    BitmapStore.write(w0, s"$base/inc")
    BitmapStore.append(w1, s"$base/inc")
    BitmapStore.append(w2, s"$base/inc")
    val (before, after) = BitmapStore.compact(spark, s"$base/inc")
    assert(after < before, s"merge-compact must shrink files ($before -> $after)")
    BitmapStore.write(
      Tables.events(spark, sf).select(col("event_type"), col("user_id")),
      s"$base/one")
    assert(hashRows(BitmapStore.report(spark, s"$base/inc")) ==
      hashRows(BitmapStore.report(spark, s"$base/one")))
    // post-compact each source dir holds exactly one merged file
    val dirs = new java.io.File(s"$base/inc").listFiles()
      .filter(f => f.isDirectory && f.getName.contains("="))
    assert(dirs.nonEmpty && dirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
  }

  test("KmvStore: three-append + merge-compact equals the one-shot sketch") {
    import graft.sources.KmvStore
    val base = java.nio.file.Files.createTempDirectory("kmv_store").toString
    val Seq(w0, w1, w2) = eventWaves(3)
    KmvStore.write(w0, s"$base/inc")
    KmvStore.append(w1, s"$base/inc")
    KmvStore.append(w2, s"$base/inc")
    KmvStore.compact(spark, s"$base/inc")
    KmvStore.write(
      Tables.events(spark, sf).select(col("event_type"), col("user_id")),
      s"$base/one")
    val inc = KmvStore.report(spark, s"$base/inc")
    assert(hashRows(inc) == hashRows(KmvStore.report(spark, s"$base/one")))
    // sketch rows are capped at K per source after compact
    val perSrc = spark.read.parquet(s"$base/inc")
      .groupBy("event_type").count().collect()
    assert(perSrc.nonEmpty && perSrc.forall(_.getLong(1) <= KmvStore.K))
  }

  test("KmvAgg: map-side partial aggregation carries only sketch bytes") {
    // the aggregate must plan as partial + final (ObjectHashAggregate
    // pair), proving rows are discarded before the exchange
    val plan = graft.sources.KmvStore
      .sketchRows(Tables.events(spark, sf).select(col("event_type"), col("user_id")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("kmv_agg"))
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"expected partial+final aggregate pair in:\n$plan")
  }

  test("runKmvIngest: two-wave streamed sketches equal the one-shot KMV store") {
    import graft.sources.KmvStore
    val ev = Tables.events(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("kmv_ingest").toString
    val (src, ckpt, store) = (s"$base/in", s"$base/ckpt", s"$base/sk")
    // waves split by EVENT id, so the same user lands in both waves
    // for some sources — exercising k-smallest-of-union distinctness
    ev.filter(col("event_id") % 2 === 0).write.parquet(src)
    graft.streaming.EventStreams.runKmvIngest(spark, src, ckpt, store)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    graft.streaming.EventStreams.runKmvIngest(spark, src, ckpt, store)
    KmvStore.write(ev.select(col("event_type"), col("user_id")), s"$base/one")
    assert(hashRows(KmvStore.report(spark, store)) ==
      hashRows(KmvStore.report(spark, s"$base/one")),
      "streamed per-batch sketches must merge to the one-shot sketch")
  }

  // ---- StoreMaintenance crash consistency ------------------------------

  test("MaxsimStore: two-wave append equals one-shot, probes prune hash buckets") {
    import graft.sources.MaxsimStore
    val base = java.nio.file.Files.createTempDirectory("maxsim_store").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val q = docs.filter(col("doc_id") < 3)
    MaxsimStore.write(docs, s"$base/one")
    val expected = hashRows(MaxsimStore.search(spark, s"$base/one", q, 5))
    MaxsimStore.write(docs.filter(col("doc_id") % 2 === 0), s"$base/inc")
    MaxsimStore.append(docs.filter(col("doc_id") % 2 === 1), s"$base/inc")
    val res = MaxsimStore.search(spark, s"$base/inc", q, 5)
    assert(hashRows(res) == expected,
      "appended store must answer exactly as the one-shot build")
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[hbkt".r.findFirstIn(plan).nonEmpty,
      s"candidate probe should prune hbkt partitions:\n${plan.take(2000)}")
  }

  test("runMaxsimIngest: two streamed waves equal the one-shot maxsim store") {
    import graft.sources.MaxsimStore
    val base = java.nio.file.Files.createTempDirectory("maxsim_ingest").toString
    val (src, ckpt, store) = (s"$base/in", s"$base/ckpt", s"$base/idx")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    docs.filter(col("doc_id") % 2 === 0).write.parquet(src)
    graft.streaming.EventStreams.runMaxsimIngest(spark, src, ckpt, store)
    docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(src)
    graft.streaming.EventStreams.runMaxsimIngest(spark, src, ckpt, store)
    MaxsimStore.write(docs, s"$base/one")
    val q = docs.filter(col("doc_id") < 3)
    assert(hashRows(MaxsimStore.search(spark, store, q, 5)) ==
      hashRows(MaxsimStore.search(spark, s"$base/one", q, 5)),
      "streamed vector-row appends must serve exactly as the batch build")
  }

  test("runRateIngest: two streamed waves equal the one-shot anomaly ranking") {
    import graft.sources.RateStore
    val ev = Tables.events(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("rate_ingest").toString
    val (src, ckpt, store) = (s"$base/in", s"$base/ckpt", s"$base/rate")
    // disjoint file waves: the checkpointed source delivers each row
    // exactly once, which is what makes additive count shards lossless
    ev.filter(col("event_id") % 2 === 0).write.parquet(src)
    graft.streaming.EventStreams.runRateIngest(spark, src, ckpt, store)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    graft.streaming.EventStreams.runRateIngest(spark, src, ckpt, store)
    RateStore.write(ev.select(col("ts"), col("event_type")), s"$base/one")
    assert(hashRows(RateStore.report(spark, store)) ==
      hashRows(RateStore.report(spark, s"$base/one")),
      "streamed count shards must re-sum to the one-shot series")
  }

  test("compact survives a stale reader and a crash mid-swap (recover)") {
    import graft.sources.{BitmapStore, StoreMaintenance}
    val base = java.nio.file.Files.createTempDirectory("crash_store").toString
    val path = s"$base/idx"
    val Seq(w0, w1, w2) = eventWaves(3)
    BitmapStore.write(w0, path)
    BitmapStore.append(w1, path)
    BitmapStore.append(w2, path)
    val expected = hashRows(BitmapStore.report(spark, path))

    // stale reader: a result materialized BEFORE the swap is
    // unaffected; a lazy plan over the pre-compact listing must be
    // re-planned after the swap (the documented recovery is re-read)
    val stale = spark.read.parquet(path)
    val staleRows = stale.collect() // materialized pre-compact
    StoreMaintenance.compact(spark, path)
    assert(hashRows(BitmapStore.report(spark, path)) == expected)
    assert(staleRows.length > 0)

    // crash mid-swap: rebuild an interrupted state by hand — a
    // committed temp rewrite (parquet + _SUCCESS + manifest) next to a
    // partition dir where the delete phase already removed one file
    val pdir = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.contains("=")).head
    BitmapStore.append(w1, path) // un-compact: add a second file again
    val files = pdir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2)
    val tmp = new java.io.File(path, s".compact_${pdir.getName}")
    spark.read.parquet(pdir.getAbsolutePath)
      .groupBy("bucket").agg(expr("bit_or(bits)").as("bits")).coalesce(1)
      .write.mode("overwrite").parquet(tmp.getAbsolutePath)
    java.nio.file.Files.write(new java.io.File(tmp, "manifest").toPath,
      java.util.Arrays.asList(files.map(_.getName): _*))
    files.head.delete() // the simulated crash: one retire done, rest pending
    val (completed, discarded) = StoreMaintenance.recover(path)
    assert(completed == 1 && discarded == 0)
    assert(hashRows(BitmapStore.report(spark, path)) == expected,
      "recovered store must answer exactly as before the crash")

    // uncommitted temp (no _SUCCESS/manifest) is discarded, store intact
    val junk = new java.io.File(path, s".compact_${pdir.getName}")
    junk.mkdirs()
    java.nio.file.Files.write(new java.io.File(junk, "part-junk.parquet").toPath,
      Array[Byte](1, 2, 3))
    val (c2, d2) = StoreMaintenance.recover(path)
    assert(c2 == 0 && d2 == 1 && !junk.exists())
    assert(hashRows(BitmapStore.report(spark, path)) == expected)
  }

  test("BPE fuse: HF-exact list walk — adjacent repeats merge in-round (r10)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // the list-walk contract t_bpe_train's merge rounds rely on: walk
    // symbols left-to-right, merge whenever (last symbol, next) is the
    // pair — exactly HF's within-round merge semantics (the r8
    // single-pass replace deferred the second of two adjacent
    // occurrences to a later round; closed)
    val out = Seq(" a b a b ", " ab a b ", " x ab y ")
      .toDF("sp")
      .select(TextAnalysis.bpeFuse(col("sp"), "a", "b").as("sp"))
      .as[String].collect()
    assert(out(0) == " ab ab ",
      "BOTH adjacent occurrences must merge in the same round (HF list walk)")
    assert(out(1) == " ab ab ",
      "an occurrence after an already-fused symbol must merge")
    assert(out(2) == " x ab y ",
      "the fuse must never match inside a multi-char symbol")
    // symbol-boundary exactness: 'b a' must not match across 'ab'
    val cross = Seq(" ab a ").toDF("sp")
      .select(TextAnalysis.bpeFuse(col("sp"), "b", "a").as("sp"))
      .as[String].collect()
    assert(cross(0) == " ab a ",
      "'b a' must not match across the 'ab' symbol boundary")
  }

  test("purge with recluster keeps the MIH radius contract exact") {
    import graft.sources.{BqIndexStore, StoreMaintenance}
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("purge_mih").toString
    val full = s"$base/full"
    val rest = s"$base/rest"
    val victims = Seq(3L, 7L, 11L)
    BqIndexStore.writeMih(emb, "vec_id", "embedding", full)
    BqIndexStore.writeMih(emb.filter(!col("vec_id").isin(victims: _*)),
      "vec_id", "embedding", rest)
    val (rewritten, removed) =
      StoreMaintenance.purge(spark, full, "id", victims, recluster = Some("bval"))
    assert(rewritten > 0)
    assert(removed == victims.size * 8L,
      "each vector owns one row per byte-block in the multi-index layout")
    val codes = operators.Knn.corpus(spark, sf).select(col("vec_id"),
      operators.Knn.bqWords(col("v"), 0).as("code_lo"),
      operators.Knn.bqWords(col("v"), 32).as("code_hi"))
    val q = operators.Knn.bqCorruptedQueries(codes)
    def res(p: String): Set[(Long, Long, Long)] =
      BqIndexStore.searchRadius(spark, p, q, radius = 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res(full) == res(rest),
      "purged store must answer exactly like a store never containing the victims")
  }

  test("bloom join filter: no false negatives, real pruning, fp near theory") {
    import graft.operators.Dedup
    val dim = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val nKeys = dim.count()
    val mBits = 32L * ((16L * nKeys + 31L) / 32L)
    val words = Dedup.bloomWords(dim.select(col("c_custkey").as("doc_id"),
      col("c_custkey").cast("string").as("text")), mBits)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("doc_id"),
        col("o_custkey").cast("string").as("text"), col("o_custkey"))
    val hit = Dedup.bloomPositions(orders.select("doc_id", "text"), mBits)
      .join(words, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(min(when(expr("(shiftright(bits, bit) & 1) = 1"), 1).otherwise(0)).as("inb"))
    val passed = hit.filter(col("inb") === 1).count()
    val total = orders.count()
    val exact = orders.join(dim, orders("o_custkey") === dim("c_custkey"), "left_semi").count()
    assert(passed >= exact, "a Bloom filter must never drop a joining row")
    assert(passed < total, "the filter must actually prune the fact side")
    assert(passed - exact <= total * 2 / 100 + 1,
      s"false positives far above theory: passed=$passed exact=$exact total=$total")
  }

  test("purge removes only the targeted ids and rewrites only their partitions") {
    import graft.sources.{IndexStore, StoreMaintenance}
    val base = java.nio.file.Files.createTempDirectory("purge_store").toString
    val path = s"$base/idx"
    val emb = Tables.embeddings(spark, sf)
    IndexStore.write(emb, "vec_id", "embedding", path, dim = 64)
    val index0 = IndexStore.read(spark, path)
    val total = index0.count()
    val victims = Seq(3L, 7L, 11L)
    val victimBands = index0.filter(col("id").isin(victims: _*))
      .select("band0").distinct().collect().map(_.getInt(0)).toSet
    def filesByDir = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.contains("="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet)
      .toMap
    val before = filesByDir
    val (rewritten, removed) = StoreMaintenance.purge(spark, path, "id", victims)
    assert(removed == victims.size.toLong)
    assert(rewritten == victimBands.size)
    val after = filesByDir
    before.foreach { case (d, fs) =>
      if (!victimBands.contains(d.split("=")(1).toInt))
        assert(after(d) == fs, s"untouched partition $d must keep its exact files")
      else
        assert(after(d) != fs, s"hit partition $d must have been rewritten")
    }
    val index1 = IndexStore.read(spark, path)
    assert(index1.count() == total - victims.size)
    assert(index1.filter(col("id").isin(victims: _*)).count() == 0)
    val res = IndexStore.search(index1, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", 5)
    assert(res.count() > 0 &&
      res.filter(col("neighbor_id").isin(victims: _*)).count() == 0,
      "purged ids must never surface in search results again")
    // idempotence: a second purge of the same ids touches nothing
    val before2 = filesByDir
    val (r2, n2) = StoreMaintenance.purge(spark, path, "id", victims)
    assert(r2 == 0 && n2 == 0L && filesByDir == before2)
  }
}
