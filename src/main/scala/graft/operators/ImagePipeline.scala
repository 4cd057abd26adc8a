package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{HashFns => H}

/** Multimodal ingest pipeline — the Spark re-expression of the
  * reference's index-build stage (/root/reference/build_faiss_db.py):
  * image → preprocess (gamma LUT + blur, :40-107) → YOLO-label bbox
  * crop (:168-180) → CNN feature vector (:110-135) → metadata row
  * (:196-201).
  *
  * This environment has no image/torch libraries, so the pixel-level
  * steps are STUBS (deterministic md5-derived fakes) behind the typed
  * API below — the Spark-side plumbing (binary payload column, typed
  * metadata struct, one map-side projection per stage, no shuffles
  * until an aggregation is asked for) is real and is what carries over
  * to a cluster with a real decoder plugged in.
  */
object ImagePipeline {

  /** Typed metadata carried alongside each binary payload. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Attach payload + metadata columns to any frame: `payload` is an
    * opaque binary column; metadata is a typed struct. With a real
    * decoder this is where EXIF/probe data lands.
    */
  def withImageColumns(df: DataFrame, payload: Column, width: Column,
                       height: Column, format: Column): DataFrame =
    df.withColumn("payload", payload)
      .withColumn("img_meta", struct(
        width.cast("int").as("width"), height.cast("int").as("height"),
        format.as("format")))

  /** STUB decode: a real implementation decodes `payload` to pixels.
    * The stub derives a deterministic per-image digest (so downstream
    * stages have a stable value to transform) — md5 of the payload.
    */
  def decodeStub(payload: Column): Column = md5(payload)

  /** Gamma-correction lookup table, γ=1.5 — the reference's exact
    * preprocessing table (build_faiss_db.py:53-54:
    * ((i/255)^(1/γ))·255 as uint8). Computed once, broadcast as a
    * literal array; a real pixel pipeline maps it over bytes.
    */
  def gammaLut(gamma: Double = 1.5): Array[Int] =
    Array.tabulate(256)(i => (math.pow(i / 255.0, 1.0 / gamma) * 255).toInt)

  /** STUB preprocess: marks the digest as gamma+blur processed. */
  def preprocessStub(decoded: Column): Column =
    md5(concat(lit("gamma1.5_blur3x3_"), decoded))

  /** YOLO-label normalized coords → absolute pixel bbox — the exact
    * integer math of build_faiss_db.py:173-177 (python int() truncates
    * toward zero, hence the cast-to-long on doubles).
    */
  def yoloBbox(xc: Column, yc: Column, w: Column, h: Column,
               imgW: Column, imgH: Column): Column = {
    val wAbs = (w * imgW).cast("long")
    val hAbs = (h * imgH).cast("long")
    val x1 = (xc * imgW - wAbs / lit(2.0)).cast("long")
    val y1 = (yc * imgH - hAbs / lit(2.0)).cast("long")
    struct(x1.as("x1"), y1.as("y1"), (x1 + wAbs).as("x2"), (y1 + hAbs).as("y2"),
      wAbs.as("w_abs"), hAbs.as("h_abs"))
  }

  /** STUB feature extraction (ResNet-18 stand-in): deterministic
    * `dim`-dimensional vector in [0,1) from md5 of (payload, dim index).
    * Real impl: mapInPandas/JNI batch inference over the binary column.
    */
  def fakeEmbedding(payload: Column, dim: Int): Column =
    array((1 to dim).map(d =>
      round(H.md5Long(concat(payload, lit("_" + d)), 8) / lit(4294967296.0), 6)): _*)

  // ---- driver-checkable queries (documents as the payload carrier) --

  /** m_bbox: the reference's label→bbox math over synthetic-but-
    * deterministic normalized coords derived from doc_id. Image dims
    * fixed 640×480 like a YOLO input.
    */
  def mBbox(spark: SparkSession, dir: String): DataFrame = {
    val xc = (col("doc_id") % 97 + 1) / lit(100.0)
    val yc = (col("doc_id") % 89 + 1) / lit(100.0)
    val w = (col("doc_id") % 23 + 1) / lit(100.0)
    val h = (col("doc_id") % 19 + 1) / lit(100.0)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        yoloBbox(xc, yc, w, h, lit(640), lit(480)).as("bb"))
      .select(col("doc_id"), col("bb.x1").as("x1"), col("bb.y1").as("y1"),
        col("bb.x2").as("x2"), col("bb.y2").as("y2"),
        col("bb.w_abs").as("w_abs"), col("bb.h_abs").as("h_abs"))
      .orderBy("doc_id")
  }

  /** m_gamma_lut: the reference's gamma-correction lookup table (γ=1.5,
    * build_faiss_db.py:53-54) computed as an engine query —
    * ((i/255)^(1/γ))·255 truncated toward zero, for each intensity
    * present in the data (doc_id mod 256 covers all 256).
    */
  def mGammaLut(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select((col("doc_id") % 256).as("intensity"))
      .distinct()
      .withColumn("lut",
        (pow(col("intensity") / lit(255.0), lit(1.0) / lit(1.5)) * 255).cast("long"))
      .orderBy("intensity")

  /** m_clahe_hist: the histogram core of the reference's alternative
    * CLAHE preprocessing path (app.py:60-66 — clip-limited adaptive
    * histogram equalization). Per tile: intensity histogram, counts
    * clipped at the limit, clipped excess redistributed evenly across
    * the tile's occupied bins (integer arithmetic end-to-end so the
    * oracle matches bit-exactly). One shuffle for the histogram, one
    * window for the per-tile totals.
    */
  def mClaheHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clipLimit = 5L
    val hist = Tables.documents(spark, dir)
      .select((col("doc_id") % 4).as("tile"), (col("doc_id") % 256).as("intensity"))
      .groupBy("tile", "intensity")
      .agg(count(lit(1)).as("n"))
      .withColumn("clipped", least(col("n"), lit(clipLimit)))
    val byTile = Window.partitionBy("tile")
    hist
      .withColumn("excess", sum(col("n") - col("clipped")).over(byTile))
      .withColumn("n_bins", count(lit(1)).over(byTile))
      .select(col("tile"), col("intensity"), col("n"), col("clipped"),
        expr("clipped + (excess div n_bins)").as("equalized"))
      .orderBy("tile", "intensity")
  }

  /** m_frame_sample: video frame-sampling plumbing — given per-asset
    * frame counts (deterministic fakes of probe metadata: a real
    * pipeline reads them from the container header), emit the sampled
    * frame indices (≈8 evenly spaced) and their timestamps. The
    * sequence+explode shape is the real Spark-side plumbing a frame
    * extractor UDF batches over; only the decode is a stub.
    */
  /** m_shot_detect: video shot-boundary detection — consecutive-frame
    * histogram differencing, the standard first pass of any video
    * curation pipeline (split into shots, then sample/caption per
    * shot). Each synthetic "video" (doc_id < 30, n = doc_id%60+30
    * frames, shot length doc_id%5+8) carries an 8-bin gray histogram
    * per frame: a per-SCENE md5 base + small per-frame md5 noise, so
    * within a shot the L1 distance between consecutive histograms is
    * ≤ 56 while across a cut it is ~680 — threshold 200 separates
    * them exactly, keeping the detector oracle-checkable (the oracle
    * recomputes the same closed form; the ground-truth scene id never
    * reaches the detector, only the histograms do).
    *
    * Scale shape: histograms are one map-side array projection; the
    * only shuffle is the per-video lag window (partitioned by doc_id,
    * like q_sessionize — each video sorts independently); the L1 fold
    * is exact int64 arithmetic.
    */
  def mShotDetect(spark: SparkSession, dir: String): DataFrame = {
    val frames = Tables.documents(spark, dir)
      .filter(col("doc_id") < 30)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("doc_id") % 60 + 29)).as("frame"))
      .withColumn("scene",
        floor(col("frame") / (col("doc_id") % 5 + 8)).cast("long"))
    val hist = frames.withColumn("hist",
      transform(sequence(lit(0), lit(7)), b =>
        H.md5Long(concat(lit("hist_"), col("doc_id").cast("string"), lit("_"),
          col("scene").cast("string"), lit("_"), b.cast("string")), 2) +
        H.md5Long(concat(lit("nz_"), col("doc_id").cast("string"), lit("_"),
          col("frame").cast("string"), lit("_"), b.cast("string")), 1) % 8))
    val w = Window.partitionBy("doc_id").orderBy("frame")
    hist.withColumn("prev", lag(col("hist"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("l1_dist",
        aggregate(zip_with(col("hist"), col("prev"), (a, b) => abs(a - b)),
          lit(0L), (acc, x) => acc + x))
      .filter(col("l1_dist") > 200)
      .select(col("doc_id"), col("frame"), col("l1_dist"))
      .orderBy("doc_id", "frame")
  }

  /** m_video_dedup: video near-dup detection by sampled-frame
    * signature overlap — the video twin of d_minhash: sample ~8
    * frames per video, hash each frame's CONTENT, and two videos are
    * near-dups when their frame-hash sets overlap (the re-upload /
    * re-encode case: same footage, slightly different length). The
    * synthetic corpus has 20 contents × 2 copies (content =
    * doc_id % 20, copies drift by 3 frames), so copy pairs overlap
    * heavily and cross-content pairs share nothing. Scale shape: the
    * pair space comes from an equi-join on the frame hash (inverted
    * index — only videos sharing a frame ever meet), then per-pair
    * counts; never an all-pairs product.
    */
  def mVideoDedup(spark: SparkSession, dir: String): DataFrame = {
    val content = col("doc_id") % 20
    val frames = Tables.documents(spark, dir)
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), content.as("content"),
        (content * 7 + 30 + floor(col("doc_id") / 20).cast("long") * 3).as("n_frames"))
      .withColumn("step", greatest(lit(1L), floor(col("n_frames") / 8)))
      .select(col("doc_id"), col("content"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("step"))).as("idx"))
    val sig = frames.select(col("doc_id"),
      H.md5Long(concat(lit("vf_"), col("content").cast("string"), lit("_"),
        col("idx").cast("string")), 15).as("fh"))
    val cnt = sig.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val shared = sig.select(col("doc_id").as("doc1"), col("fh"))
      .join(sig.select(col("doc_id").as("doc2"), col("fh").as("fh2")),
        col("fh") === col("fh2") && col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("n_shared"))
    shared
      .join(cnt.select(col("doc_id").as("doc1"), col("nf").as("n1")), "doc1")
      .join(cnt.select(col("doc_id").as("doc2"), col("nf").as("n2")), "doc2")
      .filter(col("n_shared").cast("double")
        / (col("n1") + col("n2") - col("n_shared")) >= 0.3)
      .select(col("doc1"), col("doc2"), col("n_shared"), col("n1"), col("n2"),
        round(col("n_shared").cast("double")
          / (col("n1") + col("n2") - col("n_shared")), 6).as("jaccard"))
      .orderBy("doc1", "doc2")
  }

  def mFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val fps = 30
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), (col("doc_id") % 240 + 30).as("n_frames"))
      .withColumn("step", greatest(lit(1L), floor(col("n_frames") / 8)))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("step"))).as("frame_idx"))
      .withColumn("sample_ms", expr(s"(frame_idx * 1000) div $fps"))
      .orderBy("doc_id", "frame_idx")
  }

  /** m_gauss_blur: the reference's Gaussian-blur preprocessing step
    * (build_faiss_db.py:40-107 gamma+blur pipeline) as a distributed
    * stencil: a 5×5 binomial kernel ([1,4,6,4,1]⊗[1,4,6,4,1]/256 — the
    * standard integer Gaussian approximation, exact in int64)
    * convolved over deterministic 16×16 fake images (md5-derived
    * pixels; a real decoder lands here). The convolution is a
    * broadcast join of the pixel table against the 25-row offset
    * table + one group-by on output coordinates — the
    * stencil-as-equi-join shape that partitions by image at any scale.
    * Zero padding falls out of the inner join (out-of-range sources
    * contribute nothing).
    */
  def mGaussBlur(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = 16
    val px = Tables.documents(spark, dir)
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), explode(sequence(lit(0), lit(n - 1))).as("y"))
      .select(col("doc_id"), col("y"), explode(sequence(lit(0), lit(n - 1))).as("x"))
      .withColumn("px", H.md5Long(
        concat(lit("px_"), col("doc_id").cast("string"), lit("_"),
          col("y").cast("string"), lit("_"), col("x").cast("string")), 2))
    val w1 = Map(0 -> 6L, 1 -> 4L, 2 -> 1L)
    val offs = (for (dy <- -2 to 2; dx <- -2 to 2)
      yield (dy, dx, w1(math.abs(dy)) * w1(math.abs(dx)))).toSeq
      .toDF("dy", "dx", "wgt")
    val conv = px.join(broadcast(offs))
      .select(col("doc_id"), (col("y") + col("dy")).as("yo"),
        (col("x") + col("dx")).as("xo"), (col("wgt") * col("px")).as("contrib"))
      .filter(col("yo") >= 0 && col("yo") < n && col("xo") >= 0 && col("xo") < n)
      .groupBy("doc_id", "yo", "xo")
      .agg(sum(col("contrib")).as("b256"))
    conv.select(col("doc_id"), expr("b256 div 256").as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_px"), sum(col("b")).as("sum_b"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .orderBy("doc_id")
  }

  /** m_audio_energy: audio feature-extraction plumbing — framewise
    * energy/RMS over deterministic fake PCM samples (md5-derived
    * int8; a real decoder emits the same (asset, sample) long format
    * from the binary payload). Energy is an exact integer sum of
    * squares per frame; only the final RMS touches FP (rounded 6 dp
    * both sides). Shape: sequence+explode then one group-by on
    * (asset, frame) — partition-local when assets are the partition
    * key.
    */
  /** m_audio_resample: linear-interpolation sample-rate conversion —
    * the audio twin of m_resize (the preprocessing step that puts
    * heterogeneous-rate audio on the model's fixed input rate). Each
    * doc's 512-sample synthetic PCM clip (same md5 source as
    * m_audio_energy) resamples to 320 samples: output j reads source
    * position p = j·511/319, out = s₀·(1−frac) + s₁·frac. One
    * codegen'd projection per output sample — sequence/explode, two
    * md5 taps, no shuffle until the per-doc aggregate. Results fold
    * to integer-quantized checksums (q = round(out·1000)) so the
    * per-doc sums are order-independent exact int64 arithmetic — the
    * same fp-ambiguity dodge as m_audio_energy's integer energy.
    */
  def mAudioResample(spark: SparkSession, dir: String): DataFrame = {
    val nIn = 512
    val nOut = 320
    def sampleAt(doc: Column, i: Column): Column =
      (H.md5Long(concat(lit("pcm_"), doc.cast("string"), lit("_"),
        i.cast("string")), 2) - 128).cast("double")
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(sequence(lit(0), lit(nOut - 1))).as("j"))
      .withColumn("p", col("j") * lit(nIn - 1) / lit((nOut - 1).toDouble))
      .withColumn("i0", floor(col("p")).cast("long"))
      .withColumn("fr", col("p") - col("i0"))
      .withColumn("out",
        sampleAt(col("doc_id"), col("i0")) * (lit(1.0) - col("fr")) +
          sampleAt(col("doc_id"), least(col("i0") + 1, lit(nIn - 1).cast("long"))) * col("fr"))
      .withColumn("q", round(col("out") * 1000, 0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_out"), sum(col("q")).as("checksum"),
        sum(col("q") * col("q")).as("sumsq"))
      .select(col("doc_id"), col("n_out"), col("checksum"), col("sumsq"),
        round(sqrt(col("sumsq").cast("double") / col("n_out")) / 1000, 6).as("rms"))
      .orderBy("doc_id")
  }

  def mAudioEnergy(spark: SparkSession, dir: String): DataFrame = {
    val frames = 8
    val spf = 64 // samples per frame
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(sequence(lit(0), lit(frames - 1))).as("frame"))
      .select(col("doc_id"), col("frame"),
        explode(sequence(lit(0), lit(spf - 1))).as("i"))
      .withColumn("s", H.md5Long(
        concat(lit("pcm_"), col("doc_id").cast("string"), lit("_"),
          (col("frame") * spf + col("i")).cast("string")), 2) - 128)
      .groupBy("doc_id", "frame")
      .agg(count(lit(1)).as("n_samples"),
        sum(col("s") * col("s")).as("energy"))
      .select(col("doc_id"), col("frame").cast("long").as("frame"),
        col("n_samples"), col("energy"),
        round(sqrt(col("energy") / lit(spf.toDouble)), 6).as("rms"))
      .orderBy("doc_id", "frame")
  }

  /** m_audio_fp: the Haitsma–Kalker robust audio fingerprint (the
    * published Philips algorithm behind broadcast-monitoring /
    * audio-dedup systems) over the synthetic PCM frames: per frame,
    * 8 band energies (integer Σs² over 8-sample bands); bit(f, b) =
    * sign of the TIME-DIFFERENCE of the BAND-DIFFERENCE,
    * (E(f,b)−E(f,b+1)) − (E(f−1,b)−E(f−1,b+1)) > 0 — 7 frame pairs ×
    * 7 band pairs = 49 bits packed into one long per asset. All
    * integer arithmetic, so the fingerprint is engine-exact and the
    * oracle replays it bit-for-bit; near-dup audio lookup is then
    * Hamming over these words (the m_phash_pairs / MIH machinery
    * applies unchanged). Scale shape: one (doc, frame, band)
    * aggregation, two tiny window passes, one per-doc fold — a single
    * shuffle on doc_id at any corpus size.
    */
  def mAudioFp(spark: SparkSession, dir: String): DataFrame = {
    val frames = 8
    val spf = 64
    val e = Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(sequence(lit(0), lit(frames - 1))).as("frame"))
      .select(col("doc_id"), col("frame"),
        explode(sequence(lit(0), lit(spf - 1))).as("i"))
      .withColumn("s", H.md5Long(
        concat(lit("pcm_"), col("doc_id").cast("string"), lit("_"),
          (col("frame") * spf + col("i")).cast("string")), 2) - 128)
      .groupBy(col("doc_id"), col("frame"), expr("i div 8").as("band"))
      .agg(sum(col("s") * col("s")).as("en"))
    val wB = Window.partitionBy("doc_id", "frame").orderBy("band")
    val d = e.withColumn("dd", col("en") - lead(col("en"), 1).over(wB))
      .filter(col("band") < 7)
    val wF = Window.partitionBy("doc_id", "band").orderBy("frame")
    d.withColumn("bit",
        when(col("dd") - lag(col("dd"), 1).over(wF) > 0, 1L).otherwise(0L))
      .filter(col("frame") >= 1)
      .groupBy("doc_id")
      .agg(sum(expr("shiftleft(bit, cast((frame - 1) * 7 + band as int))")).as("fp"),
        sum(col("bit")).as("n_bits"))
      .orderBy("doc_id")
  }

  /** Fixed-point DCT-II basis: C(u,y) = round(cos(π·(2y+1)·u/32)·10⁴)
    * for a 16-point transform. Computed once driver-side and inlined
    * as literals into BOTH the Spark plan and the SQL oracle, so no
    * engine ever evaluates cos() — the whole pHash derivation below is
    * exact integer arithmetic.
    */
  val dctBasis: Seq[(Int, Int, Long)] =
    for (u <- 0 until 16; y <- 0 until 16)
      yield (u, y, math.round(math.cos(math.Pi * (2 * y + 1) * u / 32.0) * 10000))

  /** m_phash: perceptual image hash — the image near-dup fingerprint
    * (pHash): 2-D DCT of the 16×16 image, keep the low-frequency 8×8
    * block minus DC, hash = which coefficients exceed the median. Two
    * deterministic fakes stand in for decode (md5 pixels); everything
    * downstream is the real algorithm. The DCT is SEPARABLE and each
    * 1-D pass is a stencil-as-equi-join against the broadcast basis
    * table + a group-by — rows × 16 fan-out per pass, never rows²;
    * partitioned by image id at any scale. The median is an exact
    * order statistic (rank-32 of 63) via one tiny window.
    */
  def mPhash(spark: SparkSession, dir: String): DataFrame =
    phashTable(spark, dir, 50)

  /** (doc_id, phash, n_bits, median) for the first `nDocs` assets —
    * shared by m_phash and m_phash_pairs.
    */
  private def phashTable(spark: SparkSession, dir: String, nDocs: Int): DataFrame = {
    val n = 16
    val px = Tables.documents(spark, dir)
      .filter(col("doc_id") < nDocs)
      .select(col("doc_id"), explode(sequence(lit(0), lit(n - 1))).as("y"))
      .select(col("doc_id"), col("y"), explode(sequence(lit(0), lit(n - 1))).as("x"))
      .withColumn("px", H.md5Long(
        concat(lit("px_"), col("doc_id").cast("string"), lit("_"),
          col("y").cast("string"), lit("_"), col("x").cast("string")), 2))
    phashFromFrame(px)
  }

  /** The pHash derivation proper over any 16×16 (doc_id, y, x, px)
    * pixel frame — shared by the md5-synthesized path above and the
    * REAL javax.imageio decode path (ImageDecode.mDecodePhash), so the
    * fingerprint is identical no matter which decode produced the
    * pixels.
    */
  private[graft] def phashFromFrame(px: DataFrame): DataFrame = {
    val spark = px.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val basis = dctBasis.toDF("bu", "by", "cw")
    // pass 1: T(u, x) = Σ_y C(u,y)·P(y,x)
    val t = px.join(broadcast(basis), col("y") === col("by"))
      .groupBy(col("doc_id"), col("bu").as("u"), col("x"))
      .agg(sum(col("cw") * col("px")).as("t"))
    // pass 2: D(u, v) = Σ_x C(v,x)·T(u,x), low-frequency 8×8 minus DC
    val d = t.join(broadcast(basis.toDF("bv", "bx", "cw2")), col("x") === col("bx"))
      .groupBy(col("doc_id"), col("u"), col("bv").as("v"))
      .agg(sum(col("cw2") * col("t")).as("coef"))
      .filter(col("u") < 8 && col("v") < 8 && !(col("u") === 0 && col("v") === 0))
    // median = exact rank-32 of the 63 coefficients (ties by (u,v))
    val w = Window.partitionBy("doc_id").orderBy(col("coef").asc, col("u").asc, col("v").asc)
    val ranked = d.withColumn("rk", row_number().over(w))
    val med = ranked.filter(col("rk") === 32)
      .select(col("doc_id").as("md"), col("coef").as("median"))
    // bit index u·8+v−1 ∈ [0,62] (DC excluded) keeps every power and
    // the sum inside positive int64 on both engines
    ranked.join(med, col("doc_id") === col("md"))
      .groupBy("doc_id")
      .agg(sum(when(col("coef") > col("median"),
          expr("shiftleft(CAST(1 AS BIGINT), u * 8 + v - 1)")).otherwise(0L)).as("phash"),
        count(when(col("coef") > col("median"), 1)).as("n_bits"),
        max(col("median")).as("median"))
      .orderBy("doc_id")
  }

  /** m_phash_pairs: nearest image pairs by perceptual-hash hamming
    * distance — candidates come from byte-position pigeonhole blocking
    * (pairs sharing any of the hash's 8 bytes at the same position:
    * an equi-join on (position, byte), the d_simhash_pairs pattern),
    * exact bit_count(xor) hamming only on candidates, top-20 closest.
    * The pair space is never materialized beyond the shared-byte
    * buckets, which is what survives a billion images.
    */
  def mPhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val ph = phashTable(spark, dir, 100).select(col("doc_id"), col("phash"))
      .transform(graft.Materialize.forceCached) // feeds both sides of the byte-bucket self-join
    val bytes = ph.select(col("doc_id"), col("phash"),
      explode(sequence(lit(0), lit(7))).as("k"))
      .withColumn("byte", expr("(phash >> (k * 8)) & 255"))
    val cands = bytes.select(col("doc_id").as("doc1"), col("phash").as("h1"),
        col("k"), col("byte"))
      .join(bytes.select(col("doc_id").as("doc2"), col("phash").as("h2"),
        col("k").as("k2"), col("byte").as("b2")),
        col("k") === col("k2") && col("byte") === col("b2") && col("doc1") < col("doc2"))
      .select("doc1", "doc2", "h1", "h2").distinct()
    cands
      .withColumn("hamming", expr("bit_count(h1 ^ h2)").cast("long"))
      .select("doc1", "doc2", "hamming")
      .orderBy(col("hamming").asc, col("doc1").asc, col("doc2").asc)
      .limit(20)
  }

  /** m_resize: image downsampling plumbing — 16×16 → 8×8 by 2×2 box
    * averaging over the deterministic fake pixels (a real decoder's
    * resize step before the CNN; the reference resizes crops for
    * ResNet input). Integer-exact: each output pixel is the floor
    * mean of its 4 sources. The gather is a map-side coordinate
    * group-by (yo = y div 2), no joins at all.
    */
  /** m_clahe: FULL clip-limited adaptive histogram equalization — the
    * reference's alternative preprocess (app.py:60-66,
    * cv2.createCLAHE(clipLimit, tileGridSize=(8,8))) including the
    * per-pixel bilinear blend of the 4 surrounding tiles' equalization
    * curves that makes CLAHE "adaptive" (m_clahe_hist keeps only the
    * histogram core). Integer-exact fixed-point adaptation:
    *
    *  - synthetic 32×32 image per doc (md5-derived intensities), 4×4
    *    grid of 8×8 tiles;
    *  - per tile: histogram clipped at 5, excess redistributed evenly
    *    over all 256 bins (excess div 256), CDF → mapping
    *    m(i) = (cdf(i)·255) div tileArea — a 256-entry integer LUT
    *    built as one transform/aggregate expression per tile;
    *  - per pixel: corner tiles via doubled-coordinate arithmetic
    *    (pc = clamp(2x−7, 0, 48); tile = pc div 16; frac = pc mod 16),
    *    blend = Σ m_corner·w_corner with /16 fixed-point weights,
    *    div 256 — cv2's border-replicate behavior at the edges.
    *
    * Scale shape: one shuffle for the per-tile histograms, tile LUTs
    * are tiny and broadcast, the per-pixel blend is 4 broadcast
    * equi-joins + a map-side projection. Output: per-row intensity
    * stats after equalization.
    */
  def mClahe(spark: SparkSession, dir: String): DataFrame =
    claheFromFrame(
      Tables.documents(spark, dir).filter(col("doc_id") < 2).select("doc_id")
        .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("y"))
        .select(col("doc_id"), col("y"), explode(sequence(lit(0), lit(31))).as("x"))
        .withColumn("px", H.md5Long(
          concat(lit("cl_"), col("doc_id").cast("string"), lit("_"),
            col("y").cast("string"), lit("_"), col("x").cast("string")), 2)))

  /** CLAHE core over any 32×32 (doc_id, y, x, px) frame — factored so
    * the md5-synthesized gate (m_clahe) and the REAL-decode gate
    * (m_decode_clahe, ImageDecode) run the identical adaptation: only
    * where the pixels came from differs.
    */
  def claheFromFrame(frame: DataFrame): DataFrame = {
    val px = frame.withColumn("t", expr("(y div 8) * 4 + (x div 8)"))
    val tiles = px
      .groupBy("doc_id", "t", "px").agg(count(lit(1)).as("n"))
      .withColumn("clipped", least(col("n"), lit(5L)))
      .groupBy("doc_id", "t")
      .agg(sum(col("n") - col("clipped")).as("excess"),
        collect_list(struct(col("px").as("intensity"), col("clipped"))).as("occ"))
      .withColumn("lut", expr(
        """transform(sequence(0, 255), i ->
             ((aggregate(occ, 0L, (acc, s) -> acc + IF(s.intensity <= i, s.clipped, 0L))
               + CAST(i + 1 AS BIGINT) * (excess div 256)) * 255) div 64)"""))
      .select(col("doc_id").as("td"), col("t").as("tt"), col("lut"))
    def corner(c: Column): Column = least(greatest(c * 2 - 7, lit(0)), lit(48))
    val corners = px.drop("t")
      .withColumn("pcx", corner(col("x"))).withColumn("pcy", corner(col("y")))
      .withColumn("tx0", expr("pcx div 16")).withColumn("qx", col("pcx") % 16)
      .withColumn("ty0", expr("pcy div 16")).withColumn("qy", col("pcy") % 16)
      .withColumn("tx1", least(col("tx0") + 1, lit(3)))
      .withColumn("ty1", least(col("ty0") + 1, lit(3)))
    def lutJoin(df: DataFrame, ty: String, tx: String, out: String): DataFrame =
      df.join(broadcast(tiles),
          col("doc_id") === col("td") && col(ty) * 4 + col(tx) === col("tt"))
        .withColumn(out, element_at(col("lut"), col("px").cast("int") + 1))
        .drop("td", "tt", "lut")
    val blended = lutJoin(lutJoin(lutJoin(lutJoin(
        corners, "ty0", "tx0", "mtl"), "ty0", "tx1", "mtr"),
        "ty1", "tx0", "mbl"), "ty1", "tx1", "mbr")
      .withColumn("m", expr(
        """(mtl * (16 - qx) * (16 - qy) + mtr * qx * (16 - qy)
           + mbl * (16 - qx) * qy + mbr * qx * qy) div 256"""))
    blended.groupBy(col("doc_id"), col("y").cast("long").as("y"))
      .agg(count(lit(1)).as("n_px"), sum("m").as("sum_m"),
        min("m").as("min_m"), max("m").as("max_m"))
      .orderBy("doc_id", "y")
  }

  def mResize(spark: SparkSession, dir: String): DataFrame = {
    val n = 16
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(sequence(lit(0), lit(n - 1))).as("y"))
      .select(col("doc_id"), col("y"), explode(sequence(lit(0), lit(n - 1))).as("x"))
      .withColumn("px", H.md5Long(
        concat(lit("px_"), col("doc_id").cast("string"), lit("_"),
          col("y").cast("string"), lit("_"), col("x").cast("string")), 2))
      .groupBy(col("doc_id"), expr("y div 2").as("yo"), expr("x div 2").as("xo"))
      .agg(expr("sum(px) div 4").as("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_px"), sum(col("p")).as("sum_p"),
        min(col("p")).as("min_p"), max(col("p")).as("max_p"))
      .orderBy("doc_id")
  }

  /** m_resize_bilinear: torchvision's Resize(shortest-side, BILINEAR)
    * → CenterCrop → Normalize(mean, std) as ONE map-side array
    * projection — the exact fixed-point preprocess ConvNet.preprocess
    * runs inside m_pipeline_real (the reference transform's order,
    * build_faiss_db.py:119-123), gated standalone over variable-
    * aspect synthetic frames (w 6–12 × h 5–9 exercises both up- and
    * down-scales and the round-half-up long side). Arithmetic:
    * half-pixel-center sampling position ((2t+1)·S − T)/(2T) in exact
    * integer numerator/denominator form, edge clamp below 0, one
    * floor division per pixel; Normalize((v/255 − .449)/.226) in
    * thousandths with every division on a non-negative operand.
    * Scale shape: the pixel grid materializes once per document (a
    * plain column — no join), each target position's gather is a
    * small SCALAR codegen unit over it (one giant 64-wide array
    * expression would serialize multi-MB interpreted projections to
    * every task — measured 4x slower), and the only exchange is the
    * per-doc stats rollup; at 100 TB the per-pixel math stays
    * map-side CPU exactly like the decode stages. The weighted
    * checksum pins every output positionally.
    */
  def mResizeBilinear(spark: SparkSession, dir: String): DataFrame = {
    val R = 10L
    // floor division for non-negative operands as ONE division node:
    // long/long promotes to double, and at these magnitudes (≤ 2.6e8
    // over divisors ≥ 2) the true quotient sits ≥ 1/3600 away from
    // the next integer while a double's half-ulp there is ~1e-10, so
    // floor() of the rounded quotient is the exact integer floor —
    // the (a - pmod)/b form duplicates `a`, and the nested bilinear
    // arithmetic turns that duplication exponential (measured: a
    // multi-MB generated projection, 2s of per-task codegen)
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val d = Tables.documents(spark, dir).filter(col("doc_id") < 30)
      .select(col("doc_id"),
        (col("doc_id") % 7 + 6).cast("long").as("w"),
        (col("doc_id") % 5 + 5).cast("long").as("h"))
      .withColumn("nw", when(col("w") <= col("h"), lit(R))
        .otherwise(idiv(lit(2L) * col("w") * R + col("h"), lit(2L) * col("h"))))
      .withColumn("nh", when(col("w") <= col("h"),
          idiv(lit(2L) * col("h") * R + col("w"), lit(2L) * col("w")))
        .otherwise(lit(R)))
    // one row per (doc, target position): the bilinear sample is a
    // SCALAR codegen expression that derives its 4 source pixels'
    // md5 values directly from their coordinates — no per-doc pixel
    // array, no higher-order functions, nothing interpreted; the only
    // exchange is the per-doc stats rollup
    val t = idiv(col("t"), lit(8L)) // target row i; col j = t mod 8
    val j = pmod(col("t"), lit(8L))
    val yd = lit(2L) * col("nh")
    val xd = lit(2L) * col("nw")
    // negative sample positions clamp to the edge: greatest(num, 0)
    // gives (i0 = 0, frac = 0) without a when() that would duplicate
    // the num subtree in both branches
    val gy = greatest(
      (lit(2L) * (idiv(col("nh") - 8, lit(2L)) + t) + 1) * col("h") - col("nh"), lit(0L))
    val gx = greatest(
      (lit(2L) * (idiv(col("nw") - 8, lit(2L)) + j) + 1) * col("w") - col("nw"), lit(0L))
    val y0 = idiv(gy, yd)
    val fy = gy - y0 * yd
    val y1 = least(y0 + 1, col("h") - 1)
    val x0 = idiv(gx, xd)
    val fx = gx - x0 * xd
    val x1 = least(x0 + 1, col("w") - 1)
    def p(yy: Column, xx: Column): Column =
      H.md5Long(concat(lit("bl_"), col("doc_id").cast("string"), lit("_"),
        yy.cast("string"), lit("_"), xx.cast("string")), 2)
    val v = (yd - fy) * ((xd - fx) * p(y0, x0) + fx * p(y0, x1)) +
      fy * ((xd - fx) * p(y1, x0) + fx * p(y1, x1))
    val bpx = idiv(v, yd * xd)
    val n = idiv(idiv(bpx * lit(1000000L), lit(255L)) - 449000L + 452000L,
      lit(226L)) - 2000L
    d.select(col("doc_id"), col("w"), col("h"), col("nw"), col("nh"),
        explode(sequence(lit(0L), lit(63L))).as("t"))
      .withColumn("n", n)
      .groupBy("doc_id", "w", "h", "nw", "nh")
      .agg(sum(col("n")).as("sum_n"),
        min(col("n")).as("min_n"), max(col("n")).as("max_n"),
        sum(col("n") * (col("t") + 1)).as("wsum"))
      .orderBy("doc_id")
  }

  /** m_fake_embed: stub featurizer over the documents payload, long
    * format (doc_id, d, f) — the embedding column a real decoder would
    * produce, restricted to 10 docs × 8 dims for the correctness dump.
    */
  def mFakeEmbed(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 10)
      .select(col("doc_id"),
        posexplode(fakeEmbedding(col("text"), 8)).as(Seq("d0", "f")))
      .select(col("doc_id"), (col("d0") + 1).cast("long").as("d"), col("f"))
      .orderBy("doc_id", "d")

  /** m_meta_paths: the reference's metadata path canonicalization
    * (app.py:163-170) as a queryable projection — stored cropped-image
    * paths arrive with mixed separators (the reference's metadata.pkl
    * was written on Windows, so its relative paths use backslashes),
    * and presentation normalizes every backslash to a slash before
    * joining with the app's base directory. Raw paths are derived
    * deterministically from (vec_id, label) with both separator
    * styles exercised by parity; canonicalization is one map-side
    * translate + concat, oracle-replayed verbatim.
    */
  def mMetaPaths(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
      .withColumn("raw_path",
        when(col("vec_id") % 2 === 0,
          concat(lit("output\\cropped_images\\class_"), col("label").cast("string"),
                 lit("\\img_"), col("vec_id").cast("string"), lit(".jpg")))
        .otherwise(
          concat(lit("output/cropped_images/class_"), col("label").cast("string"),
                 lit("/img_"), col("vec_id").cast("string"), lit(".jpg"))))
      .withColumn("final_path",
        concat(lit("/srv/graft_app/"), translate(col("raw_path"), "\\", "/")))
      .select("vec_id", "raw_path", "final_path")
      .orderBy("vec_id")
}
