package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL pixel decode for the multimodal pipeline — `javax.imageio`
  * (public JDK API, present in any JVM) turns PNG/BMP payload bytes
  * into the integer grayscale pixel frame (id, y, x, px ∈ [0,255])
  * that the γ-LUT / Gaussian-blur / CLAHE / pHash stencils already
  * consume, replacing the md5 decode stub for payloads that are
  * actual images. This is the Spark-side re-expression of the
  * reference's `cv2.imread` → grayscale step
  * (/root/reference/build_faiss_db.py:72-83); only the CNN models
  * remain fakes (no torch in this environment).
  *
  * Scale shape: decode is a per-row library call with no cross-row
  * state, so `pixelFrame` is one narrow flatMap stage — no shuffle, no
  * collect, partitioned by whatever partitions the payload table. The
  * w×h fan-out per image is the same row multiplicity every stencil
  * downstream already budgets for.
  */
object ImageDecode {

  /** ITU-R BT.601 integer luma — the same weights cv2's grayscale
    * conversion uses, as exact integer arithmetic:
    * (299·R + 587·G + 114·B) div 1000. For a gray pixel (v,v,v) this
    * is exactly v, which the spec exploits for round-trip checks.
    */
  def gray(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff
    val g = (rgb >> 8) & 0xff
    val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Decode one payload to (width, height, row-major gray pixels).
    * Throws on undecodable bytes — a real ingest wraps this in its
    * quarantine policy; the engine does not silently fabricate pixels.
    */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img: BufferedImage = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = gray(img.getRGB(x, y)); x += 1 }
      y += 1
    }
    (w, h, px)
  }

  /** Binary payload column → (id, y, x, px) pixel frame. The decode
    * boundary is per-row imperative by nature (a codec library call —
    * the same justification as the batched-inference stages); every
    * transform downstream of this frame stays declarative and feeds
    * the existing stencil operators unchanged.
    */
  def pixelFrame(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val (w, h, px) = decodeGray(bytes)
        for (y <- 0 until h; x <- 0 until w) yield (id, y, x, px(y * w + x))
      }
      .toDF(idCol, "y", "x", "px")
  }

  /** m_decode_lut: REAL image decode inside the oracle gate. Synthetic
    * PNGs are generated from the closed form px(x,y) = (seed + 7y +
    * 13x) mod 256 (seed = 31·doc_id + 5), pushed through the actual
    * javax.imageio decode (PNG is lossless and BT.601 luma of a gray
    * pixel is the identity, so decode ∘ encode is exactly the closed
    * form), then the reference's γ=1.5 LUT and a per-image summary.
    * The DuckDB oracle never decodes an image — it evaluates the
    * closed form directly — so a hash match proves the whole
    * encode → decode → LUT path is bit-exact. Payload generation is a
    * fixture map (same per-row codec boundary class as the decode
    * itself); everything after pixelFrame is declarative.
    */
  /** Decoded pixel frames for the gate queries: 8 synthetic 16×12
    * PNGs (seed 31·doc_id + 5) through the REAL decode path.
    */
  private[operators] def decodedFrames(spark: SparkSession, dir: String,
                                       w: Int = 16, h: Int = 12,
                                       nDocs: Int = 8): DataFrame = {
    import spark.implicits._
    val payloads = graft.Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") < nDocs)
      .as[Long]
      .map(id => (id, syntheticPng(w, h, seed = (31 * id + 5).toInt)))
      .toDF("doc_id", "payload")
    pixelFrame(payloads, "doc_id", "payload")
  }

  def mDecodeLut(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    decodedFrames(spark, dir)
      .withColumn("lut",
        (pow(col("px") / lit(255.0), lit(1.0) / lit(1.5)) * 255).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_px"),
        sum(col("lut")).as("sum_lut"),
        min(col("px")).cast("long").as("min_px"),
        max(col("px")).cast("long").as("max_px"))
      .orderBy("doc_id")
  }

  /** m_decode_blur: the ENGINE'S Gaussian smoothing over REAL decoded
    * pixels — the integer 5×5 binomial stencil shared with
    * m_gauss_blur (broadcast offset join, out-of-bounds contributions
    * dropped, /256 integer scale), fed by the actual PNG decode
    * instead of md5-synthesized pixels. The reference's EXACT cv2
    * kernel is [[mDecodeBlur3]]; this twin keeps the wider stencil
    * available decode-fed. With m_decode_lut this puts both
    * preprocessing stages of the reference's decode path inside the
    * oracle gate; the oracle blurs the closed pixel form directly.
    */
  def mDecodeBlur(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (w, h) = (16, 12)
    val w1 = Map(0 -> 6L, 1 -> 4L, 2 -> 1L)
    val offs = (for (dy <- -2 to 2; dx <- -2 to 2)
      yield (dy, dx, w1(math.abs(dy)) * w1(math.abs(dx)))).toSeq
      .toDF("dy", "dx", "wgt")
    decodedFrames(spark, dir)
      .join(broadcast(offs))
      .select(col("doc_id"), (col("y") + col("dy")).as("yo"),
        (col("x") + col("dx")).as("xo"), (col("wgt") * col("px")).as("contrib"))
      .filter(col("yo") >= 0 && col("yo") < h && col("xo") >= 0 && col("xo") < w)
      .groupBy("doc_id", "yo", "xo")
      .agg(sum(col("contrib")).as("b256"))
      .select(col("doc_id"), expr("b256 div 256").as("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_px"), sum(col("b")).as("sum_b"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .orderBy("doc_id")
  }

  /** cv2-EXACT 3×3 Gaussian over a (doc_id, y, x, px) frame — the
    * reference's actual cv2.GaussianBlur((3,3), 0)
    * (build_faiss_db.py:79): for ksize=3 / σ=0 OpenCV uses the
    * special-cased separable kernel [1,2,1]/4 (small_gaussian_tab),
    * BORDER_REFLECT_101 edges (index −1 → 1, n → n−2), and uint8
    * fixed-point accumulation whose final 2¹⁶ shift rounds half-up —
    * algebraically out(y,x) = (Σ w·p(reflect(y+dy), reflect(x+dx)) + 8)
    * div 16 with w = [1,2,1]⊗[1,2,1]. All-integer, so the oracle
    * replays it exactly. Gather form: each output joins its 9
    * reflected source coordinates (broadcast offset table, one
    * equi-join, one partial-aggregated groupBy — same scale shape as
    * the 5×5 stencil).
    */
  private[graft] def gaussBlur3(frame: DataFrame, w: Int, h: Int,
      pxCol: String = "px", outCol: String = "b"): DataFrame = {
    import frame.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val offs = (for (dy <- -1 to 1; dx <- -1 to 1)
      yield (dy, dx, (if (dy == 0) 2L else 1L) * (if (dx == 0) 2L else 1L)))
      .toDF("dy", "dx", "wgt")
    def refl(c: Column, n: Int): Column =
      when(c < 0, -c).when(c >= n, lit(2 * (n - 1)) - c).otherwise(c)
    val src = frame.select(col("doc_id"), col("y").as("sy"),
      col("x").as("sx"), col(pxCol).as("spx"))
    frame.select("doc_id", "y", "x")
      .join(broadcast(offs))
      .select(col("doc_id"), col("y"), col("x"),
        refl(col("y") + col("dy"), h).as("sy"),
        refl(col("x") + col("dx"), w).as("sx"), col("wgt"))
      .join(src, Seq("doc_id", "sy", "sx"))
      .groupBy("doc_id", "y", "x")
      .agg(expr("(sum(wgt * spx) + 8) div 16").as(outCol))
  }

  /** m_decode_blur3: the reference-exact blur over REAL decoded pixels
    * — cv2's actual 3×3/σ=0 kernel with reflect-101 borders and
    * round-half-up ([[gaussBlur3]]), fed by the javax.imageio decode.
    * m_decode_blur keeps the engine's own 5×5 stencil; this twin is
    * the cv2-fidelity gate the decode pipelines share.
    */
  def mDecodeBlur3(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    gaussBlur3(decodedFrames(spark, dir), w = 16, h = 12)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_px"), sum(col("b")).as("sum_b"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
      .orderBy("doc_id")
  }

  /** m_center_crop: torchvision's CenterCrop over REAL decoded pixels
    * — the reference's CNN preprocess step (app.py:70 /
    * build_faiss_db.py:117: transforms.CenterCrop(224) between
    * Resize and Normalize). Crop offsets are
    * `int(round((full − crop) / 2.0))` with PYTHON'S banker's
    * rounding, so an odd difference rounds its half toward the EVEN
    * integer: offset = k + (k mod 2) where k = (full−crop) div 2.
    * Both parities are exercised here — height 24→13 (d=11 odd: k=5
    * → top 6) and width 32→22 (d=10 even: left 5) — and the oracle
    * derives the offsets from the same integer formula, so a naive
    * half-up crop would shift a row and break the hash.
    */
  def mCenterCrop(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val (ch, cw) = (13, 22)
    def off(full: Int, c: Int): Int = {
      val d = full - c
      val k = d / 2
      if (d % 2 == 0) k else k + (k % 2)
    }
    val (top, left) = (off(24, ch), off(32, cw))
    decodedFrames(spark, dir, w = 32, h = 24)
      .filter(col("y") >= top && col("y") < top + ch &&
        col("x") >= left && col("x") < left + cw)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_px"), sum(col("px")).cast("long").as("sum_px"),
        min(col("px")).cast("long").as("min_px"),
        max(col("px")).cast("long").as("max_px"))
      .orderBy("doc_id")
  }

  /** m_decode_phash: the perceptual-hash fingerprint over REAL decoded
    * pixels — 16×16 synthetic PNGs through the actual javax.imageio
    * decode, then the exact same separable fixed-point DCT → median →
    * bit-pack derivation as m_phash (shared ImagePipeline
    * .phashFromFrame, so decode is the ONLY difference). The oracle
    * evaluates the closed pixel form and replays the DCT in SQL — a
    * hash match proves encode → decode → DCT → median → pack bit-exact
    * end to end. With m_decode_lut and m_decode_blur this puts all
    * three pixel stages the reference runs (LUT, blur, fingerprint)
    * behind a real codec inside the gate.
    */
  def mDecodePhash(spark: SparkSession, dir: String): DataFrame =
    ImagePipeline.phashFromFrame(decodedFrames(spark, dir, w = 16, h = 16))

  /** m_decode_clahe: the reference's CLAHE preprocess (app.py:60-66)
    * over REAL decoded pixels — 32×32 synthetic PNGs through the
    * actual javax.imageio decode, then the exact same clip-limited
    * tile histograms → integer LUTs → bilinear corner blend as
    * m_clahe (shared ImagePipeline.claheFromFrame, so decode is the
    * ONLY difference). This closes the last md5-fed pixel stage: all
    * four pixel transforms the reference runs (γ-LUT, blur, CLAHE,
    * fingerprint) are now decode-fed inside the oracle gate. The
    * DuckDB oracle evaluates the closed pixel form and replays the
    * adaptation in SQL — hash equality proves encode → decode →
    * histogram → blend bit-exact end to end.
    */
  def mDecodeClahe(spark: SparkSession, dir: String): DataFrame =
    ImagePipeline.claheFromFrame(
      decodedFrames(spark, dir, w = 32, h = 32, nDocs = 2))

  /** m_decode_resize: the 2×2 box-average downsample over REAL decoded
    * pixels (the resize step before the CNN; m_resize keeps the
    * md5-synthesized variant). Same floor-mean derivation, decode is
    * the only difference — with LUT, blur, CLAHE and pHash this makes
    * every pixel transform in the engine available decode-fed.
    */
  def mDecodeResize(spark: SparkSession, dir: String): DataFrame =
    decodedFrames(spark, dir, w = 16, h = 16)
      .groupBy(col("doc_id"), expr("y div 2").as("yo"), expr("x div 2").as("xo"))
      .agg(expr("sum(px) div 4").as("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_px"), sum(col("p")).as("sum_p"),
        min(col("p")).as("min_p"), max(col("p")).as("max_p"))
      .orderBy("doc_id")

  /** m_decode_crop: the reference's label→bbox CROP over REAL decoded
    * pixels (build_faiss_db.py:168-180: normalized YOLO coords →
    * exact pixel-truncation math → numpy slice). 32×24 PNGs through
    * the actual decode; boxes derive from doc_id arithmetic through
    * the SAME yoloBbox expression m_bbox gates; the crop is the
    * pixel-range join (numpy's implicit bounds clamp falls out of
    * pixels only existing inside the frame). With preprocess
    * (LUT/blur/CLAHE), fingerprint and resize, the crop stage
    * completes the decode-fed set — every pixel operation the
    * reference performs now runs against a real codec in the gate.
    */
  def mDecodeCrop(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val xc = (col("doc_id") % 5 + 3) / lit(10.0)
    val yc = (col("doc_id") % 7 + 2) / lit(10.0)
    val w = (col("doc_id") % 3 + 2) / lit(10.0)
    val h = (col("doc_id") % 4 + 2) / lit(10.0)
    val boxes = graft.Tables.documents(spark, dir).filter(col("doc_id") < 8)
      .select(col("doc_id").as("bid"),
        ImagePipeline.yoloBbox(xc, yc, w, h, lit(32), lit(24)).as("bb"))
      .select(col("bid"), col("bb.x1").as("x1"), col("bb.y1").as("y1"),
        col("bb.x2").as("x2"), col("bb.y2").as("y2"))
    decodedFrames(spark, dir, w = 32, h = 24)
      .join(broadcast(boxes), col("doc_id") === col("bid"))
      .filter(col("x") >= col("x1") && col("x") < col("x2") &&
        col("y") >= col("y1") && col("y") < col("y2"))
      .groupBy("doc_id", "x1", "y1", "x2", "y2")
      .agg(count(lit(1)).as("n_px"), sum(col("px")).as("sum_px"),
        min(col("px")).cast("long").as("min_px"),
        max(col("px")).cast("long").as("max_px"))
      .orderBy("doc_id")
  }

  /** m_decode_jpeg: the LOSSY decode path inside the oracle gate. The
    * PNG/BMP gates derive their oracle from a closed pixel form; JPEG
    * has none, so the ground truth is the committed fixture grid
    * ([[JpegFixtures]] — ramps encoded once by this JVM's javax.imageio
    * JPEG writer, decoded grids committed alongside the payloads). The
    * query decodes the committed PAYLOADS through the real pixelFrame
    * path; the DuckDB oracle replays the committed GRIDS as literals —
    * the src_binary trick (the oracle never touches an image), applied
    * to the one decode format that was only spec-gated. A codec drift
    * or a luma-math regression breaks the hash.
    */
  def mDecodeJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fail at the source with the codec named, not as an opaque oracle
    // hash break: the committed grids are only valid under a compatible
    // javax.imageio build (JpegFixtures.GeneratedUnder)
    JpegFixtures.codecDrift().foreach { diff =>
      throw new IllegalStateException(
        s"JPEG codec drift: $diff. Fixtures were generated under " +
          s"${JpegFixtures.GeneratedUnder}; this JVM is " +
          s"${System.getProperty("java.runtime.version")}. Regenerate with " +
          "graft.tools.JpegFixtureGen and re-commit JpegFixtures + oracle grids.")
    }
    val payloads = JpegFixtures.all.toSeq.sortBy(_._1)
      .map { case (id, (b64, _, _, _)) =>
        (id, java.util.Base64.getDecoder.decode(b64))
      }
      .toDF("doc_id", "payload")
    pixelFrame(payloads, "doc_id", "payload")
      .orderBy("doc_id", "y", "x")
  }

  /** Deterministic synthetic PNG (spec/dev helper): pixel (x, y) has
    * gray value ((seed + 7·y + 13·x) mod 256), so every decoded value
    * is predictable driver-side without any image library.
    */
  def syntheticPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + 7 * y + 13 * x) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
