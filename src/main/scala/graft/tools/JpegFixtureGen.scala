package graft.tools

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Dev generator for the committed JPEG decode fixtures (m_decode_jpeg):
  * encodes gray-ramp images with THIS JVM's javax.imageio JPEG writer,
  * decodes them back through ImageDecode.decodeGray, and prints the
  * Scala literals (base64 payload + luma grid) to paste into
  * graft.operators.JpegFixtures. JPEG is lossy, so the decoded grid is
  * the committed ground truth — the driver gate then proves the decode
  * path reproduces it bit-for-bit (same contract as Round8Spec's single
  * fixture, promoted to the oracle gate).
  */
object JpegFixtureGen {
  def main(args: Array[String]): Unit = {
    // (doc_id, w, h, seed) — sizes/pitches chosen to exercise non-square
    // frames and several ramp phases
    val specs = Seq((0, 8, 6, 17), (1, 16, 12, 101), (2, 12, 10, 55), (3, 10, 16, 203))
    specs.foreach { case (id, w, h, seed) =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (seed + 7 * y + 13 * x) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", out)
      val bytes = out.toByteArray
      val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
      val (dw, dh, px) = graft.operators.ImageDecode.decodeGray(bytes)
      require(dw == w && dh == h)
      println(s"// fixture $id: ${w}x$h seed=$seed (${bytes.length} bytes)")
      println(s"""    ${id}L -> ("$b64",""")
      println(s"      $w, $h, Array(")
      px.grouped(w).map(row => "        " + row.mkString(", ") + ",").foreach(println)
      println("      )),")
    }
  }
}
