package graft.operators

/** Committed JPEG decode fixtures for the m_decode_jpeg driver gate.
  *
  * JPEG is lossy, so unlike the PNG/BMP paths the decoded grid is not
  * a closed form of (doc_id, y, x) — the ground truth is this COMMITTED
  * grid, precomputed once by encoding gray ramps with javax.imageio's
  * JPEG writer and decoding them back through ImageDecode.decodeGray
  * (regenerate with graft.tools.JpegFixtureGen; fixture 0 is
  * Round8Spec's original 8x6 ramp). The gate decodes the committed
  * PAYLOADS through the real pipeline and the DuckDB oracle replays the
  * committed GRIDS as literals, so a hash match proves the lossy decode
  * path stable and byte-exact end-to-end — closing the reference's
  * jpg/jpeg upload format (app.py:100) inside the oracle gate, not just
  * the spec.
  */
object JpegFixtures {

  /** The toolchain the committed grids were generated under. JPEG
    * decode output is implementation-defined (IDCT variants differ by
    * ±1 luma across codec builds), so the grids are only guaranteed to
    * reproduce under a compatible javax.imageio build. [[codecDrift]]
    * turns a mismatch into a named diagnostic instead of a spurious
    * downstream hash break; regenerate with graft.tools.JpegFixtureGen
    * (and re-commit BOTH the grids and this header) when pinning a new
    * toolchain.
    */
  val GeneratedUnder = "OpenJDK 17 (Debian 17.0.20+8, javax.imageio JPEGImageReader)"

  /** Decodes fixture 0's committed payload through the REAL decode path
    * and diffs it against the committed grid: Some(message) when this
    * JVM's JPEG codec disagrees with the generating toolchain, None
    * when the fixtures are valid here. Called by the m_decode_jpeg gate
    * so codec drift fails loudly at the source.
    */
  def codecDrift(): Option[String] = {
    val (b64, w, h, grid) = all(0L)
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val (dw, dh, px) = ImageDecode.decodeGray(bytes)
    if (dw != w || dh != h)
      Some(s"decoded ${dw}x$dh, fixtures committed as ${w}x$h")
    else if (!java.util.Arrays.equals(px, grid)) {
      val bad = px.indices.find(i => px(i) != grid(i)).get
      Some(s"luma[$bad] = ${px(bad)}, committed ${grid(bad)}")
    } else None
  }

  /** doc_id -> (base64 payload, width, height, decoded BT.601 luma). */
  val all: Map[Long, (String, Int, Int, Array[Int])] = Map(
// fixture 0: 8x6 seed=17 (636 bytes)
    0L -> ("/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAGAAgDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDk/C+nJ8nSiiigD//Z",
      8, 6, Array(
        17, 27, 42, 56, 68, 81, 96, 107,
        24, 34, 49, 63, 75, 88, 103, 114,
        31, 42, 57, 71, 82, 96, 111, 122,
        38, 48, 63, 77, 89, 102, 117, 128,
        45, 55, 70, 84, 96, 109, 124, 135,
        51, 62, 77, 91, 102, 116, 131, 142,
      )),
// fixture 1: 16x12 seed=101 (712 bytes)
    1L -> ("/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAMABADASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDq/C+lfc+WvN/ibrP/AAkfjkabbnNjo262Tj70xI81uVBHICYyR+7yPvV6X4k1e68L/DzVNY0zy1vIEjWJ3XcELyKm7HQkBiRnIyBkEcV4n4Xto/k+WgD/2Q==",
      16, 12, Array(
        102, 113, 128, 141, 153, 167, 182, 192, 202, 219, 235, 251, 0, 4, 35, 38,
        108, 119, 134, 147, 159, 172, 187, 198, 218, 211, 231, 255, 18, 21, 38, 47,
        116, 127, 142, 155, 167, 180, 196, 206, 213, 233, 255, 0, 0, 34, 33, 54,
        123, 134, 149, 162, 174, 187, 202, 213, 226, 241, 255, 9, 37, 32, 46, 60,
        129, 140, 155, 168, 180, 193, 208, 219, 240, 240, 0, 17, 6, 55, 57, 68,
        136, 146, 162, 175, 187, 200, 215, 226, 246, 250, 8, 50, 34, 58, 49, 77,
        144, 155, 170, 183, 195, 208, 223, 234, 239, 19, 12, 19, 44, 49, 78, 84,
        150, 160, 175, 189, 201, 214, 229, 240, 249, 14, 26, 37, 52, 72, 61, 96,
        155, 173, 172, 197, 211, 227, 235, 249, 5, 16, 31, 44, 56, 69, 84, 95,
        163, 172, 213, 189, 219, 210, 232, 255, 12, 22, 37, 51, 63, 76, 91, 102,
        170, 190, 185, 216, 218, 247, 255, 0, 20, 31, 46, 59, 71, 84, 99, 110,
        183, 177, 214, 208, 238, 243, 0, 23, 25, 36, 51, 64, 76, 90, 105, 115,
      )),
// fixture 2: 12x10 seed=55 (684 bytes)
    2L -> ("/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAKAAwDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwBnhfSvufLXrGn6V/oafLXG+F1HycCuK+NviPXdG8X6fb6XrWo2MDaZG7R2t08SlvNlGSFIGcADPsKAP//Z",
      12, 10, Array(
        56, 67, 82, 95, 107, 121, 136, 146, 159, 172, 188, 198,
        62, 73, 88, 101, 113, 126, 141, 152, 165, 178, 194, 204,
        70, 81, 96, 109, 121, 134, 150, 160, 173, 186, 202, 212,
        77, 88, 103, 116, 128, 141, 156, 167, 180, 193, 209, 219,
        83, 94, 109, 122, 134, 147, 162, 173, 186, 199, 215, 225,
        90, 100, 116, 129, 141, 154, 169, 180, 193, 206, 222, 232,
        98, 109, 124, 137, 149, 162, 177, 188, 201, 214, 230, 240,
        104, 114, 129, 143, 155, 168, 183, 194, 207, 220, 236, 246,
        112, 123, 138, 152, 164, 177, 192, 203, 201, 242, 240, 235,
        117, 128, 143, 156, 168, 182, 197, 207, 228, 249, 239, 10,
      )),
// fixture 3: 10x16 seed=203 (686 bytes)
    3L -> ("/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/2wBDAQkJCQwLDBgNDRgyIRwhMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjIyMjL/wAARCAAQAAoDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREAAgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDE+JniGbxD4xfRbaaT+y9KfyfLBIWS4GRI5BAOQSUGcj5SQfmNUU0r5F+XsKo+F9K+58tejJpXyL8vYUAf/9k=",
      10, 16, Array(
        222, 202, 238, 243, 242, 20, 33, 37, 52, 65,
        195, 230, 232, 240, 22, 0, 37, 39, 58, 71,
        228, 227, 248, 7, 12, 27, 47, 44, 66, 79,
        213, 250, 240, 0, 26, 31, 45, 62, 73, 86,
        227, 247, 0, 26, 41, 42, 39, 75, 79, 92,
        253, 248, 17, 2, 24, 49, 72, 58, 86, 99,
        237, 0, 1, 57, 39, 44, 65, 88, 94, 107,
        255, 9, 32, 19, 53, 65, 62, 91, 100, 113,
        4, 15, 30, 43, 55, 69, 84, 94, 108, 121,
        10, 21, 36, 49, 61, 74, 89, 100, 114, 127,
        18, 29, 44, 57, 69, 82, 98, 108, 122, 135,
        25, 36, 51, 64, 76, 89, 104, 115, 129, 142,
        31, 42, 57, 70, 82, 95, 110, 121, 135, 148,
        38, 48, 64, 77, 89, 102, 117, 128, 142, 155,
        46, 57, 72, 85, 97, 110, 125, 136, 150, 163,
        52, 62, 77, 91, 103, 116, 131, 142, 156, 169,
      ))
  )
}
