package graft

import org.apache.spark.sql.functions._

/** Round-16 additions, part 1 — the r15 ADVICE fixes: maintenance ops
  * refuse to invent store roots, scoped versioned appends validate the
  * caller's touched-dirs declaration, and the safetensors parser's
  * negative paths fail loudly (it sits on the model-import trust
  * boundary).
  */
class Round16Spec extends SparkSpec {

  import graft.sources.{StoreMaintenance => SM}
  import graft.operators.Safetensors

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------------------------------------------------------------
  // maintenance ops on a nonexistent root fail loudly
  // ---------------------------------------------------------------

  test("maintenance on a typo'd store path fails loudly instead of creating an empty store") {
    val ghost = tmpDir("ghost") + "/no_such_store"
    // vacuum and purge are the ops an operator runs by hand — a typo'd
    // path must surface, not mkdirs an empty root and report a no-op
    intercept[java.io.FileNotFoundException] {
      SM.vacuum(ghost, 0L, minRetentionMs = 0, force = true)
    }
    intercept[java.io.FileNotFoundException] {
      SM.purge(spark, ghost, "id", Seq(1L))
    }
    assert(!graft.sources.StoreFs.exists(ghost),
      "the failed maintenance op must not have created the store root")
  }

  // ---------------------------------------------------------------
  // scoped versionedAppend validates the declared dirs
  // ---------------------------------------------------------------

  test("scoped versionedAppend records a NEW partition dir landing outside the declared scope") {
    import spark.implicits._
    val root = tmpDir("va_validate") + "/store"
    (0 until 60).map(i => (i.toLong, i % 4)).toDF("id", "c")
      .write.partitionBy("c").parquet(root)
    // the writer declares c=1 but the wave also lands a BRAND-NEW c=9
    // dir — the r15 gap: the undeclared dir silently vanished from the
    // version's _added record and readBefore(v) included its rows
    val v = SM.versionedAppend(root, Seq("c=1")) {
      Seq((900L, 1), (901L, 9), (902L, 9)).toDF("id", "c")
        .write.mode("append").partitionBy("c").parquet(root)
    }
    assert(v > 0)
    val snap = SM.readBefore(spark, root, v)
    assert(snap.count() == 60, "pre-append snapshot must exclude the whole wave")
    assert(snap.filter(col("id") >= 900L).count() == 0,
      "rows in the undeclared NEW dir must be excluded from the snapshot")
    assert(spark.read.parquet(root).count() == 63)
  }

  test("scoped versionedAppend records new ROOT data files outside a dir-only scope") {
    import spark.implicits._
    val root = tmpDir("va_rootfiles") + "/store"
    // flat store (root-level files) with some pre-existing data
    (0 until 20).map(i => (i.toLong, i)).toDF("id", "x")
      .coalesce(1).write.parquet(root)
    // declaration says "." is untouched (declares a dir that the write
    // ignores); the wave actually lands new root files
    val v = SM.versionedAppend(root, Seq("c=0")) {
      Seq((500L, 500)).toDF("id", "x")
        .coalesce(1).write.mode("append").parquet(root)
    }
    assert(v > 0, "undeclared root files must still burn a version")
    val snap = SM.readBefore(spark, root, v)
    assert(snap.count() == 20 && snap.filter(col("id") === 500L).count() == 0,
      "pre-append snapshot must exclude the undeclared root files " +
        "and keep every pre-existing one")
  }

  test("scoped versionedAppend walks nested leaves within a declared dir") {
    import spark.implicits._
    val root = tmpDir("va_nested") + "/store"
    (0 until 24).map(i => (i.toLong, i % 2, i % 3)).toDF("id", "a", "b")
      .write.partitionBy("a", "b").parquet(root)
    // the declared top-level dir nests b= leaves — the diff must key
    // by leaf rel paths (a=1/b=2), matching readBefore's reconstruction
    val v = SM.versionedAppend(root, Seq("a=1")) {
      Seq((800L, 1, 2)).toDF("id", "a", "b")
        .write.mode("append").partitionBy("a", "b").parquet(root)
    }
    assert(v > 0)
    val snap = SM.readBefore(spark, root, v)
    assert(snap.count() == 24 && snap.filter(col("id") === 800L).count() == 0)
    assert(spark.read.parquet(root).count() == 25)
  }

  // ---------------------------------------------------------------
  // safetensors negative paths: the model-import trust boundary
  // ---------------------------------------------------------------

  private def stImage(header: String, dataBytes: Int): Array[Byte] = {
    val h = header.getBytes("UTF-8")
    val buf = java.nio.ByteBuffer.allocate(8 + h.length + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(h.length.toLong)
    buf.put(h)
    (0 until dataBytes).foreach(i => buf.put(i.toByte))
    buf.array()
  }

  test("safetensors parse: every malformed input fails loudly with a named error") {
    val cases: Seq[(String, Array[Byte], String)] = Seq(
      ("truncated: no header length",
        Array[Byte](1, 2, 3), "no header length"),
      ("header length past the file", {
        val b = java.nio.ByteBuffer.allocate(16)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putLong(9999L); b.array()
      }, "out of bounds"),
      ("header is not JSON",
        stImage("not json at all", 0), "not valid JSON"),
      ("duplicate tensor names",
        stImage(""""t":{"dtype":"I32","shape":[1],"data_offsets":[0,4]},""" +
          """"t":{"dtype":"I32","shape":[1],"data_offsets":[4,8]}""" match {
          case s => "{" + s + "}"
        }, 8), "not valid JSON"),
      ("missing data_offsets",
        stImage("""{"t":{"dtype":"I32","shape":[1]}}""", 4),
        "missing dtype/shape/data_offsets"),
      ("negative offset",
        stImage("""{"t":{"dtype":"I32","shape":[1],"data_offsets":[-4,0]}}""", 4),
        "out of bounds"),
      ("offsets past the data section",
        stImage("""{"t":{"dtype":"I32","shape":[1],"data_offsets":[4,8]}}""", 4),
        "out of bounds"),
      ("span/shape mismatch",
        stImage("""{"t":{"dtype":"I32","shape":[2],"data_offsets":[0,4]}}""", 4),
        "byte span"),
      ("overlapping tensors",
        stImage("""{"a":{"dtype":"I32","shape":[2],"data_offsets":[0,8]},""" +
          """"b":{"dtype":"I32","shape":[1],"data_offsets":[4,8]}}""", 8),
        "overlapping data_offsets"))
    cases.foreach { case (label, bytes, needle) =>
      val e = intercept[IllegalArgumentException] { Safetensors.parse(bytes) }
      assert(e.getMessage != null && e.getMessage.contains(needle),
        s"$label: expected error containing '$needle', got: ${e.getMessage}")
    }
  }

  test("safetensors serialize: JSON-unsafe tensor names are rejected") {
    val vals = (Seq(1L), Array(7))
    intercept[IllegalArgumentException] {
      Safetensors.serializeI32(Seq("bad\"name" -> vals))
    }
    intercept[IllegalArgumentException] {
      Safetensors.serializeF64(Seq("bad\\name" -> (Seq(1L), Array(1.0))))
    }
    // a safe name still serializes and round-trips
    val ok = Safetensors.parse(Safetensors.serializeI32(Seq("fine.name" -> vals)))
    assert(ok("fine.name").toIntArray.toSeq == Seq(7))
  }
}
