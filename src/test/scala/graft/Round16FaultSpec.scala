package graft

import org.apache.spark.sql.functions._

/** Round-16 headline: the OBJECT-STORE crash-window matrix. r15
  * shipped the StoreFs seam with a documented S3A atomicity contract
  * ("recover() still settles every outcome because the manifest is
  * the commit point") proven only for file:// — this suite proves it
  * under simulated S3A semantics ([[FaultFs]]: rename = copy+delete
  * with staged crash points, non-exclusive create), driving every
  * maintenance op through EVERY protocol rename with a crash injected
  * before / mid / after the copy, then asserting:
  *
  *   1. recover() settles the store to a LEGAL state (pre-op or
  *      post-op rows — never a torn mixture, never duplication);
  *   2. re-running the op after recovery converges to the post state;
  *   3. recover() is idempotent.
  *
  * The matrix surfaced (and r16 fixed) three real windows: a torn
  * versionedAppend record rename leaving a committed-looking partial
  * `v<N>` beside its staged src, the single-file vacuum-tombstone
  * rewrite losing every tombstone on a torn write, and readBefore
  * trusting a snapshot dir that survived its own tombstone (the
  * vacuum crash window serving a HALF-deleted snapshot).
  */
class Round16FaultSpec extends SparkSpec {

  import graft.sources.{StoreFs, StoreMaintenance => SM}

  private def registerFaulty(): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.faulty.impl", classOf[FaultFs].getName)
  }

  private def freshRoot(prefix: String): String = {
    registerFaulty()
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    s"faulty://$d/store"
  }

  /** The protocol's own renames — Spark job-internal `_temporary`
    * traffic is excluded inside FaultFs, so indexing these is
    * deterministic per op.
    */
  private val ProtocolMarkers =
    Seq(".compact_", ".retired", ".commit_group_", ".rewrite_stage")

  private def isInjected(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(12).exists(x =>
      x.isInstanceOf[FaultFs.InjectedCrash] ||
        Option(x.getMessage).exists(_.contains("injected crash")))

  /** Drive `op` through staged (k-th matching rename × crash phase)
    * crashes, each on a FRESH store. A counting pass first measures
    * the protocol's matching-rename total n; short protocols test
    * every k, long ones sample the boundaries and the middle (the
    * interesting transitions — first retire, commit point, cleanup —
    * all live at the edges of each sub-phase).
    *
    * `legal` is the settled-state contract: by default pre-or-post
    * (single-swap atomicity); multi-dir ops pass their honest
    * contract (each dir pre or post, nothing else disturbed).
    */
  private def crashMatrix(label: String,
                          build: String => Unit,
                          op: String => Unit,
                          snapshot: String => Seq[String],
                          legal: (Seq[String], Seq[String], Seq[String]) => Boolean =
                            (live, pre, post) => live == pre || live == post,
                          settle: String => Unit = p => { SM.recover(p); () },
                          markers: Seq[String] = ProtocolMarkers,
                          intermediateReadable: Boolean = true): Unit = {
    val clean = freshRoot(s"fm_${label}_clean")
    build(clean)
    val pre = snapshot(clean)
    // counting pass: how many protocol renames does one op perform?
    FaultFs.arm(FaultFs.RenameOp, markers, Int.MaxValue, FaultFs.CrashBefore)
    op(clean)
    val n = FaultFs.matchedCount
    FaultFs.disarm()
    val post = snapshot(clean)
    assert(pre.nonEmpty && post.nonEmpty, s"$label: empty fixture")
    assert(n > 0, s"$label: no protocol renames matched — marker filter broken?")
    val ks =
      if (n <= 14) (1 to n).toSeq
      else ((1 to 4) ++ (n / 2 - 1 to n / 2 + 1) ++ (n - 3 to n)).distinct.sorted
    var crashes = 0
    ks.foreach { k =>
      Seq(FaultFs.CrashBefore, FaultFs.CrashMid, FaultFs.CrashAfter).foreach { ph =>
        val path = freshRoot(s"fm_$label")
        build(path)
        FaultFs.arm(FaultFs.RenameOp, markers, k, ph)
        val crashed =
          try { op(path); false }
          catch {
            case t: Throwable if isInjected(t) => true
          } finally FaultFs.disarm()
        if (crashed) {
          crashes += 1
          settle(path)
          // multi-component protocols may be legitimately UNREADABLE
          // mid-crash (a torn lexical correction fails stats reads
          // loudly until the purge replays) — their contract is
          // replay convergence, checked below, not mid-state shape
          if (intermediateReadable) {
            val live = snapshot(path)
            assert(legal(live, pre, post),
              s"$label rename#$k $ph: recovered state violates the settled-state " +
                s"contract (${live.size} rows vs pre=${pre.size}/post=${post.size})")
          }
          // the op must converge after recovery
          op(path)
          assert(snapshot(path) == post,
            s"$label rename#$k $ph: re-run after recovery did not converge")
          // and recovery is idempotent on the settled store
          SM.recover(path)
          assert(snapshot(path) == post,
            s"$label rename#$k $ph: recover() disturbed a settled store")
        }
      }
    }
    assert(crashes > 0, s"$label: no crash ever fired — marker filter broken?")
    info(s"$label: $crashes staged crashes settled across $n protocol renames")
  }

  private def rowsOf(path: String): Seq[String] =
    spark.read.parquet(path).collect().map(_.toString).sorted.toSeq

  // ---------------------------------------------------------------
  // the swap protocol ops
  // ---------------------------------------------------------------

  test("compact settles at every staged S3A rename crash") {
    import spark.implicits._
    crashMatrix("compact",
      build = p => (0 until 40).map(i => (i.toLong, i % 2)).toDF("id", "c")
        .repartition(3).write.partitionBy("c").parquet(p),
      op = p => { SM.compact(spark, p, targetFiles = 1); () },
      // compaction is physical: pre == post rows, so ANY torn state
      // (duplicated tmp reads, half-retired files) breaks equality
      snapshot = rowsOf)
  }

  test("purge settles at every staged S3A rename crash (per-dir atomic; cross-dir prefix legal, re-run converges)") {
    import spark.implicits._
    crashMatrix("purge",
      build = p => (0 until 40).map(i => (i.toLong, i % 2)).toDF("id", "c")
        .repartition(2).write.partitionBy("c").parquet(p),
      op = p => { SM.purge(spark, p, "id", Seq(3L, 4L, 5L)); () },
      snapshot = rowsOf,
      // purge's HONEST contract (this matrix surfaced it): each dir's
      // swap is atomic, but the pass over dirs is sequential — a crash
      // mid-pass leaves some dirs purged and others not. Legal =
      // nothing but victims removed, nothing duplicated, every
      // non-victim intact; the re-run convergence check below is what
      // makes the cross-dir prefix operationally safe
      legal = (live, pre, post) => {
        val (l, p0, p1) = (live.toSet, pre.toSet, post.toSet)
        p1.subsetOf(l) && l.subsetOf(p0) && live.size == l.size
      })
  }

  test("flat-store compactIfNeeded settles at every staged S3A rename crash") {
    import spark.implicits._
    crashMatrix("flatcompact",
      build = p => {
        (0 until 20).map(i => (i.toLong, i)).toDF("id", "x")
          .coalesce(1).write.parquet(p)
        (20 until 40).map(i => (i.toLong, i)).toDF("id", "x")
          .coalesce(1).write.mode("append").parquet(p)
      },
      op = p => { SM.compactIfNeeded(spark, p, maxFiles = 1); () },
      snapshot = rowsOf)
  }

  test("IVF retrain (group-committed layout rewrite) settles at every staged S3A rename crash") {
    import spark.implicits._
    import graft.sources.IvfIndexStore
    val dim = 4
    def vec(i: Int): Seq[Double] =
      (0 until dim).map(d => math.sin(i * 7 + d * 3).abs + 0.1)
    val rows = (0 until 60).map(i => (i.toLong, vec(i)))
    def trainFrame() = {
      val df = rows.take(30).toDF("vec_id", "v")
      df.withColumn("nrm", graft.functions.VectorFns.norm2(col("v")))
        .select("vec_id", "v", "nrm")
    }
    crashMatrix("retrain",
      build = p => IvfIndexStore.write(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", p),
      op = p => { IvfIndexStore.retrain(spark, p, trainFrame()); () },
      // cid included: pre and post LAYOUTS differ, so a half-moved
      // layout (some dirs old assignment, some new) matches neither
      snapshot = p => spark.read.parquet(p)
        .select(col("vec_id"), col("cid")).collect()
        .map(_.toString).sorted.toSeq)
  }

  test("lexical purge protocol settles by REPLAY at every staged S3A crash (correction-first contract)") {
    import spark.implicits._
    import graft.sources.Bm25Store
    def docsDf = (0 until 16).map { i =>
      (i.toLong, s"w${i % 4} w${(i + 1) % 5} common w${i % 3} t$i")
    }.toDF("doc_id", "text")
    def queries = docsDf.filter(col("doc_id") === 0)
      .select(col("doc_id").as("q_id"), col("text"))
    crashMatrix("bm25purge",
      build = p => Bm25Store.write(docsDf, p),
      op = p => { Bm25Store.purge(spark, p, Seq(3L, 4L)); () },
      // the search RANKING is the snapshot: it folds postings, dl,
      // AND the corrected corpus stats, so any component left behind
      // shows up in the scores
      snapshot = p => Bm25Store.search(spark, p, queries, k = 5)
        .collect().map(_.toString).sorted.toSeq,
      // multi-COMPONENT op: intermediate states are defined but mixed
      // (e.g. stats corrected while postings not yet purged) — the
      // documented contract is REPLAY convergence (correction lands
      // FIRST from the still-intact dl, its victim-keyed filename
      // makes the replay skip instead of double-subtracting, and the
      // partition purges are natural no-ops on purged ids); the
      // re-run assertion is the contract's enforcement
      legal = (_, _, _) => true,
      settle = p => { SM.recover(p); SM.recover(s"$p.dl")
        SM.recover(s"$p.stats"); () },
      markers = ProtocolMarkers :+ ".corr_tmp",
      intermediateReadable = false)
  }

  // ---------------------------------------------------------------
  // versionedAppend: the record rename is the commit point
  // ---------------------------------------------------------------

  test("versionedAppend's record rename settles at every staged S3A crash (append stands, lineage never torn)") {
    import spark.implicits._
    Seq(FaultFs.CrashBefore, FaultFs.CrashMid, FaultFs.CrashAfter).foreach { ph =>
      val path = freshRoot("fm_vapp")
      (0 until 20).map(i => (i.toLong, i % 2)).toDF("id", "c")
        .write.partitionBy("c").parquet(path)
      FaultFs.arm(FaultFs.RenameOp, Seq(".retired"), 1, ph)
      val crashed =
        try {
          SM.versionedAppend(path, Seq("c=0", "c=1")) {
            Seq((100L, 0), (101L, 1)).toDF("id", "c")
              .write.mode("append").partitionBy("c").parquet(path)
          }
          false
        } catch { case t: Throwable if isInjected(t) => true }
        finally FaultFs.disarm()
      assert(crashed, s"$ph: the record rename must have fired")
      SM.recover(path)
      // the data stands (appends are never lost to a record crash)
      assert(spark.read.parquet(path).count() == 22, s"$ph: append data lost")
      // and the lineage is never torn: either no version was recorded
      // (the documented unversioned-append outcome) or the record is
      // COMPLETE (readBefore reproduces the exact pre-append state)
      SM.versions(path) match {
        case Seq() => () // record discarded — legal
        case vs =>
          val snap = SM.readBefore(spark, path, vs.max)
          assert(snap.count() == 20 &&
            snap.filter(col("id") >= 100L).count() == 0,
            s"$ph: surviving record v${vs.max} is torn")
      }
    }
  }

  // ---------------------------------------------------------------
  // vacuum: tombstone-then-reclaim crash window
  // ---------------------------------------------------------------

  test("vacuum crash between tombstone and reclaim: readBefore fails closed, vacuum re-run converges") {
    import spark.implicits._
    val path = freshRoot("fm_vac")
    (0 until 30).map(i => (i.toLong, i % 2)).toDF("id", "c")
      .repartition(3).write.partitionBy("c").parquet(path)
    SM.compact(spark, path, targetFiles = 1)
    val v = SM.versions(path).max
    // sanity: the lineage serves before the crash
    assert(SM.readBefore(spark, path, v).count() == 30)
    FaultFs.arm(FaultFs.DeleteOp, Seq(s".retired/v$v"), 1, FaultFs.CrashBefore)
    val crashed =
      try { SM.vacuum(path, 0L, minRetentionMs = 0, force = true); false }
      catch { case t: Throwable if isInjected(t) => true }
      finally FaultFs.disarm()
    assert(crashed, "the reclaim delete must have fired")
    // the tombstone landed; the (possibly half-deleted) snapshot dir
    // must now read as GONE — not be trusted for reconstruction
    val e = intercept[IllegalArgumentException] { SM.readBefore(spark, path, v) }
    assert(e.getMessage.contains("already vacuumed"))
    // re-run converges; live store unaffected throughout
    SM.vacuum(path, 0L, minRetentionMs = 0, force = true)
    assert(SM.versions(path).isEmpty)
    assert(spark.read.parquet(path).count() == 30)
  }

  // ---------------------------------------------------------------
  // the advisory-lock caveat, demonstrated rather than asserted away
  // ---------------------------------------------------------------

  test("create-exclusive is advisory on the object-store scheme (and atomic on file://)") {
    registerFaulty()
    val d = java.nio.file.Files.createTempDirectory("fm_lock").toString
    val fp = StoreFs.qualified(s"faulty://$d/lock")
    val ffs = StoreFs.fsOf(fp)
    assert(StoreFs.createExclusive(ffs, fp, Seq("a")))
    // S3A-style create ignores exclusivity: the second "acquire"
    // SUCCEEDS — this is exactly why the docs demand external
    // serialization of maintainers on object stores
    assert(StoreFs.createExclusive(ffs, fp, Seq("b")),
      "faulty:// create-exclusive unexpectedly enforced exclusivity")
    val lp = StoreFs.qualified(s"$d/lock2")
    val lfs = StoreFs.fsOf(lp)
    assert(StoreFs.createExclusive(lfs, lp, Seq("a")))
    assert(!StoreFs.createExclusive(lfs, lp, Seq("b")),
      "file:// create-exclusive must be atomic")
  }
}
