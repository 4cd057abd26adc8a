package graft

import org.apache.spark.sql.functions._

/** Invariants + plan-shape assertions for the round-3 operators
  * (filtered/grouped/multi-probe/scalar-quantized search, index
  * stats, histogram, correlation, CDC compaction, PII redaction,
  * readability, blur stencil, audio energy).
  */
class Round3Spec extends SparkSpec {

  test("v_filtered_knn: every neighbor shares the query's label") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = SparkEntry.queries("v_filtered_knn")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("label") == labels(r.getAs[Long]("query_id")),
        "filter must restrict candidates to the query's own label")
      assert(labels(r.getAs[Long]("neighbor_id")) == r.getAs[Int]("label"))
    }
  }

  test("v_filtered_knn is a subset-ranking of the unfiltered search space") {
    // the top-1 filtered sim can never exceed the top-1 unfiltered sim
    val unf = SparkEntry.queries("v_knn_exact")(spark, sf).collect()
      .filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("sim")).toMap
    SparkEntry.queries("v_filtered_knn")(spark, sf).collect()
      .filter(_.getAs[Long]("rnk") == 1L)
      .foreach(r => assert(r.getAs[Double]("sim") <= unf(r.getAs[Long]("query_id"))))
  }

  test("v_knn_per_label: one row per (query, present label)") {
    val nLabels = Tables.embeddings(spark, sf).select("label").distinct().count()
    val rows = SparkEntry.queries("v_knn_per_label")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 3)
    byQ.values.foreach { g =>
      assert(g.length <= nLabels)
      assert(g.map(_.getAs[Int]("label")).distinct.length == g.length)
    }
  }

  test("v_multiprobe candidates contain the exact band0 bucket matches") {
    // probing {band0} ∪ Hamming-1 flips is a superset of the band0-only
    // candidate set, so multiprobe's top-1 is ≥ any band0-only match
    val rows = SparkEntry.queries("v_multiprobe")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { g =>
      val rnks = g.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(rnks == (1L to rnks.length.toLong), "ranks must be dense from 1")
    }
  }

  test("v_index_stats: bucket occupancies sum to 2×corpus, band_val in range") {
    val n = Tables.embeddings(spark, sf).count()
    val rows = SparkEntry.queries("v_index_stats")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == 2 * n,
      "each vector appears in exactly one bucket per band")
    rows.foreach { r =>
      assert(r.getAs[Long]("band_val") >= 0 && r.getAs[Long]("band_val") < 16)
      assert(r.getAs[Long]("n_labels") <= r.getAs[Long]("n_vectors"))
    }
  }

  test("v_scalar_quant: 5 dense-ranked rows per query, high recall vs exact L2") {
    val sq = SparkEntry.queries("v_scalar_quant")(spark, sf).collect()
    val byQ = sq.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.values.foreach(g => assert(g.length == 5))
    // quantized L2 approximates exact L2 to 8-bit precision — recall
    // should be near-perfect, unlike a lossier PQ codebook
    val exact = SparkEntry.queries("v_knn_l2")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = sq.count(r =>
      exact.contains((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    assert(hits >= 40, s"SQ8 recall collapsed: $hits/50 overlap with exact L2 top-5")
  }

  test("q_histogram: buckets within range, counts cover all orders") {
    val total = Tables.orders(spark, sf).count()
    val rows = SparkEntry.queries("q_histogram")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    rows.foreach(r => assert(r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 20))
    val los = rows.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Double]("bucket_lo")).toSeq
    assert(los == los.sorted, "bucket_lo must increase with bucket id")
  }

  test("q_corr_stats: correlations in [-1,1], one row per flag") {
    val rows = SparkEntry.queries("q_corr_stats")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr_qty_price")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("q_dedup_latest: keys unique, timestamps are the per-key max") {
    val rows = SparkEntry.queries("q_dedup_latest")(spark, sf).collect()
    val keys = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    assert(keys.distinct.length == keys.length, "compaction must emit one row per key")
    val maxTs = Tables.events(spark, sf).filter(col("user_id") < 100)
      .groupBy("user_id", "event_type")
      .agg(date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("m")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) -> r.getAs[String]("m"))
      .toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))
      assert(r.getAs[String]("last_ts") == maxTs(k))
    }
  }

  test("t_pii_redact: redaction is idempotent on the hash") {
    val rows = SparkEntry.queries("t_pii_redact")(spark, sf).collect()
    assert(rows.nonEmpty)
    // a doc with zero matches must hash to md5(lower(text)) unchanged
    val zero = rows.filter(r =>
      r.getAs[Long]("n_emails") == 0 && r.getAs[Long]("n_phones") == 0)
    assert(zero.nonEmpty)
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(lower(col("text"))).as("h")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("h")).toMap
    zero.foreach(r =>
      assert(r.getAs[String]("red_hash") == orig(r.getAs[Long]("doc_id"))))
  }

  test("t_readability: counts positive, score formula reproduced") {
    SparkEntry.queries("t_readability")(spark, sf).collect().foreach { r =>
      val (w, s, y) = (r.getAs[Long]("n_words").toDouble,
        r.getAs[Long]("n_sentences").toDouble, r.getAs[Long]("n_vowel_groups").toDouble)
      assert(w >= 1 && s >= 1 && y >= 1)
      val expected = BigDecimal(206.835 - 1.015 * (w / s) - 84.6 * (y / w))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("flesch") - expected) < 1e-9)
    }
  }

  test("m_gauss_blur: full coverage, blur bounded by the pixel range") {
    val rows = SparkEntry.queries("m_gauss_blur")(spark, sf).collect()
    assert(rows.length == math.min(40, Tables.documents(spark, sf).count()))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_px") == 256, "every output pixel must be produced")
      assert(r.getAs[Long]("min_b") >= 0 && r.getAs[Long]("max_b") <= 255,
        "normalized binomial kernel cannot leave [0,255]")
    }
  }

  test("m_audio_energy: 8 frames × 64 samples, RMS consistent with energy") {
    val rows = SparkEntry.queries("m_audio_energy")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach(g => assert(g.length == 8))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_samples") == 64)
      val e = r.getAs[Long]("energy").toDouble
      assert(math.abs(r.getAs[Double]("rms") - BigDecimal(math.sqrt(e / 64.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("v_rrf_fusion: 5 per query; fused scores bounded by 2/61") {
    val rows = SparkEntry.queries("v_rrf_fusion")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      g.foreach { r =>
        val s = r.getAs[Double]("rrf")
        assert(s > 0.0 && s <= 2.0 / 61.0 + 1e-9,
          "RRF of two rankings with k=60 is at most 1/61 + 1/61")
      }
    }
  }

  test("d_cdc_chunks: chunk counts well-formed, boundaries content-stable") {
    val rows = SparkEntry.queries("d_cdc_chunks")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chunks") >= 1)
      assert(r.getAs[Long]("n_uniq_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[String]("head_chunk") != null)
    }
    // content-defined property: identical texts yield identical chunk
    // stats (the md5 head chunk pins the actual boundary bytes)
    val byText = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("th")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("th")).toMap
    rows.groupBy(r => byText(r.getAs[Long]("doc_id"))).values.foreach { g =>
      assert(g.map(_.getAs[String]("head_chunk")).distinct.length == 1)
      assert(g.map(_.getAs[Long]("n_chunks")).distinct.length == 1)
    }
  }

  test("d_chunk_dedup: totals consistent with per-doc chunk stats") {
    val summary = SparkEntry.queries("d_chunk_dedup")(spark, sf).collect().head
    val perDoc = SparkEntry.queries("d_cdc_chunks")(spark, sf).collect()
    assert(summary.getAs[Long]("total_chunks") == perDoc.map(_.getAs[Long]("n_chunks")).sum)
    assert(summary.getAs[Long]("uniq_chunks") <= summary.getAs[Long]("total_chunks"))
    assert(summary.getAs[Long]("shared_chunks") <= summary.getAs[Long]("uniq_chunks"))
    val s = summary.getAs[Double]("savings_pct")
    assert(s >= 0.0 && s < 100.0)
  }

  test("t_entropy: bounded by log of alphabet size, constant text = 0") {
    val rows = SparkEntry.queries("t_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("entropy")
      val maxE = math.log(r.getAs[Long]("n_distinct").toDouble)
      assert(e >= -1e-9 && e <= maxE + 1e-9,
        s"entropy $e outside [0, ln(n_distinct)=$maxE]")
      if (r.getAs[Long]("n_distinct") == 1) assert(math.abs(e) < 1e-9)
    }
  }

  test("m_phash: 63-bit hashes with ~half the bits set") {
    val rows = SparkEntry.queries("m_phash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("phash")
      val nb = r.getAs[Long]("n_bits")
      assert(h >= 0L, "bit 63 is never set (DC excluded)")
      assert(java.lang.Long.bitCount(h) == nb)
      // 31 of 63 coefficients exceed the rank-32 median unless tied
      assert(nb <= 31 && nb >= 20, s"bit balance off: $nb set")
    }
  }

  test("m_phash_pairs: 20 closest pairs, hamming ascending and exact") {
    val phash = SparkEntry.queries("m_phash")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    val rows = SparkEntry.queries("m_phash_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hams = rows.map(_.getAs[Long]("hamming")).toSeq
    assert(hams == hams.sorted)
    rows.filter(r => phash.contains(r.getAs[Long]("doc1"))
        && phash.contains(r.getAs[Long]("doc2")))
      .foreach { r =>
        val expected = java.lang.Long.bitCount(
          phash(r.getAs[Long]("doc1")) ^ phash(r.getAs[Long]("doc2")))
        assert(r.getAs[Long]("hamming") == expected)
      }
  }

  test("v_ivf_pq: per-query results, ADC distances agree with full-scan PQ") {
    val ivfpq = SparkEntry.queries("v_ivf_pq")(spark, sf).collect()
    val byQ = ivfpq.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.values.foreach(g => assert(g.length >= 1 && g.length <= 5))
    // same codebooks → wherever a pair appears in both the pruned and
    // the full-scan ranking, the ADC distance must be identical
    val full = SparkEntry.queries("v_pq")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[Double]("adc_dist")).toMap
    val both = ivfpq.filter(r =>
      full.contains((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    assert(both.nonEmpty, "pruned search found nothing the full scan ranked top-5")
    both.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(r.getAs[Double]("adc_dist") == full(k))
    }
  }

  test("q_scd2: versions dense, intervals chain, one current row per user") {
    val rows = SparkEntry.queries("q_scd2")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq == (1L to sorted.length.toLong))
      assert(sorted.count(_.getAs[Long]("is_current") == 1L) == 1)
      assert(sorted.last.getAs[Long]("is_current") == 1L)
      // each version closes exactly where the next one opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
          // consecutive versions must differ in the tracked attribute
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"))
        case _ =>
      }
    }
  }

  test("q_window_range: trailing window bounded by day revenue sums") {
    val rows = SparkEntry.queries("q_window_range")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("l_suppkey")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[String]("ship_day"))
      sorted.foreach { r =>
        assert(r.getAs[Double]("wk_rev") >= r.getAs[Double]("day_rev") - 1e-9,
          "the 7-day window includes the current day")
      }
      // wk_rev on an isolated first day equals its day_rev
      assert(math.abs(sorted.head.getAs[Double]("wk_rev")
        - sorted.head.getAs[Double]("day_rev")) < 1e-9 ||
        sorted.length > 1)
    }
  }

  test("d_pipeline: keep counts monotone per language, totals reconcile") {
    val rows = SparkEntry.queries("d_pipeline")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    rows.foreach { r =>
      val (n, ex, fi) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_exact_keep"), r.getAs[Long]("n_final_keep"))
      assert(fi <= ex && ex <= n, "each stage can only remove documents")
      assert(r.getAs[Double]("keep_ratio") <= 1.0)
    }
  }

  test("v_refine: exact re-rank never scores better than full exact search") {
    val refined = SparkEntry.queries("v_refine")(spark, sf).collect()
    assert(refined.groupBy(_.getAs[Long]("query_id")).size == 10)
    val exact = SparkEntry.queries("v_knn_exact")(spark, sf).collect()
      .filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("sim")).toMap
    refined.filter(_.getAs[Long]("rnk") == 1L).foreach { r =>
      assert(r.getAs[Double]("sim") <= exact(r.getAs[Long]("query_id")) + 1e-9,
        "refined candidates are a subset of the corpus")
    }
  }

  test("m_resize: 64 output pixels per image, means inside pixel range") {
    val rows = SparkEntry.queries("m_resize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_px") == 64)
      assert(r.getAs[Long]("min_p") >= 0 && r.getAs[Long]("max_p") <= 255)
    }
  }

  test("q_multi_distinct: one Expand pass, distincts bounded sensibly") {
    val df = SparkEntry.queries("q_multi_distinct")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("n_user_days") >= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("n_user_days") <= r.getAs[Long]("n"))
    }
    assert(df.queryExecution.executedPlan.toString.contains("Expand"),
      "multiple COUNT DISTINCTs must plan through one Expand, not N jobs")
  }

  test("t_bigram_lm: log-probs negative, common-transition docs score higher") {
    val rows = SparkEntry.queries("t_bigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logprob") < 0.0, "probabilities are < 1")
      assert(r.getAs[Long]("n_bigrams") >= 1)
    }
  }

  test("plan shape: v_filtered_knn broadcasts the query side") {
    val df = SparkEntry.queries("v_filtered_knn")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "query side must broadcast — corpus never shuffles for exact search")
  }

  test("plan shape: q_histogram never shuffles orders for the stats pass") {
    val df = SparkEntry.queries("q_histogram")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "min/max stats must attach via a 1-row broadcast, not a shuffle join")
  }

  test("plan shape: v_multiprobe probes via equi-join on the bucket key") {
    val df = SparkEntry.queries("v_multiprobe")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "probe set must hash-join the corpus bucket key (no theta join)")
  }
}
