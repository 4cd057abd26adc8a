package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-2 operators (OlapExtras, d_ngram_jacc,
  * t_bpe_tokens, m_frame_sample, format round-trips) plus plan-shape
  * assertions (pushdown, broadcast) that pin the scale contracts.
  */
class Round2Spec extends SparkSpec {

  test("q_asof_join: one row per purchase; gaps consistent") {
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    val rows = SparkEntry.queries("q_asof_join")(spark, sf).collect()
    assert(rows.length == purchases)
    rows.foreach { r =>
      val view = r.getAs[Long]("view_id")
      val gap = r.getAs[Long]("gap_ms")
      if (view == -1L) assert(gap == -1L, "no prior view must mean no gap")
      else assert(gap >= 0L, "a matched view must be at-or-before the purchase")
    }
  }

  test("q_range_join: intervals in range, users bounded by events") {
    val rows = SparkEntry.queries("q_range_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("interval_id") >= 0 && r.getAs[Long]("interval_id") < 20)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
    }
  }

  test("q_pivot: cells sum to total event count") {
    val total = Tables.events(spark, sf).count()
    val rows = SparkEntry.queries("q_pivot")(spark, sf).collect()
    val cellSum = rows.map(r =>
      Seq("click", "error", "purchase", "signup", "view")
        .map(c => r.getAs[Long](c)).sum).sum
    assert(cellSum == total)
  }

  test("q_percentiles: quartiles ordered within each flag") {
    SparkEntry.queries("q_percentiles")(spark, sf).collect().foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("q_salted_agg equals the direct group-by") {
    val salted = SparkEntry.queries("q_salted_agg")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val direct = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * 100 + lit(0.5)).cast("long")) / lit(100.0)).as("sum_value"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(salted == direct)
  }

  test("q_grouping_sets: grand total row counts all orders") {
    val total = Tables.orders(spark, sf).count()
    val rows = SparkEntry.queries("q_grouping_sets")(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
  }

  test("d_ngram_jacc: jaccard well-formed") {
    val rows = SparkEntry.queries("d_ngram_jacc")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("uni"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("t_bpe_tokens: piece classes bounded by piece count") {
    SparkEntry.queries("t_bpe_tokens")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_alpha") + r.getAs[Long]("n_num") <= r.getAs[Long]("n_pieces"))
    }
  }

  test("m_frame_sample: indices inside the clip, ≤11 samples each") {
    val rows = SparkEntry.queries("m_frame_sample")(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, g) =>
      // step = max(1, ⌊n/8⌋) gives ⌊(n−1)/step⌋+1 ≤ 11 samples over n∈[30,270)
      assert(g.length <= 11)
      g.foreach(r => assert(r.getAs[Long]("frame_idx") < r.getAs[Long]("n_frames")))
    }
  }

  test("format round-trips agree with each other") {
    def canon(name: String) =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Double]("sum_bal"),
          r.getAs[Long]("min_key"), r.getAs[Long]("max_key"))).toSet
    val csv = canon("src_csv")
    assert(csv == canon("src_json") && csv == canon("src_orc"))
  }

  test("plan shape: q1 pushes the shipdate filter into the parquet scan") {
    val df = SparkEntry.queries("q1_pricing")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "shipdate predicate must reach the scan")
  }

  test("plan shape: q5 joins its dimension chain via broadcast") {
    val df = SparkEntry.queries("q5_multijoin")(spark, sf)
    df.collect() // finalize adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dimension joins must broadcast")
  }

  test("v_pq: 5 ranked neighbors per query, recall overlap with exact L2") {
    val pq = SparkEntry.queries("v_pq")(spark, sf).collect()
    val byQ = pq.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.values.foreach(g => assert(g.length == 5))
    val exact = SparkEntry.queries("v_knn_l2")(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = pq.count(r =>
      exact.contains((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    assert(hits > 0, "PQ found no exact-L2-top-5 neighbor at all")
  }

  test("custom CosineTopK operator returns exactly v_knn_exact's rows") {
    def rows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim"))).toSeq
    assert(rows("v_knn_custom") == rows("v_knn_exact"))
  }

  test("custom CosineTopK plans through CosineTopKExec, no join/window") {
    val df = SparkEntry.queries("v_knn_custom")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CosineTopK"))
    assert(!plan.contains("Join") && !plan.contains("Window"),
      "whole-operator path must not fall back to join+window")
  }

  test("plan shape: bucketed join shuffles neither side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("src_bucketed")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed tables must join without re-shuffling")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plan shape: as-of join has no join operator at all (union+window)") {
    val df = SparkEntry.queries("q_asof_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not fan out via a join")
    assert(plan.contains("Window"))
  }
}
