package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant coverage for every SparkEntry query at sf0.001.
  * (Exact value parity vs DuckDB is covered by the driver gate and
  * tools/check.py; these specs pin structural invariants.)
  */
class EngineSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet),
      s"oracle keys without query: ${SparkEntry.oracleSql.keySet -- qs.keySet}")
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("q1 aggregates all flag/status combinations") {
    val rows = SparkEntry.queries("q1_pricing")(spark, sf).collect()
    assert(rows.length >= 4 && rows.length <= 9)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("v_knn_exact: 5 neighbors per query, sims sorted desc in [-1,1]") {
    val rows = SparkEntry.queries("v_knn_exact")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      assert(g.length == 5)
      val sims = g.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("sim"))
      assert(sims.sameElements(sims.sorted.reverse))
      assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    }
  }

  test("v_ann_lsh neighbors are a subset of exact top ranks' universe") {
    val exact = SparkEntry.queries("v_knn_exact")(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("v_ann_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty)
    // recall@3 against exact top-5: just require some overlap overall
    val hits = lsh.count(r =>
      exact.contains((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    assert(hits > 0, "LSH found no exact-top-5 neighbor at all")
  }

  test("d_minhash: 16 perms per doc, values in [0, P31)") {
    val df = SparkEntry.queries("d_minhash")(spark, sf)
    val perDoc = df.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSet == Set(16L))
    import graft.functions.HashFns
    val bad = df.filter(col("mh") < 0 || col("mh") >= HashFns.P31).count()
    assert(bad == 0)
  }

  test("d_minhash_pairs jaccard estimates within [0,1]") {
    val rows = SparkEntry.queries("d_minhash_pairs")(spark, sf).collect()
    assert(rows.forall { r =>
      val j = r.getAs[Double]("jacc_est"); j >= 0.0 && j <= 1.0
    })
  }

  test("d_exact groups cover all docs") {
    val total = SparkEntry.queries("d_exact")(spark, sf)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("t_langid predicts a language for every doc") {
    val df = SparkEntry.queries("t_langid")(spark, sf)
    assert(df.filter(col("pred_lang").isNull).count() == 0)
    assert(df.count() == Tables.documents(spark, sf).count())
  }

  test("q_sessionize: session ids start at 1 and durations non-negative") {
    val rows = SparkEntry.queries("q_sessionize")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("duration_s") >= 0))
    val firstSessions = rows.groupBy(_.getAs[Long]("user_id"))
      .map(_._2.map(_.getAs[Long]("session_id")).min)
    assert(firstSessions.forall(_ == 1L))
  }

  test("v_ivf returns ranked neighbors per query") {
    val rows = SparkEntry.queries("v_ivf")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { g =>
      val rnks = g.map(_.getAs[Long]("rnk")).sorted
      assert(rnks.head == 1L)
    }
  }
}
