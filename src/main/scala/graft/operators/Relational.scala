package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{HashFns => H}

/** Relational / OLAP core over the TPC-H-ish tables.
  *
  * Oracle-parity conventions (see SURVEY.md §6):
  *  - money aggregates go through decimal(18,2) casts (order-independent
  *    exact sums) and are emitted as doubles;
  *  - averages are written explicitly as castDouble(sum)/count so Spark
  *    and DuckDB use the same double division;
  *  - time buckets are emitted as formatted strings (no parquet
  *    timestamp encoding concerns);
  *  - every top-k breaks ties on a key column.
  *
  * Scale notes: all aggregations are declarative (map-side partial agg
  * free); dimension sides of joins are broadcast; filters sit directly
  * on the scans so parquet pushdown applies.
  */
object Relational {

  /** Money values are summed as exact integer cents: floor(x·100+0.5)
    * is bit-deterministic on any engine (unlike double→decimal casts,
    * whose tie-rounding differs between Spark's HALF_UP and DuckDB's
    * half-to-even), and long sums are order-independent.
    */
  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")
  private def moneySum(c: Column): Column = sum(cents(c)) / lit(100.0)

  /** Pricing summary report (TPC-H Q1 shape). */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        (moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Shipping-priority top-10 (TPC-H Q3 shape): join big fact with
    * filtered dims; the dim side (customer) is broadcast.
    */
  def q3TopN(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === ord("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** Regional supplier volume (TPC-H Q5 shape): 6-way join where every
    * dimension chain is broadcast; only lineitem⋈orders shuffles.
    */
  def q5MultiJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp),
        li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("n_name")
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** Returned-item customer ranking (TPC-H Q10 shape), top-20. */
  /** q6_forecast (TPC-H Q6 shape): revenue-change forecast — a pure
    * filter + scalar aggregate. The whole query is one scan with every
    * predicate pushed to parquet (date range, discount band, quantity
    * cap) and a map-side partial sum; no shuffle carries more than one
    * row per task. The canonical "does the engine push down and
    * prune" probe.
    */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))

  /** q14_promo (TPC-H Q14 shape): promotion revenue share per month —
    * the part dimension broadcasts, revenue folds as exact integer
    * cents (both the promo-only and total sums), and the share is a
    * division of the two cents sums, so the ratio is fp-unambiguous.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val part = Tables.part(spark, dir).select("p_partkey", "p_type")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("l_month"))
      .agg(
        (sum(when(col("p_type") === "PROMO",
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .otherwise(lit(0L))) / lit(100.0)).as("promo_rev"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_rev"))
      .select(col("l_month"), col("promo_rev"), col("total_rev"),
        round(col("promo_rev") * 100.0 / col("total_rev"), 6).as("promo_pct"))
      .orderBy("l_month")
  }

  /** q18_bigorders (TPC-H Q18 shape): large-volume customers — the
    * quantity group-by prunes to the few qualifying orders BEFORE any
    * join (map-side partial sums; HAVING > 300 keeps a handful), then
    * the tiny survivor set drives broadcast joins against orders and
    * customer. At 100 TB the only big shuffle is the l_orderkey
    * aggregate; the joins never move the fact table.
    */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    ord.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)
  }

  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** Orders having at least one high-value lineitem — left-semi join
    * (EXISTS): never materializes the probe side twice.
    */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val big = Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice") > 90000)
      .select(col("l_orderkey"))
    ord.join(big, ord("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
           moneySum(col("o_totalprice")).as("sum_total"))
      .orderBy("o_orderstatus")
  }

  /** Customers with no recent orders — left-anti join (NOT EXISTS). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Top-3 parts per brand by retail price — windowed top-k: the
    * row_number prunes inside each partition before any global sort.
    */
  def qWindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(spark, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("p_brand"), col("rk"), col("p_partkey"),
              (cents(col("p_retailprice")) / lit(100.0)).as("price"))
      .orderBy("p_brand", "rk")
  }

  /** Running revenue per supplier over ship dates — window frame agg.
    * Emitted per (supplier, ship-date) after an exact daily pre-agg so
    * the running sum is deterministic (no intra-day ordering ambiguity).
    */
  def qRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 5)
      .groupBy(col("l_suppkey"), date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
    val w = Window.partitionBy("l_suppkey").orderBy("ship_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_rev", sum(col("day_cents")).over(w) / lit(100.0))
      .select(col("l_suppkey"), col("ship_day"),
              (col("day_cents") / lit(100.0)).as("day_rev"), col("running_rev"))
      .orderBy("l_suppkey", "ship_day")
  }

  /** Events per hour per type with average value — time bucketing. */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           (moneySum(col("value")) / count(lit(1))).as("avg_value"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30 min) via lag + cumulative flag —
    * the classic two-window pattern; one shuffle on user_id.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
    ev.withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > 30L * 60 * 1000, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
           floor((max(col("ts_ms")) - min(col("ts_ms"))) / 1000).cast("long").as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** Exact distinct users per event type (shuffle-dedup then agg). */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Cube aggregation over nation × market segment (all 4 grouping
    * sets) — dimension join broadcast, one shuffle for the cube agg.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    // Dataset.cube/rollup over a join's output trips Spark 4.1's
    // self-join ambiguity detector (false positive — the grouping
    // attrs carry dataset lineage tags from both join inputs), so this
    // operator goes through the SQL surface, which carries no tags.
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("c_acctbal"))
      .createOrReplaceTempView("graft_qcube_base")
    spark.sql("""
      SELECT COALESCE(n_name, 'ALL') AS nation,
        COALESCE(c_mktsegment, 'ALL') AS segment,
        COUNT(*) AS n,
        SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0D AS acctbal
      FROM graft_qcube_base
      GROUP BY CUBE (n_name, c_mktsegment)
      ORDER BY nation, segment""")
  }

  /** Conversion funnel view→click→purchase by first-occurrence order
    * per user: one shuffle on user_id, then a global roll-up.
    */
  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ts_ms"))
    val perUser = ev.groupBy("user_id").agg(
      min(when(col("event_type") === "view", col("ts_ms"))).as("t_view"),
      min(when(col("event_type") === "click", col("ts_ms"))).as("t_click"),
      min(when(col("event_type") === "purchase", col("ts_ms"))).as("t_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      count(col("t_view")).as("n_view"),
      count(when(col("t_click") > col("t_view"), lit(1))).as("n_view_click"),
      count(when(col("t_click") > col("t_view") &&
                 col("t_purchase") > col("t_click"), lit(1))).as("n_view_click_purchase"))
  }

  /** Approximate distinct via HyperLogLog++ — the 100 TB path where an
    * exact distinct shuffle is not affordable. No SQL oracle (HLL
    * estimates are implementation-specific); rows-only check.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type")

  /** q_approx_distinct_err: the HLL sketch's error gate — |estimate −
    * exact| / exact must stay within 5× the requested rsd. The oracle
    * cannot reproduce sketch internals, but it CAN assert the bound:
    * its expected within_tol is literally TRUE, so a sketch drifting
    * out of tolerance breaks the hash match and the driver sees it.
    * Both inputs are 5-row aggregates; the join is trivial.
    */
  def qApproxDistinctErr(spark: SparkSession, dir: String): DataFrame = {
    // deliberately TWO aggregation passes + a 5-row join, NOT one
    // groupBy with both aggregates: mixing a distinct aggregate with
    // the HLL makes Spark plan them through Expand, where the HLL
    // partial runs per (event_type, user_id) group — one rsd=0.01
    // sketch (~KBs) built and merged PER DISTINCT USER. Measured 2×
    // slower at sf0.1 and far worse at scale, where the sketch-merge
    // shuffle dwarfs the second columnar scan this plan pays instead.
    val ev = Tables.events(spark, dir)
    val approx = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
    exact.join(approx, "event_type")
      .select(col("event_type"), col("n_users"),
        (abs(col("approx_users") - col("n_users")).cast("double") / col("n_users")
          <= 0.05).as("within_tol"))
      .orderBy("event_type")
  }

  /** q_freq_items: heavy-hitters sketch with its guarantee as the
    * gate — the hot-key detection op a pipeline runs before choosing
    * salting factors. Spark's freqItems (Karp-Papadimitriou-Shenker)
    * may return false positives but NEVER misses an item above the
    * support threshold; the query joins the exact ≥-support set
    * against the sketch output and emits the containment flag, which
    * the oracle expects to be literal TRUE — same contract as the
    * HLL/quantile error gates. Exact side is one aggregation; sketch
    * side is one single-pass scan.
    */
  def qFreqItemsErr(spark: SparkSession, dir: String): DataFrame = {
    val support = 0.15
    val ev = Tables.events(spark, dir)
    val sketch = ev.stat.freqItems(Array("event_type"), support)
      .select(explode(col("event_type_freqItems")).as("item"))
    // STRICT >: KPS only guarantees items strictly above the support
    // threshold appear in the sketch — a key landing exactly on the
    // boundary may legitimately be absent, which would fail the
    // literal-TRUE gate on correct sketch behavior
    val exact = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .join(broadcast(ev.agg(count(lit(1)).as("total"))))
      .filter(col("n") > col("total") * support)
      .select(col("event_type"), col("n"))
    exact.join(broadcast(sketch), col("event_type") === col("item"), "left")
      .select(col("event_type"), col("n"), col("item").isNotNull.as("in_sketch"))
      .orderBy("event_type")
  }

  /** q_cms_err: count-min sketch with its one-sided bound as the gate
    * — the per-key frequency estimator for streams too wide to count
    * exactly. CMS NEVER underestimates (hash collisions only add), and
    * at eps=0.001 over 5 distinct keys overestimation is bounded by
    * eps·total with ≥99% confidence; both bounds ride as flags the
    * oracle expects to be literal TRUE. The sketch is built
    * distributed (mergeable per partition); only the 5-key probe runs
    * on the driver.
    */
  def qCmsErr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val cms = ev.stat.countMinSketch(col("event_type"),
      eps = 0.001, confidence = 0.99, seed = 42)
    val exact = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val total = exact.map(_._2).sum
    exact.toSeq.map { case (t, n) =>
      val est = cms.estimateCount(t)
      (t, n, est >= n, est <= n + (0.001 * total).ceil.toLong)
    }.toDF("event_type", "n", "ge_ok", "tight_ok")
      .orderBy("event_type")
  }

  /** Rollup aggregation: status × priority with subtotals + grand total. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              col("n"), col("total"))
      .orderBy("status", "priority")

  /** q13_custdist (TPC-H Q13 shape): order-count distribution over
    * customers, including the zero-order bucket. The classic left
    * outer join + double aggregation — but shaped so the fact table
    * never carries customer payload: orders pre-aggregates to one
    * (custkey, count) row map-side-partially, and only that compact
    * counts table joins customer. At 100 TB both inputs shuffle once
    * on custkey and the second aggregate's domain is tiny (distinct
    * order counts), so it collapses to a near-free partial agg.
    */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    Tables.customer(spark, dir).select("c_custkey")
      .join(cnt, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q15_topsupp (TPC-H Q15 shape): the top revenue supplier(s) over a
    * quarter — a scalar MAX subquery against a derived revenue view.
    * Revenue folds as exact integer cents, so the `= max` equality is
    * integer-exact on both engines (double equality would be an fp
    * coin-flip). The revenue view aggregates the filtered fact once;
    * the 1-row max broadcasts back against it; supplier is a broadcast
    * dim. The fact table shuffles once, on l_suppkey.
    */
  def q15TopSupp(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("rev_cents"))
    val mx = rev.agg(max(col("rev_cents")).as("max_cents"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    rev.join(broadcast(mx)).filter(col("rev_cents") === col("max_cents"))
      .join(broadcast(supp), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cents") / lit(100.0)).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** q17_smallqty (TPC-H Q17 shape): average yearly revenue lost to
    * small-quantity orders of one brand — the correlated-average
    * pattern (l_quantity < 0.2·avg(l_quantity) per part). The fp
    * threshold is rewritten integer-exactly: q < S/(5n) ⇔ 5·q·n < S
    * with q, S in cents — so both engines keep or drop the same
    * boundary rows. The brand filter broadcasts into the fact scan
    * first; the per-part stats aggregate over only the surviving
    * rows, then rejoin on partkey (one shuffle, brand-pruned).
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val bp = Tables.part(spark, dir)
      .filter(col("p_brand") === "Brand#11").select("p_partkey")
    val lp = Tables.lineitem(spark, dir)
      .join(broadcast(bp), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val st = lp.groupBy(col("l_partkey").as("pk"))
      .agg(sum(cents(col("l_quantity"))).as("sq"), count(lit(1)).as("nq"))
    lp.join(st, col("l_partkey") === col("pk"))
      .filter(cents(col("l_quantity")) * col("nq") * 5 < col("sq"))
      .agg((sum(cents(col("l_extendedprice"))) / lit(700.0)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** q22_idle (TPC-H Q22 shape): high-balance customers with no recent
    * urgent order, grouped by nation — anti-join against the filtered
    * fact plus a scalar-average threshold. The average test is
    * integer-exact: bal > S/n ⇔ cents(bal)·n > S with S = Σ cents over
    * positive balances (double-sum ordering differences between
    * engines can never flip a row). The 1-row stats frame broadcasts;
    * the anti-join is the only fact-side shuffle and its build side is
    * pre-filtered at the scan (priority + date pushed to parquet), so
    * it carries only the surviving o_custkey column.
    */
  def q22Idle(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val pos = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(cents(col("c_acctbal"))).as("s"), count(lit(1)).as("n"))
    val rich = cust.join(broadcast(pos))
      .filter(cents(col("c_acctbal")) * col("n") > col("s"))
    val recentUrgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
      .select("o_custkey")
    rich.join(recentUrgent,
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntry")
  }

  /** q_gaps_islands: consecutive-day activity streaks per user (the
    * gaps-and-islands pattern): distinct active days → row_number per
    * user → island key = day_number − row_number (constant within a
    * consecutive run, computed as integer days from a fixed epoch so
    * both engines group identically). One shuffle on user_id covers
    * the distinct, the window, and both aggregates — everything after
    * the exchange is partition-local.
    */
  def qGapsIslands(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")),
          lit("2024-01-01").cast("timestamp")).cast("long").as("day_num"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day_num")
    val isl = ud.withColumn("grp", col("day_num") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
    isl.groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
        sum(col("len")).as("active_days"))
      .orderBy("user_id")
  }

  /** q_retention: cohort retention matrix over the events stream — the
    * product-analytics staple (cohort = day of first purchase, cell =
    * distinct users active n days later). Two shuffles, both on
    * user_id: the first-touch aggregate and the self-join back to the
    * activity rows — co-partitioned, so at 100 TB the join is
    * shuffle-free after the first exchange; the final (cohort, day)
    * aggregate's domain is days², tiny at any scale.
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
    val f = p.groupBy("user_id").agg(min(col("d")).as("cd"))
    p.join(f, "user_id")
      .groupBy(date_format(col("cd"), "yyyy-MM-dd").as("cohort"),
        datediff(col("d"), col("cd")).cast("long").as("day_n"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "day_n")
  }

  /** q4_priority (TPC-H Q4 shape): order-priority checking — orders in
    * one quarter having at least one LATE lineitem (shipped > 90 days
    * after the order date; this schema carries no commit/receipt
    * dates, so lateness is ship-lag), counted per priority. The EXISTS
    * compiles to ONE left-semi equi-join on orderkey with the
    * non-equi lateness predicate riding the join; both sides project
    * to ≤3 columns before the single orderkey shuffle, and the
    * quarter filter is pushed to the orders scan so the semi-join's
    * probe side is already pruned at the files.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q12_latemode (TPC-H Q12 shape): late-shipment accounting per
    * line status (the schema's stand-in for ship mode) — for 1997
    * shipments more than 60 days after their order date, how many
    * belonged to high- vs low-priority orders. The fact and orders
    * both shuffle ONCE on orderkey (orders is 1:4 of lineitem — too
    * big to broadcast at 100 TB); orders projects to (key, date,
    * priority) before the exchange and the priority split is a
    * map-side conditional sum after the join.
    */
  def q12LateMode(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_shipdate", "l_linestatus")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** q19_disjunct (TPC-H Q19 shape): discounted revenue under a
    * DISJUNCTION of three brand/size/quantity clauses — the classic
    * OR-predicate probe. Catalyst extracts the common `l_partkey =
    * p_partkey` equi-condition so the plan is one BROADCAST hash join
    * (part is the dim side) with the disjunction evaluated as a
    * post-join filter, never a nested-loop; the quantity bounds the
    * clauses share (1..30) are pushed to the fact scan as a
    * conjunctive envelope.
    */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 50) &&
          col("l_quantity").between(20, 30)))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** q21_waiting (TPC-H Q21 shape): suppliers who single-handedly held
    * up multi-supplier orders — the reference formulation is an
    * EXISTS + NOT-EXISTS pair of lineitem self-joins; here both
    * collapse into ONE aggregation per order (n distinct suppliers,
    * n distinct LATE suppliers, and — when exactly one — its key via
    * min-over-late), which is the shape that survives 100 TB: the
    * fact shuffles once on orderkey instead of three times, and the
    * blame condition (≥2 suppliers, exactly 1 late) is a filter over
    * the per-order aggregate. Late = shipped > 60 days after the
    * order date (no receipt/commit dates in this schema); orders
    * restricted to finished ('F') status, supplier names broadcast.
    */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val fo = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val ll = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(fo, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late_supp",
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          col("l_suppkey")))
    val perOrder = ll.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("late_supp")).as("n_late"),
        min(col("late_supp")).as("blame"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    perOrder.groupBy("blame").agg(count(lit(1)).as("numwait"))
      .join(broadcast(supp), col("blame") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Region-filtered suppliers (nation ⋈ region broadcast chain) —
    * shared by the Q2/Q7/Q8/Q11/Q20 shapes. Both dims are tiny at any
    * scale (25 nations, 5 regions), so the chain collapses into the
    * supplier scan as two broadcast hash joins.
    */
  private def suppliersIn(spark: SparkSession, dir: String,
                          region: String): DataFrame = {
    val n = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === region)), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
  }

  /** q2_mincost (TPC-H Q2 shape): for each qualifying part, the
    * EU supplier(s) offering it at the minimum observed price — the
    * correlated-MIN-subquery pattern. No partsupp table exists in
    * this schema, so "offer price" is the minimum observed
    * l_extendedprice per (part, supplier), in exact cents (the `=
    * min` equality is integer, never an fp coin-flip). The part
    * filter is a few-row broadcast that prunes the fact BEFORE its
    * only shuffle (groupBy part+supplier); the per-part min then
    * re-joins the tiny aggregated cost table — a second exchange over
    * rows whose count is bounded by (parts × suppliers), independent
    * of fact size.
    */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val ep = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 5)
      .select("p_partkey")
    val es = suppliersIn(spark, dir, "EUROPE")
      .select("s_suppkey", "s_name", "s_acctbal")
    val cost = Tables.lineitem(spark, dir)
      .join(broadcast(ep), col("l_partkey") === col("p_partkey"))
      .join(broadcast(es.select("s_suppkey")), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(cents(col("l_extendedprice"))).as("cost_cents"))
    val mn = cost.groupBy(col("pk").as("mpk")).agg(min(col("cost_cents")).as("m"))
    cost.join(mn, col("pk") === col("mpk") && col("cost_cents") === col("m"))
      .join(broadcast(es), col("sk") === col("s_suppkey"))
      .select(col("pk").as("p_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), (col("cost_cents") / lit(100.0)).as("cost"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  /** q11_important (TPC-H Q11 shape): parts whose revenue through one
    * region's suppliers exceeds a fixed fraction of that region's
    * total — GROUP BY + HAVING against a scalar subquery. The
    * threshold test is integer cross-multiplied (value·1000 > total)
    * so both engines keep identical boundary parts; the global total
    * is a 1-row broadcast re-aggregated from the per-part sums (one
    * fact shuffle on partkey, region suppliers broadcast into the
    * scan).
    */
  def q11Important(spark: SparkSession, dir: String): DataFrame = {
    val as = suppliersIn(spark, dir, "ASIA").select("s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .join(broadcast(as), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("value_cents"))
    val total = value.agg(sum(col("value_cents")).as("total_cents"))
    value.join(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents"))
      .select(col("l_partkey").as("p_partkey"),
        (col("value_cents") / lit(100.0)).as("value"))
      .orderBy(col("value_cents").desc, col("p_partkey"))
  }

  /** q16_suppcnt (TPC-H Q16 shape): how many distinct suppliers offer
    * each (brand, type, size) — with a brand/type exclusion and an
    * anti-join against a "complaints" supplier set (name ending in 7;
    * this schema has no comment column). Part-supplier pairs come
    * from a DISTINCT over the fact projected to two key columns —
    * the one corpus-wide shuffle, combining map-side — then the part
    * attributes broadcast in and the count-distinct runs over the
    * already-distinct pairs (a cheap re-key on the tiny pair set).
    */
  def q16SuppCnt(spark: SparkSession, dir: String): DataFrame = {
    val pf = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = Tables.supplier(spark, dir)
      .filter(col("s_name").endsWith("7")).select("s_suppkey")
    val pairs = Tables.lineitem(spark, dir)
      .join(broadcast(pf.select("p_partkey")), col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
    pairs.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q20_excess (TPC-H Q20 shape): American suppliers who moved more
    * than 30 units of some red part in 1996 — the nested-semi-join
    * pattern (parts semi into the fact, per-(supplier, part) volume
    * threshold, survivors semi into supplier). The fact is pruned by
    * BOTH broadcast semis before its single (suppkey, partkey)
    * shuffle; the threshold filter runs on the aggregate, and the
    * final semi-join is against the tiny distinct-supplier set.
    */
  def q20Excess(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("red ")).select("p_partkey")
    val amSupp = suppliersIn(spark, dir, "AMERICA")
      .select("s_suppkey", "s_name")
    val movers = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(cents(col("l_quantity"))).as("qty_cents"))
      .filter(col("qty_cents") > 30 * 100L)
      .select("l_suppkey").distinct()
    amSupp.join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** q7_volume (TPC-H Q7 shape): shipping volume between the nations
    * of a fixed set, by direction pair and ship year. Customer and
    * supplier are both pre-filtered to the set — each collapses to a small
    * broadcast that prunes its fact side BEFORE the single
    * orderkey shuffle joining lineitem to orders; the (supp_nation,
    * cust_nation) anti-symmetry filter and year bucketing are
    * map-side. Revenue folds as exact cents.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "cust_nation")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q8_share (TPC-H Q8 shape): one nation's market share inside a
    * region's market for one part type, per order year. Share =
    * ratio of two exact integer cents sums folded in the SAME
    * aggregation pass (conditional numerator), so no second scan and
    * the division is the only double arithmetic. Part and customer
    * prunes broadcast into the two fact scans before the orderkey
    * shuffle; supplier nation rides as a broadcast dim.
    */
  def q8Share(spark: SparkSession, dir: String): DataFrame = {
    val ecoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select("p_partkey")
    val amCust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(amCust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(broadcast(ecoParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_3",
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .otherwise(0L)).as("nation_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("total_cents"))
      .select(col("o_year"),
        (col("nation_cents").cast("double") / col("total_cents")).as("mkt_share"),
        (col("total_cents") / lit(100.0)).as("total_rev"))
      .orderBy("o_year")
  }

  /** q9_profit (TPC-H Q9 shape): profit per supplier nation per order
    * year over a part-name class. No supplycost column exists, so
    * cost is modeled as 10% of retail per unit; profit folds in
    * MILLI-units (10·rev_cents − retail_cents·qty — all longs, qty is
    * integral in this data) so the subtraction is exact on both
    * engines. Part and supplier broadcast into the fact; the only
    * big shuffle is lineitem ⋈ orders on orderkey; the (nation,
    * year) aggregate domain is tiny.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val gp = Tables.part(spark, dir)
      .filter(col("p_name").contains("gear"))
      .select("p_partkey", "p_retailprice")
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    Tables.lineitem(spark, dir)
      .join(broadcast(gp), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg((sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10
        - cents(col("p_retailprice")) * col("l_quantity").cast("long"))
        / lit(1000.0)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** q_bitmap_distinct: EXACT distinct counting via bitmap shards —
    * the ClickHouse/Druid bitmap-index pattern, and the exact
    * alternative to HLL when the key domain is dense integers. Each
    * user lands as one bit in a (event_type, user_id div 32) bucket;
    * buckets fold with bit_or (associative + idempotent → map-side
    * partial agg absorbs ALL row-level duplicates before the
    * shuffle, so the exchange carries at most |domain|/32 longs per
    * type regardless of row count — the same reaggregation property
    * sketches have, with no error). Bits stay below 2^32 so the
    * shifted value never touches the sign bit (the v_bq two-word
    * lesson). The per-type popcount sum is a near-free second agg
    * over the tiny bucket table.
    */
  def qBitmapDistinct(spark: SparkSession, dir: String): DataFrame =
    bitmapCount(bitmapShards(
      Tables.events(spark, dir).select(col("event_type"), col("user_id"))))

  /** (event_type, user_id) rows → (event_type, bucket, bits) bitmap
    * shards. bit_or is associative AND idempotent, so shards built
    * over any partition of the rows re-merge losslessly — the property
    * both the batch distinct and the streaming ingest twin
    * (EventStreams.runBitmapIngest) rely on.
    */
  private[graft] def bitmapShards(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"), expr("user_id div 32").as("bucket"))
      .agg(expr("bit_or(shiftleft(1L, cast(user_id % 32 as int)))").as("bits"))

  /** Shards (possibly overlapping, e.g. from incremental appends) →
    * exact per-type distinct count: re-OR per bucket, then popcount.
    */
  private[graft] def bitmapCount(shards: DataFrame): DataFrame =
    shards.groupBy("event_type", "bucket")
      .agg(expr("bit_or(bits)").as("bits"))
      .groupBy("event_type")
      .agg(sum(bit_count(col("bits"))).cast("long").as("n_users"))
      .orderBy("event_type")

  /** q_hll_rollup: MERGEABLE sketch rollup — per-(type, day) HLL
    * sketches built once, then UNIONED upward to the per-type level
    * (hll_union_agg) without rescanning rows. This is the capability
    * plain approx_count_distinct lacks: at 100 TB you persist the
    * daily sketch table (kilobytes per group) and answer any
    * coarser-grained distinct query by merging sketches, never
    * re-reading the corpus. Gate: the merged estimate must land
    * within 5% of the exact count — the oracle expects literal-TRUE
    * flags, same contract as q_approx_distinct_err.
    */
  def qHllRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"),
        (col("est") >= col("n_exact") * 0.95 &&
          col("est") <= col("n_exact") * 1.05).as("within_5pct"))
      .orderBy("event_type")
  }
  /** q_kmv_jaccard: k-minimum-values set-similarity sketch between two
    * user cohorts (viewers vs purchasers) — the DETERMINISTIC
    * mergeable sketch family (Beyer et al.): keep the k smallest
    * md5-hash values per set; the union sketch is the k smallest of
    * the sketch union, and Jaccard ≈ |union-sketch members present in
    * both input sketches| / k. Because the hash is md5 (bit-equal on
    * both engines) and "k smallest" is order-deterministic, the
    * ESTIMATE itself is oracle-checkable by full hash equality — no
    * tolerance band, unlike HLL. Scale shape: each k-smallest runs as
    * TakeOrdered (map-side top-k, no corpus shuffle); sketches are
    * 64-row broadcasts; only the exact-comparison columns (kept for
    * context) pay a distinct-join. At 100 TB you'd persist per-source
    * KMV sketches and estimate any pairwise overlap from kilobytes.
    */
  def qKmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val ev = Tables.events(spark, dir)
    def users(t: String): DataFrame =
      ev.filter(col("event_type") === t).select("user_id").distinct()
    def sketch(df: DataFrame): DataFrame = df
      .withColumn("h",
        H.md5Long(concat(lit("kmv_"), col("user_id").cast("string")), 15))
      .orderBy("h", "user_id").limit(k).select("h")
    val ska = sketch(users("view"))
    val skb = sketch(users("purchase"))
    val un = ska.union(skb).distinct().orderBy("h").limit(k)
    val est = un.join(broadcast(ska), Seq("h"), "left_semi")
      .join(broadcast(skb), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("est_common"))
    val ix = users("view").join(users("purchase"), "user_id")
      .agg(count(lit(1)).as("inter_exact"))
    val up = users("view").union(users("purchase")).distinct()
      .agg(count(lit(1)).as("union_exact"))
    est.crossJoin(broadcast(ix)).crossJoin(broadcast(up))
      .select(lit(64L).as("k"), col("est_common"),
        round(col("est_common") / lit(64.0), 6).as("jacc_est"),
        col("inter_exact"), col("union_exact"),
        round(col("inter_exact").cast("double") / col("union_exact"), 6)
          .as("jacc_exact"))
  }

  /** Z-score anomaly detection over the hourly event-rate series: the
    * 3 most anomalous hours per event type. Per-type mean/std come
    * from EXACT integer sufficient statistics (n_hours, Σc, Σc² — the
    * q_corr_stats technique), so z = (c·n − S) / sqrt(n·Σc² − S²) has
    * an integer numerator and an integer radicand: IEEE sqrt/divide
    * make it bit-deterministic on both engines. Scale shape: one
    * shuffle for the hourly rollup, the per-type stats are a tiny
    * broadcast back onto it, and the top-3 window runs as
    * WindowGroupLimit (k-sized heaps per type, no global sort).
    */
  /** The z-score top-3 ranking over an (hour, event_type, n) hourly
    * series — shared by q_anomaly and the persisted rate store's
    * report. The series is materialized once (it feeds both the stats
    * branch and the join).
    */
  private[graft] def anomalyRank(hourlyRaw: DataFrame): DataFrame = {
    val hourly = graft.Materialize.forceCached(hourlyRaw)
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("nh"), sum(col("n")).as("s"),
           sum(col("n") * col("n")).as("ss"))
    // zero-variance guard: a type with a single hour or identical
    // hourly counts has radicand 0 → 0/0 = NaN, and NaN ordering is
    // exactly the cross-engine hazard the gate exists to exclude. A
    // flat series has no anomalies by definition, so it drops here
    // (same predicate in the oracle).
    val z = hourly.join(broadcast(stats), "event_type")
      .filter(col("nh") > 1 && col("nh") * col("ss") - col("s") * col("s") > 0)
      .withColumn("z", round(
        (col("n") * col("nh") - col("s")).cast("double") /
          sqrt((col("nh") * col("ss") - col("s") * col("s")).cast("double")), 6))
    val w = Window.partitionBy("event_type").orderBy(abs(col("z")).desc, col("hour").asc)
    z.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= 3)
      .select("event_type", "rnk", "hour", "n", "z")
      .orderBy("event_type", "rnk")
  }

  /** Per-batch (hour, event_type, n) partial counts — the rate
    * store's shard rows (counts are additive over disjoint batches).
    */
  private[graft] def rateRows(ev: DataFrame): DataFrame =
    ev.groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))

  def qAnomaly(spark: SparkSession, dir: String): DataFrame =
    anomalyRank(rateRows(Tables.events(spark, dir)))

  /** q_ewma: exponential smoothing (α = 1/4) of the hourly event-rate
    * series per type — the trend-level complement of q_anomaly's
    * global z-score. The EWMA recurrence is non-associative, so it
    * runs as a SORTED left fold seeded at 0.0 (the t_entropy
    * determinism dodge: both engines execute the identical sequence
    * of double ops, so even transcendental-free fp is hash-stable;
    * DuckDB replays it as list_reduce over a list_prepend'ed series).
    * Scale shape: one rollup shuffle, then one per-type aggregate
    * whose state is the hour-count series — bounded by the calendar,
    * not the corpus.
    */
  def qEwma(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
               col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
           sort_array(collect_list(struct(col("hour"), col("n")))).as("hs"))
      .select(col("event_type"), col("n_hours"),
        round(aggregate(transform(col("hs"), s => s.getField("n").cast("double")),
          lit(0.0), (acc, x) => acc + (x - acc) / 4.0), 6).as("ewma"))
      .orderBy("event_type")

  /** Runtime Bloom-filter join pruning — the hand-rolled form of the
    * engine-injected runtime filters Spark/Trino/Photon apply to
    * selective shuffle joins: revenue of orders whose customer is in
    * one market segment, where the fact side is pre-filtered MAP-SIDE
    * by a Bloom filter built from the dim side's join keys (m = 16
    * bits/key, k = 4 double-hashed probes — d_bloom's arithmetic)
    * before the exact semi-join runs. The filter is a (word, bits)
    * table of m/32 longs — kilobytes regardless of dim-row payload, so
    * it broadcasts even when the dim itself is too wide to (the case
    * where this pattern pays: at 100 TB the ~75% of fact rows with no
    * partner die inside the scan stage instead of crossing the
    * exchange). The semi-join carries a shuffle_hash hint to model
    * exactly that non-broadcastable case. Bloom false positives are
    * killed by the exact join, false negatives are impossible — the
    * oracle is the PLAIN semi-join aggregate, so a hash match proves
    * the pruning lossless.
    */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val nKeys = dim.count()
    val mBits = 32L * ((16L * nKeys + 31L) / 32L)
    // one filter table, four broadcast probes — materialize so the
    // build group-by runs once, not once per broadcast
    val words = Dedup.bloomWords(
      dim.select(col("c_custkey").as("doc_id"),
        col("c_custkey").cast("string").as("text")), mBits)
      .transform(graft.Materialize.forceCached)
    var fact = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .withColumn("ha",
        H.md5Long(concat(lit("bloomA_"), col("o_custkey").cast("string")), 15) % mBits)
      .withColumn("hb",
        H.md5Long(concat(lit("bloomB_"), col("o_custkey").cast("string")), 15) % (mBits - 1) + 1)
    for (i <- 0 until 4) {
      fact = fact
        .withColumn(s"p$i", (col("ha") + lit(i.toLong) * col("hb")) % mBits)
        .withColumn(s"b$i", (col(s"p$i") % 32).cast("int"))
        .join(broadcast(words.select(col("word").as(s"fw$i"), col("bits").as(s"bits$i"))),
          (col(s"p$i") / 32).cast("long") === col(s"fw$i"), "left")
        .withColumn(s"hit$i",
          coalesce(expr(s"(shiftright(bits$i, b$i) & 1) = 1"), lit(false)))
    }
    val pass = fact.filter((0 until 4).map(i => col(s"hit$i")).reduce(_ && _))
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    pass.join(dim.hint("shuffle_hash"),
        pass("o_custkey") === dim("c_custkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderpriority")
  }
}
