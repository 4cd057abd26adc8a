package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

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
}
