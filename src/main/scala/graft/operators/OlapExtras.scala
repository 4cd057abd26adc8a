package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-2 OLAP additions: as-of join, banded range join, pivot,
  * exact percentiles, salted aggregation, grouping sets.
  *
  * Each one exists because Spark has no single built-in operator for
  * it (as-of, range) or because the composition itself is the
  * 100 TB-scale pattern worth keeping first-class (salting, banding).
  */
object OlapExtras {

  /** q_asof_join: backward as-of join — for every purchase event, the
    * user's most recent view event at-or-before it.
    *
    * Implemented with the union-then-window technique rather than an
    * equi-join + per-key argmax: tag both sides, union, one window
    * sorted by (ts, tag, id) per user, carry the last view forward
    * with last_value(ignoreNulls). ONE shuffle on user_id and no
    * per-key pair fan-out — an equi-join formulation materializes
    * |purchases_u|×|views_u| rows per user, which dies on 100 TB
    * power-law users; this shape is linear in input size.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        when(col("event_type") === "view", 0).otherwise(1).as("tag"))
    // ties: a view at the same millisecond as the purchase counts
    // (tag 0 sorts first); among same-ms views the largest id wins
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "tag", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("view_id",
        last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ms",
        last(when(col("tag") === 0, col("ts_ms")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        coalesce(col("ts_ms") - col("view_ms"), lit(-1L)).as("gap_ms"))
      .orderBy("event_id")
  }

  /** q_asof_forward: the FORWARD as-of join — for each purchase, the
    * next click at-or-after it (post-purchase engagement lag; the
    * mirror of q_asof_join's backward fill, and the other half every
    * as-of API ships). Same union+window shape — no per-key join
    * fan-out, one shuffle on user_id — with a
    * current-row→unbounded-following frame and first-non-null instead
    * of last. Ties: a click in the same millisecond counts (purchase
    * tag sorts first), earliest id wins.
    */
  def qAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "tag", "event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev.withColumn("click_id",
        first(when(col("tag") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ms",
        first(when(col("tag") === 1, col("ts_ms")), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(col("click_ms") - col("ts_ms"), lit(-1L)).as("wait_ms"))
      .orderBy("event_id")
  }

  /** Epoch millis of 2024-01-01T00:00:00Z — the events table's epoch. */
  private val Epoch2024: Long = 1704067200000L
  private val HourMs: Long = 3600L * 1000

  /** q_range_join: interval (range) join, banded. 20 six-hour analysis
    * windows (every 36 h) joined to the events whose ts falls inside.
    *
    * A raw theta-join `start <= ts < end` is a broadcast nested loop
    * over every (event, interval) pair. Banding makes it an equi-join:
    * intervals are exploded to the 6-hour buckets they cover, events
    * map to their bucket, and the range predicate only runs within
    * bucket-matched pairs. At 100 TB both sides shuffle/broadcast on
    * the bucket key and the cross product never exists.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bucketMs = 6 * HourMs
    val iv = spark.range(20)
      .select(col("id").as("interval_id"),
        (lit(Epoch2024) + col("id") * (36 * HourMs)).as("start_ms"))
      .withColumn("end_ms", col("start_ms") + 6 * HourMs)
      .withColumn("bucket",
        explode(sequence(floor(col("start_ms") / bucketMs),
          floor((col("end_ms") - 1) / bucketMs))))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("bucket", floor(col("ts_ms") / bucketMs))
    ev.join(broadcast(iv),
        ev("bucket") === iv("bucket") &&
        col("ts_ms") >= col("start_ms") && col("ts_ms") < col("end_ms"))
      .groupBy("interval_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("interval_id")
  }

  /** q_pivot: wide daily activity matrix — one column per event type.
    * Explicit pivot values keep the schema static (no extra pass to
    * discover them — at 100 TB an unseeded pivot is a full scan), and
    * each cell is a map-side conditional count.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("day")
  }

  /** q_percentiles: exact interpolated quartiles of lineitem quantity
    * per return flag (percentile_cont semantics on both engines).
    *
    * NOT percentile(col, p) over raw rows — that ships every value of
    * a group to one reducer (3 groups → 3 hot reducers holding the
    * whole table). Instead: partial-aggregated (flag, value) histogram
    * first (map-side combine shrinks 100 TB to |flags|×|distinct
    * values| rows), then percentile with explicit frequencies over the
    * tiny histogram. Same exact result, embarrassingly parallel.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("freq"))
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25, freq)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.50, freq)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75, freq)"), 6).as("p75"),
        sum(col("freq")).as("n"))
      .orderBy("l_returnflag")

  /** q_approx_quantiles: t-digest-style approximate quartiles
    * (approx_percentile) — the 100 TB path where the exact histogram
    * is itself too wide (continuous values, billions of distincts).
    * Mergeable sketch per partition, one tiny final merge. No SQL
    * oracle (sketch internals are implementation-specific) — rows-only
    * check; q_percentiles is the exact twin.
    */
  def qApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
          .as("quartiles"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        col("quartiles")(0).as("p25"), col("quartiles")(1).as("p50"),
        col("quartiles")(2).as("p75"), col("n"))
      .orderBy("l_returnflag")

  /** q_approx_quantiles_err: the quantile sketch's error gate — each
    * approximate quartile must sit within 5% relative error of the
    * exact interpolated percentile. Same contract as
    * q_approx_distinct_err: the oracle's expected booleans are
    * literally TRUE, so sketch drift breaks the hash. Both sides are
    * 3-row aggregates.
    */
  def qApproxQuantilesErr(spark: SparkSession, dir: String): DataFrame = {
    // sketch and exact percentiles in ONE scan + ONE aggregation — no
    // second pass, no join
    def ok(i: Int): Column =
      (abs(col("aq")(i) - col("eq")(i)) / col("eq")(i) <= 0.05)
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
          .as("aq"),
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("eq"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        ok(0).as("p25_ok"), ok(1).as("p50_ok"), ok(2).as("p75_ok"))
      .orderBy("l_returnflag")
  }

  /** q_salted_agg: two-phase (salted) aggregation. events has only 5
    * event types — a direct groupBy sends every row for a type to ONE
    * reducer, the classic skew bottleneck. Salting the key over 16
    * shards aggregates in parallel, then a second tiny agg over ≤
    * 16×|types| partial rows merges shards. Result is identical to the
    * direct groupBy (the oracle IS the direct formulation).
    */
  def qSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val partial = Tables.events(spark, dir)
      .withColumn("salt", pmod(col("user_id"), lit(16)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("pcents"))
    partial.groupBy("event_type")
      .agg(sum(col("pn")).as("n_events"),
        (sum(col("pcents")) / lit(100.0)).as("sum_value"))
      .orderBy("event_type")
  }

  /** q_window_funcs: the window-function breadth query — lag, lead,
    * dense_rank, ntile and a group-fraction share in ONE window pass
    * over each supplier's daily revenue (all five share the same
    * partition+order, so Catalyst evaluates them in a single Window
    * operator: one shuffle).
    */
  def qWindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 3)
      .groupBy(col("l_suppkey"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .agg((sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
        / lit(100.0)).as("day_rev"))
    val w = Window.partitionBy("l_suppkey").orderBy("ship_day")
    daily
      .withColumn("prev_rev", lag(col("day_rev"), 1).over(w))
      .withColumn("next_rev", lead(col("day_rev"), 1).over(w))
      .withColumn("rev_rank",
        dense_rank().over(Window.partitionBy("l_suppkey")
          .orderBy(col("day_rev").desc, col("ship_day").asc)).cast("long"))
      .withColumn("quartile",
        ntile(4).over(Window.partitionBy("l_suppkey")
          .orderBy(col("day_rev").desc, col("ship_day").asc)).cast("long"))
      .select(col("l_suppkey"), col("ship_day"), col("day_rev"),
        coalesce(col("prev_rev"), lit(-1.0)).as("prev_rev"),
        coalesce(col("next_rev"), lit(-1.0)).as("next_rev"),
        col("rev_rank"), col("quartile"))
      .orderBy("l_suppkey", "ship_day")
  }

  /** q_exists_subquery: correlated EXISTS + scalar subquery through
    * the SQL surface — exercises Catalyst's decorrelation (rewrites to
    * a semi join + a broadcast scalar aggregate; never a per-row
    * subquery execution).
    */
  def qExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_sub_orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_sub_lineitem")
    spark.sql("""
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM graft_sub_orders o
      WHERE EXISTS (
          SELECT 1 FROM graft_sub_lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_quantity > (SELECT AVG(l_quantity) FROM graft_sub_lineitem))
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** q_json_extract: semi-structured column handling — the events
    * props JSON parsed in-flight (get_json_object, codegen'd) and
    * aggregated. At 100 TB the parse is map-side and the only shuffle
    * is the final small agg; a repeated-access production path would
    * first materialize props into typed columns (from_json once).
    */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** q_setops: INTERSECT / EXCEPT over customer key sets (BUILDING
    * customers vs customers with orders). Both compile to hash
    * aggregate + shuffle join — no driver-side set logic.
    */
  def qSetops(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val withOrders = Tables.orders(spark, dir).select(col("o_custkey").as("c_custkey"))
    val both = building.intersect(withOrders)
      .agg(count(lit(1)).as("intersect_n"))
    val without = building.except(withOrders)
      .agg(count(lit(1)).as("except_n"))
    both.crossJoin(without)
  }

  /** q_salted_join: skew-safe join via key salting. The build side is
    * replicated once per salt shard and the probe side picks a
    * deterministic shard, so a hot join key's rows spread over 16
    * reducers instead of one. Result is identical to the unsalted
    * join (the oracle IS the unsalted formulation); AQE's skew-join
    * split is the automatic variant, salting is the planned one.
    */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val salts = 16
    // tiny dim: per-type weight derived from the type name, replicated
    // per salt (at scale: the small-but-hot side of a skewed join)
    val dim = Tables.events(spark, dir).select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")).cast("long"))
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    val ev = Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)).cast("int"))
    ev.join(dim, Seq("event_type", "salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("weight")).as("sum_weight"))
      .orderBy("event_type")
  }

  /** q_grouping_sets: explicit grouping sets — the two one-dimension
    * marginals plus the grand total, without the full cube's 2^n sets.
    * Goes through the SQL surface (same Spark 4.1 lineage-tag issue as
    * q_cube — see Relational.qCube).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
      .createOrReplaceTempView("graft_qgs_base")
    spark.sql("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COUNT(*) AS n,
        SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0D AS total
      FROM graft_qgs_base
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")
  }

  /** q_histogram: equal-width histogram of order totals — global
    * min/max from a 1-row broadcast aggregate, then bucket assignment
    * as pure integer arithmetic over exact cents (no FP bucket-edge
    * ambiguity between engines). The two-pass shape (tiny stats pass,
    * then map-side bucketing + one small group-by) is the 100 TB
    * histogram idiom; the stats cross-join never shuffles the fact
    * table.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val buckets = 20
    val c = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val stats = c.agg(min(col("cents")).as("mnc"), max(col("cents")).as("mxc"))
    c.crossJoin(broadcast(stats))
      .withColumn("bucket", expr(s"((cents - mnc) * $buckets) div (mxc - mnc + 1)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("cents")) / 100.0).as("sum_total"),
        (min(expr(s"mnc + (bucket * (mxc - mnc + 1)) div $buckets")) / 100.0).as("bucket_lo"))
      .select(col("bucket"), col("bucket_lo"), col("n_orders"), col("sum_total"))
      .orderBy("bucket")
  }

  /** q_corr_stats: Pearson correlation + population covariance of
    * quantity vs (floored) price per return flag — computed from the
    * five exact integer sufficient-statistic sums (Σx, Σy, Σxy, Σx²,
    * Σy²), then combined in double at the end. Spark's built-in
    * corr() streams FP partial sums whose order differs run to run;
    * the integer-sums formulation is order-independent, one-pass,
    * map-side-combinable — and therefore oracle-hash-stable.
    */
  def qCorrStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
    val sums = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    sums.select(col("l_returnflag"), col("n"),
        round((d("n") * d("sxy") - d("sx") * d("sy"))
          / sqrt((d("n") * d("sxx") - d("sx") * d("sx"))
            * (d("n") * d("syy") - d("sy") * d("sy"))), 6).as("corr_qty_price"),
        round((d("n") * d("sxy") - d("sx") * d("sy")) / (d("n") * d("n")), 6)
          .as("covar_pop"))
      .orderBy("l_returnflag")
  }

  /** q_window_range: RANGE-framed window — trailing-7-day revenue per
    * supplier, where the frame is defined by VALUE distance (day
    * number within 6 of the current row), not row count: gaps in the
    * calendar shrink the window, which ROWS frames cannot express.
    * Day numbers are integers (epoch days) so the frame bounds are
    * exact on both engines; cents arithmetic as usual.
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 3)
      .groupBy(col("l_suppkey"),
        datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
          .as("day_num"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("day_cents"))
    val w = Window.partitionBy("l_suppkey").orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("wk_cents", sum(col("day_cents")).over(w))
      .select(col("l_suppkey"),
        date_format(expr("date_add(DATE '1970-01-01', day_num)"), "yyyy-MM-dd")
          .as("ship_day"),
        (col("day_cents") / 100.0).as("day_rev"),
        (col("wk_cents") / 100.0).as("wk_rev"))
      .orderBy("l_suppkey", "ship_day")
  }

  /** q_multi_distinct: several COUNT(DISTINCT …) over different keys
    * in ONE aggregation — Catalyst plans this with the Expand operator
    * (one replicated row per distinct-group), so all four aggregates
    * still run in a single shuffle pass instead of one job per
    * distinct column.
    */
  def qMultiDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("day")).as("n_days"),
        countDistinct(concat(col("user_id").cast("string"), lit("_"), col("day")))
          .as("n_user_days"))
      .orderBy("event_type")

  /** q_scd2: slowly-changing-dimension type-2 build — turn each
    * user's event log into versioned validity intervals: a new version
    * opens whenever the tracked attribute (event_type) CHANGES from
    * the previous event (lag-based change detection), closes at the
    * next change (lead), and the open version is flagged current. Two
    * window passes over the same (user, time) ordering — one shuffle
    * total, no self-join; the standard merge pattern for building
    * dimension history from a change log.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")).asc, col("event_id").asc)
    val changes = Tables.events(spark, dir)
      .filter(col("user_id") < 30)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val byChange = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")).asc, col("event_id").asc)
    changes
      .withColumn("version", row_number().over(byChange).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(byChange))
      .select(col("user_id"), col("version"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("valid_to_ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")).as("valid_to"),
        when(col("valid_to_ts").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy("user_id", "version")
  }

  /** q_dedup_latest: CDC compaction — the latest record per
    * (user, event_type) key, ties broken by event_id. The
    * `row_number ≤ 1` filter compiles to WindowGroupLimit, so each
    * partition keeps one row per key before the shuffle — the
    * latest-wins resolve that turns an append log into current state
    * (the batch twin of the foreachBatch upsert sink).
    */
  def qDedupLatest(spark: SparkSession, dir: String): DataFrame = {
    // order on explicit micros: Spark's ts is already µs-truncated but
    // DuckDB reads the raw nanos timestamp — epoch_us on both sides
    // pins the tie-break granularity to the same unit
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
    Tables.events(spark, dir)
      .filter(col("user_id") < 100)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("event_id").as("last_event_id"),
        (floor(col("value") * 100 + 0.5).cast("long") / 100.0).as("last_value"))
      .orderBy("user_id", "event_type")
  }

  /** q_merge_cdc: MERGE INTO semantics — apply a CDC delta
    * (inserts + updates + deletes) to a base table in one pass, the
    * lakehouse upsert every warehouse sync runs (q_dedup_latest
    * compacts an append LOG; this applies an op-tagged CHANGESET).
    * The delta derives deterministically from the base (update keys
    * ≡0 mod 7 with +$5 in exact cents, delete keys ≡0 mod 13 —
    * deletes win over updates, inserts at keys above max), so both
    * engines merge identical changesets. Shape: ONE shuffled
    * full-outer equi-join on the key — delete = filter, update =
    * projection, insert = the delta-only side; nothing is
    * driver-resident and the only movement is the join's hash
    * partitioning (what Delta/Iceberg MERGE compiles to before
    * file-level pruning).
    */
  def qMergeCdc(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val upd = base.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("k"), lit("U").as("op"),
        ((floor(col("o_totalprice") * 100 + lit(0.5)).cast("long") + 500) / lit(100.0))
          .as("new_price"))
    val del = base.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey").as("k"), lit("D").as("op"),
        lit(null).cast("double").as("new_price"))
    val mx = base.agg(max(col("o_orderkey")).as("mk"))
    val ins = base.filter(col("o_orderkey") % 11 === 0).crossJoin(broadcast(mx))
      .select((col("o_orderkey") + col("mk") + 1).as("k"), lit("I").as("op"),
        (lit(100.0) + (col("o_orderkey") % 900).cast("double")).as("new_price"))
    val delta = upd.unionByName(del).unionByName(ins)
    base.join(delta, col("o_orderkey") === col("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(coalesce(col("o_orderstatus"), lit("N")).as("status"),
        when(col("op") === "U", col("new_price"))
          .otherwise(coalesce(col("o_totalprice"), col("new_price"))).as("price"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("price") * 100 + lit(0.5)).cast("long")) / lit(100.0)).as("total"))
      .orderBy("status")
  }
  /** q_topk_agg: per-group top-k through the engine's custom Catalyst
    * AGGREGATE function (graft.expressions.TopKAgg) instead of a
    * window — per supplier, the 3 priciest lineitems. The window
    * formulation must shuffle EVERY fact row to its group before
    * discarding; the k-bounded aggregate buffer discards inside the
    * scan (partial agg keeps ≤ k pairs per group per map task), so
    * the exchange carries k·|groups| tiny rows at any corpus size —
    * the CosineTopKExec bounded-heap idea as a reusable declarative
    * aggregate. Item ids fold orderkey and linenumber into one long
    * tiebreak; the oracle replays the semantics as a row_number
    * window, proving the heap path exact.
    */
  def qTopkAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("item_id"),
        col("l_extendedprice"))
      .groupBy("l_suppkey")
      .agg(graft.expressions.TopKAgg.topK(
        col("l_extendedprice"), col("item_id"), 3).as("topk"))
      .select(col("l_suppkey"), posexplode(col("topk")).as(Seq("i", "s")))
      .select(col("l_suppkey"), (col("i") + 1).cast("long").as("rnk"),
        col("s.id").as("item_id"), col("s.v").as("price"))
      .orderBy("l_suppkey", "rnk")
}
