package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.9): scans, filter/project,
  * joins (inner/outer/semi/anti, broadcast), aggregations, windows,
  * sort/limit/top-k, set ops, scalar/JSON/array functions.
  *
  * Every query is declared with the DataFrame API so Catalyst owns the
  * physical plan: filters and projections push into the Parquet scan,
  * dimension joins broadcast, aggregates get map-side partial combine.
  * Every query also carries a deterministic total ORDER BY so results are
  * stable for hash comparison against the DuckDB oracle.
  *
  * Scale notes (100 TB): fact-fact joins shuffle on their join keys and
  * rely on AQE for skew; dim joins (region/nation/customer at TPC-H
  * ratios) are explicit `broadcast()`. No collect(), no driver loops.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: partial-agg friendly groupBy over the
    * fact table with an arithmetic expression kept inside codegen. */
  private def pricingSummary: Q = (s, d) => {
    val l = Tables.lineitem(s, d)
    l.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Writes lineitem + orders as BUCKETED tables on their join key and
    * returns them re-read through the session catalog. Bucketing is the
    * at-rest layout for 100 TB repeated joins: both sides pre-hashed
    * into the same bucket count means every subsequent join/aggregation
    * on that key plans with ZERO shuffle exchanges (PlanSpec asserts) —
    * the shuffle is paid once at write time, not once per query. A
    * fixed location + overwrite keeps re-runs idempotent. */
  def bucketedOrderTables(s: SparkSession, d: String,
                          nBuckets: Int = 8): (DataFrame, DataFrame) = {
    val loc = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-bucketed-tables").toString
    // spread the single-split local scans so the bucketed write (hash +
    // per-bucket sort + parquet encode, the expensive stage here) runs
    // at session parallelism instead of one task (ScaleOut scaladoc);
    // bucket assignment is per-row hash arithmetic, so the re-read
    // tables and the zero-exchange join plan are unchanged
    graft.operators.ScaleOut.forCompute(
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey")
      .write.format("parquet").option("path", s"$loc/lineitem_b")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_bucketed_lineitem")
    graft.operators.ScaleOut.forCompute(
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority"), "o_orderkey")
      .write.format("parquet").option("path", s"$loc/orders_b")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_bucketed_orders")
    (s.table("graft_bucketed_lineitem"), s.table("graft_bucketed_orders"))
  }

  /** Revenue by priority over the bucketed layout — the merge hint keeps
    * the join on the sort-merge path, which the bucketed co-location
    * turns into a zero-exchange join at every scale factor. */
  private def bucketedJoin: Q = (s, d) => {
    val (l, o) = bucketedOrderTables(s, d)
    l.join(o.hint("merge"), l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  /** Narrow filter+project — the plan must show PushedFilters + a 2-column
    * ReadSchema (verified in PlanSpec). */
  private def filterProject: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Revenue per nation: fact joined through two broadcast dims.
    * customer/nation/region are tiny relative to orders at any SF. */
  private def revenueByNation: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("order_cnt"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-outer join keeping customers with zero orders; count per key. */
  private def leftOuterOrderCounts: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("order_cnt"))
      .orderBy(col("c_custkey"))
      .limit(1000)
  }

  /** Semi join: customers that placed at least one urgent order. */
  private def semiJoinUrgent: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Anti join: customers with no orders at all — the same shape as the
    * reference's replication-planner dedup (ReplicationPlanner.java:81-84)
    * and inventory gap report (iceberg-arch-geo-distributed-ha.md:1206). */
  private def antiJoinNoOrders: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Top-3 orders per customer via ranked window (dedup/top-k-per-group
    * pattern; at scale this shuffles once on the partition key). */
  private def top3OrdersPerCustomer: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running total per customer (frame spec rowsBetween). */
  private def runningTotal: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 200)
      .withColumn("running_spend", sum(col("o_totalprice")).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Relative-position windows: percent_rank and cume_dist per customer
    * over a unique (price, key) ordering — identical definitions in both
    * engines ((rank-1)/(n-1); peers-cumulative/n). Completes the ranking
    * window family next to row_number/ntile/lead/lag. */
  private def windowPercentiles: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d).filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Value-RANGE frame (vs the ROWS frame above): trailing 30-day spend
    * per customer. The frame is defined on the ORDER-BY VALUE (epoch
    * seconds), so same-timestamp peers always aggregate together —
    * semantics a ROWS frame cannot express. Same one-shuffle window
    * shape as every per-customer window here. */
  private def rangeFrameSpend: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 200)
      .withColumn("trailing_30d_spend", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("trailing_30d_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** lead/lag offsets: per-customer order-to-order spend delta and the
    * next order key (the offset-window family §2.9 windows). */
  private def windowLeadLag: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2).as("delta_prev"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Forward fill (gap fill): every event carries the user's most recent
    * purchase value at-or-before it — `last(..., ignoreNulls)` over a
    * running frame; events before the user's first purchase stay null.
    * The timeseries imputation primitive (carry-forward of a sparse
    * signal onto a dense one); one shuffle on user_id like every window
    * here, and the frame is running so the window evaluates in one pass. */
  private def gapFill: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
          .over(w).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** ntile quartiles over a bounded, totally-ordered slice. */
  private def ntileBuckets: Q = (s, d) => {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d).filter(col("o_custkey") < 100)
      .select(col("o_orderkey"), ntile(4).over(w).as("quartile"))
      .orderBy(col("o_orderkey"))
  }

  /** EXISTS / NOT EXISTS subqueries through the SQL front end (the
    * decorrelation path — distinct from the semi/anti join API form). */
  private def existsSubquery: Q = (s, d) => {
    Tables.registerViews(s, d)
    s.sql("""
      SELECT c_custkey, c_mktsegment
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
      ORDER BY c_custkey""")
  }

  /** Regex extraction family: first-group extract, scrub-replace, and
    * full-match listing — same PCRE-ish dialect in both engines. */
  private def regexExtract: Q = (s, d) =>
    Tables.part(s, d).filter(col("p_partkey") < 300)
      .select(col("p_partkey"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("type_scrubbed"),
        size(split(col("p_name"), " ")).as("name_words"))
      .orderBy(col("p_partkey"))

  /** Conditional + math scalar family: coalesce/nullif/least/greatest,
    * sign/abs/mod, log/power (rounded for engine-portable doubles). */
  private def conditionalMath: Q = (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 400)
      .select(col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open"),
        least(col("o_totalprice"), lit(100000.0)).as("capped"),
        greatest(col("o_custkey") % 7, lit(2L)).as("floored_mod"),
        signum(col("o_totalprice") - 150000.0).cast("int").as("above_mid"),
        round(log(col("o_totalprice")), 4).as("ln_price"),
        round(pow(col("o_totalprice") / 100000.0, 2), 4).as("sq_ratio"))
      .orderBy(col("o_orderkey"))

  /** Global top-k: Spark plans TakeOrderedAndProject — no full sort. */
  private def topkOrders: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(50)

  /** Set difference: orders that have no lineitem shipped after a date
    * (EXCEPT — the reference's GC reachability primitive, G2). */
  private def setExcept: Q = (s, d) => {
    val allKeys = Tables.orders(s, d).select(col("o_orderkey"))
    val shippedLate = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-01-01"))
      .select(col("l_orderkey").as("o_orderkey"))
    allKeys.except(shippedLate).orderBy(col("o_orderkey"))
  }

  /** Intersection: customers that are both urgent-order and high-priority
    * purchasers (INTERSECT). */
  private def setIntersect: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val b = o.filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
    a.intersect(b).orderBy(col("o_custkey"))
  }

  /** UNION ALL + dedup via distinct (union semantics). */
  private def setUnion: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val a = o.filter(col("o_totalprice") > 300000.0).select(col("o_custkey"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    a.union(b).distinct().orderBy(col("o_custkey"))
  }

  /** ROLLUP over (status, priority); grouping keys coalesced so the output
    * is null-free and orders identically in both engines. */
  private def rollupOrderStats: Q = (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("total"))
      .orderBy(col("status"), col("priority"))

  /** Scalar string/date/math functions in one projection. */
  private def scalarFunctions: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_uc"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat(lit("ord-"), col("o_orderkey").cast("string")).as("tag"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        round(col("o_totalprice") / 1000.0, 1).as("price_k"),
        (col("o_totalprice") > 200000.0).as("is_big"))
      .orderBy(col("o_orderkey"))

  /** JSON extraction over the events table (props is a JSON string). */
  private def jsonEvents: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Exact distinct aggregation (the oracle-checkable dual of the
    * approx_count_distinct/HLL path used at 100 TB). */
  private def distinctUsers: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"),
           count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** Array functions over embeddings: length + L2 norm via higher-order
    * aggregate (no UDF — stays in codegen). */
  private def arrayNorms: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(
          sqrt(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))), 4).as("l2_norm"))
      .orderBy(col("vec_id"))

  /** Time-bucketed aggregation over the event stream (batch dual of the
    * streaming tumbling-window query). */
  private def hourlyEventStats: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Exponential time-decay engagement score per user — the recency
    * weighting every feed/freshness ranker runs: events lose half their
    * weight every 24h against a FIXED anchor (deterministic, and at
    * scale the anchor is the batch watermark, so incremental runs
    * compose by rescaling). One partial-aggregated groupBy; exp() stays
    * inside codegen. Anchor chosen past the data's ts range. */
  private def decayScore: Q = (s, d) => {
    // ts casts to FRACTIONAL epoch seconds on both sides (micros/1e6 as
    // one double division) — unix_timestamp would truncate to whole
    // seconds while DuckDB's epoch_us/1000000.0 would not, and the
    // exp() would amplify the disagreement
    // 2025-01-01T00:00:00Z — fixed epoch constant, NOT Timestamp.valueOf
    // (which reads the JVM default zone; the oracle's naive TIMESTAMP
    // literal is epoch-UTC like Spark's internal micros)
    val anchorSec = lit(1735689600.0)
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value") *
          exp(lit(-DecayLambda) * (anchorSec - col("ts").cast("double")))), 6)
          .as("decayed_value"))
      .orderBy(col("user_id"))
  }

  /** Half-life 24h in per-second units; ONE Scala-computed double
    * embedded verbatim in both the Spark plan and the DuckDB oracle so
    * ln(2)/86400 can never disagree across engines. */
  private val DecayLambda: Double = math.log(2.0) / 86400.0

  /** Fixed-bucket histogram of order totals — the distribution report
    * behind partition sizing and skew triage. Buckets are
    * floor((v - lo) / width) clamped to [0, n-1] with EXPLICIT lo/width
    * literals (both engines compute identical bucket ids; no
    * width_bucket dialect differences). One partial-aggregated groupBy
    * over a codegen'd projection. */
  private def valueHistogram: Q = (s, d) => {
    val (lo, width, n) = (0.0, 50000.0, 12)
    val bucket = least(greatest(
      floor((col("o_totalprice") - lit(lo)) / lit(width)), lit(0.0)),
      lit((n - 1).toDouble)).cast("int")
    Tables.orders(s, d)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"),
           round(min(col("o_totalprice")), 2).as("lo_seen"),
           round(max(col("o_totalprice")), 2).as("hi_seen"))
      .orderBy(col("bucket"))
  }

  /** Join-key skew diagnostic — the report to run BEFORE choosing a
    * salting factor (rel_salted_skew_join) or trusting AQE's runtime
    * split: the per-key row-count distribution of a prospective join
    * key. One partial-aggregated groupBy, then a single-row aggregate
    * over |keys| counts (key-cardinality scale, not row scale). */
  private def skewReport: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      min(col("cnt")).as("min_rows"),
      round(expr("percentile(cnt, 0.5)"), 4).as("p50_rows"),
      round(expr("percentile(cnt, 0.95)"), 4).as("p95_rows"),
      max(col("cnt")).as("max_rows"),
      round(avg(col("cnt")), 4).as("avg_rows"),
      round(max(col("cnt")) / avg(col("cnt")), 4).as("skew_ratio"))
  }

  /** Sliding-window trending: top-3 event types per 2-hour window
    * sliding every 30 minutes (batch dual of the watermarked streaming
    * form — StreamingSpec proves stream ≡ batch). The 4× window fan-out
    * happens before a partially-aggregated count; ranking runs on the
    * aggregated (window × type) table only. */
  private def streamSlidingTopn: Q = (s, d) =>
    graft.streaming.Trending.topNPerWindow(
        graft.streaming.Trending.slidingCounts(Tables.events(s, d), "ts", "event_type"), 3)
      .orderBy(col("window_start"), col("rank"))

  /** Writes documents as a Hive-partitioned (`partitionBy(lang)`) parquet
    * layout at a fixed location and returns the re-read DataFrame. This is
    * the third at-rest layout next to bucketing (rel_bucketed_join) and
    * z-order/range clustering (cat_zorder_read): a predicate on the
    * partition column prunes whole DIRECTORIES at planning time
    * (`PartitionFilters` in the scan, PlanSpec asserts), so a per-language
    * pipeline over a 100 TB corpus reads only its language's files.
    * Overwrite keeps re-runs idempotent. */
  def partitionedDocuments(s: SparkSession, d: String): DataFrame = {
    val loc = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-partitioned-docs").toString
    Tables.documents(s, d)
      .write.mode("overwrite").partitionBy("lang").parquet(loc)
    s.read.parquet(loc)
  }

  /** Customers written Hive-partitioned by nation key — the star-schema
    * fact layout whose partition column is only constrained THROUGH a
    * join (see dppJoin). Overwrite keeps re-runs idempotent. */
  def partitionedCustomers(s: SparkSession, d: String): DataFrame = {
    val loc = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-partitioned-cust").toString
    Tables.customer(s, d)
      .write.mode("overwrite").partitionBy("c_nationkey").parquet(loc)
    s.read.parquet(loc)
  }

  /** Dynamic partition pruning: the fact side is partitioned by
    * c_nationkey but the query's only filter sits on the DIM side
    * (n_regionkey = 1), so static pruning can't fire. Spark broadcasts
    * the filtered dim and re-uses that broadcast as a runtime partition
    * filter on the fact scan (`dynamicpruningexpression` — PlanSpec
    * asserts), reading only the ~1/5 of directories whose nation
    * survives. At 100 TB this is THE star-join access path: without DPP
    * a dim-filtered join scans the whole fact table. */
  private def dppJoin: Q = (s, d) => {
    val cust = partitionedCustomers(s, d)
    val nat = Tables.nation(s, d).filter(col("n_regionkey") === 1)
    cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("n_name"))
  }

  /** Per-source quality stats for ONE language off the partitioned layout
    * — the scan touches only the `lang=en` directory. */
  private def partitionedScan: Q = (s, d) =>
    partitionedDocuments(s, d)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("source"))

  /** MERGE INTO-style upsert expressed as a full-outer join + coalesce —
    * the batch primitive behind incremental table maintenance (the
    * foreachBatch MERGE sink pattern). The updates batch is derived
    * deterministically from the target itself: every 97th order key gets
    * its priority rewritten (MATCHED ⇒ UPDATE) and every 501st key is
    * re-keyed negative, guaranteed absent (NOT MATCHED ⇒ INSERT).
    *
    * Scale shape: ONE shuffle join on the merge key (on a bucketed
    * at-rest layout — rel_bucketed_join — even that exchange
    * disappears); result verified as a per-priority rollup. */
  private def mergeUpsert: Q = (s, d) => {
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val updates = orders.filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("u_key"), lit("0-MERGED").as("u_priority"),
        col("o_totalprice").as("u_price"))
      .unionByName(orders.filter(col("o_orderkey") % 501 === 0)
        .select((-col("o_orderkey")).as("u_key"), lit("6-INSERTED").as("u_priority"),
          lit(0.0).as("u_price")))
    orders.join(updates, col("o_orderkey") === col("u_key"), "full_outer")
      .select(
        coalesce(col("o_orderkey"), col("u_key")).as("key"),
        coalesce(col("u_priority"), col("o_orderpriority")).as("priority"),
        coalesce(col("u_price"), col("o_totalprice")).as("price"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("price")), 2).as("sum_price"),
        min(col("key")).as("min_key"))
      .orderBy(col("priority"))
  }

  /** Skew-salted large-×-large join as a gate query: ~30% of the events
    * fact table is collapsed onto ONE hot user key (the planted-skew shape
    * of a hot tenant / bot account at 100 TB), then joined to the customer
    * dim through [[graft.operators.RegistryOps.saltedJoin]] — the hot key
    * is split across 8 salt sub-keys so no single reducer owns it, and the
    * dim side is exploded ×8 (dim-scale, cheap). The join result is
    * salt-invariant, so a plain DuckDB join oracles it exactly; SkewSpec
    * pins the partition-spread property and PlanSpec pins the (key, salt)
    * join keys. AQE skew-split is the first line of defense (SkewSpec's
    * other test); explicit salting is the fallback when one key is so hot
    * a single AQE split still straggles. */
  private def saltedSkewJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .withColumn("k",
        when(col("user_id") % 10 < 3, lit(1L)).otherwise(col("user_id")))
      .select(col("k"), col("value"))
    val dim = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    graft.operators.RegistryOps.saltedJoin(ev, dim, "k", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("c_mktsegment"))
  }

  /** Gap-based sessionization via Spark's native `session_window`: events
    * for a user merge into one session while consecutive gaps are <= 30
    * minutes (strictly-greater gaps split); `window.end` is last-event +
    * gap (Spark's session semantics, replayed literally in the oracle as
    * max(ts) + 30 min).
    *
    * Scale shape: ONE shuffle on user_id; session merging happens inside
    * the sort-based session aggregation, state bounded per user. This is
    * the batch dual of the streaming session_window query (StreamingSpec
    * asserts stream ≡ batch on the same micro-batched input). */
  private def sessionize: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("n_types"),
        col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** SCD type-2 dimension build via gaps-and-islands: collapse each
    * user's CONSECUTIVE runs of the same event_type into validity
    * intervals (valid_from, valid_to, valid_to = next run's start, open
    * run = null) — the classic "attribute history table" a warehouse
    * derives from a change stream. The island id is the rn − rn_per_value
    * difference trick: two window passes over ONE shuffle on user_id
    * (both windows share the partitioning), then a run-level aggregate
    * and one more lead over the runs — run-cardinality, not
    * event-cardinality. */
  private def scd2Islands: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(s, d)
      .filter(col("user_id") < 200)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("island",
        row_number().over(byUser) - row_number().over(byUserType))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
    // event_type tie-break keeps the run sequence deterministic even if
    // two runs of one user share a first-event timestamp
    val runSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from"), col("event_type"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(runSeq))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("valid_from"), col("event_type"))
  }

  /** Ordered conversion funnel: first signup, then the first view AFTER
    * it, first click after that view, first purchase after that click —
    * each stage's timestamp must strictly follow the previous stage's.
    *
    * Scale shape: each stage is a filter (pushed to the scan) + an agg
    * and a join, ALL keyed on user_id — the same hash partitioning is
    * reused through the chain, and the per-stage aggregates are
    * user-cardinality (small), so Catalyst broadcasts them back against
    * the fact scan. No window over the full corpus, no collect. */
  private def funnelStages: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    def firstAfter(stage: String, prev: DataFrame, prevCol: String, outCol: String) =
      e.filter(col("event_type") === stage)
        .join(broadcast(prev), "user_id")
        .filter(col("ts") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outCol))
    val t1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = firstAfter("view", t1, "t1", "t2")
    val t3 = firstAfter("click", t2.select("user_id", "t2"), "t2", "t3")
    val t4 = firstAfter("purchase", t3.select("user_id", "t3"), "t3", "t4")
    t1.join(t2.select(col("user_id").as("u2"), col("t2")), col("user_id") === col("u2"), "left")
      .join(t3.select(col("user_id").as("u3"), col("t3")), col("user_id") === col("u3"), "left")
      .join(t4.select(col("user_id").as("u4"), col("t4")), col("user_id") === col("u4"), "left")
      .agg(
        count(col("t1")).as("n_signup"),
        count(col("t2")).as("n_view_after"),
        count(col("t3")).as("n_click_after"),
        count(col("t4")).as("n_purchase_after"))
  }

  /** Weekly cohort retention: cohort = week of a user's first event;
    * n_active = distinct users from that cohort seen again at each whole
    * -week offset. The offset divides exactly by 7 because both sides
    * are week-truncated first.
    *
    * Scale shape: distinct (user, week) pairs shrink the fact table
    * before the cohort join; both aggs and the join hash on user_id, the
    * final agg on (cohort, offset) is small. */
  private def retentionCohorts: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    e.join(cohorts, "user_id")
      .withColumn("week_offset",
        floor(datediff(col("wk"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Explicit GROUPING SETS: per-status, per-priority, and grand total in
    * one aggregate pass. */
  private def groupingSetsStats: Q = (s, d) =>
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"))
      .orderBy(col("status"), col("priority"))

  /** CUBE over (status, order-year): all grouping-set combinations. */
  private def cubeOrderStats: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .cube(col("o_orderstatus"), col("o_year"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_year").cast("string"), lit("ALL")).as("o_year"),
        col("cnt"))
      .orderBy(col("status"), col("o_year"))

  /** Generator/UNNEST: explode document tokens to rows, global top-50. */
  private def explodeTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(50)

  /** Fuzzy string matching: edit distance against a probe value. */
  private def levenshteinBrands: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_partkey") < 300)
      .select(col("p_partkey"), col("p_brand"),
        levenshtein(col("p_brand"), lit("Brand#33")).as("dist"))
      .orderBy(col("p_partkey"))

  /** Datetime arithmetic: diffs, truncation, month-end, interval shift. */
  private def datetimeFunctions: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 400)
      .select(
        col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_at"))
      .orderBy(col("o_orderkey"))

  /** Ordered string aggregation per group (deterministic listagg). */
  private def stringAggNations: Q = (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
      .orderBy(col("r_name"))

  /** Pivot: per order-year counts by status as columns. */
  private def pivotStatus: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy(col("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_year"))

  /** LATERAL correlated derived table — per-customer top-2 orders via a
    * correlated ORDER BY ... LIMIT subquery in FROM. Catalyst rewrites
    * the lateral into a ranked join (no per-row re-execution); the same
    * query in DuckDB is the oracle. */
  private def lateralTopOrders: Q = (s, d) => {
    Tables.registerViews(s, d)
    s.sql("""
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      WHERE c.c_custkey < 100
      ORDER BY c.c_custkey, o.o_orderkey""")
  }

  /** Feed-gap detection: hourly buckets in each event type's ACTIVE
    * range (min..max observed hour) with no events — the monitor that
    * catches a dead upstream partition before a consumer notices. The
    * expected-bucket sequence is generated per type (sequence() is a
    * narrow projection off the 1-row-per-type bounds aggregate) and
    * anti-joined against the observed hours: work is O(observed hours +
    * expected hours), never a data rescan. */
  private def missingBuckets: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val expected = hourly.groupBy(col("event_type"))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    expected.join(hourly.select(col("event_type"), col("hour")),
        Seq("event_type", "hour"), "left_anti")
      .orderBy(col("event_type"), col("hour"))
  }

  /** TPC-H Q3 shape (shipping priority): 3-way join with date bands on
    * both fact sides, revenue agg, top-10 — the canonical "filter
    * early, broadcast the dim, one shuffle on the agg key" composite;
    * rank ties break by key. */
  private def tpchQ3: Q = (s, d) => {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < "1998-01-01")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1998-01-01")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q10 shape (returned-item reporting): revenue lost to returns
    * per customer, top 20 — fact filter first, two dim broadcasts, one
    * agg shuffle on the customer key. */
  private def tpchQ10: Q = (s, d) => {
    val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate").between("1996-01-01", "1996-12-31"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey")
    val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("rev")), 2).as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Wide-to-long UNPIVOT via stack(): three per-flag aggregate columns
    * reshaped into (flag, metric, value) rows — the report/export shape.
    * stack is a generator expression (no shuffle beyond the aggregate
    * itself); the oracle is the UNION ALL dual. */
  private def unpivotMetrics: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .select(col("l_returnflag"), expr(
        """stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price,
                    'avg_disc', avg_disc) AS (metric, value)"""))
      .orderBy(col("l_returnflag"), col("metric"))

  /** Malformed-tolerant JSON ingest: event props are deterministically
    * corrupted for event_id % 17 == 0, parsed in PERMISSIVE mode with a
    * corrupt-record column — bad rows are COUNTED and quarantined, never
    * dropped silently and never failing the job (the 100 TB ingest
    * reality: some fraction of upstream JSON is always broken). */
  private def jsonCorrupt: Q = (s, d) => {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k long, _bad string")
    val mangled = Tables.events(s, d)
      .select(col("event_type"),
        when(col("event_id") % 17 === 0, concat(lit("##"), col("props")))
          .otherwise(col("props")).as("props"))
      .select(col("event_type"), from_json(col("props"), schema,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_bad")).as("p"))
    mangled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("p._bad").isNotNull, 1L).otherwise(0L)).as("corrupt_cnt"),
        sum(col("p.k")).as("sum_k"))
      .orderBy(col("event_type"))
  }

  /** Correlated subquery through the SQL front end — Catalyst
    * decorrelates it into an aggregate + join; customers richer than
    * their nation's average. */
  private def correlatedSubquery: Q = (s, d) => {
    Tables.registerViews(s, d)
    s.sql("""
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey""")
  }

  /** Scalar subquery: orders above the global average price. */
  private def scalarSubquery: Q = (s, d) => {
    Tables.registerViews(s, d)
    s.sql("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey""")
  }

  /** As-of join: each click paired with the user's latest purchase at or
    * before it (point-in-time lookup). Implementation is the union-scan
    * form — one shuffle on user_id, no per-key range explosion
    * (operators/AsOfJoin.scala); the oracle is DuckDB's native ASOF JOIN. */
  private def asofLastPurchase: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))
    graft.operators.AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        rightPayload = Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts"), col("asof_purchase_id"), col("asof_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** The same as-of query through the custom Catalyst operator
    * (AsOfJoinNode → AsOfJoinStrategy → AsOfJoinExec sort-merge): the
    * planner owns the two co-partitioned exchanges and sorts, the merge
    * streams with O(1) state. Identical output contract, same oracle. */
  private def asofLastPurchaseExec: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))
    graft.operators.AsOfJoin.asOfExec(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        rightPayload = Seq("purchase_id", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_ts"), col("asof_purchase_id"), col("asof_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** As-of join with a match-age tolerance (the pandas `merge_asof
    * tolerance` semantics): the matched purchase must be within one hour
    * of the click or the payload nulls out. Same one-shuffle union-scan
    * plan as rel_asof_join — the tolerance is a post-join projection over
    * integer microseconds (exact in both engines), not a different join. */
  private def asofTolerance: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val within = col("asof_ts").isNotNull &&
      (unix_micros(col("ts")) - unix_micros(col("asof_ts"))) <= lit(3600000000L)
    graft.operators.AsOfJoin.asOf(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightPayload = Seq("purchase_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(within, col("asof_ts")).as("recent_ts"),
        when(within, col("asof_purchase_id")).as("recent_purchase_id"))
      .orderBy(col("event_id"))
  }

  /** Nearest-event join (merge_asof direction='nearest'): each click
    * pairs with the user's closest purchase in either direction, ties
    * to the at-or-before row. One shuffle; two streaming frames over
    * one sorted partition stream (AsOfJoin.asOfNearest). */
  private def asofNearest: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    graft.operators.AsOfJoin.asOfNearest(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightPayload = Seq("purchase_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("nearest_ts"), col("nearest_purchase_id"))
      .orderBy(col("event_id"))
  }

  /** Range join: click values falling inside [purchase_value,
    * purchase_value + 2] — bucketed equi-join (operators/RangeJoin.scala),
    * not the BroadcastNestedLoop Spark would plan for a bare inequality
    * join. Bounded to user_id < 30 to keep the oracle pair set modest. */
  private def rangeValueJoin: Q = (s, d) => {
    val ev = Tables.events(s, d).filter(col("user_id") < 30)
    val points = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("value"))
    val intervals = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("value").as("lo"),
        (col("value") + 2).as("hi"))
    graft.operators.RangeJoin.pointsInIntervals(
        points, intervals, "value", "lo", "hi", bucketWidth = 2.0)
      .select(col("click_id"), col("purchase_id"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** Interval×interval overlap join through the bucketed equi-join
    * (RangeJoin.intervalOverlapJoin): purchase value-bands [v, v+2]
    * against click value-bands [v, v+1] — no BroadcastNestedLoop, and
    * each overlapping pair emits exactly once via the responsible-bucket
    * condition (no distinct over the match set). */
  private def intervalOverlapJoin: Q = (s, d) => {
    val ev = Tables.events(s, d).filter(col("user_id") < 30)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("value").as("p_lo"),
        (col("value") + 2).as("p_hi"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("value").as("c_lo"),
        (col("value") + 1).as("c_hi"))
    graft.operators.RangeJoin.intervalOverlapJoin(
        purchases, clicks, "p_lo", "p_hi", "c_lo", "c_hi", bucketWidth = 2.0)
      .select(col("purchase_id"), col("click_id"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Per-type hourly volume anomalies: hours whose event count sits
    * 2.5+ population-σ from the type's mean. Mean/variance come from
    * exact integer sums (Σcnt, Σcnt²), so both engines evaluate the
    * identical IEEE expression — no stddev aggregate numerics to
    * reconcile. Stats are |types| rows, broadcast back into the hourly
    * table; one shuffle for the hourly aggregate. */
  private def anomalyZscore: Q = (s, d) => {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .withColumn("mean", col("s1").cast("double") / col("n_hours"))
      .withColumn("variance",
        col("s2").cast("double") / col("n_hours") - col("mean") * col("mean"))
      .filter(col("variance") > 0)
      .select(col("event_type"), col("mean"), sqrt(col("variance")).as("sigma"))
    hourly.join(broadcast(stats), "event_type")
      .withColumn("z", round((col("cnt").cast("double") - col("mean")) / col("sigma"), 4))
      .filter(abs(col("z")) >= 2.5)
      .select(col("event_type"), col("hour"), col("cnt"), col("z"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Deequ-style single-pass column profile of the orders table — the
    * per-batch data-quality report (nulls, exact distincts, ranges,
    * means) from one scan, reshaped to |columns| rows with stack(). */
  private def profileReport: Q = (s, d) =>
    graft.pipeline.Profiling.profile(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("col_name"))

  /** Profile drift between the even- and odd-key halves of orders — the
    * yesterday-vs-today monitor that pages when a feed breaks. Two
    * single-pass profiles joined at metadata scale. */
  private def profileDrift: Q = (s, d) => {
    val o = Tables.orders(s, d)
    graft.pipeline.Profiling.profileDrift(
        o.filter(col("o_orderkey") % 2 === 0), o.filter(col("o_orderkey") % 2 === 1),
        Seq("o_custkey", "o_totalprice", "o_orderstatus"))
      .orderBy(col("col_name"))
  }

  /** Declarative expectation suite over orders (Deequ check analog):
    * five row-local rules in ONE scan, a uniqueness check, and a
    * referential check against customer — the admission gate a pipeline
    * runs per batch. Rules are chosen so some genuinely pass (0) and the
    * planted ones count real rows; the oracle recomputes each count. */
  private def dqExpectations: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val rowRules = graft.pipeline.Profiling.expectations(o, Seq(
      "custkey_not_null" -> col("o_custkey").isNotNull,
      "orderdate_in_range" -> col("o_orderdate").between("1990-01-01", "2000-12-31"),
      "status_in_set" -> col("o_orderstatus").isin("O", "F", "P"),
      "totalprice_positive" -> (col("o_totalprice") > 0),
      "priority_well_formed" -> col("o_orderpriority").rlike("^[1-5]-")))
    rowRules
      .unionByName(graft.pipeline.Profiling.uniqueExpectation(
        o, Seq("o_orderkey"), "orderkey_unique"))
      .unionByName(graft.pipeline.Profiling.fkExpectation(
        o, "o_custkey", Tables.customer(s, d), "c_custkey", "custkey_fk"))
      .orderBy(col("rule"))
  }

  /** k-anonymity audit: customer equivalence classes over
    * (nation, segment, 1000-wide balance band) smaller than k=5 —
    * the privacy release gate a curation pipeline runs before
    * publishing a slice keyed on quasi-identifiers. One
    * hash-aggregate + filter (see Profiling.kAnonymityViolations). */
  private def dqKAnonymity: Q = (s, d) =>
    graft.pipeline.Profiling.kAnonymityViolations(
        Tables.customer(s, d).select(
          col("c_nationkey"), col("c_mktsegment"),
          (floor(col("c_acctbal") / 1000) * 1000).cast("long").as("balance_band")),
        Seq("c_nationkey", "c_mktsegment", "balance_band"), k = 5)
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("balance_band"))

  val queries: Map[String, Q] = Map(
    "rel_scd2_islands"        -> scd2Islands,
    "dq_expectations"         -> dqExpectations,
    "dq_k_anonymity"          -> dqKAnonymity,
    "rel_profile"             -> profileReport,
    "rel_profile_drift"       -> profileDrift,
    "rel_interval_join"       -> intervalOverlapJoin,
    "rel_anomaly_zscore"      -> anomalyZscore,
    "rel_asof_join"           -> asofLastPurchase,
    "rel_asof_join_exec"      -> asofLastPurchaseExec,
    "rel_asof_tolerance"      -> asofTolerance,
    "rel_asof_nearest"        -> asofNearest,
    "rel_gap_fill"            -> gapFill,
    "rel_range_join"          -> rangeValueJoin,
    "rel_correlated_subquery" -> correlatedSubquery,
    "rel_lateral_join"        -> lateralTopOrders,
    "rel_unpivot"             -> unpivotMetrics,
    "rel_tpch_q3"             -> tpchQ3,
    "rel_missing_buckets"     -> missingBuckets,
    "rel_tpch_q10"            -> tpchQ10,
    "rel_json_corrupt"        -> jsonCorrupt,
    "rel_scalar_subquery"     -> scalarSubquery,
    "rel_exists_subquery"     -> existsSubquery,
    "rel_window_leadlag"      -> windowLeadLag,
    "rel_ntile_quartiles"     -> ntileBuckets,
    "rel_regex_extract"       -> regexExtract,
    "rel_conditional_math"    -> conditionalMath,
    "rel_cube_stats"          -> cubeOrderStats,
    "rel_grouping_sets"       -> groupingSetsStats,
    "rel_explode_tokens"      -> explodeTokens,
    "rel_levenshtein"         -> levenshteinBrands,
    "rel_datetime_functions"  -> datetimeFunctions,
    "rel_string_agg"          -> stringAggNations,
    "rel_pivot_status"        -> pivotStatus,
    "rel_pricing_summary"     -> pricingSummary,
    "rel_bucketed_join"       -> bucketedJoin,
    "rel_filter_project"      -> filterProject,
    "rel_revenue_by_nation"   -> revenueByNation,
    "rel_left_outer_counts"   -> leftOuterOrderCounts,
    "rel_semi_join_urgent"    -> semiJoinUrgent,
    "rel_anti_join_no_orders" -> antiJoinNoOrders,
    "rel_window_top3"         -> top3OrdersPerCustomer,
    "rel_window_running"      -> runningTotal,
    "rel_window_range_frame"  -> rangeFrameSpend,
    "rel_window_percentiles"  -> windowPercentiles,
    "rel_topk_orders"         -> topkOrders,
    "rel_set_except"          -> setExcept,
    "rel_set_intersect"       -> setIntersect,
    "rel_set_union"           -> setUnion,
    "rel_rollup_stats"        -> rollupOrderStats,
    "rel_scalar_functions"    -> scalarFunctions,
    "rel_json_events"         -> jsonEvents,
    "rel_distinct_users"      -> distinctUsers,
    "rel_array_norms"         -> arrayNorms,
    "rel_hourly_events"       -> hourlyEventStats,
    "stream_sliding_topn"     -> streamSlidingTopn,
    "rel_skew_report"         -> skewReport,
    "rel_decay_score"         -> decayScore,
    "rel_value_histogram"     -> valueHistogram,
    "rel_sessionize"          -> sessionize,
    "rel_funnel"              -> funnelStages,
    "rel_retention_cohorts"   -> retentionCohorts,
    "rel_partitioned_scan"    -> partitionedScan,
    "rel_dpp_join"            -> dppJoin,
    "rel_merge_upsert"        -> mergeUpsert,
    "rel_salted_skew_join"    -> saltedSkewJoin,
  )

  val oracles: Map[String, String] = Map(
    "rel_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                           event_id AS purchase_id, value AS purchase_value
                    FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
                p.ts AS asof_ts, p.purchase_id AS asof_purchase_id,
                p.purchase_value AS asof_purchase_value
         FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
         ORDER BY c.event_id""",
    "rel_asof_join_exec" ->
      """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                           event_id AS purchase_id, value AS purchase_value
                    FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
                p.ts AS asof_ts, p.purchase_id AS asof_purchase_id,
                p.purchase_value AS asof_purchase_value
         FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
         ORDER BY c.event_id""",
    "rel_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
                   CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   count(DISTINCT $c) AS n_distinct,
                   round(CAST(min($c) AS DOUBLE), 4) AS min_num,
                   round(CAST(max($c) AS DOUBLE), 4) AS max_num,
                   round(avg($c), 4) AS mean,
                   CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
            FROM orders"""
      def str(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
                   CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   count(DISTINCT $c) AS n_distinct,
                   CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
                   CAST(NULL AS DOUBLE) AS mean,
                   CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
            FROM orders"""
      Seq(num("o_orderkey"), num("o_custkey"), num("o_totalprice"),
          str("o_orderstatus"), str("o_orderpriority"))
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    },
    "rel_profile_drift" -> {
      def side(filter: String, tag: String) =
        s"""SELECT col_name, n_rows AS ${tag}_rows, n_nulls AS ${tag}_nulls,
                   n_distinct AS ${tag}_distinct, mean AS ${tag}_mean
            FROM (
              SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
                     CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                     count(DISTINCT o_custkey) AS n_distinct, round(avg(o_custkey), 4) AS mean
              FROM orders WHERE $filter
              UNION ALL
              SELECT 'o_totalprice', count(*),
                     CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                     count(DISTINCT o_totalprice), round(avg(o_totalprice), 4)
              FROM orders WHERE $filter
              UNION ALL
              SELECT 'o_orderstatus', count(*),
                     CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                     count(DISTINCT o_orderstatus), CAST(NULL AS DOUBLE)
              FROM orders WHERE $filter)"""
      s"""WITH a AS (${side("o_orderkey % 2 = 0", "ref")}),
              b AS (${side("o_orderkey % 2 = 1", "cur")})
         SELECT a.col_name,
                round(CAST(cur_nulls AS DOUBLE) / cur_rows
                      - CAST(ref_nulls AS DOUBLE) / ref_rows, 6) AS null_frac_delta,
                round(CAST(cur_distinct AS DOUBLE) / ref_distinct, 4) AS distinct_ratio,
                round(cur_mean - ref_mean, 4) AS mean_delta
         FROM a JOIN b ON a.col_name = b.col_name
         ORDER BY a.col_name"""
    },
    "rel_interval_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, value AS p_lo, value + 2 AS p_hi
                    FROM events WHERE event_type = 'purchase' AND user_id < 30),
              c AS (SELECT event_id AS click_id, value AS c_lo, value + 1 AS c_hi
                    FROM events WHERE event_type = 'click' AND user_id < 30)
         SELECT purchase_id, click_id
         FROM p JOIN c ON p_lo <= c_hi AND c_lo <= p_hi
         ORDER BY purchase_id, click_id""",
    "rel_anomaly_zscore" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                                count(*) AS cnt
                         FROM events GROUP BY 1, 2),
              stats AS (SELECT event_type, count(*) AS n_hours,
                               sum(cnt) AS s1, sum(cnt * cnt) AS s2
                        FROM hourly GROUP BY 1),
              sd AS (SELECT event_type,
                            CAST(s1 AS DOUBLE) / n_hours AS mean,
                            CAST(s2 AS DOUBLE) / n_hours
                              - (CAST(s1 AS DOUBLE) / n_hours) * (CAST(s1 AS DOUBLE) / n_hours)
                              AS variance
                     FROM stats),
              sg AS (SELECT event_type, mean, sqrt(variance) AS sigma
                     FROM sd WHERE variance > 0)
         SELECT h.event_type, CAST(h.hour AS TIMESTAMP) AS hour, h.cnt,
                round((CAST(h.cnt AS DOUBLE) - sg.mean) / sg.sigma, 4) AS z
         FROM hourly h JOIN sg USING (event_type)
         WHERE abs(round((CAST(h.cnt AS DOUBLE) - sg.mean) / sg.sigma, 4)) >= 2.5
         ORDER BY h.event_type, hour""",
    "rel_asof_nearest" ->
      """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
                           event_id AS purchase_id
                    FROM events WHERE event_type = 'purchase'),
              pairs AS (SELECT c.event_id, p.pts, p.purchase_id,
                               abs(epoch_us(c.ts) - epoch_us(p.pts)) AS adiff,
                               CASE WHEN p.pts <= c.ts THEN 0 ELSE 1 END AS side,
                               CASE WHEN p.pts <= c.ts THEN -p.purchase_id
                                    ELSE p.purchase_id END AS tiebreak
                        FROM c JOIN p USING (user_id)),
              best AS (SELECT event_id, pts, purchase_id,
                              row_number() OVER (PARTITION BY event_id
                                ORDER BY adiff, side, tiebreak) AS rn
                       FROM pairs)
         SELECT c.event_id, c.user_id, c.ts, b.pts AS nearest_ts,
                b.purchase_id AS nearest_purchase_id
         FROM c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (event_id)
         ORDER BY c.event_id""",
    "rel_asof_tolerance" ->
      """WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                           event_id AS purchase_id
                    FROM events WHERE event_type = 'purchase')
         SELECT c.event_id, c.user_id, c.ts,
                CASE WHEN p.ts IS NOT NULL
                      AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                     THEN p.ts END AS recent_ts,
                CASE WHEN p.ts IS NOT NULL
                      AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                     THEN p.purchase_id END AS recent_purchase_id
         FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
         ORDER BY c.event_id""",
    "rel_gap_fill" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS last_purchase_value
         FROM events WHERE user_id < 50 ORDER BY event_id""",
    "rel_range_join" ->
      """WITH c AS (SELECT event_id AS click_id, value FROM events
                    WHERE event_type = 'click' AND user_id < 30),
              p AS (SELECT event_id AS purchase_id, value AS lo, value + 2 AS hi
                    FROM events WHERE event_type = 'purchase' AND user_id < 30)
         SELECT click_id, purchase_id FROM c JOIN p ON value >= lo AND value <= hi
         ORDER BY click_id, purchase_id""",
    "rel_correlated_subquery" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
         FROM customer c
         WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                            WHERE c2.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""",
    "rel_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
         FROM orders
         WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
         ORDER BY o_orderkey""",
    "rel_lateral_join" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         FROM customer c, LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         WHERE c.c_custkey < 100
         ORDER BY c.c_custkey, o.o_orderkey""",
    "rel_missing_buckets" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour
                    FROM events GROUP BY 1, 2),
            b AS (SELECT event_type, min(hour) AS lo, max(hour) AS hi
                  FROM h GROUP BY event_type),
            e AS (SELECT event_type,
                         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
                  FROM b)
         SELECT e.event_type, e.hour
         FROM e LEFT JOIN h ON h.event_type = e.event_type AND h.hour = e.hour
         WHERE h.event_type IS NULL
         ORDER BY e.event_type, e.hour""",
    "rel_tpch_q3" ->
      """SELECT o.o_orderkey, o.o_orderdate,
                round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1998-01-01'
           AND l.l_shipdate >= TIMESTAMP '1998-01-01'
         GROUP BY o.o_orderkey, o.o_orderdate
         ORDER BY revenue DESC, o.o_orderkey LIMIT 10""",
    "rel_tpch_q10" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
                round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS lost_revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE l.l_returnflag = 'R'
           AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
         GROUP BY c.c_custkey, c.c_name, n.n_name
         ORDER BY lost_revenue DESC, c.c_custkey LIMIT 20""",
    "rel_unpivot" ->
      """WITH a AS (SELECT l_returnflag,
                           round(sum(l_quantity), 2) AS sum_qty,
                           round(sum(l_extendedprice), 2) AS sum_price,
                           round(avg(l_discount), 4) AS avg_disc
                    FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, metric, value FROM (
           SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
           UNION ALL
           SELECT l_returnflag, 'sum_price', sum_price FROM a
           UNION ALL
           SELECT l_returnflag, 'avg_disc', avg_disc FROM a)
         ORDER BY l_returnflag, metric""",
    "rel_json_corrupt" ->
      """SELECT event_type, count(*) AS cnt,
                count(*) FILTER (WHERE event_id % 17 = 0) AS corrupt_cnt,
                CAST(sum(CASE WHEN event_id % 17 = 0 THEN NULL
                         ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
                    END) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "rel_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS cnt
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY status, priority""",
    "rel_explode_tokens" ->
      """SELECT tok, count(*) AS cnt
         FROM documents, unnest(string_split(text, ' ')) AS u(tok)
         GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 50""",
    "rel_levenshtein" ->
      """SELECT p_partkey, p_brand,
         CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS dist
         FROM part WHERE p_partkey < 300 ORDER BY p_partkey""",
    "rel_datetime_functions" ->
      """SELECT o_orderkey,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
         CAST(last_day(o_orderdate) AS DATE) AS month_end,
         o_orderdate + INTERVAL 90 DAY AS due_at
         FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""",
    "rel_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "rel_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
         count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
         count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY 1 ORDER BY 1""",
    "rel_cube_stats" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(CAST(CAST(year(o_orderdate) AS INT) AS VARCHAR), 'ALL') AS o_year,
         count(*) AS cnt
         FROM orders GROUP BY CUBE (o_orderstatus, year(o_orderdate))
         ORDER BY status, o_year""",
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(l_extendedprice) AS sum_base_price,
         sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
         avg(l_quantity) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // the bucketed layout is a physical-plan property; the result is the
    // plain join — which is the point: same answer, zero join shuffles
    "rel_bucketed_join" ->
      """SELECT o_orderpriority,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "rel_filter_project" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0
         ORDER BY o_orderkey""",
    "rel_revenue_by_nation" ->
      """SELECT r_name, n_name, sum(o_totalprice) AS revenue,
         count(*) AS order_cnt
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "rel_left_outer_counts" ->
      """SELECT c_custkey, count(o_orderkey) AS order_cnt
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1 LIMIT 1000""",
    "rel_semi_join_urgent" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "rel_anti_join_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "rel_window_top3" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "rel_window_running" ->
      """SELECT o_custkey, o_orderkey,
         sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend
         FROM orders WHERE o_custkey < 200
         ORDER BY o_custkey, o_orderkey""",
    "rel_window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY CAST(floor(epoch_us(o_orderdate) / 1000000.0) AS BIGINT)
           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS trailing_30d_spend
         FROM orders WHERE o_custkey < 200
         ORDER BY o_custkey, o_orderkey""",
    "rel_window_percentiles" ->
      """SELECT o_custkey, o_orderkey,
                round(percent_rank() OVER w, 6) AS pct_rank,
                round(cume_dist() OVER w, 6) AS cume
         FROM orders WHERE o_custkey < 100
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "rel_decay_score" ->
      s"""SELECT user_id, count(*) AS n_events,
         round(sum(value * exp(-($DecayLambda) *
           (CAST(epoch_us(TIMESTAMP '2025-01-01 00:00:00') AS DOUBLE) / 1000000.0
            - CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 1000000.0))), 6)
           AS decayed_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "rel_value_histogram" ->
      """SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 50000.0), 0.0), 11.0) AS INT)
                AS bucket,
                count(*) AS cnt,
                round(min(o_totalprice), 2) AS lo_seen,
                round(max(o_totalprice), 2) AS hi_seen
         FROM orders GROUP BY 1 ORDER BY 1""",
    "rel_skew_report" ->
      """WITH c AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1)
         SELECT count(*) AS n_keys, min(cnt) AS min_rows,
                round(quantile_cont(cnt, 0.5), 4) AS p50_rows,
                round(quantile_cont(cnt, 0.95), 4) AS p95_rows,
                max(cnt) AS max_rows, round(avg(cnt), 4) AS avg_rows,
                round(max(cnt) / avg(cnt), 4) AS skew_ratio
         FROM c""",
    "rel_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",
    "rel_set_except" ->
      """SELECT o_orderkey FROM orders
         EXCEPT
         SELECT l_orderkey AS o_orderkey FROM lineitem
         WHERE l_shipdate > TIMESTAMP '1997-01-01'
         ORDER BY o_orderkey""",
    "rel_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
         ORDER BY o_custkey""",
    "rel_set_union" ->
      """SELECT DISTINCT o_custkey FROM (
           SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
           UNION ALL
           SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
         ORDER BY o_custkey""",
    "rel_rollup_stats" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS cnt, sum(o_totalprice) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "rel_scalar_functions" ->
      """SELECT o_orderkey,
         upper(o_orderstatus) AS status_uc,
         substring(o_orderpriority, 1, 1) AS prio_code,
         'ord-' || CAST(o_orderkey AS VARCHAR) AS tag,
         CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(month(o_orderdate) AS INT) AS o_month,
         round(o_totalprice / 1000.0, 1) AS price_k,
         o_totalprice > 200000.0 AS is_big
         FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""",
    "rel_regex_extract" ->
      """SELECT p_partkey,
         regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
         regexp_replace(p_type, '[aeiou]', '', 'g') AS type_scrubbed,
         CAST(len(string_split(p_name, ' ')) AS INT) AS name_words
         FROM part WHERE p_partkey < 300 ORDER BY p_partkey""",
    "rel_conditional_math" ->
      """SELECT o_orderkey,
         coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
         least(o_totalprice, CAST(100000.0 AS DOUBLE)) AS capped,
         greatest(o_custkey % 7, CAST(2 AS BIGINT)) AS floored_mod,
         CAST(sign(o_totalprice - CAST(150000.0 AS DOUBLE)) AS INT) AS above_mid,
         round(ln(o_totalprice), 4) AS ln_price,
         round(power(o_totalprice / CAST(100000.0 AS DOUBLE), 2), 4) AS sq_ratio
         FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""",
    "rel_window_leadlag" ->
      """SELECT o_custkey, o_orderkey,
         round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta_prev,
         lead(o_orderkey, 1) OVER w AS next_order
         FROM orders WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "rel_ntile_quartiles" ->
      """SELECT o_orderkey,
         CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS quartile
         FROM orders WHERE o_custkey < 100 ORDER BY o_orderkey""",
    "rel_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
           AND NOT EXISTS (SELECT 1 FROM orders o2
                           WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "rel_json_events" ->
      """SELECT event_type, count(*) AS cnt,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "rel_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS cnt
         FROM events GROUP BY 1 ORDER BY 1""",
    "rel_array_norms" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
         round(sqrt(list_aggregate(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm
         FROM embeddings ORDER BY vec_id""",
    "rel_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS cnt, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // Sliding windows replayed by hand: each event belongs to the 4
    // 30-minute-grid starts covering it (Spark window() epoch alignment)
    "stream_sliding_topn" ->
      """WITH w AS (SELECT (CAST(ts AS TIMESTAMP)
                            - to_microseconds(epoch_us(CAST(ts AS TIMESTAMP)) % 1800000000)
                            - to_minutes(30 * k)) AS window_start,
                           event_type
                    FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k)),
              cnt AS (SELECT window_start, event_type, count(*) AS cnt
                      FROM w GROUP BY 1, 2),
              r AS (SELECT *, CAST(row_number() OVER (PARTITION BY window_start
                                     ORDER BY cnt DESC, event_type) AS INT) AS "rank"
                    FROM cnt)
         SELECT window_start, event_type, cnt, "rank" FROM r
         WHERE "rank" <= 3 ORDER BY window_start, "rank"""",
    // Replays Spark's session_window semantics: a NEW session starts only
    // when the gap to the previous event is STRICTLY > 30 min (an event
    // landing exactly on the previous session's end is merged — verified
    // in StreamingSpec); session_end = last event + gap.
    "rel_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                           event_type, value FROM events),
              l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev_ts FROM e),
              f AS (SELECT *, CASE WHEN prev_ts IS NULL
                                     OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                                   THEN 1 ELSE 0 END AS new_sess FROM l),
              g AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM f)
         SELECT user_id, min(ts) AS session_start,
                max(ts) + INTERVAL 30 MINUTE AS session_end,
                count(*) AS n_events, count(DISTINCT event_type) AS n_types,
                round(sum(value), 2) AS sum_value
         FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "rel_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
              t1 AS (SELECT user_id, min(ts) AS t1 FROM e
                     WHERE event_type = 'signup' GROUP BY 1),
              t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e JOIN t1 USING (user_id)
                     WHERE e.event_type = 'view' AND e.ts > t1.t1 GROUP BY 1),
              t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e JOIN t2 USING (user_id)
                     WHERE e.event_type = 'click' AND e.ts > t2.t2 GROUP BY 1),
              t4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM e JOIN t3 USING (user_id)
                     WHERE e.event_type = 'purchase' AND e.ts > t3.t3 GROUP BY 1)
         SELECT count(t1.t1) AS n_signup, count(t2.t2) AS n_view_after,
                count(t3.t3) AS n_click_after, count(t4.t4) AS n_purchase_after
         FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
              LEFT JOIN t4 USING (user_id)""",
    "rel_retention_cohorts" ->
      """WITH e AS (SELECT DISTINCT user_id,
                           CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wk
                    FROM events),
              f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1)
         SELECT cohort_week,
                CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
                count(DISTINCT user_id) AS n_active
         FROM e JOIN f USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "rel_partitioned_scan" ->
      """SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                round(avg(n_chars), 2) AS avg_chars
         FROM documents WHERE lang = 'en'
         GROUP BY source ORDER BY source""",
    "rel_dpp_join" ->
      """SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE n_regionkey = 1
         GROUP BY n_name ORDER BY n_name""",
    "rel_scd2_islands" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
                    FROM events WHERE user_id < 200),
              r AS (SELECT *,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)
                         - row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS island
                    FROM e),
              runs AS (SELECT user_id, event_type, island,
                              min(ts) AS valid_from, count(*) AS n_events
                       FROM r GROUP BY user_id, event_type, island),
              seq AS (SELECT user_id, event_type, valid_from, n_events,
                             lead(valid_from) OVER (PARTITION BY user_id
                               ORDER BY valid_from, event_type) AS valid_to
                      FROM runs)
         SELECT user_id, event_type, valid_from, valid_to, n_events
         FROM seq ORDER BY user_id, valid_from, event_type""",
    "dq_expectations" ->
      """WITH n AS (SELECT count(*) AS checked FROM orders),
              rows_r AS (
                SELECT 'custkey_not_null' AS rule,
                       count(*) FILTER (WHERE o_custkey IS NULL) AS violations FROM orders
                UNION ALL
                SELECT 'orderdate_in_range',
                       count(*) FILTER (WHERE o_orderdate IS NULL
                         OR o_orderdate < DATE '1990-01-01'
                         OR o_orderdate > DATE '2000-12-31') FROM orders
                UNION ALL
                SELECT 'status_in_set',
                       count(*) FILTER (WHERE o_orderstatus IS NULL
                         OR o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
                UNION ALL
                SELECT 'totalprice_positive',
                       count(*) FILTER (WHERE o_totalprice IS NULL
                         OR NOT (o_totalprice > 0)) FROM orders
                UNION ALL
                SELECT 'priority_well_formed',
                       count(*) FILTER (WHERE o_orderpriority IS NULL
                         OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) FROM orders
                UNION ALL
                SELECT 'orderkey_unique',
                       count(*) - count(DISTINCT o_orderkey) FROM orders
                UNION ALL
                SELECT 'custkey_fk',
                       count(*) FILTER (WHERE o_custkey NOT IN
                         (SELECT c_custkey FROM customer)) FROM orders)
         SELECT rule, CAST(violations AS BIGINT) AS violations, checked
         FROM rows_r, n ORDER BY rule""",
    "dq_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS balance_band,
                count(*) AS class_size
         FROM customer
         GROUP BY 1, 2, 3 HAVING count(*) < 5
         ORDER BY c_nationkey, c_mktsegment, balance_band""",
    "rel_merge_upsert" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
              u AS (SELECT o_orderkey AS u_key, '0-MERGED' AS u_priority,
                           o_totalprice AS u_price
                    FROM o WHERE o_orderkey % 97 = 0
                    UNION ALL
                    SELECT -o_orderkey, '6-INSERTED', CAST(0.0 AS DOUBLE)
                    FROM o WHERE o_orderkey % 501 = 0),
              m AS (SELECT coalesce(o.o_orderkey, u.u_key) AS key,
                           coalesce(u.u_priority, o.o_orderpriority) AS priority,
                           coalesce(u.u_price, o.o_totalprice) AS price
                    FROM o FULL OUTER JOIN u ON o.o_orderkey = u.u_key)
         SELECT priority, count(*) AS n_rows, round(sum(price), 2) AS sum_price,
                min(key) AS min_key
         FROM m GROUP BY priority ORDER BY priority""",
    "rel_salted_skew_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
                round(sum(value), 2) AS sum_value
         FROM (SELECT CASE WHEN user_id % 10 < 3 THEN 1
                           ELSE user_id END AS k, value
               FROM events) e
         JOIN customer ON e.k = customer.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
  )
}
