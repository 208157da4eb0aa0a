package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Classic relational workloads over the large fact tables — the engine's
  * general-analytics surface (the reference has no joins or aggregations at
  * all; these exercise the shuffle/aggregate machinery the pipeline
  * operators stand on, at lineitem scale).
  *
  * Scale notes:
  *  - the pricing summary is a single groupBy over a date-filtered scan —
  *    the filter pushes into parquet (row-group pruning on l_shipdate once
  *    data is sorted/partitioned by date), aggregation is map-side partial;
  *  - the revenue rollup joins fact-to-fact on the order key (shuffle
  *    hash/sort-merge under AQE) while the small dimensions (customer at
  *    SF-proportional size, nation at 25 rows) broadcast — no shuffle of
  *    the big side for them.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary. Money sums rounded to whole units and
    * averages to 4 dp so cross-engine summation-order drift (~1e-15
    * relative on ~1e9 sums) stays far from the rounding boundary. */
  def pricingSummary(spark: SparkSession, dir: String,
                     cutoff: String = "1998-09-02"): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 0).as("sum_qty"),
        round(sum(col("l_extendedprice")), 0).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))), 0).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Supplier-region part-type revenue rollup: the fact table against the
    * full dimension chain (part, supplier, nation, region — all broadcast;
    * each is SF-proportional-small or constant-size). Exercises every
    * remaining driver table. */
  def partTypeRevenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("p_type"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("p_type"))
  }

  /** Top-`k` part types per region by revenue — the per-group top-N shape
    * (ranking window AFTER aggregation). The window partitions by region,
    * so its state is one group's aggregated rows, never the fact table;
    * Spark 4 additionally pushes a partial `WindowGroupLimit` below the
    * rank filter's shuffle. Ranked on the ROUNDED revenue with a p_type
    * tie-break, so both engines elect the same rows. */
  def topTypesPerRegion(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("r_name"))
      .orderBy(desc("revenue"), asc("p_type"))
    partTypeRevenueByRegion(spark, dir)
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .where(col("rnk") <= k)
      .orderBy(col("r_name"), col("rnk"))
  }

  /** Top-k customers by lifetime revenue: fact⋈fact on the order key, the
    * customer dimension broadcast, k-selection AFTER the aggregation via
    * `orderBy + limit` ⇒ TakeOrderedAndProject — a bounded heap over the
    * aggregated (per-customer) rows, never a global sort of customers. */
  def topCustomers(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("revenue"),
        count_distinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(k)
  }

  /** TPC-H Q3-shaped shipping priority: segment-filtered customers
    * (broadcast AFTER the filter — the pushdown shrinks the broadcast, not
    * just the scan), date cutoffs pushed into both fact scans, top-k after
    * the per-order rollup. */
  def shippingPriority(spark: SparkSession, dir: String,
                       segment: String = "BUILDING",
                       cutoff: String = "1996-06-01", k: Int = 10): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val cut = to_timestamp(lit(cutoff))
    l.where(l("l_shipdate") > cut)
      .join(o.where(o("o_orderdate") < cut), l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c.where(col("c_mktsegment") === segment)),
        o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(k)
  }

  /** Anti join: orders that never shipped a line item — the referential
    * integrity / orphan audit shape. Plans as a broadcast/shuffled hash
    * anti join on the order key; the probe side streams, nothing
    * materializes the complement. */
  def ordersWithoutLineitems(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Semi join: customers with at least one order before the cutoff —
    * existence check without multiplying rows (a plain inner join would
    * duplicate each customer per matching order). */
  def activeCustomers(spark: SparkSession, dir: String,
                      cutoff: String = "1996-01-01"): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o.where(o("o_orderdate") < to_timestamp(lit(cutoff))),
        c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP: pricing totals with subtotal and grand-total rows — the
    * hierarchical-report shape. One aggregation; Spark expands the
    * grouping sets map-side, so the shuffle stays at (groups × 3) rows.
    * `gid` disambiguates subtotal NULLs from (absent here) data NULLs,
    * computed with explicit grouping() arithmetic so both engines agree
    * on the encoding. */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("revenue"),
        count(lit(1)).as("n_items"),
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("bigint").as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** PIVOT: daily event counts, one column per event type (explicit value
    * list — a pivot over unknown values needs a discovery pass, which is
    * an extra job by design in Spark). Missing combinations surface as 0,
    * matching the FILTER-aggregate formulation. */
  def eventsPivot(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = events
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(pivoted)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("day"))
  }

  /** Revenue by customer nation: fact⋈fact on the order key, dimensions
    * broadcast explicitly. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("n_name"))
  }
}
