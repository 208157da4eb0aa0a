package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fix for the stragglers
  * [[Diagnostics.skewAudit]] detects, for engines/configs where AQE's
  * skew-join splitting doesn't apply (aggregations keyed on a hot key,
  * joins below AQE's skew thresholds, pre-Spark-3 clusters).
  *
  * The technique: widen the hot key into (key, salt) so one reducer's
  * work spreads over `salts` reducers. For a JOIN the salt must come from
  * the FACT row (any per-row column), and the dimension side is
  * replicated `salts`× so every (key, salt) pair finds its match — the
  * classic replicate-the-small-side salted join. The salt here is a
  * deterministic row hash ([[Sampling.hashBucket]]), not a random number:
  * results are reproducible run-to-run and engine-to-engine, which is
  * what lets the DuckDB oracle check that salting PRESERVES SEMANTICS
  * (the salted plan must equal the plain join bit-for-bit).
  *
  * Scale shape: the fact side shuffles once on (key, salt) — same bytes
  * as the unsalted join, `salts`× the key cardinality, 1/`salts` the
  * per-reducer load on the hottest key. The dimension side grows
  * `salts`×; pick `salts` so that (dim × salts) stays far below the fact
  * side (a 1e9-row dim at salts=8 is still ~1% of a 1e12-row fact).
  */
object Salting {

  /** Generic salted equi-join: `fact ⋈ dim ON key` executed as
    * `(key, salt) ⋈ (key, salt)`. `saltSrc` must be a per-row fact column
    * (ids are ideal); rows of the same hot key spread across `salts`
    * sub-keys. Inner-join semantics are identical to the plain join: a
    * NULL `saltSrc` falls back to salt 0 (those rows don't spread, but
    * they survive — dropping them would silently diverge from the plain
    * join whenever the join key itself is non-null). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltSrc: Column): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // the internal column must not collide: on the fact side withColumn
    // would silently REPLACE (and drop() then lose) a user column; on the
    // dim side the join key would become ambiguous
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt; rename it on the input")
    val f = fact.withColumn("__salt",
      coalesce(Sampling.hashBucket(saltSrc, salts), lit(0L)))
    val d = dim.crossJoin(broadcast(
      dim.sparkSession.range(salts).toDF("__salt")))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Demonstration query over the two FACT tables (the real salted-join
    * regime — neither side broadcasts at warehouse scale): revenue per
    * order priority, lineitem salted on its line identity, orders
    * replicated. The oracle runs the PLAIN join — equality is the
    * semantics-preservation proof. */
  def saltedPriorityRevenue(lineitem: DataFrame, orders: DataFrame,
                            salts: Int = 8): DataFrame = {
    val fact = lineitem.select(col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val dim = orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(
        fact, dim, "l_orderkey", salts,
        // per-row salt: same order spreads across reducers by line number
        concat_ws("|", col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(round(sum(col("rev")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("priority"))
  }
}
