package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted skew join: bit-equal to the plain join (including on a hot key),
  * salt actually spreads the hot key across sub-keys, and the physical
  * join keys on (key, salt).
  */
class SaltingSpec extends SparkSpec {

  import spark.implicits._

  test("salted join equals the plain join on a hot-key fact table") {
    // key 7 is hot: 500 of 520 fact rows
    val fact = ((1 to 500).map(i => (7L, i.toLong, i * 1.0)) ++
      (1 to 20).map(i => (i.toLong % 5 + 1, 1000L + i, i * 2.0)))
      .toDF("k", "row_id", "v")
    val dim = (1 to 10).map(i => (i.toLong, s"name$i")).toDF("k", "name")

    val salted = Salting.saltedJoin(fact, dim, "k", salts = 8,
        concat_ws("|", col("k"), col("row_id")))
      .select(col("k"), col("row_id"), col("v"), col("name"))
      .orderBy(col("k"), col("row_id")).collect().toSeq
    val plain = fact.join(dim, Seq("k"))
      .select(col("k"), col("row_id"), col("v"), col("name"))
      .orderBy(col("k"), col("row_id")).collect().toSeq
    assert(salted == plain)
    assert(salted.count(_.getLong(0) == 7L) == 500)
  }

  test("a NULL salt source keeps the row (plain-join parity), via salt 0") {
    // row_id NULL ⇒ saltSrc NULL ⇒ hashBucket NULL; the row must still
    // join (the plain join keeps it — the join KEY is non-null)
    val fact = Seq((1L, Option(10L), 1.0), (2L, Option.empty[Long], 2.0))
      .toDF("k", "row_id", "v")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val salted = Salting.saltedJoin(fact, dim, "k", 8,
        concat_ws("|", col("k"), col("row_id")) // concat_ws skips NULLs → "2|"… still fine
      )
    val saltedNull = Salting.saltedJoin(fact, dim, "k", 8, col("row_id"))
      .orderBy("k").collect().toSeq
    val plain = fact.join(dim, Seq("k")).orderBy("k").collect().toSeq
    assert(saltedNull == plain,
      s"NULL-salt row dropped: salted=$saltedNull plain=$plain")
    assert(salted.count() == 2)
  }

  test("the salt spreads the hot key over multiple sub-keys") {
    val fact = (1 to 500).map(i => (7L, i.toLong, 1.0)).toDF("k", "row_id", "v")
    val nSalts = fact
      .withColumn("salt", Sampling.hashBucket(concat_ws("|", col("k"), col("row_id")), 8))
      .select("salt").distinct().count()
    assert(nSalts == 8, s"hot key landed on only $nSalts of 8 salts")
  }

  test("physical join keys include the salt; dim replication is broadcast") {
    val fact = (1 to 100).map(i => (7L, i.toLong, 1.0)).toDF("k", "row_id", "v")
    val dim = (1 to 10).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    val plan = Salting.saltedJoin(fact, dim, "k", 8,
      concat_ws("|", col("k"), col("row_id"))).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column absent from plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }
}
