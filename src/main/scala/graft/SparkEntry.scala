package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CatalogOps, Ingest, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry
  * (Spark DataFrame) and, when SQL-expressible, an `oracleSql` entry (ANSI
  * SQL run by DuckDB over the same parquet tables). Column names and row
  * ordering are aligned between the two; floating-point outputs are rounded
  * (6 dp scores, 2-4 dp aggregates) and rankings computed on the rounded
  * values so both engines agree deterministically.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Similarity.topKSingle(spark, "/root/testdata/sf0.001", queryVecId = 0L, k = 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_single"   -> ((s, dir) => Similarity.topKSingle(s, dir, 0L, 10)),
    "topk_filtered" -> ((s, dir) => Similarity.topKFiltered(s, dir, 0L, 10, 3)),
    "point_lookup"  -> ((s, dir) => Similarity.pointLookup(s, dir, 42L)),
    "sim_join_topk" -> ((s, dir) => Similarity.batchSimilarityJoin(s, dir, 8, 5)),
    "topk_via_catalog" -> ((s, dir) => CatalogOps.topkViaCatalog(s, dir, 0L, 10)),
    "chunk_docs" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, length}
      Ingest.chunk(graft.core.Tables.documents(s, dir), "doc_id", "text", 128)
        .select(col("id"), col("chunk"), length(col("chunk")).cast("bigint").as("chunk_len"))
    }),
    "ingest_topk" -> ((s, dir) => Ingest.ingestTopk(s, dir, "spark data query", 10, 128)),
  )

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL. Shared fragment: exact cosine over DOUBLE[] with the
  // reference's pinned semantics (zero-norm → 0.0), rounded to 6 dp —
  // mirrors graft.functions.CosineSimilarity (same sequential accumulation
  // order, so the doubles are bit-identical before rounding).
  // ---------------------------------------------------------------------
  private def cosSql(v: String, qv: String): String =
    s"""round(CASE WHEN list_sum(list_transform($v, x -> x*x)) = 0
       |            OR list_sum(list_transform($qv, x -> x*x)) = 0 THEN 0.0
       |       ELSE list_sum(list_transform(range(1, len($v)+1), i -> $v[i]*$qv[i]))
       |            / (sqrt(list_sum(list_transform($v, x -> x*x)))
       |               * sqrt(list_sum(list_transform($qv, x -> x*x))))
       |       END, 6)""".stripMargin

  /** DuckDB reproduction of the `local/hash-<dim>` embedder for text `t`
    * (see Embedders.hashProjection: top 53 bits of little-endian MD5 head,
    * mapped to [-1,1); `md5_number_upper` is exactly that LE u64). The
    * oracle skips L2 normalization — cosine is scale-invariant. */
  private def embSql(t: String, dim: Int = 64): String =
    s"""list_transform(range(0, $dim),
       | i -> CAST(md5_number_upper(CAST(i AS VARCHAR) || '|' || $t) >> 11 AS DOUBLE)
       |      / 9007199254740992.0 * 2 - 1)""".stripMargin

  /** DuckDB chunking of `documents` matching Ingest.chunk(id scheme
    * `<docId>-<pos>`, fixed character chunks). */
  private def chunkSql(chunkSize: Int): String =
    s"""SELECT CAST(doc_id AS VARCHAR) || '-' || CAST(u.pos AS VARCHAR) AS id, u.chunk AS chunk
       |FROM (SELECT doc_id,
       |        unnest(list_transform(
       |          range(0, CAST(ceil(length(text) / ${chunkSize}.0) AS BIGINT)),
       |          i -> {'pos': i, 'chunk': substr(text, CAST(i * $chunkSize + 1 AS BIGINT), $chunkSize)})) AS u
       |      FROM documents WHERE length(text) > 0)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "topk_single" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ${cosSql("e.v", "q.qv")} AS score
         |FROM e, q
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "topk_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ${cosSql("e.v", "q.qv")} AS score
         |FROM e, q
         |WHERE e.label = 3
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "point_lookup" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS norm
        |FROM embeddings WHERE vec_id = 42""".stripMargin,

    "topk_via_catalog" ->
      s"""WITH e AS (SELECT CAST(vec_id AS VARCHAR) AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.id, ${cosSql("e.v", "q.qv")} AS score
         |FROM e, q
         |ORDER BY score DESC, id ASC
         |LIMIT 10""".stripMargin,

    "chunk_docs" ->
      s"""SELECT id, chunk, length(chunk) AS chunk_len FROM (${chunkSql(128)})""",

    "ingest_topk" ->
      s"""WITH chunks AS (${chunkSql(128)}),
         |emb AS (SELECT id, ${embSql("chunk")} AS v FROM chunks),
         |q AS (SELECT ${embSql("'spark data query'")} AS qv)
         |SELECT emb.id, ${cosSql("emb.v", "q.qv")} AS score
         |FROM emb, q
         |ORDER BY score DESC, id ASC
         |LIMIT 10""".stripMargin,

    "sim_join_topk" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.query_id, e.vec_id, e.label, ${cosSql("e.v", "q.qv")} AS score
         |  FROM e, q),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, label, score
         |FROM ranked WHERE rnk <= 5
         |ORDER BY query_id ASC, rnk ASC""".stripMargin,
  )
}
