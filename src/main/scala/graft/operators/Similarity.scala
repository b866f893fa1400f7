package graft.operators

import graft.{QueryDef, QueryModule}
import graft.functions.VectorOps
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table (builder
  * brief: similarity search as a first-class training-pipeline operator).
  *
  * Two paths:
  *   - q39 brute force — the correctness baseline: broadcast the (small)
  *     query batch against the corpus scan, exact cosine, windowed top-k.
  *     At 100 TB the corpus side streams through executors once; no
  *     shuffle of the corpus, only of the k×|queries| survivors.
  *   - q40 hyperplane LSH — the scale path: 8 fixed hyperplanes in 2
  *     bands of 4; vectors pair only when they share a band bucket
  *     (LSH-OR over bands), then exact cosine re-ranks candidates. The
  *     bucket join replaces the corpus×query product with per-bucket
  *     products, the classic sub-linear ANN trade.
  *
  * All float math is the scaled-integer VectorOps form — bit-identical
  * across engines and partition orders, so both queries oracle-check
  * against DuckDB exactly.
  */
object Similarity extends QueryModule {

  private val K = 10
  private val NumQueries = 8

  // ---------------------------------------------------------------------
  // q39 — brute-force cosine top-k.
  // ---------------------------------------------------------------------
  private val q39 = QueryDef(
    "q39_knn_brute",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.embeddings(spark, dir)
        .withColumn("nrm", VectorOps.normScaled($"embedding"))
        .persist() // corpus side + query side come from one materialization
      val queries = emb.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
      val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
      emb.join(broadcast(queries), $"vec_id" =!= $"q_id")
        .withColumn("cos", VectorOps.cosineFromScaled(
          VectorOps.dotScaled($"embedding", $"q_emb"), $"nrm", $"q_nrm"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"cos")
        .orderBy($"q_id", $"rank")
    },
    Some(s"""
      WITH emb AS (
        SELECT vec_id, embedding, ${VectorOps.normScaledSql("embedding")} AS nrm
        FROM embeddings),
      scored AS (
        SELECT q.vec_id AS q_id, e.vec_id,
               ${VectorOps.cosineFromScaledSql(
                 VectorOps.dotScaledSql("e.embedding", "q.embedding"),
                 "e.nrm", "q.nrm")} AS cos
        FROM emb e JOIN emb q
          ON q.vec_id < $NumQueries AND e.vec_id <> q.vec_id),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT q_id, rank, vec_id, cos FROM ranked
      WHERE rank <= $K ORDER BY q_id, rank"""))

  // ---------------------------------------------------------------------
  // q40 — LSH-bucketed ANN: 2 bands × 4 hyperplanes. Hyperplane weights
  // are a fixed integer lattice derived from (plane, dim) — identical
  // literals on both engines; sign bits come from exact scaled-integer
  // projections, so bucket assignment is deterministic everywhere.
  // ---------------------------------------------------------------------
  private val NumPlanes = 8
  private val NumBands = 2
  private val PlanesPerBand = NumPlanes / NumBands

  /** Integer hyperplane weight for (plane j, dim d): LCG over j*64+d,
    * mapped to [-1000, 1000].
    */
  private def weightSql(j: Int, d: String) =
    s"((1103515245 * ($j * 64 + $d) + 12345) % 2001 - 1000)"

  /** Scaled-integer projection of the embedding on plane j. */
  private def projScaled(j: Int): Column =
    aggregate(
      zip_with(col("embedding"), sequence(lit(0), lit(63)), (x, d) =>
        floor(x.cast("double") *
          ((lit(1103515245L) * (lit(j) * 64 + d) + 12345) % 2001 - 1000).cast("double")
          * lit(1e12)).cast("long")),
      lit(0L), (acc, p) => acc + p)

  private def projScaledSql(j: Int): String =
    s"CAST(list_sum(list_transform(list_zip(embedding, range(0, 64)), " +
      s"p -> CAST(floor(CAST(p[1] AS DOUBLE) * CAST(${weightSql(j, "p[2]")} AS DOUBLE) * 1e12) AS BIGINT))) AS BIGINT)"

  /** Band bucket value from the 4 sign bits of its planes. */
  private def bandBucket(b: Int): Column =
    (0 until PlanesPerBand).map { r =>
      val j = b * PlanesPerBand + r
      when(projScaled(j) > 0, lit(1L << r)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def bandBucketSql(b: Int): String =
    (0 until PlanesPerBand).map { r =>
      val j = b * PlanesPerBand + r
      s"CASE WHEN ${projScaledSql(j)} > 0 THEN ${1L << r} ELSE 0 END"
    }.mkString(" + ")

  private val q40 = QueryDef(
    "q40_knn_lsh",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.embeddings(spark, dir)
        .withColumn("nrm", VectorOps.normScaled($"embedding"))
        .persist()
      val bucketed = (0 until NumBands).map { b =>
        emb.select($"vec_id", $"embedding", $"nrm",
          lit(b).as("band"), bandBucket(b).as("bucket"))
      }.reduce(_ unionByName _).persist()
      val queries = bucketed.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"),
          $"band", $"bucket")
      // LSH-OR: candidate if any band bucket matches; distinct pairs
      val cand = bucketed.join(broadcast(queries), Seq("band", "bucket"))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id", $"embedding", $"nrm", $"q_emb", $"q_nrm")
        .dropDuplicates("q_id", "vec_id")
      val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
      cand
        .withColumn("cos", VectorOps.cosineFromScaled(
          VectorOps.dotScaled($"embedding", $"q_emb"), $"nrm", $"q_nrm"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"cos")
        .orderBy($"q_id", $"rank")
    },
    Some {
      val bandSelects = (0 until NumBands).map(b =>
        s"SELECT vec_id, embedding, nrm, $b AS band, ${bandBucketSql(b)} AS bucket FROM emb")
        .mkString("\n        UNION ALL\n        ")
      s"""
      WITH emb AS (
        SELECT vec_id, embedding, ${VectorOps.normScaledSql("embedding")} AS nrm
        FROM embeddings),
      bucketed AS (
        $bandSelects),
      cand AS (
        SELECT DISTINCT q.vec_id AS q_id, e.vec_id
        FROM bucketed e JOIN bucketed q
          ON q.vec_id < $NumQueries AND e.band = q.band AND e.bucket = q.bucket
         AND e.vec_id <> q.vec_id),
      scored AS (
        SELECT c.q_id, c.vec_id,
               ${VectorOps.cosineFromScaledSql(
                 VectorOps.dotScaledSql("e.embedding", "q.embedding"),
                 "e.nrm", "q.nrm")} AS cos
        FROM cand c
        JOIN emb e ON e.vec_id = c.vec_id
        JOIN emb q ON q.vec_id = c.q_id),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
        FROM scored)
      SELECT q_id, rank, vec_id, cos FROM ranked
      WHERE rank <= $K ORDER BY q_id, rank"""
    })

  override val defs: Seq[QueryDef] = Seq(q39, q40)
}
