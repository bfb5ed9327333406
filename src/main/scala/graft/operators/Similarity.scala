package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: `bruteForceTopK` against a SINGLE query vector is a
  * broadcast + map + global top-k — fully parallel, no shuffle until the
  * final k-row reduction. `knnJoin` (queries x corpus) broadcasts the small
  * query side; cost is |Q| x |corpus| dot products, the honest baseline.
  * `lshTopK` is the scale path: random-hyperplane buckets cut the candidate
  * set to one bucket per query (tunable recall via nPlanes/probes).
  */
object Similarity {

  /** Exact top-k by cosine against one query vector (given as a DataFrame
    * with a single row / `embedding` column). Rounded similarity + id as the
    * ranking key keeps results deterministic across engines and runs. */
  def bruteForceTopK(
      corpus: DataFrame,
      query: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("query_vec")))
    corpus.crossJoin(q)
      .select(col(idCol), round(cosine(col(vecCol), col("query_vec")), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact k-NN join: top-k corpus neighbors for every query row.
    * Query side is broadcast; ranking via window per query id. */
  def knnJoin(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec")))
    val scored = corpus.crossJoin(q)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col(vecCol), col("query_vec")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate k-NN join via random-hyperplane LSH: corpus and queries are
    * bucketed by `nPlanes` deterministic sign bits; candidates are pairs
    * sharing a bucket, so the join is hash-partitioned by bucket id instead
    * of a cartesian product. Recall trades off with nPlanes (fewer planes =
    * bigger buckets = higher recall, more work). */
  def lshKnnJoin(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nPlanes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("corpus_vec"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val scored = cb.join(qb, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("corpus_vec"), col("query_vec")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed by
    * LSH so the pair join never goes cartesian. Pairs are (a < b). */
  def embeddingNearDups(
      corpus: DataFrame,
      threshold: Double,
      nPlanes: Int = 6,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshBucket(col(vecCol), nPlanes).as("bucket"))
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(cosine(col("l.vec"), col("r.vec")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
