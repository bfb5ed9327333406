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
    val q = broadcast(query.select(col(vecCol).as("query_vec"),
      norm(col(vecCol)).as("query_nrm")))
    corpus.crossJoin(q)
      .select(col(idCol),
        round(dot(col(vecCol), col("query_vec")) / (norm(col(vecCol)) * col("query_nrm")), 6)
          .as("sim"))
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
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      norm(col(vecCol)).as("query_nrm")))
    val scored = corpus
      .withColumn("corpus_nrm", norm(col(vecCol))) // once per corpus row, not per pair
      .crossJoin(q)
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(dot(col(vecCol), col("query_vec")) / (col("corpus_nrm") * col("query_nrm")), 6)
          .as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Planes scaled so expected bucket occupancy ~= targetBucketSize:
    * buckets ~= n / target, so the within-bucket join stays LINEAR in n
    * (n * target pairs) instead of O(n^2 / 2^constant). */
  def autoPlanes(corpusSize: Long, targetBucketSize: Int = 64): Int =
    math.max(2, math.ceil(
      math.log(math.max(1.0, corpusSize.toDouble / targetBucketSize)) / math.log(2.0)).toInt)

  private def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head.getInt(0)

  /** One (table, bucket) row per input vector per hash table. Multi-table
    * banding: a true neighbor missed by one table's buckets is caught by
    * another — recall grows with `tables` at linear (not quadratic) cost. */
  private def bucketed(
      df: DataFrame, idAs: String, vecAs: String, vecCol: String, idCol: String,
      nPlanes: Int, dim: Int, tables: Int): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      norm(col(vecCol)).as(s"${vecAs}_nrm"), // norm once per vector, not per pair
      posexplode(
        array((0 until tables).map(t => lshBucket(col(vecCol), nPlanes, dim, t)): _*))
        .as(Seq("tbl", "bucket")))

  /** Approximate k-NN join via random-hyperplane LSH: candidates are pairs
    * sharing a (table, bucket), so the join is hash-partitioned by bucket id
    * instead of a cartesian product. nPlanes <= 0 auto-scales bucket count
    * to the corpus (see [[autoPlanes]]). */
  def lshKnnJoin(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nPlanes: Int = 0,
      tables: Int = 2,
      targetBucketSize: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    val planes = if (nPlanes > 0) nPlanes else autoPlanes(corpus.count(), targetBucketSize)
    val cb = bucketed(corpus, "neighbor_id", "corpus_vec", vecCol, idCol, planes, dim, tables)
    val qb = bucketed(queries, "query_id", "query_vec", vecCol, idCol, planes, dim, tables)
    val scored = cb.join(qb, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("corpus_vec"), col("query_vec")) /
          (col("corpus_vec_nrm") * col("query_vec_nrm")), 6).as("sim"))
      .dropDuplicates("query_id", "neighbor_id") // pair may collide in >1 table
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) approximate k-NN — the second ANN scale path
    * beside LSH. A deterministic coarse quantizer (centroids = the
    * ~sqrt(n) corpus vectors with the smallest xxhash64(id), i.e. a stable
    * pseudo-random sample) partitions the corpus into cells; each query
    * probes its `nProbe` nearest cells, so scored candidates are
    * ~ |corpus| * nProbe / C instead of the full corpus.
    *
    * Cell assignment runs as a mapPartitions loop over the broadcast
    * centroid array — C dot products per row in tight JVM code. This is
    * the deliberate mapPartitions case: per-row argmin against a broadcast
    * array is imperative, not relational, and a crossJoin would blow the
    * row count to n*C. Centroid table size is the driver bound:
    * sqrt(1e9) * 64 dims * 4B ~= 8 MB at billion-vector scale — standard
    * IVF practice. */
  def ivfKnnJoin(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCentroids: Int = 0,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import corpus.sparkSession.implicits._
    val typedCorpus = corpus.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    val c = if (nCentroids > 0) nCentroids
      else math.max(2, math.ceil(math.sqrt(corpus.count().toDouble)).toInt)

    val centroids: Array[Array[Float]] = corpus
      .select(col(idCol), col(vecCol).cast("array<float>"))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(c)
      .as[(Long, Array[Float])]
      .collect()
      .map(_._2)
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)

    def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def nearestCells(v: Array[Float], probes: Int): Seq[Int] = {
      val cs = bc.value
      cs.indices.map(ci => ci -> cosineLocal(v, cs(ci))).sortBy(x => (-x._2, x._1))
        .take(probes).map(_._1)
    }

    val corpusCells = typedCorpus.mapPartitions(_.map { case (id, v) =>
      (nearestCells(v, 1).head, id, v)
    }).toDF("cell", "neighbor_id", "corpus_vec")
      .withColumn("corpus_nrm", norm(col("corpus_vec")))

    val queryCells = queries.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.flatMap { case (id, v) =>
        nearestCells(v, nProbe).map(cell => (cell, id, v))
      }).toDF("cell", "query_id", "query_vec")
      .withColumn("query_nrm", norm(col("query_vec")))

    val scored = corpusCells.join(queryCells, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("corpus_vec"), col("query_vec")) /
          (col("corpus_nrm") * col("query_nrm")), 6).as("sim"))
      .dropDuplicates("query_id", "neighbor_id") // a pair may meet in >1 probed cell
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed by
    * multi-table LSH so the pair join never goes cartesian and bucket count
    * grows with the corpus. Pairs are (a < b). */
  def embeddingNearDups(
      corpus: DataFrame,
      threshold: Double,
      nPlanes: Int = 0,
      tables: Int = 2,
      targetBucketSize: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val dim = vecDim(corpus, vecCol)
    val planes = if (nPlanes > 0) nPlanes else autoPlanes(corpus.count(), targetBucketSize)
    val b = bucketed(corpus, "id", "vec", vecCol, idCol, planes, dim, tables)
    val l = b.as("l")
    val r = b.as("r")
    l.join(r, col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
              col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(dot(col("l.vec"), col("r.vec")) /
          (col("l.vec_nrm") * col("r.vec_nrm")), 6).as("sim"))
      // threshold BEFORE the pair-dedup: sim is deterministic per pair, so
      // the dedup shuffle carries only the (rare) near-dup pairs instead of
      // every multi-table candidate collision.
      .filter(col("sim") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
