package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Similarity search over the `embeddings` fixture. Exact variants are
  * oracle-checked with explicit index-ordered double arithmetic on both
  * sides (identical products, similarities rounded to 6 dp before ranking so
  * ordering is engine-independent). LSH variants are rows-only checked here
  * and recall-tested in SimilaritySpec.
  */
object Vectors extends QueryModule {

  /** DuckDB: index-ordered double dot product of two list columns. */
  private def dotSql(a: String, b: String) =
    s"""list_aggregate(list_transform(range(1, len($a) + 1),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')"""

  private def cosineSql(a: String, b: String) =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  def defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q40
    // Brute-force cosine top-k against one query vector: broadcast + map +
    // global top-k; the baseline every ANN variant is judged against.
    QueryDef("q40_cosine_topk",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0), k = 20)
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, ${cosineSql("embedding", "qv")} AS sim
        FROM embeddings, q ORDER BY sim DESC, vec_id LIMIT 20""")),

    // ---------------------------------------------------------------- q41
    // Exact k-NN join: 5 query vectors x corpus, top-3 each.
    QueryDef("q41_knn_join",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.knnJoin(emb, emb.filter($"vec_id" < 5), k = 3)
          .orderBy($"query_id", $"rank")
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                          FROM embeddings WHERE vec_id < 5),
        scored AS (SELECT query_id, e.vec_id AS neighbor_id,
            ${cosineSql("e.embedding", "qv")} AS sim
          FROM embeddings e, q WHERE e.vec_id <> query_id),
        ranked AS (SELECT query_id, neighbor_id, sim,
            CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, sim, rank FROM ranked
        WHERE rank <= 3 ORDER BY query_id, rank""")),

    // ---------------------------------------------------------------- q42
    // Per-label embedding stats (norms via index-ordered fold).
    QueryDef("q42_vector_stats",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "embeddings")
          .select($"label", VectorFunctions.norm($"embedding").as("nrm"))
          .groupBy($"label")
          .agg(count(lit(1)).as("n"), round(avg($"nrm"), 6).as("avg_norm"))
          .orderBy($"label")
      },
      Some(s"""SELECT label, count(*) AS n,
        round(avg(sqrt(${dotSql("embedding", "embedding")})), 6) AS avg_norm
        FROM embeddings GROUP BY label ORDER BY label""")),

    // ---------------------------------------------------------------- q43
    // Cosine similarity on adjacent-id pairs (linear, oracle-able).
    QueryDef("q43_cosine_pairs",
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings").select($"vec_id", $"embedding")
        e.as("a").join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
            round(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")), 6)
              .as("sim"))
          .orderBy($"id_a")
      },
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        ${cosineSql("a.embedding", "b.embedding")} AS sim
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        ORDER BY id_a""")),

    // ---------------------------------------------------------------- q44
    // LSH-bucketed approximate k-NN (the 100 TB scale path: hash-partitioned
    // multi-table bucket join, no cartesian; bucket count auto-scales with
    // the corpus so within-bucket work stays linear). Rows-only check;
    // recall pinned in SimilaritySpec.
    QueryDef("q44_lsh_knn",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.lshKnnJoin(emb, emb.filter($"vec_id" < 5), k = 3)
          .orderBy($"query_id", $"rank")
      },
      None),

    // ---------------------------------------------------------------- q53
    // IVF approximate k-NN (rows-only; recall pinned in SimilaritySpec):
    // coarse-quantizer cells + nProbe probing — candidates shrink to
    // ~ corpus * nProbe / sqrt(n) instead of the whole corpus.
    QueryDef("q53_ivf_knn",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        Similarity.ivfKnnJoin(emb, emb.filter($"vec_id" < 5), k = 3, nProbe = 3)
          .orderBy($"query_id", $"rank")
      },
      None),

    // ---------------------------------------------------------------- q45
    // Embedding-cosine near-duplicate pairs via corpus-scaled LSH buckets
    // (rows-only). Threshold calibrated to the fixture's cosine distribution
    // (max pairwise sim at sf0.01 is ~0.513, p99.9 ~0.377): 0.35 yields a
    // meaningful but selective near-dup set.
    QueryDef("q45_embedding_neardups",
      (s, dir) => {
        import s.implicits._
        Similarity.embeddingNearDups(t(s, dir, "embeddings"), threshold = 0.35)
          .orderBy($"id_a", $"id_b")
      },
      None))
}
