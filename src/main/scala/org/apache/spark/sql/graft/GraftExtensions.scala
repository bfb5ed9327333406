package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions installer for the engine's native expressions —
  * wire with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`, after
  * which SQL (including JDBC/Thrift clients and notebook SQL cells) can
  * call the codegen kernels directly:
  *
  * {{{
  * SELECT float_dot(a.embedding, b.embedding) FROM ...      -- array<float> dot
  * SELECT sliding_min(gh, 8) FROM ...                       -- winnowing window min
  * SELECT char_gram_hashes(text, 8) FROM ...                -- xxhash64 k-grams
  * SELECT word_shingles(text, 3) FROM ...                   -- word n-grams
  * SELECT word_shingle_hashes(text, 3) FROM ...             -- fused shingle hashes
  * SELECT minhash_signature(text, 3, 64) FROM ...           -- per-row MinHash sig
  * SELECT token_count(text), quality_score(text) FROM ...   -- text analysis
  * SELECT lang_id(text), doc_fingerprint(text) FROM ...
  * SELECT jaccard_sim(distinct_shingles(a, 3), distinct_shingles(b, 3)) ...
  * }}}
  *
  * The integer width/size arguments must be literals — they parameterize
  * codegen, exactly like the Scala wrappers' Int parameters.
  *
  * The text-analysis family (token_count .. jaccard_sim) registers the
  * SAME composed expression trees as the `graft.functions.TextFunctions`
  * Column builders — built-in functions end to end, fully codegen'd, no
  * UDFs — so SQL-only clients get bit-identical results to the Scala API
  * (the q30-q36 oracles pin those semantics).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    // plan rewrite: the declarative aggregate(zip_with) dot idiom lowers to
    // the codegen kernels (sound — kernels are exact HOF equivalents)
    ext.injectOptimizerRule(_ => RewriteHofDot)
    // rank-filter idiom -> TopKPerKey (must come with the strategy below)
    ext.injectOptimizerRule(_ => RewriteRankFilter)
    // physical planning for the per-group top-k logical node
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** Eagerly lower a functions-API Column tree to catalyst expressions.
    * `ExpressionUtils.expression` alone wraps the tree in a lazy
    * `ColumnNodeExpression`, which a FunctionBuilder result must NOT be:
    * the analyzer treats it as an opaque leaf, so the `UnresolvedFunction`
    * nodes inside never resolve and execution dies with "Cannot generate
    * code". The converter emits real catalyst `UnresolvedFunction`s, which
    * the analyzer then resolves like any parsed SQL. */
  private def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Adapt a TextFunctions-style Column builder into a FunctionBuilder:
    * the registered function expands to the same composed expression tree
    * the Scala wrapper builds. */
  private def composed1(name: String, f: Column => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getCanonicalName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name expects exactly 1 argument")
        toExpr(f(ExpressionUtils.column(children.head)))
      })

  private def composed2(name: String, f: (Column, Column) => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getCanonicalName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects exactly 2 arguments")
        toExpr(f(
          ExpressionUtils.column(children.head), ExpressionUtils.column(children(1))))
      })

  private def composedStrInt(name: String, f: (Column, Int) => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getCanonicalName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects exactly 2 arguments")
        toExpr(f(
          ExpressionUtils.column(children.head), intLit(children(1), name, "n")))
      })

  private val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getCanonicalName, "float_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "float_dot expects exactly 2 arguments")
        FloatDot(children.head, children(1)): Expression
      }),
    (FunctionIdentifier("double_dot"),
      new ExpressionInfo(classOf[DoubleDot].getCanonicalName, "double_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "double_dot expects exactly 2 arguments")
        DoubleDot(children.head, children(1)): Expression
      }),
    (FunctionIdentifier("sliding_min"),
      new ExpressionInfo(classOf[SlidingMin].getCanonicalName, "sliding_min"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "sliding_min expects exactly 2 arguments")
        SlidingMin(children.head, intLit(children(1), "sliding_min", "w")): Expression
      }),
    (FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashes].getCanonicalName, "char_gram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "char_gram_hashes expects exactly 2 arguments")
        CharGramHashes(children.head, intLit(children(1), "char_gram_hashes", "k")): Expression
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getCanonicalName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingles expects exactly 2 arguments")
        WordShingles(children.head, intLit(children(1), "word_shingles", "n")): Expression
      }),
    (FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[WordShingleHashes].getCanonicalName, "word_shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "word_shingle_hashes expects exactly 2 arguments")
        WordShingleHashes(children.head,
          intLit(children(1), "word_shingle_hashes", "n")): Expression
      }),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getCanonicalName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "minhash_signature expects exactly 3 arguments: (text, shingle_n, k)")
        MinHashSignature(children.head,
          intLit(children(1), "minhash_signature", "n"),
          intLit(children(2), "minhash_signature", "k")): Expression
      }),
    composed1("token_count", graft.functions.TextFunctions.tokenCount),
    composed1("bpeish_token_count", graft.functions.TextFunctions.bpeishTokenCount),
    composed1("quality_score", graft.functions.TextFunctions.qualityScore),
    composed1("lang_id", graft.functions.TextFunctions.langId),
    composed1("doc_fingerprint", graft.functions.TextFunctions.fingerprint),
    composedStrInt("distinct_shingles", graft.functions.TextFunctions.distinctShingles),
    composed2("jaccard_sim", graft.functions.TextFunctions.jaccard),
    // the deterministic split/sample coin (Sampling.hashHexCol): compare
    // against Sampling.fractionThresholdHex(f) in SQL for hash splits
    composed2("split_hash", (id, salt) =>
      graft.operators.Sampling.hashHexCol(id, salt)),
    // the default PII rule pack's replacement chain (Redaction.redactedText)
    composed1("redact_pii", c => graft.operators.Redaction.redactedText(c)))

  /** Register into an ALREADY-BUILT session (tests, notebooks) — extensions
    * configured on the builder only apply to sessions created after. */
  // one install per session: registerInto is called from the shared table
  // entry point (sources.Tables) so every engine session gets the SQL
  // functions, the optimizer rules, and the planner strategy without
  // depending on which query runs first
  private val installed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def registerInto(spark: SparkSession): Unit = {
    if (installed.putIfAbsent(spark, java.lang.Boolean.TRUE) != null) return
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    // post-hoc counterpart of injectOptimizerRule for already-built
    // sessions; extraOptimizations runs in the user-provided batch, after
    // the main optimizer (so promotion casts are already simplified)
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDot))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDot
    if (!spark.experimental.extraOptimizations.contains(RewriteRankFilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankFilter
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }
}
