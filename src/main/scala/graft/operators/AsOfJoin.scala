package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, attach the single right
  * row with the greatest right timestamp <= the left timestamp (backward,
  * the default) or the smallest right timestamp >= it (forward), within the
  * same key — the join a feature store / manifest-lookup / quote-to-trade
  * pipeline needs and plain equi/interval joins can't express without a
  * per-key row explosion.
  *
  * Implementation is the union–carry-forward pattern, not a range join:
  * tag both sides, union them, shuffle ONCE on the key, sort each key's
  * rows by (timestamp, side) and carry the latest reference payload forward
  * with `last(_, ignoreNulls = true)`. Cost is one Exchange + one sort over
  * |L|+|R| rows — no M×N candidate expansion, no broadcast requirement, no
  * per-row binary search. At 100 TB the bound is the usual windowed-operator
  * one (a single key's rows sort within a task spill-ably); skewed keys
  * behave exactly like any window aggregation, not like a join blow-up.
  *
  * Matching semantics (pandas `merge_asof` / DuckDB `ASOF JOIN`):
  *  - backward: match right.ts <= left.ts (strict: <), take the greatest.
  *  - forward:  match right.ts >= left.ts (strict: >), take the smallest.
  *  - tolerance: a match farther than `tolerance` (in the timestamp's own
  *    unit, as a Column interval/long usable in `left.ts - right.ts`
  *    arithmetic on unix micros) is nulled out — LEFT-join shape always.
  *  - ties among right rows sharing (key, ts): the row with the greatest
  *    `tiebreak` column wins (deterministic; pass the right side's unique id).
  *  - null timestamps never match (either side).
  *
  * Output: every left column unchanged, plus each right non-key column
  * renamed `<rightPrefix><name>` (including the right timestamp, so callers
  * can compute the gap).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      strict: Boolean = false,
      toleranceMicros: Option[Long] = None,
      tiebreak: Option[String] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(keys.nonEmpty, "as-of join needs at least one equi-key")

    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload.as("p")).schema("p").dataType

    // Sort position of reference rows at EQUAL timestamps decides inclusivity:
    // inclusive backward scans refs before probes (a ref at the probe's own ts
    // is eligible); strict flips it. Probes sit at ord=1 either way.
    val refOrd = if (strict) 2 else 0
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__ord", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__p", lit(null).cast(payloadType))
      .select(keys.map(col) ++ Seq(col("__ts"), col("__ord"), col("__tie"), col("__p")) ++
        left.columns.map(c => col(c).as(s"__l_$c")): _*)
    val r = right
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__ord", lit(refOrd))
      .withColumn("__tie",
        tiebreak.map(col(_).cast("long")).getOrElse(lit(0L)))
      .withColumn("__p", payload)
      .select(keys.map(col) ++ Seq(col("__ts"), col("__ord"), col("__tie"), col("__p")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    // Backward walks time ascending (carry = greatest ts so far); forward
    // walks descending (carry = smallest ts still ahead). Among equal-ts
    // refs the LAST in walk order wins, so order ties by __tie such that the
    // greatest tiebreak is walked last in both directions.
    val walk: Seq[Column] =
      if (direction == "backward") Seq(col("__ts").asc, col("__ord").asc, col("__tie").asc)
      else Seq(col("__ts").desc, col("__ord").asc, col("__tie").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(walk: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__ord") === 1)

    val withTol = toleranceMicros match {
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            unix_micros(col("__ts")) - unix_micros(col("__m")(rightTs))
          else unix_micros(col("__m")(rightTs)) - unix_micros(col("__ts"))
        matched.withColumn("__m", when(gap <= tol, col("__m")))
      case None => matched
    }

    // Null left timestamps sort at the walk's edge and could see a carry in
    // one direction — never match, by contract.
    val out = withTol.withColumn("__m", when(col("__ts").isNull, lit(null)).otherwise(col("__m")))
    out.select(
      left.columns.map(c => col(s"__l_$c").as(c)).toSeq ++
        payloadCols.map(c => col("__m")(c).as(s"$rightPrefix$c")): _*)
  }
}
