package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: list catalog queries whose physical plan contains a
  * CartesianProduct or BroadcastNestedLoopJoin — input for CatalogSpec's
  * plan-lint whitelist. */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.catalog.foreach { q =>
      try {
        val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
        val hits = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (hits.nonEmpty) println(s"PLANLINT ${q.name}: ${hits.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"PLANLINT ${q.name}: ERROR ${e.getMessage.take(80)}")
      }
    }
    println("PLANLINT done")
    spark.stop()
  }
}
