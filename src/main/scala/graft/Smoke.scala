package graft

import org.apache.spark.sql.SparkSession

/** Local smoke: run the flagship entry query on sf0.001 exactly as the
  * driver does (rows>0 check), print the rows and the physical plan. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(10, truncate = false)
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
  }
}
