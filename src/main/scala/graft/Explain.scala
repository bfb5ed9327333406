package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan for one catalog query (the loop used to audit
  * shuffle/reuse/pushdown shapes before they matter at scale).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <queryName> [sfDir]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
