package graft

import org.apache.spark.sql.SparkSession

// Temporary check harness; deleted before commit.
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val rows = SparkEntry.queries("q57_winnow_fingerprint")(spark, s"/root/testdata/$sf").collect()
      println(s"$sf -> " + rows.map(_.toString).mkString(";"))
    }
    spark.stop()
  }
}
