package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc exploration main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.printSchema()
    df.show(3, false)
  }
}
