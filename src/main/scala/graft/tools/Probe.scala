package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc exploration main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 1. md5-hex → bigint parity probe
    Seq("abc", "1:the quick", "x").toDF("s")
      .select($"s", conv(substring(md5($"s"), 1, 15), 16, 10).cast("long").as("h"))
      .show(false)
    // 2. cosine parity probe on first embeddings
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.filter($"vec_id" === 0).select($"embedding".as("ea"))
    val b = e.filter($"vec_id" === 1).select($"embedding".as("eb"))
    val dot = expr("aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)")
    val na = expr("sqrt(aggregate(ea, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    val nb = expr("sqrt(aggregate(eb, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))")
    a.crossJoin(b).select((dot / (na * nb)).as("cos")).show(false)
    println("cos17dp: " + a.crossJoin(b).select(format_string("%.17f", dot / (na * nb))).head.getString(0))
    // 3. regexp_count
    Seq("Hello, world! 42 foo_bar").toDF("t")
      .select(regexp_count($"t", lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).as("n")).show(false)
    // 4. percentile exact
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy($"o_orderstatus")
      .agg(percentile($"o_totalprice", lit(0.5)).as("p50"))
      .orderBy($"o_orderstatus")
      .select($"o_orderstatus", format_string("%.6f", $"p50")).show(false)
    spark.stop()
  }
}
