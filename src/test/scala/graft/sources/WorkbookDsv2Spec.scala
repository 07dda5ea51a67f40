package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WorkbookDsv2Spec extends SparkSpec {
  import spark.implicits._

  test("spark.read.format(\"xlsx\") round-trips a written workbook dir") {
    val dir = tmpDir("dsv2-xlsx")
    val df = (1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(3)
    XlsxSource.write(df, s"$dir/t.xlsx")
    val back = spark.read.format("xlsx").load(s"$dir/t.xlsx")
    assert(back.columns.toSeq == Seq("id", "v"))
    assert(back.rdd.getNumPartitions == 3) // one partition per workbook
    assert(back.select($"id".cast("long")).as[Long].collect().sorted.toSeq == (1L to 30L))
  }

  test("spark.read.format(\"xls\") round-trips, single file path") {
    val dir = tmpDir("dsv2-xls")
    val df = Seq((1L, "a", 2.5), (2L, null.asInstanceOf[String], -1.0)).toDF("id", "v", "x")
    XlsSource.write(df.coalesce(1), s"$dir/t.xls")
    val file = new java.io.File(s"$dir/t.xls").listFiles()
      .filter(_.getName.endsWith(".xls")).head
    val back = spark.read.format("xls").load(file.getAbsolutePath)
    assert(back.columns.toSeq == Seq("id", "v", "x"))
    val rows = back.select($"id".cast("long"), $"v", $"x".cast("double"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a", 2.5), (2L, null, -1.0)))
  }

  test("xlsx DSv2 registers as a SQL table via CREATE TABLE ... USING") {
    val dir = tmpDir("dsv2-sql")
    XlsxSource.write(Seq((7L, "z")).toDF("id", "v"), s"$dir/t.xlsx")
    spark.sql("DROP TABLE IF EXISTS wb_sql")
    spark.sql(s"CREATE TABLE wb_sql USING xlsx OPTIONS (path '$dir/t.xlsx')")
    try {
      val got = spark.sql("SELECT id, v FROM wb_sql").as[(String, String)].collect()
      assert(got.toSeq == Seq(("7", "z")))
    } finally spark.sql("DROP TABLE IF EXISTS wb_sql")
  }
}
