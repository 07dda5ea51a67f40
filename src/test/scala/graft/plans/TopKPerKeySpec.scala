package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("matches the window formulation (value multisets), plans without a sort") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val topk = TopKPerKey(orders, Seq("o_custkey"), $"o_totalprice", 3)
    val got = topk.select($"o_custkey", $"o_totalprice")
      .as[(Long, Double)].collect().sorted

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
    val expected = orders
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_totalprice")
      .as[(Long, Double)].collect().sorted
    assert(got.sameElements(expected))

    topk.collect()
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"),
      s"map-side partial top-k missing — shuffle is unbounded:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into plan:\n$plan")
    assert(!plan.contains("Sort"), s"sort leaked into plan:\n$plan")
  }

  test("keys with fewer than k rows keep all rows; ascending mode; nulls never win") {
    val df = Seq(
      ("a", Some(3.0)), ("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", Some(9.0)),
      ("c", None),
    ).toDF("k", "v")
    val top2asc = TopKPerKey(df, Seq("k"), $"v", 2, descending = false)
      .select($"k", $"v").as[(String, Option[Double])].collect().sortBy(r => (r._1, r._2))
    assert(top2asc.toSeq == Seq(("a", Some(1.0)), ("a", Some(2.0)), ("b", Some(9.0))))
  }

  test("string order column: heap-stored values are owned copies (unsafe-row reuse regression)") {
    // enough rows per partition that the row buffer is recycled many
    // times; order by a STRING — eval returns a view into the reused
    // buffer, which must be copied before living in the heap
    val df = (1 to 5000).map(i => (i % 7, f"s$i%05d")).toDF("k", "v").repartition(2)
    val got = TopKPerKey(df, Seq("k"), $"v", 2, descending = false)
      .select($"k", $"v").as[(Int, String)].collect().sorted
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"k").orderBy($"v")
    val expected = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"k", $"v").as[(Int, String)].collect().sorted
    assert(got.sameElements(expected))
  }

  test("ambiguous column name fails loudly; same-named user column survives intact") {
    val df = Seq((1, 2.0)).toDF("k", "v")
    val dup = df.select($"k", $"v", $"v".as("k")) // two columns named k
    val e = intercept[IllegalArgumentException] {
      TopKPerKey(dup, Seq("k"), $"v", 1)
    }
    assert(e.getMessage.contains("ambiguous"))
    // a user column that collides with the old fixed temp name is kept
    val marked = Seq(("a", 1.0, 42), ("a", 2.0, 43)).toDF("k", "v", "__graft_topk_order")
    val out = TopKPerKey(marked, Seq("k"), $"v", 1).collect()
    assert(out.map(_.getInt(2)).toSeq == Seq(43))
  }

  test("struct order column: tie-break inside the struct, heap values owned (aliasing regression)") {
    // score collides across rows (i % 5), so the long field inside the
    // struct decides — and struct eval over unsafe rows returns a VIEW
    // that must be copied into the heap
    val df = (1 to 5000).map(i => (i % 7, (i % 5).toDouble, i.toLong))
      .toDF("k", "score", "id").repartition(3)
    val got = TopKPerKey(df, Seq("k"), struct($"score", -$"id"), 3)
      .select($"k", $"score", $"id").as[(Int, Double, Long)].collect().sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"score".desc, $"id".asc)
    val expected = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"k", $"score", $"id").as[(Int, Double, Long)].collect().sorted
    assert(got.sameElements(expected))
  }

  test("per-key emission order is best-first") {
    val df = Seq(("x", 1.0), ("x", 5.0), ("x", 3.0), ("x", 4.0)).toDF("k", "v")
    val rows = TopKPerKey(df.repartition(1), Seq("k"), $"v", 3)
      .select($"v").as[Double].collect()
    assert(rows.toSeq == Seq(5.0, 4.0, 3.0))
  }
}
