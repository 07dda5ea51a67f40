package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def freshTarget(): FileConnector = {
    val c = FileConnector("mt", tmpDir("merge-into"), "parquet")
    c.write(Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("id", "v", "tag"), "t", WriteMode.Overwrite)
    c
  }

  test("update-matched with expression (GREATEST semantics) + insert-not-matched") {
    val c = freshTarget()
    val source = Seq((2L, 5.0, "x"), (3L, 99.0, "y"), (4L, 40.0, "d"))
      .toDF("id", "v", "tag")
    MergeInto(c, "t", keys = Seq("id"))
      .whenMatchedUpdate(Map(
        "v" -> ((s, t) => greatest(s("v"), t("v"))), // GREATEST(VALUES(v), v)
        "tag" -> ((s, _) => s("tag"))))
      .whenNotMatchedInsert()
      .run(source)
    val got = c.read(spark, "t").as[(Long, Double, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 10.0, "a"),   // untouched
      (2L, 20.0, "x"),   // greatest(5, 20) = 20, tag from source
      (3L, 99.0, "y"),   // greatest(99, 30) = 99
      (4L, 40.0, "d"))) // inserted
  }

  test("delete-matched removes keys present in the source") {
    val c = freshTarget()
    MergeInto(c, "t", keys = Seq("id"))
      .whenMatchedDelete()
      .run(Seq((2L, 0.0, ""), (9L, 0.0, "")).toDF("id", "v", "tag"))
    val got = c.read(spark, "t").select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L)) // 2 deleted; 9 had no match, not inserted
  }

  test("update-only merge leaves unmatched source rows out") {
    val c = freshTarget()
    MergeInto(c, "t", keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> ((s, _) => s("v"))))
      .run(Seq((1L, -1.0, "z"), (7L, 7.0, "q")).toDF("id", "v", "tag"))
    val got = c.read(spark, "t").as[(Long, Double, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, -1.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c")))
  }
}
