package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline specs reproducing the reference's de-facto
  * acceptance tests (SURVEY §5): the example.py CSV→CSV transform
  * (rename/add-column), dedup/limit, write modes, whole-db loop.
  */
class MigrationJobSpec extends SparkSpec {
  import spark.implicits._

  private def csvConn(name: String): FileConnector =
    FileConnector(name, tmpDir(name), "csv")

  test("CSV→CSV with rename/add transform (example.py test5 analog)") {
    val src = csvConn("src5")
    val dst = csvConn("dst5")
    // source table `user(user_id, sex)` — the example.py shape
    src.write(Seq(("b123", "male"), ("b124", "female")).toDF("user_id", "sex"),
      "user", WriteMode.Overwrite)

    val t = Transform.identity
      .rename("user_id", "uuid")
      .add("time", lit(1600000000L))
      .add("tag", lit("xs"))
    val n = MigrationJob(src, dst, t).runOne(spark, "user", "user2")
    assert(n == 2)

    val out = dst.read(spark, "user2")
    assert(out.columns.toSet == Set("uuid", "sex", "time", "tag"))
    assert(out.filter($"tag" === "xs").count() == 2)
    assert(out.filter($"uuid" === "b123" && $"sex" === "male").count() == 1)
  }

  test("filter-in-transform drops rows (falsy format_data parity)") {
    val src = csvConn("srcF")
    val dst = csvConn("dstF")
    src.write((1 to 10).map(i => (i, s"n$i")).toDF("id", "name"), "t", WriteMode.Overwrite)
    val n = MigrationJob(src, dst, Transform.identity.filter($"id" % 2 === 0))
      .runOne(spark, "t", "t")
    assert(n == 5)
  }

  test("dedup (quchong) and limit (size)") {
    val src = csvConn("srcD")
    val dst = csvConn("dstD")
    src.write(Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"), (3, "c"))
      .toDF("id", "v"), "t", WriteMode.Overwrite)
    assert(MigrationJob(src, dst, dedup = true).runOne(spark, "t", "t_dedup") == 3)
    assert(MigrationJob(src, dst, limit = Some(2)).runOne(spark, "t", "t_lim") == 2)
  }

  test("InsertIgnore keeps existing rows on pk conflict; Replace overwrites") {
    val c = FileConnector("wm", tmpDir("wm"), "parquet")
    c.write(Seq((1, "old"), (2, "keep")).toDF("id", "v"), "t", WriteMode.Overwrite)

    val incoming = Seq((1, "new"), (3, "add")).toDF("id", "v")
    c.write(incoming, "t", WriteMode.InsertIgnore(Seq("id")))
    val afterIgnore = c.read(spark, "t").as[(Int, String)].collect().toMap
    assert(afterIgnore == Map(1 -> "old", 2 -> "keep", 3 -> "add"))

    c.write(incoming, "t", WriteMode.Replace(Seq("id")))
    val afterReplace = c.read(spark, "t").as[(Int, String)].collect().toMap
    assert(afterReplace == Map(1 -> "new", 2 -> "keep", 3 -> "add"))
  }

  test("whole-database loop over the source catalog (P1)") {
    val src = csvConn("srcAll")
    val dst = csvConn("dstAll")
    src.write(Seq((1, "x")).toDF("id", "v"), "t1", WriteMode.Overwrite)
    src.write(Seq((1, "y"), (2, "z")).toDF("id", "v"), "t2", WriteMode.Overwrite)
    assert(src.listIndexes(spark) == Seq("t1", "t2"))
    val counts = MigrationJob(src, dst).runAll(spark)
    assert(counts == Map("t1" -> 1L, "t2" -> 2L))
  }

  test("MemConnector (ListD) read/write/append") {
    val m = MemConnector("mem")
    m.write(Seq((1, "a")).toDF("id", "v"), "t", WriteMode.Overwrite)
    m.write(Seq((2, "b")).toDF("id", "v"), "t", WriteMode.Append)
    assert(m.read(spark, "t").count() == 2)
    assert(m.listIndexes(spark) == Seq("t"))
  }

  test("ndjson (JsonListD) round-trip") {
    val j = FileConnector("nd", tmpDir("nd"), "json")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "score")
    j.write(df, "t", WriteMode.Overwrite)
    val back = j.read(spark, "t")
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("id", "name", "score"))
  }
}
