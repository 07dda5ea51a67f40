package graft.operators

import graft.SparkSpec
import graft.core.JdbcUpsert
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class OperatorHelpersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("AsOf.join: latest right row at-or-before each left time, per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:01:30"), 101.0),
      (2L, ts("2024-01-01 10:00:30"), 50.0),
      (3L, ts("2024-01-01 10:00:30"), 7.0), // no quotes for key 3
    ).toDF("sym", "t_time", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.5),
      (1L, ts("2024-01-01 10:01:00"), 100.5),
      (1L, ts("2024-01-01 10:02:00"), 101.5), // after both trades
      (2L, ts("2024-01-01 10:00:30"), 49.9), // exact tie → inclusive
    ).toDF("sym", "q_time", "bid")

    val out = AsOf.join(trades, quotes, "t_time", "q_time", "sym", Seq("bid"))
      .select($"sym", $"px", $"bid").orderBy($"sym", $"px")
      .as[(Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 100.0, 99.5), (1L, 101.0, 100.5), (2L, 50.0, 49.9)))

    val outer = AsOf.join(trades, quotes, "t_time", "q_time", "sym", Seq("bid"), inner = false)
    assert(outer.count() == 4) // key 3 kept with null bid
    assert(outer.filter($"sym" === 3 && $"bid".isNull).count() == 1)
  }

  test("AsOf.join: null payload on the matched right row stays null (no back-fill)") {
    val trades = Seq((1L, ts("2024-01-01 10:01:00"), 100.0))
      .toDF("sym", "t_time", "px")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(99.5)),
      (1L, ts("2024-01-01 10:00:30"), None), // latest as-of row: bid is null
    ).toDF("sym", "q_time", "bid")

    val out = AsOf.join(trades, quotes, "t_time", "q_time", "sym", Seq("bid"))
    // The 10:00:30 row is the match; its null payload must NOT be
    // back-filled from the older 10:00:00 row — and since the row
    // matched, inner keeps it (DuckDB ASOF semantics).
    assert(out.count() == 1)
    assert(out.filter($"bid".isNull).count() == 1)

    // A left row with no as-of right row at all is still dropped by inner.
    val early = Seq((1L, ts("2023-12-31 00:00:00"), 5.0)).toDF("sym", "t_time", "px")
    assert(AsOf.join(early, quotes, "t_time", "q_time", "sym", Seq("bid")).count() == 0)
  }

  test("SkewJoin.saltedJoin equals the plain join on skewed data") {
    val fact = (1 to 5000).map(i => (if (i % 10 == 0) 7L else i.toLong % 100, i.toLong))
      .toDF("k", "v") // key 7 is hot
    val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk").select($"k", $"v", $"name")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .select($"k", $"v", $"name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("JdbcUpsert SQL: MySQL and Postgres dialects") {
    val rows = Seq(Seq(1L, "o'x"), Seq(2L, null))
    val my = JdbcUpsert.upsertSql(JdbcUpsert.MySql, "t", Seq("id", "v"), rows, Seq("id"))
    assert(my.startsWith("INSERT INTO `t` (`id`, `v`) VALUES (1, 'o\\'x'), (2, NULL)"))
    assert(my.endsWith("ON DUPLICATE KEY UPDATE `v` = VALUES(`v`);"))

    // Postgres: double-quoted identifiers, '' string escaping (no backslashes)
    val pg = JdbcUpsert.upsertSql(JdbcUpsert.Postgres, "t", Seq("id", "v"), rows, Seq("id"))
    assert(pg.startsWith("""INSERT INTO "t" ("id", "v") VALUES (1, 'o''x'), (2, NULL)"""))
    assert(pg.endsWith("""ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v";"""))

    val ig = JdbcUpsert.insertIgnoreSql(JdbcUpsert.Postgres, "t", Seq("id", "v"), rows, Seq("id"))
    assert(ig.endsWith("""ON CONFLICT ("id") DO NOTHING;"""))

    val expr = JdbcUpsert.upsertWithExprSql("t", Seq("id", "v"), rows,
      "v = GREATEST(VALUES(v), v)")
    assert(expr.endsWith("ON DUPLICATE KEY UPDATE v = GREATEST(VALUES(v), v);"))
  }
}
