package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Live execution of the keyed JDBC write modes (S2/S29/P11) against
  * embedded Derby — the one real database in this sandbox. Asserts the
  * same semantics MigrationJobSpec proves for file targets: InsertIgnore
  * keeps existing rows, Replace overwrites them — plus the P1
  * whole-database loop over a JDBC source via `DatabaseMetaData`.
  */
class JdbcUpsertExecSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(name: String): String =
    s"jdbc:derby:${tmpDir(name)}/db;create=true"

  test("InsertIgnore via MERGE keeps existing rows; Replace overwrites") {
    val url = freshDb("graft-derby-upsert")
    JdbcExec.execute(url, "CREATE TABLE items (id INT NOT NULL PRIMARY KEY, v VARCHAR(64))", Map.empty)
    JdbcExec.execute(url, "INSERT INTO items VALUES (1, 'old'), (2, 'keep')", Map.empty)

    val conn = JdbcConnector("derby", url)
    val batch = Seq((1, "new"), (3, "add")).toDF("id", "v").coalesce(2)

    conn.write(batch, "items", WriteMode.InsertIgnore(Seq("id")))
    val afterIgnore = conn.read(spark, "items").orderBy("ID")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(afterIgnore == Seq((1, "old"), (2, "keep"), (3, "add")))

    conn.write(Seq((1, "replaced"), (4, "more")).toDF("id", "v"), "items",
      WriteMode.Replace(Seq("id")))
    val afterReplace = conn.read(spark, "items").orderBy("ID")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(afterReplace == Seq((1, "replaced"), (2, "keep"), (3, "add"), (4, "more")))
  }

  test("upsert into a missing table auto-creates it (P7) and handles nulls") {
    val url = freshDb("graft-derby-create")
    val conn = JdbcConnector("derby", url)
    val df = Seq((1L, Some(1.5), Some("a")), (2L, None, None))
      .toDF("id", "score", "tag")
    conn.write(df, "auto_tbl", WriteMode.Replace(Seq("id")))
    // Re-applying the same batch must be idempotent (task-retry model).
    conn.write(df, "auto_tbl", WriteMode.Replace(Seq("id")))
    val rows = conn.read(spark, "auto_tbl").orderBy("ID").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 1.5 && rows(0).getString(2) == "a")
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("listIndexes via DatabaseMetaData powers MigrationJob.runAll over JDBC (P1)") {
    val url = freshDb("graft-derby-catalog")
    JdbcExec.execute(url, "CREATE TABLE t_users (id INT NOT NULL PRIMARY KEY, nm VARCHAR(32))", Map.empty)
    JdbcExec.execute(url, "INSERT INTO t_users VALUES (1, 'ann'), (2, 'bob')", Map.empty)
    JdbcExec.execute(url, "CREATE TABLE t_tags (id INT NOT NULL PRIMARY KEY, tag VARCHAR(32))", Map.empty)
    JdbcExec.execute(url, "INSERT INTO t_tags VALUES (1, 'x')", Map.empty)

    val src = JdbcConnector("derby-src", url)
    assert(src.listIndexes(spark) == Seq("T_TAGS", "T_USERS"))

    val sink = MemConnector("mem")
    val counts = MigrationJob(src, sink).runAll(spark)
    assert(counts == Map("T_TAGS" -> 1L, "T_USERS" -> 2L))
    assert(sink.read(spark, "T_USERS").count() == 2)
  }

  test("prepared statement goldens across dialects") {
    val cols = Seq("id", "v")
    val my = JdbcUpsert.prepared(JdbcUpsert.MySql, "t", cols, Seq("id"), newWins = false)
    assert(my.sql == "INSERT IGNORE INTO `t` (`id`, `v`) VALUES (?, ?)")
    assert(my.bind == Seq(0, 1))

    val myUp = JdbcUpsert.prepared(JdbcUpsert.MySql, "t", cols, Seq("id"), newWins = true)
    assert(myUp.sql ==
      "INSERT INTO `t` (`id`, `v`) VALUES (?, ?) ON DUPLICATE KEY UPDATE `v` = VALUES(`v`)")

    val pg = JdbcUpsert.prepared(JdbcUpsert.Postgres, "t", cols, Seq("id"), newWins = true)
    assert(pg.sql ==
      """INSERT INTO "t" ("id", "v") VALUES (?, ?) ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"""")

    val ansi = JdbcUpsert.prepared(JdbcUpsert.Ansi, "t", cols, Seq("id"), newWins = true)
    assert(ansi.sql ==
      """MERGE INTO "t" USING SYSIBM.SYSDUMMY1 ON "t"."id" = ? WHEN MATCHED THEN UPDATE SET "v" = ? WHEN NOT MATCHED THEN INSERT ("id", "v") VALUES (?, ?)""")
    assert(ansi.bind == Seq(0, 1, 0, 1))

    // all-pk rows: update clause degenerates to ignore semantics
    val allPk = JdbcUpsert.prepared(JdbcUpsert.MySql, "t", Seq("id"), Seq("id"), newWins = true)
    assert(allPk.sql == "INSERT IGNORE INTO `t` (`id`) VALUES (?)")
  }
}
