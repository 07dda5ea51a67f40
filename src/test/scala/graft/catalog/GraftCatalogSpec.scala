package graft.catalog

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The V2 TableCatalog surface (round-18 verdict task 1): manifested
  * tables as nameable SQL objects — CREATE/INSERT/MERGE/SELECT with
  * time travel, partition DELETE, TRUNCATE, ALTER COLUMN — all landing
  * on the same engine the Scala surface uses, with the same plans.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse = tmpDir("graft-warehouse")

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.demo")
  }

  private def fs = new Path(warehouse).getFileSystem(spark.sessionState.newHadoopConf())

  test("CREATE TABLE + INSERT INTO (partitioned) + SELECT through the catalog") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.t1")
    spark.sql(
      "CREATE TABLE graftcat.demo.t1 (id BIGINT, v DOUBLE, day STRING) " +
        "USING graft PARTITIONED BY (day)")
    // empty table reads as zero rows with the declared schema
    val empty = spark.sql("SELECT * FROM graftcat.demo.t1")
    assert(empty.columns.toSeq.sorted == Seq("day", "id", "v"))
    assert(empty.count() == 0)
    spark.sql(
      "INSERT INTO graftcat.demo.t1 SELECT id, id * 2.0 AS v, " +
        "concat('d', cast(id % 3 AS int)) AS day FROM range(0, 30)")
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.t1").head().getLong(0) == 30)
    assert(spark.sql("SELECT sum(v) FROM graftcat.demo.t1 WHERE day = 'd1'")
      .head().getDouble(0) == (0 until 30).filter(_ % 3 == 1).map(_ * 2.0).sum)
    // second INSERT INTO appends (partitioned append: carry, no rewrite)
    spark.sql(
      "INSERT INTO graftcat.demo.t1 SELECT id, 0.5 AS v, 'd0' AS day FROM range(100, 105)")
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.t1").head().getLong(0) == 35)
    // the mapping was assigned at birth: metadata-only rename works
    val root = s"$warehouse/demo/t1"
    val m = graft.core.ManifestTable.resolve(fs, new Path(root)).get
    assert(m.cols.map(_.logical).toSet == Set("id", "v"))
  }

  test("catalog reads plan as ONE manifest file scan with pushdown and pruning") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.t2")
    spark.sql(
      "CREATE TABLE graftcat.demo.t2 (id BIGINT, v DOUBLE, day STRING) " +
        "USING graft PARTITIONED BY (day)")
    spark.sql(
      "INSERT INTO graftcat.demo.t2 SELECT id, id * 1.0, concat('d', cast(id % 4 AS int)) " +
        "FROM range(0, 400)")
    val q = spark.sql("SELECT id FROM graftcat.demo.t2 WHERE day = 'd2' AND id > 100")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("FileScan parquet"),
      s"catalog read must plan as the native file scan:\n$physical")
    assert(physical.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,100)"),
      s"data filter must push to the scan:\n$physical")
    assert(!physical.contains("GraftTable"), s"v2 relation survived planning:\n$physical")
    // partition pruning: only d2's files are read
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
    assert(q.count() == (101 until 400).count(_ % 4 == 2), scanned)
  }

  test("SQL MERGE INTO lowers onto the row-level merge engine") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.m1")
    spark.sql(
      "CREATE TABLE graftcat.demo.m1 (id BIGINT, v DOUBLE, day STRING) " +
        "USING graft PARTITIONED BY (day)")
    spark.sql(
      "INSERT INTO graftcat.demo.m1 SELECT id, id * 1.0, concat('d', cast(id % 2 AS int)) " +
        "FROM range(0, 20)")
    spark.sql(
      """MERGE INTO graftcat.demo.m1 t
        |USING (SELECT id, id * 100.0 AS nv,
        |              concat('d', cast(id % 2 AS int)) AS day
        |       FROM range(15, 25)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.nv + t.v
        |WHEN NOT MATCHED THEN INSERT (id, v, day) VALUES (s.id, s.nv, s.day)
        |""".stripMargin)
    val out = spark.sql("SELECT id, v FROM graftcat.demo.m1 ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 25)
    (0 until 15).foreach(i => assert(out(i.toLong) == i * 1.0, s"id $i"))
    (15 until 20).foreach(i => assert(out(i.toLong) == i * 100.0 + i * 1.0, s"id $i"))
    (20 until 25).foreach(i => assert(out(i.toLong) == i * 100.0, s"id $i"))
    // MERGE … DELETE
    spark.sql(
      """MERGE INTO graftcat.demo.m1 t
        |USING (SELECT id FROM range(0, 5)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN DELETE
        |""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.m1").head().getLong(0) == 20)
  }

  test("VERSION AS OF / TIMESTAMP AS OF through the catalog") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.tt")
    spark.sql("CREATE TABLE graftcat.demo.tt (id BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO graftcat.demo.tt SELECT id, 1.0 FROM range(0, 10)") // v2
    spark.sql("INSERT INTO graftcat.demo.tt SELECT id, 2.0 FROM range(10, 30)") // v3
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.tt").head().getLong(0) == 30)
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.tt VERSION AS OF 2")
      .head().getLong(0) == 10)
    // VERSION AS OF 1 is the empty creation commit
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.tt VERSION AS OF 1")
      .head().getLong(0) == 0)
    val future = java.time.Instant.now().plusSeconds(3600).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graftcat.demo.tt TIMESTAMP AS OF '$future'")
      .head().getLong(0) == 30)
  }

  test("INSERT OVERWRITE: whole table and static partition") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.ow")
    spark.sql(
      "CREATE TABLE graftcat.demo.ow (id BIGINT, day STRING) USING graft PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftcat.demo.ow SELECT id, concat('d', cast(id % 2 AS int)) FROM range(0, 10)")
    spark.sql(
      "INSERT OVERWRITE graftcat.demo.ow PARTITION (day = 'd0') SELECT id FROM range(100, 102)")
    val rows = spark.sql("SELECT day, count(*) AS n FROM graftcat.demo.ow GROUP BY day")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("d0" -> 2L, "d1" -> 5L), rows.toString)
    spark.sql("INSERT OVERWRITE graftcat.demo.ow SELECT id, 'dX' FROM range(0, 3)")
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.ow").head().getLong(0) == 3)
    assert(spark.sql("SELECT DISTINCT day FROM graftcat.demo.ow").head().getString(0) == "dX")
  }

  test("DELETE FROM by partition predicate; TRUNCATE; row-level delete refused clearly") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.del")
    spark.sql(
      "CREATE TABLE graftcat.demo.del (id BIGINT, day STRING) USING graft PARTITIONED BY (day)")
    spark.sql("INSERT INTO graftcat.demo.del SELECT id, concat('d', cast(id % 3 AS int)) FROM range(0, 30)")
    spark.sql("DELETE FROM graftcat.demo.del WHERE day = 'd1'")
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.del").head().getLong(0) == 20)
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graftcat.demo.del WHERE id = 3")
    }
    assert(e.getMessage.toLowerCase.contains("delete") ||
      e.getMessage.contains("MERGE"), e.getMessage)
    spark.sql("TRUNCATE TABLE graftcat.demo.del")
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.del").head().getLong(0) == 0)
  }

  test("ALTER TABLE RENAME/ADD/DROP COLUMN are metadata-only commits") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.alt")
    spark.sql("CREATE TABLE graftcat.demo.alt (id BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO graftcat.demo.alt SELECT id, id * 1.0 FROM range(0, 10)")
    spark.sql("ALTER TABLE graftcat.demo.alt RENAME COLUMN v TO amount")
    assert(spark.sql("SELECT sum(amount) FROM graftcat.demo.alt").head().getDouble(0)
      == (0 until 10).map(_ * 1.0).sum)
    spark.sql("ALTER TABLE graftcat.demo.alt ADD COLUMN tag STRING")
    assert(spark.sql("SELECT * FROM graftcat.demo.alt").columns.toSeq ==
      Seq("id", "amount", "tag"))
    spark.sql("INSERT INTO graftcat.demo.alt SELECT id, 0.0, 'x' FROM range(10, 12)")
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.alt WHERE tag = 'x'")
      .head().getLong(0) == 2)
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.alt WHERE tag IS NULL")
      .head().getLong(0) == 10)
    spark.sql("ALTER TABLE graftcat.demo.alt DROP COLUMN tag")
    assert(spark.sql("SELECT * FROM graftcat.demo.alt").columns.toSeq == Seq("id", "amount"))
  }

  test("SHOW TABLES / DESCRIBE / DROP TABLE / self-join") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.sj")
    spark.sql("CREATE TABLE graftcat.demo.sj (id BIGINT, v DOUBLE) USING graft")
    spark.sql("INSERT INTO graftcat.demo.sj SELECT id, id * 1.0 FROM range(0, 8)")
    val tables = spark.sql("SHOW TABLES IN graftcat.demo").collect().map(_.getString(1))
    assert(tables.contains("sj"), tables.mkString(","))
    val desc = spark.sql("DESCRIBE TABLE graftcat.demo.sj").collect()
      .map(_.getString(0))
    assert(desc.contains("id") && desc.contains("v"), desc.mkString(","))
    // self-join: the two references must deduplicate cleanly
    val n = spark.sql(
      "SELECT count(*) FROM graftcat.demo.sj a JOIN graftcat.demo.sj b ON a.id = b.id")
      .head().getLong(0)
    assert(n == 8)
    // CTAS
    spark.sql("DROP TABLE IF EXISTS graftcat.demo.sj2")
    spark.sql("CREATE TABLE graftcat.demo.sj2 USING graft AS SELECT * FROM graftcat.demo.sj WHERE id < 4")
    assert(spark.sql("SELECT count(*) FROM graftcat.demo.sj2").head().getLong(0) == 4)
    spark.sql("DROP TABLE graftcat.demo.sj2")
    assert(!spark.sql("SHOW TABLES IN graftcat.demo").collect().map(_.getString(1))
      .contains("sj2"))
  }
}
