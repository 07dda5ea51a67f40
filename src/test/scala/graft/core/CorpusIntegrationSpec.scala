package graft.core

import graft.{SparkSpec, Tables}
import graft.merge.MergeJob
import graft.sources.SqlDumpConnector
import org.apache.spark.sql.functions._

/** End-to-end pipelines over the real driver corpus: the §3.1/§3.2
  * flows at sf0.001 across heterogeneous connectors.
  */
class CorpusIntegrationSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("Migration: parquet corpus → csv with transform+dedup, counts preserved") {
    val src = FileConnector("corpus", dir, "parquet")
    val dst = FileConnector("out", tmpDir("mig-corpus"), "csv")
    val t = Transform.identity
      .filter($"o_totalprice" > 50000)
      .rename("o_orderpriority", "priority")
      .add("ingested", lit("r1"))
      .drop("o_orderdate") // csv-hostile ts dropped; keep the demo simple
    val n = MigrationJob(src, dst, t).runOne(spark, "orders.parquet", "orders_subset")
    val direct = Tables.load(spark, dir, "orders").filter($"o_totalprice" > 50000).count()
    assert(n == direct)
    val out = dst.read(spark, "orders_subset")
    assert(out.columns.contains("priority") && out.columns.contains("ingested"))
  }

  test("Migration2DB flow: orders ⋈ customer merge → sqldump sink → read back") {
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice").limit(200)
    val customer = Tables.load(spark, dir, "customer")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    val merged = MergeJob.merge(orders, customer, "o_custkey", "c_custkey",
      joinType = "left", broadcastRight = true)
    assert(merged.columns.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"))

    val dump = SqlDumpConnector("dump", tmpDir("merge-dump"))
    dump.write(merged, "merged", WriteMode.Overwrite)
    val back = dump.read(spark, "merged")
    assert(back.count() == 200)
    assert(back.columns.toSeq == merged.columns.toSeq) // ddl.sql preserved order
    // spot-check a merged value survives the dump round-trip
    val one = merged.filter($"o_orderkey" === merged.select(min($"o_orderkey")).head().getLong(0))
      .select($"c_name").head().getString(0)
    val oneBack = back.filter($"o_orderkey".cast("long") ===
        back.select(min($"o_orderkey".cast("long"))).head().getLong(0))
      .select($"c_name").head().getString(0)
    assert(one == oneBack)
  }

  test("whole-database loop over the corpus catalog lands every table") {
    val src = FileConnector("corpus", dir, "parquet")
    val indexes = src.listIndexes(spark)
    assert(Tables.All.forall(t => indexes.contains(s"$t.parquet") || indexes.contains(t)),
      s"catalog: $indexes")
  }
}
