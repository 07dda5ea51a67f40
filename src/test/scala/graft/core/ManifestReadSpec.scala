package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The [[ManifestTable.read]] design premise, pinned on the REAL
  * local FS: Spark 4 rejects mixed-depth leaf dirs under one
  * `basePath` ("conflicting directory structures"), so a manifested
  * table with adopted (`root/day=X`) and rewritten (`root/g-u/day=X`)
  * entries must be read as one frame PER GENERATION (each with its
  * own basePath, partition inference intact) and unioned — and
  * partition pruning on the inferred column must survive the union.
  */
class ManifestReadSpec extends SparkSpec {
  test("basePath partition inference over mixed-depth leaf dirs") {
    import spark.implicits._
    val root = tmpDir("graft-basepath-probe")
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "d").withColumn("day", to_date($"d")).drop("d")
    // adopted shape: root/day=X
    df.filter($"id" =!= 2L).repartition(col("day"))
      .write.partitionBy("day").parquet(root + "/init")
    // move init/day=X up to root to emulate a plain adopted layout
    val r = new java.io.File(root)
    new java.io.File(root + "/init").listFiles()
      .filter(_.getName.startsWith("day="))
      .foreach(d => d.renameTo(new java.io.File(r, d.getName)))
    // rewritten shape: root/rw-1/day=X (deeper)
    df.filter($"id" === 2L).drop("day")
      .write.parquet(root + "/rw-1/day=2024-01-02")
    val adopted = spark.read.option("basePath", root)
      .parquet(s"$root/day=2024-01-01", s"$root/day=2024-01-03")
    val rewritten = spark.read.option("basePath", s"$root/rw-1")
      .parquet(s"$root/rw-1/day=2024-01-02")
    val got = adopted.unionByName(rewritten)
    got.printSchema()
    val rows = got.select($"id", $"day".cast("string")).collect()
      .map(x => (x.getLong(0), x.getString(1))).sortBy(_._1).toSeq
    assert(rows == Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03")), rows.toString)
    assert(got.schema("day").dataType.typeName == "date", got.schema.treeString)
    // and partition pruning still applies on the inferred column
    val pruned = got.filter($"day" === to_date(lit("2024-01-02")))
    assert(pruned.count() == 1)
  }
}
