package graft.plans

import graft.SparkSpec
import graft.core.{ManifestEntry, ManifestFileIndex, ManifestMerge, ManifestTable, ManifestWrite}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Round 15: metadata-only aggregates over manifested tables.
  * [[ManifestMetadataAggRule]] collapses a filterless global
  * count/min/max whose child is a manifest-backed scan into a
  * LocalRelation answered from the manifest's recorded stats — zero
  * tasks, zero file opens. The property held everywhere: the rule
  * either gives EXACTLY the answer the scan would (plan-shape asserted
  * both ways) or falls through untouched; answers are compared against
  * the legacy union read computing the same aggregates by scanning.
  */
class ManifestMetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def withMicros[T](body: => T): T = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** 10-day partitioned manifested layout with an id, a float, a
    * string, a micros timestamp, and a half-null string column.
    */
  private lazy val layout: String = {
    ManifestMetadataAgg.ensure(spark)
    val dir = tmpDir("meta-agg") + "/events"
    val base = to_date(lit("2024-03-01"))
    val day = date_add(base, (col("id") % 10).cast("int"))
    val df = spark.range(0, 1000).select(
      col("id"),
      (col("id") % 17).cast("double").as("value"),
      concat(lit("doc-"), format_string("%04d", col("id"))).as("text"),
      to_timestamp(concat(day.cast("string"), lit(" 06:00:00"))).as("ts"),
      when(col("id") % 4 === 0, lit(null).cast("string"))
        .otherwise(lit("x")).as("sparse"),
      lit(null).cast("long").as("void"),
      day.as("day"))
    withMicros {
      ManifestWrite.write(df.repartition(col("day")), dir, "day", SaveMode.Overwrite)
    }
    dir
  }

  private def rel: DataFrame = ManifestFileIndex.relation(spark, layout, "day")
  private def legacy: DataFrame = ManifestTable.read(spark, layout, partCol = "day")

  private def answeredFromMetadata(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collect { case l: LocalRelation => l }.nonEmpty &&
      p.collect { case r: LogicalRelation => r }.isEmpty
  }

  test("filterless count/min/max collapse to a LocalRelation with the scan's exact values") {
    val metaDf = rel.agg(
      count(lit(1)).as("n"), count($"sparse").as("n_sparse"),
      min($"id").as("min_id"), max($"id").as("max_id"),
      min($"ts").as("min_ts"), max($"ts").as("max_ts"),
      min($"day").as("min_day"), max($"day").as("max_day"),
      count($"void").as("n_void"), min($"void").as("min_void"))
    assert(answeredFromMetadata(metaDf),
      s"rule did not fire:\n${metaDf.queryExecution.optimizedPlan}")
    val scanDf = legacy.agg(
      count(lit(1)).as("n"), count($"sparse").as("n_sparse"),
      min($"id").as("min_id"), max($"id").as("max_id"),
      min($"ts").as("min_ts"), max($"ts").as("max_ts"),
      min($"day").as("min_day"), max($"day").as("max_day"),
      count($"void").as("n_void"), min($"void").as("min_void"))
    assert(!answeredFromMetadata(scanDf))
    assert(metaDf.collect().toSeq.map(_.toString) ==
      scanDf.collect().toSeq.map(_.toString))
    // spot values: the all-null column counts 0 and mins to SQL null
    val row = metaDf.head()
    assert(row.getAs[Long]("n") == 1000L)
    assert(row.getAs[Long]("n_sparse") == 750L)
    assert(row.getAs[Long]("n_void") == 0L)
    assert(row.isNullAt(row.fieldIndex("min_void")))
  }

  test("partition-selected reads answer from the SELECTED entries only") {
    val sel = Some(Set("2024-03-02", "2024-03-05"))
    val metaDf = ManifestFileIndex.relation(spark, layout, "day", sel)
      .agg(count(lit(1)).as("n"), min($"day").as("lo"), max($"day").as("hi"))
    assert(answeredFromMetadata(metaDf))
    val row = metaDf.head()
    assert(row.getAs[Long]("n") == 200L)
    assert(row.getAs[java.sql.Date]("lo").toString == "2024-03-02")
    assert(row.getAs[java.sql.Date]("hi").toString == "2024-03-05")
  }

  test("PARTITION-only filters stay metadata-answerable: whole entries selected exactly") {
    // a day range with no data-column reference: count/min/max answer
    // from the filtered entry set, matching the scan's rows exactly
    val f = $"day" >= to_date(lit("2024-03-03")) && $"day" < to_date(lit("2024-03-06"))
    val metaDf = rel.filter(f).agg(
      count(lit(1)).as("n"), min($"id").as("lo"), max($"day").as("hi"))
    assert(answeredFromMetadata(metaDf),
      s"partition-only filter should stay metadata:\n${metaDf.queryExecution.optimizedPlan}")
    val scanDf = legacy.filter(f).agg(
      count(lit(1)).as("n"), min($"id").as("lo"), max($"day").as("hi"))
    assert(metaDf.collect().toSeq.map(_.toString) ==
      scanDf.collect().toSeq.map(_.toString))
    assert(metaDf.head().getAs[Long]("n") == 300L)
    // an IN over partition values, ditto
    val g = $"day".isin(java.sql.Date.valueOf("2024-03-02"), java.sql.Date.valueOf("2024-03-09"))
    val inDf = rel.filter(g).agg(count(lit(1)).as("n"))
    assert(answeredFromMetadata(inDf))
    assert(inDf.head().getAs[Long]("n") == 200L)
    // a filter MIXING partition and data columns must scan
    val mixed = rel.filter($"day" >= to_date(lit("2024-03-03")) && $"id" > 10L)
      .agg(count(lit(1)).as("n"))
    assert(!answeredFromMetadata(mixed))
    assert(mixed.collect().toSeq.map(_.toString) ==
      legacy.filter($"day" >= to_date(lit("2024-03-03")) && $"id" > 10L)
        .agg(count(lit(1)).as("n")).collect().toSeq.map(_.toString))
    // a non-deterministic filter must scan (threshold 0.5: the
    // optimizer folds `rand >= 0.0` to TRUE, which — correctly —
    // leaves a partition-only filter and a metadata answer)
    val rnd = rel.filter(rand(7) >= 0.5 && $"day" >= to_date(lit("2024-03-03")))
      .agg(count(lit(1)).as("n"))
    assert(!answeredFromMetadata(rnd))
  }

  test("bail paths fall through to the scan, values still exact") {
    def sameAnswer(meta: DataFrame, scan: DataFrame): Unit =
      assert(meta.collect().toSeq.map(_.toString) ==
        scan.collect().toSeq.map(_.toString))
    // a filter voids the metadata answer
    val filtered = rel.filter($"id" < 100L).agg(count(lit(1)).as("n"))
    assert(!answeredFromMetadata(filtered))
    sameAnswer(filtered, legacy.filter($"id" < 100L).agg(count(lit(1)).as("n")))
    // string min/max: envelopes are truncated — must scan
    val strAgg = rel.agg(min($"text").as("lo"), max($"text").as("hi"))
    assert(!answeredFromMetadata(strAgg))
    sameAnswer(strAgg, legacy.agg(min($"text").as("lo"), max($"text").as("hi")))
    // float min/max: NaN-blind envelopes — must scan
    val fAgg = rel.agg(min($"value").as("lo"), max($"value").as("hi"))
    assert(!answeredFromMetadata(fAgg))
    sameAnswer(fAgg, legacy.agg(min($"value").as("lo"), max($"value").as("hi")))
    // DISTINCT is not a metadata fact
    val dAgg = rel.agg(countDistinct($"id").as("n"))
    assert(!answeredFromMetadata(dAgg))
    sameAnswer(dAgg, legacy.agg(countDistinct($"id").as("n")))
    // grouping by a DATA column is not answerable
    val gAgg = rel.groupBy($"sparse").agg(count(lit(1)).as("n")).orderBy($"sparse")
    assert(!answeredFromMetadata(gAgg))
    sameAnswer(gAgg, legacy.groupBy($"sparse").agg(count(lit(1)).as("n")).orderBy($"sparse"))
  }

  test("GROUP BY the partition column answers one zero-task row per live entry (round 16)") {
    def aggs(base: DataFrame): DataFrame = base.groupBy($"day").agg(
      count(lit(1)).as("n"), count($"sparse").as("n_sparse"),
      min($"id").as("lo"), max($"id").as("hi"),
      min($"ts").as("ts_lo"), max($"ts").as("ts_hi"),
      min($"day").as("d_lo"), max($"day").as("d_hi")).orderBy($"day")
    val metaDf = aggs(rel)
    assert(answeredFromMetadata(metaDf),
      s"GROUP BY partCol should be a metadata answer:\n${metaDf.queryExecution.optimizedPlan}")
    val scanDf = aggs(legacy)
    assert(!answeredFromMetadata(scanDf))
    assert(metaDf.collect().toSeq.map(_.toString) ==
      scanDf.collect().toSeq.map(_.toString))
    assert(metaDf.count() == 10)
    // composed with a partition-only filter: grouped over the selection
    val f = $"day" >= to_date(lit("2024-03-04"))
    val fMeta = aggs(rel.filter(f))
    assert(answeredFromMetadata(fMeta))
    assert(fMeta.collect().toSeq.map(_.toString) ==
      aggs(legacy.filter(f)).collect().toSeq.map(_.toString))
    assert(fMeta.count() == 7)
    // SQL spelling, aliased grouping column
    rel.createOrReplaceTempView("meta_agg_grp")
    val sqlDf = spark.sql(
      "SELECT day AS d, count(*) AS n FROM meta_agg_grp GROUP BY day ORDER BY d")
    assert(answeredFromMetadata(sqlDf))
    assert(sqlDf.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      .forall(_._2 == 100L))
    // grouping expressions that are NOT the bare column bail
    val exprG = rel.groupBy(date_add($"day", 1)).agg(count(lit(1)).as("n"))
    assert(!answeredFromMetadata(exprG))
  }

  test("GROUP BY partCol: an all-empty (schema-only) partition yields NO group, matching the scan") {
    val dir = tmpDir("meta-agg-empty-grp") + "/t"
    val df = spark.range(0, 40).select(col("id"),
      when(col("id") < 20, lit("2024-07-01")).otherwise(lit("2024-07-02"))
        .cast("date").as("day"))
    ManifestWrite.write(df.repartition(col("day")), dir, "day", SaveMode.Overwrite)
    // erase one partition's rows entirely via merge-delete: the entry
    // may survive as schema-only or drop; either way the group vanishes
    ManifestMerge(dir, Seq("id"))
      .whenMatchedDelete()
      .run(spark.range(20, 40).select(col("id")))
    ManifestMetadataAgg.ensure(spark)
    val g = ManifestFileIndex.relation(spark, dir, "day")
      .groupBy($"day").agg(count(lit(1)).as("n")).orderBy($"day")
    val rows = g.collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 20L,
      s"empty partition leaked a group: ${rows.mkString(", ")}")
  }

  test("partition-only filter carrying a subquery falls through to the scan — and executes (round-16 ADVICE-high)") {
    // `WHERE day IN (SELECT …)` references only the partition column
    // and is deterministic, so the structural checks alone would admit
    // it — but the ListQuery is Unevaluable for the interpreted
    // Predicate and this rule runs BEFORE RewriteSubquery. The rule
    // must bail to the scan; pre-fix this crashed during optimization.
    rel.createOrReplaceTempView("meta_agg_subq")
    val inSubq = spark.sql(
      """SELECT count(*) AS n FROM meta_agg_subq
        |WHERE day IN (SELECT DISTINCT day FROM meta_agg_subq WHERE day >= DATE'2024-03-05')""".stripMargin)
    assert(!answeredFromMetadata(inSubq),
      s"IN-subquery filter must scan:\n${inSubq.queryExecution.optimizedPlan}")
    assert(inSubq.head().getAs[Long]("n") == 600L)
    // scalar subquery, same class
    val scalarSubq = spark.sql(
      """SELECT count(*) AS n FROM meta_agg_subq
        |WHERE day = (SELECT max(day) FROM meta_agg_subq)""".stripMargin)
    assert(!answeredFromMetadata(scalarSubq))
    assert(scalarSubq.head().getAs[Long]("n") == 100L)
    // and a plain partition predicate through SQL still collapses
    val plain = spark.sql(
      "SELECT count(*) AS n FROM meta_agg_subq WHERE day >= DATE'2024-03-05'")
    assert(answeredFromMetadata(plain))
    assert(plain.head().getAs[Long]("n") == 600L)
  }

  test("a stats-less (pre-upgrade) generation disables the shortcut; counts still exact") {
    val dir = tmpDir("meta-agg-legacy") + "/t"
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    spark.range(0, 40).selectExpr("id").coalesce(1)
      .write.parquet(new Path(root, "g-old").toString)
    fs.delete(new Path(new Path(root, "g-old"), "_SUCCESS"), false)
    ManifestTable.commit(fs, root, "",
      Map("g-old" -> Some(ManifestEntry("g-old", "g-old", Nil)))) // no stats
    ManifestWrite.write(spark.range(100, 150).selectExpr("id").coalesce(1),
      dir, "", SaveMode.Append)
    ManifestMetadataAgg.ensure(spark)
    val df = ManifestFileIndex.relation(spark, dir, "").agg(count(lit(1)).as("n"))
    assert(!answeredFromMetadata(df), "stats-less entries must disable the shortcut")
    assert(df.head().getAs[Long]("n") == 90L)
  }

  test("equivalence fuzz: rule answer == scan answer on 12 random tables (nulls, skew, empty-ish days)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val params = Gen.Parameters.default
    val rowGen = for {
      dayOff <- Gen.chooseNum(0, 3)
      id <- Gen.option(Gen.chooseNum(-1000L, 1000L))
    } yield (dayOff, id)
    (1 to 12).foreach { i =>
      val seed = Seed(31000L + i)
      val rows = Gen.resize(40, Gen.nonEmptyListOf(rowGen)).apply(params, seed).get
      val dir = tmpDir(s"meta-fuzz-$i") + "/t"
      val df = rows.zipWithIndex.map { case ((d, id), j) =>
        (j.toLong, id, java.sql.Date.valueOf(java.time.LocalDate.parse("2024-06-01").plusDays(d)))
      }.toDF("pk", "id", "day")
      ManifestWrite.write(df.repartition(col("day")), dir, "day", SaveMode.Overwrite)
      def aggs(base: DataFrame) = base.agg(
        count(lit(1)).as("n"), count($"id").as("n_id"),
        min($"id").as("lo"), max($"id").as("hi"),
        min($"day").as("d_lo"), max($"day").as("d_hi"))
      val metaDf = aggs(ManifestFileIndex.relation(spark, dir, "day"))
      assert(answeredFromMetadata(metaDf), s"case $i: rule did not fire")
      val scanDf = aggs(ManifestTable.read(spark, dir, partCol = "day"))
      assert(metaDf.collect().toSeq.map(_.toString) ==
        scanDf.collect().toSeq.map(_.toString), s"case $i: metadata drifted from scan")
      // a random partition-range filter, still metadata-answered
      val cut = java.sql.Date.valueOf(java.time.LocalDate.parse("2024-06-01")
        .plusDays(Gen.chooseNum(0, 3).apply(params, seed.next).get))
      // the selection may be empty — both sides must agree either way
      val fMeta = aggs(ManifestFileIndex.relation(spark, dir, "day").filter($"day" >= cut))
      val fScan = aggs(ManifestTable.read(spark, dir, partCol = "day").filter($"day" >= cut))
      assert(fMeta.collect().toSeq.map(_.toString) ==
        fScan.collect().toSeq.map(_.toString), s"case $i: filtered metadata drifted")
      // the grouped shape (round 16), unfiltered and filtered
      def gAggs(base: DataFrame) = base.groupBy($"day").agg(
        count(lit(1)).as("n"), count($"id").as("n_id"),
        min($"id").as("lo"), max($"id").as("hi")).orderBy($"day")
      val gMeta = gAggs(ManifestFileIndex.relation(spark, dir, "day"))
      assert(answeredFromMetadata(gMeta), s"case $i: grouped rule did not fire")
      assert(gMeta.collect().toSeq.map(_.toString) ==
        gAggs(ManifestTable.read(spark, dir, partCol = "day")).collect().toSeq.map(_.toString),
        s"case $i: grouped metadata drifted from scan")
      val gfMeta = gAggs(ManifestFileIndex.relation(spark, dir, "day").filter($"day" >= cut))
      assert(gfMeta.collect().toSeq.map(_.toString) ==
        gAggs(ManifestTable.read(spark, dir, partCol = "day").filter($"day" >= cut))
          .collect().toSeq.map(_.toString), s"case $i: filtered grouped metadata drifted")
    }
  }

  test("q152 runs green and is answered from metadata (zero-task grouped profile)") {
    val df = graft.operators.StorageOps.partitionProfile(spark, "/root/testdata/sf0.001")
    assert(answeredFromMetadata(df),
      s"q152 should be a metadata answer:\n${df.queryExecution.optimizedPlan}")
    val rows = df.collect()
    assert(rows.length > 1)
    assert(rows.forall(r => r.getAs[Long]("n_rows") > 0))
  }

  test("q150 runs green and is answered from metadata") {
    val df = graft.operators.StorageOps.manifestMetadataStats(spark, "/root/testdata/sf0.001")
    assert(answeredFromMetadata(df),
      s"q150 should be a metadata answer:\n${df.queryExecution.optimizedPlan}")
    val row = df.head()
    assert(row.getAs[Long]("n_rows") > 0)
    assert(!row.isNullAt(row.fieldIndex("min_ts")))
  }
}
