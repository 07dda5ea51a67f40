package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The window-top-k auto-rewrite: the standard
  * row_number-over-window + filter idiom must plan into TopKPerKeyExec
  * (heap, no full sort) without changing results — including the `rn`
  * column itself, which the surviving Window recomputes over the ≤ k
  * kept rows per key.
  */
class TopKWindowRewriteSpec extends SparkSpec {
  import spark.implicits._

  TopKWindowRewriteRule.install(spark)

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def base: DataFrame =
    (1 to 300).map(i => (i.toLong, "k" + (i % 7), (i * 37 % 101).toLong))
      .toDF("id", "key", "score")

  test("row_number window + rn <= k rewrites to TopKPerKeyExec and matches the window result") {
    // order by the unique (per key) id so ties can't make the
    // result comparison flaky
    val wu = Window.partitionBy($"key").orderBy($"id".desc)
    val q = base.withColumn("rn", row_number().over(wu)).filter($"rn" <= 4)
    val plan = physical(q)
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    val got = q.collect().map(r => (r.getString(1), r.getLong(0), r.getInt(3))).toSet
    // ground truth in plain Scala — an in-session un-rewritten control
    // is impossible: constant folding canonicalizes any `rn + 0` dodge
    // back to the literal pattern before the rule runs
    val expect = (1 to 300).map(i => (i.toLong, "k" + (i % 7)))
      .groupBy(_._2).flatMap { case (k, xs) =>
        xs.map(_._1).sorted(Ordering[Long].reverse).take(4)
          .zipWithIndex.map { case (id, ix) => (k, id, ix + 1) }
      }.toSet
    assert(got == expect, s"rewritten result differs: ${got.diff(expect)} vs ${expect.diff(got)}")
    assert(got.size == 7 * 4 && got.forall(_._3 <= 4))
  }

  test("SQL-spelled top-k rewrites too, rn column served from the recomputed window") {
    base.createOrReplaceTempView("rw_t")
    val q = spark.sql(
      """SELECT key, id, rn FROM (
        |  SELECT key, id, row_number() OVER (PARTITION BY key ORDER BY id) AS rn
        |  FROM rw_t) WHERE rn <= 2""".stripMargin)
    assert(physical(q).contains("TopKPerKey"), s"SQL rewrite did not fire:\n${physical(q)}")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // ascending by unique id: the two smallest ids per key, ranks 1, 2
    val expect = (1 to 300).map(i => ("k" + (i % 7), i.toLong))
      .groupBy(_._1).flatMap { case (k, xs) =>
        xs.map(_._2).sorted.take(2).zipWithIndex.map { case (id, ix) => (k, id, ix + 1) }
      }.toSet
    assert(got == expect)
  }

  test("nullable order column under NULLS LAST: null rows fill trailing slots exactly") {
    val df = Seq[(Long, String, java.lang.Long)](
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", null), (4L, "a", null), (5L, "a", 5L),
      (6L, "b", null), (7L, "b", null), (8L, "b", null),
      (9L, "c", 1L), (10L, "c", 2L), (11L, "c", 3L), (12L, "c", 4L)
    ).toDF("id", "key", "score")
    // single-order-expression pattern: order by score only (desc ->
    // nulls last by default); ties/null choice are arbitrary in BOTH
    // plans, so assert set-level facts, not exact null identities
    val q = df.withColumn("rn", row_number().over(Window.partitionBy($"key").orderBy($"score".desc)))
      .filter($"rn" <= 3)
    assert(physical(q).contains("TopKPerKey"), s"nullable rewrite did not fire:\n${physical(q)}")
    val rows = q.select($"key", $"score", $"rn").collect()
    val byKey = rows.groupBy(_.getString(0))
    assert(byKey("a").length == 3 && byKey("b").length == 3 && byKey("c").length == 3)
    // a: non-nulls 20,10,5 fill all 3 slots — no null may appear
    assert(byKey("a").forall(!_.isNullAt(1)) &&
      byKey("a").map(_.getLong(1)).sorted.toSeq == Seq(5L, 10L, 20L))
    // b: all null — 3 null rows, ranks 1..3
    assert(byKey("b").forall(_.isNullAt(1)) &&
      byKey("b").map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
    // c: top-3 of 4 non-nulls
    assert(byKey("c").map(_.getLong(1)).sorted.toSeq == Seq(2L, 3L, 4L))
  }

  test("guards: nullable rank/dense_rank, missing upper bound, and global windows stay windows") {
    val w = Window.partitionBy($"key").orderBy($"id".desc)
    // rank/dense_rank over a NULLABLE order column: all nulls are
    // mutually tied (one dense class), so a bounded null completion
    // can't reproduce the filter — skip
    val nullable = Seq[(Long, String, java.lang.Long)]((1L, "a", 1L), (2L, "a", null))
      .toDF("id", "key", "score")
    val wn = Window.partitionBy($"key").orderBy($"score".desc)
    val nullRank = nullable.withColumn("rk", rank().over(wn)).filter($"rk" <= 1)
    assert(!physical(nullRank).contains("TopKPerKey"),
      "rank() over a nullable order column must not rewrite")
    val nullDense = nullable.withColumn("rk", dense_rank().over(wn)).filter($"rk" <= 1)
    assert(!physical(nullDense).contains("TopKPerKey"),
      "dense_rank() over a nullable order column must not rewrite")
    val unbounded = base.withColumn("rn", row_number().over(w)).filter($"rn" >= 2)
    assert(!physical(unbounded).contains("TopKPerKey"), "no upper bound must not rewrite")
    val global = base.withColumn("rn", row_number().over(Window.orderBy($"id"))).filter($"rn" <= 3)
    assert(!physical(global).contains("TopKPerKey"), "global window must not rewrite")
    // a cap-at-N bound past the threshold must stay a window (the heap
    // allocates O(k) arrays per key), and an always-false Int.MinValue
    // bound must neither wrap to a huge k nor crash
    val huge = base.withColumn("rn", row_number().over(w)).filter($"rn" <= 50000)
    assert(!physical(huge).contains("TopKPerKey"), "k above threshold must not rewrite")
    val wrap = base.withColumn("rn", row_number().over(w)).filter($"rn" < Int.MinValue)
    assert(!physical(wrap).contains("TopKPerKey") && wrap.count() == 0)
  }

  test("strategy plans a re-planted WindowGroupLimit over the heap node away") {
    // extension-injected sessions run the rewrite BEFORE Spark's
    // InferWindowGroupLimit, which then wraps the heap node in its
    // sort-based limit — the strategy must recognize the identity
    import org.apache.spark.sql.catalyst.expressions.{Ascending, RowNumber, SortOrder}
    import org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
    val analyzed = base.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).get
    val topk = TopKPerKeyNode(Seq(attr("key")), attr("id"), 3, descending = false, analyzed)
    val wgl = WindowGroupLimit(Seq(attr("key")),
      Seq(SortOrder(attr("id"), Ascending)), RowNumber(), 3, topk)
    val planned = TopKPerKeyStrategy(wgl)
    assert(planned.nonEmpty && planned.head.isInstanceOf[TopKPerKeyExec],
      s"WindowGroupLimit(TopKPerKeyNode) should plan as the heap execs, got $planned")
    // a LOWER limit than k is not an identity — must not be absorbed
    val tighter = WindowGroupLimit(Seq(attr("key")),
      Seq(SortOrder(attr("id"), Ascending)), RowNumber(), 2, topk)
    assert(TopKPerKeyStrategy(tighter).isEmpty)
  }

  test("rank() window + rk <= k rewrites to the keep-ties heap and keeps every tied row") {
    // a 0..9 score domain over ~43 rows per key → the top values are
    // heavily duplicated; rank <= 2 must keep MORE than 2 rows per key
    val tied = (1 to 300).map(i => (i.toLong, "k" + (i % 7), (i % 10).toLong))
      .toDF("id", "key", "score")
    val w = Window.partitionBy($"key").orderBy($"score".desc)
    val q = tied.withColumn("rk", rank().over(w)).filter($"rk" <= 2)
    val plan = physical(q)
    assert(plan.contains("TopKPerKeyTies"), s"rank rewrite did not fire:\n$plan")
    val got = q.select($"key", $"score", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    // plain-Scala rank semantics: keep rows with < 2 strictly-better
    // rows; rank = 1 + strictly-better count — value-determined, so
    // (key, score, rk) TUPLES are deterministic even though row
    // identity under ties is not
    val expect = (1 to 300).map(i => ("k" + (i % 7), (i % 10).toLong))
      .groupBy(_._1).flatMap { case (k, xs) =>
        val vals = xs.map(_._2)
        xs.collect { case (_, v) if vals.count(_ > v) < 2 =>
          (k, v, vals.count(_ > v) + 1) }
      }.toSeq.sorted
    assert(got == expect,
      s"rank selection differs:\n${got.diff(expect)}\nvs\n${expect.diff(got)}")
    assert(got.length > 14, s"fixture must exercise ties past k: ${got.length} rows")
  }

  test("SQL rank() <= k rewrites and matches DuckDB-style rank semantics") {
    base.createOrReplaceTempView("rw_rank_t")
    val q = spark.sql(
      """SELECT key, score, rk FROM (
        |  SELECT key, score, rank() OVER (PARTITION BY key ORDER BY score) AS rk
        |  FROM rw_rank_t) WHERE rk <= 3""".stripMargin)
    assert(physical(q).contains("TopKPerKeyTies"), s"SQL rank rewrite did not fire:\n${physical(q)}")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val expect = (1 to 300).map(i => ("k" + (i % 7), (i * 37 % 101).toLong))
      .groupBy(_._1).flatMap { case (k, xs) =>
        val vals = xs.map(_._2)
        xs.collect { case (_, v) if vals.count(_ < v) < 3 =>
          (k, v, vals.count(_ < v) + 1) }
      }.toSeq.sorted
    assert(got == expect)
  }

  test("dense_rank() <= k rewrites to the dense heap: top-k distinct value classes, all rows") {
    // score domain 0..9, ~43 rows per key: dense_rank <= 2 keeps every
    // row bearing one of the 2 best distinct scores per key — far more
    // than 2 rows, and rank values depend only on distinct betters
    val tied = (1 to 300).map(i => (i.toLong, "k" + (i % 7), (i % 10).toLong))
      .toDF("id", "key", "score")
    val w = Window.partitionBy($"key").orderBy($"score".desc)
    val q = tied.withColumn("dr", dense_rank().over(w)).filter($"dr" <= 2)
    val plan = physical(q)
    assert(plan.contains("TopKPerKeyDense"), s"dense rewrite did not fire:\n$plan")
    val got = q.select($"key", $"id", $"score", $"dr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val expect = (1 to 300).map(i => (i.toLong, "k" + (i % 7), (i % 10).toLong))
      .groupBy(_._2).flatMap { case (k, xs) =>
        val distinct = xs.map(_._3).distinct.sorted(Ordering[Long].reverse)
        val top2 = distinct.take(2)
        xs.collect { case (id, _, v) if top2.contains(v) =>
          (k, id, v, top2.indexOf(v) + 1) }
      }.toSet
    assert(got == expect,
      s"dense selection differs:\n${got.diff(expect)}\nvs\n${expect.diff(got)}")
    assert(got.size > 14, s"fixture must keep whole value classes: ${got.size} rows")
  }

  test("multi-column same-direction ordering rewrites via the struct key") {
    // tuple order (score desc, id desc): heavy ties on score broken by
    // id — row_number over the 2-col window must equal the plain-Scala
    // tuple sort exactly, because the tie-break makes rows total-ordered
    val tied = (1 to 300).map(i => (i.toLong, "k" + (i % 7), (i % 5).toLong))
      .toDF("id", "key", "score")
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id".desc)
    val q = tied.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    val plan = physical(q)
    assert(plan.contains("TopKPerKey"), s"multi-order rewrite did not fire:\n$plan")
    val got = q.select($"key", $"id", $"rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val expect = (1 to 300).map(i => ("k" + (i % 7), i.toLong, (i % 5).toLong))
      .groupBy(_._1).flatMap { case (k, xs) =>
        xs.sortBy(t => (-t._3, -t._2)).take(3)
          .zipWithIndex.map { case (t, ix) => (k, t._2, ix + 1) }
      }.toSet
    assert(got == expect,
      s"multi-order selection differs:\n${got.diff(expect)}\nvs\n${expect.diff(got)}")

    // rank over the same 2-col tuple: ties = equal FULL tuples, which
    // the unique id makes impossible — rank must equal row_number here,
    // and the TIES mode must still plan (struct threshold equality)
    val qr = tied.withColumn("rk", rank().over(w)).filter($"rk" <= 3)
    assert(physical(qr).contains("TopKPerKeyTies"),
      s"multi-order rank rewrite did not fire:\n${physical(qr)}")
    val gotR = qr.select($"key", $"id", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotR == expect, "unique tie-break: rank selection must equal row_number's")
  }

  test("mixed-direction multi-column ordering rewrites via flipped struct fields") {
    // the canonical `ORDER BY score DESC, id ASC` tiebreak idiom: the
    // against-the-grain id flips via bitwise NOT inside the struct key
    val tied = (1 to 300).map(i => (i.toLong, "k" + (i % 7), (i % 5).toLong))
      .toDF("id", "key", "score")
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id".asc)
    val q = tied.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    val plan = physical(q)
    assert(plan.contains("TopKPerKey"), s"mixed-direction rewrite did not fire:\n$plan")
    val got = q.select($"key", $"id", $"rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val expect = (1 to 300).map(i => ("k" + (i % 7), i.toLong, (i % 5).toLong))
      .groupBy(_._1).flatMap { case (k, xs) =>
        xs.sortBy(t => (-t._3, t._2)).take(3)
          .zipWithIndex.map { case (t, ix) => (k, t._2, ix + 1) }
      }.toSet
    assert(got == expect,
      s"mixed-order selection differs:\n${got.diff(expect)}\nvs\n${expect.diff(got)}")
    // rank over the same ordering: unique full tuples → equals row_number
    val qr = tied.withColumn("rk", rank().over(w)).filter($"rk" <= 3)
    assert(physical(qr).contains("TopKPerKeyTies"),
      s"mixed-direction rank rewrite did not fire:\n${physical(qr)}")
    assert(qr.select($"key", $"id", $"rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet == expect)
  }

  test("flipped DOUBLE field: NaN and signed zero land exactly where the window puts them") {
    // d sorts DESC against an ASC grain → flips to a (notNaN, -d)
    // struct. Window double semantics: NaN > +Inf; -0.0 == 0.0.
    val dd = Seq(
      (1L, 0L, Double.NaN), (2L, 0L, 5.0), (3L, 0L, Double.PositiveInfinity),
      (4L, 0L, -0.0), (5L, 0L, 0.0), (6L, 1L, Double.NaN), (7L, 1L, 1.0),
      (8L, 0L, Double.NegativeInfinity)
    ).toDF("id", "t", "d").withColumn("key", lit("a"))
    val wd = Window.partitionBy($"key").orderBy($"t".asc, $"d".desc)
    val qd = dd.withColumn("rn", row_number().over(wd)).filter($"rn" <= 5)
    assert(physical(qd).contains("TopKPerKey"),
      s"flipped-double rewrite did not fire:\n${physical(qd)}")
    val rows = qd.select($"id", $"rn").collect().map(r => (r.getLong(0), r.getInt(1)))
    // t=0 block, d desc: NaN(1), +Inf(3), 5.0(2), then the -0.0/0.0
    // TIE (ids 4, 5 — ranks 4 and 5 in arbitrary order), -Inf(8) and
    // the whole t=1 block cut off by rn <= 5
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L, 4L, 5L),
      s"flipped-double selection wrong: ${rows.toSeq}")
    val rn = rows.toMap
    assert(rn(1L) == 1 && rn(3L) == 2 && rn(2L) == 3,
      s"NaN/Inf must keep their window ranks under the flip: ${rows.toSeq}")
    assert(Set(rn(4L), rn(5L)) == Set(4, 5),
      s"-0.0 and 0.0 must tie (arbitrary order) at ranks 4-5: ${rows.toSeq}")
  }

  test("flipped DATE/TIMESTAMP/DECIMAL/BOOLEAN fields keep exact window parity") {
    // each type takes its turn as the against-the-grain middle column
    // (g ASC head with heavy ties, X DESC flipped, id ASC tiebreak);
    // the lossless integer views (unix_date / unix_micros) must not
    // invent ties, so the selection equals the plain-Scala tuple sort
    // exactly. Also proves the flip expressions EXECUTE — a
    // runtime-replaceable or unresolvable view would die here, not
    // just plan differently.
    val rows = (1 to 120).map { i =>
      (i.toLong, "k" + (i % 3), i % 5,
        java.sql.Date.valueOf("2024-01-%02d".format(i % 28 + 1)),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:%02d.%03d".format(i % 60, i % 7)),
        BigDecimal((i % 9) - 4).setScale(2), i % 2 == 0)
    }
    // tuple encoders mark Date/Timestamp/BigDecimal NULLABLE, which the
    // multi-column guard (correctly) refuses — build with an explicit
    // non-nullable schema, as a parquet table with required fields has
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("key", StringType, nullable = false),
      StructField("g", IntegerType, nullable = false),
      StructField("d", DateType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("dec", DecimalType(10, 2), nullable = false),
      StructField("b", BooleanType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      rows.map(t => org.apache.spark.sql.Row(
        t._1, t._2, t._3, t._4, t._5, t._6.bigDecimal, t._7)).asJava,
      schema)
    def check(colName: String, keyOf: ((Long, String, Int, java.sql.Date, java.sql.Timestamp, BigDecimal, Boolean)) => Long): Unit = {
      val w = Window.partitionBy($"key").orderBy($"g".asc, col(colName).desc, $"id".asc)
      val q = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
      assert(physical(q).contains("TopKPerKey"),
        s"flip of $colName did not rewrite:\n${physical(q)}")
      val got = q.select($"key", $"id", $"rn").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val expect = rows.groupBy(_._2).flatMap { case (k, xs) =>
        xs.sortBy(t => (t._3, -keyOf(t), t._1)).take(4)
          .zipWithIndex.map { case (t, ix) => (k, t._1, ix + 1) }
      }.toSet
      assert(got == expect,
        s"$colName flip selection differs:\n${got.diff(expect)}\nvs\n${expect.diff(got)}")
    }
    check("d", _._4.toLocalDate.toEpochDay)
    check("ts", t => t._5.getTime * 1000 + (t._5.getNanos / 1000) % 1000)
    check("dec", t => (t._6 * 100).toLongExact)
    check("b", t => if (t._7) 1L else 0L)
  }

  test("multi-column guards: non-flippable mixed fields and nullable fields stay windows") {
    // a STRING field against the grain has no order-reversing
    // transform — must stay a window
    val named = base.withColumn("name", concat(lit("n"), $"id"))
    val wMixed = Window.partitionBy($"key").orderBy($"score".desc, $"name".asc)
    val mixed = named.withColumn("rn", row_number().over(wMixed)).filter($"rn" <= 3)
    assert(!physical(mixed).contains("TopKPerKey"),
      "string field against the grain must not rewrite — no reversing transform")
    val nullable = Seq[(Long, String, java.lang.Long)](
      (1L, "a", 1L), (2L, "a", null), (3L, "a", 2L))
      .toDF("id", "key", "score")
    val wNull = Window.partitionBy($"key").orderBy($"score".desc, $"id".desc)
    val qn = nullable.withColumn("rn", row_number().over(wNull)).filter($"rn" <= 2)
    assert(!physical(qn).contains("TopKPerKey"),
      "nullable field in a multi-column ordering must not rewrite")
    // dense over a multi-column ordering with a FLOATING field: struct
    // byte-equality would split the -0.0/0.0 value class — must refuse
    val floaty = (1 to 20).map(i => (i.toLong, "a", i / 7.0)).toDF("id", "key", "score")
    val qd = floaty.withColumn("dr", dense_rank().over(
        Window.partitionBy($"key").orderBy($"score".desc, $"id".desc)))
      .filter($"dr" <= 2)
    assert(!physical(qd).contains("TopKPerKey"),
      "dense multi-column with a double field must not rewrite")
    // same hazard one level down: a SINGLE struct-typed order column
    // with a NESTED double — the -0.0 can't be normalized inside the
    // struct bytes, so dense must refuse recursively, not just at the
    // top level
    val qsn = floaty.withColumn("sk", struct($"score", $"id"))
      .withColumn("dr", dense_rank().over(
        Window.partitionBy($"key").orderBy($"sk".desc)))
      .filter($"dr" <= 2)
    assert(!physical(qsn).contains("TopKPerKeyDense"),
      "dense over a struct order with a nested double must not rewrite")
  }

  test("rn = k and conjoined predicates: bound extracted, residual filter preserved") {
    val w = Window.partitionBy($"key").orderBy($"id".asc)
    val q = base.withColumn("rn", row_number().over(w))
      .filter($"rn" === 2 && $"score" >= 0)
    assert(physical(q).contains("TopKPerKey"), s"rn = k did not rewrite:\n${physical(q)}")
    val got = q.select($"key", $"id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expect = (1 to 300).map(i => ("k" + (i % 7), i.toLong))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sorted.apply(1)) }.toSet
    assert(got == expect, "rn = 2 must keep exactly the second-smallest id per key")
  }
}
