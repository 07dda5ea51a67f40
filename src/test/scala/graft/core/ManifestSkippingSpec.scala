package graft.core

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-15 verdict task 1 STRETCH: manifest-level data skipping.
  * Writers record per-column min/max envelopes ([[ColStat]], from
  * parquet footers) into each [[FileStat]] at commit time;
  * [[ManifestFileIndex.listFiles]] consults them via
  * [[ManifestSkipping]] to drop files whose envelope cannot satisfy
  * the pushed data filters — zero filesystem calls, before the scan.
  *
  * The property under test everywhere here is the CONSERVATISM
  * contract: skipping changes file counts, never results. Each
  * end-to-end case asserts value parity against the legacy (unskipped)
  * read AND the file-count change, so a false skip (data loss) and a
  * dead evaluator (no skipping) both fail.
  */
class ManifestSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def attr(name: String, dt: DataType): AttributeReference =
    AttributeReference(name, dt)()

  private def clit(v: Any, dt: DataType): Literal = Literal(v, dt)
  private def slit(x: String): Literal = Literal(UTF8String.fromString(x), StringType)

  // -------------------------------------------------------------- unit

  test("string truncation bounds: min is a byte-wise lower bound, max a strict upper bound") {
    val long = "prefix-shared-0123456789-SUFFIX-THAT-DIFFERS"
    val mn = ParquetStats.truncateMin(long)
    assert(mn.length == ParquetStats.MaxStringLen)
    assert(ParquetStats.cmpUtf8(mn, long) <= 0)
    val mx = ParquetStats.truncateMax(long).get
    assert(ParquetStats.cmpUtf8(mx, long) > 0)
    // surrogate pairs never split: a 4-byte code point at the cut
    val emoji = "x" * (ParquetStats.MaxStringLen - 1) + "😀" + "tail"
    val mn2 = ParquetStats.truncateMin(emoji)
    assert(ParquetStats.cmpUtf8(mn2, emoji) <= 0)
    assert(!Character.isHighSurrogate(mn2.last))
    val mx2 = ParquetStats.truncateMax(emoji).get
    assert(ParquetStats.cmpUtf8(mx2, emoji) > 0)
    // a maxed-out last code point carries the increment leftward
    val maxed = "ab" + new String(Character.toChars(0x10FFFF)) * ParquetStats.MaxStringLen
    val mx3 = ParquetStats.truncateMax(maxed)
    assert(mx3.exists(m => ParquetStats.cmpUtf8(m, maxed) > 0))
    // all code points maxed: no upper bound derivable
    val hopeless = new String(Character.toChars(0x10FFFF)) * (ParquetStats.MaxStringLen + 2)
    assert(ParquetStats.truncateMax(hopeless).isEmpty)
    // short strings pass through exact
    assert(ParquetStats.truncateMin("abc") == "abc")
    assert(ParquetStats.truncateMax("abc").contains("abc"))
  }

  test("mayMatch proves skips only where the envelope allows — every handled shape") {
    val id = attr("id", LongType)
    val cols = Seq(ColStat("id", 'i', Some("100"), Some("200"), 0L))
    def may(e: Expression, cs: Seq[ColStat] = cols, rc: Long = 50L): Boolean =
      ManifestSkipping.mayMatch(Seq(e), rc, cs)
    // equality
    assert(!may(EqualTo(id, clit(99L, LongType))))
    assert(may(EqualTo(id, clit(100L, LongType))))
    assert(may(EqualTo(clit(150L, LongType), id)))
    assert(!may(EqualTo(clit(201L, LongType), id)))
    // a comparison with a NULL literal can never be satisfied
    assert(!may(EqualTo(id, clit(null, LongType))))
    // ranges, both orders, strict and or-equal
    assert(!may(GreaterThan(id, clit(200L, LongType)))) // need >200, max=200
    assert(may(GreaterThanOrEqual(id, clit(200L, LongType))))
    assert(!may(LessThan(id, clit(100L, LongType))))
    assert(may(LessThanOrEqual(id, clit(100L, LongType))))
    assert(!may(GreaterThan(clit(100L, LongType), id))) // 100 > id ⇔ id < 100
    assert(may(GreaterThan(clit(101L, LongType), id)))
    // IN: skip only when EVERY value misses
    assert(!may(In(id, Seq(clit(1L, LongType), clit(99L, LongType)))))
    assert(may(In(id, Seq(clit(1L, LongType), clit(150L, LongType)))))
    assert(!may(InSet(id, Set(1L, 99L))))
    assert(may(InSet(id, Set(1L, 150L))))
    // null shapes
    assert(!may(IsNull(id))) // nullCount = 0
    val nullable = Seq(ColStat("id", 'i', Some("100"), Some("200"), 5L))
    assert(may(IsNull(id), nullable))
    val allNull = Seq(ColStat("id", 'i', None, None, 50L))
    assert(!may(IsNotNull(id), allNull)) // nc == rc
    assert(!may(EqualTo(id, clit(150L, LongType)), allNull))
    assert(may(IsNotNull(id), allNull, rc = -1L)) // rc unknown: keep
    // AND: one provably-false conjunct skips; OR needs both arms
    assert(!may(And(IsNotNull(id), EqualTo(id, clit(99L, LongType)))))
    assert(may(Or(EqualTo(id, clit(99L, LongType)), EqualTo(id, clit(150L, LongType)))))
    assert(!may(Or(EqualTo(id, clit(99L, LongType)), EqualTo(id, clit(201L, LongType)))))
    // unknown shapes / type mismatches / missing columns keep the file
    assert(may(Not(EqualTo(id, clit(150L, LongType)))))
    // narrower integral literals share the Long domain: provable
    assert(!may(EqualTo(id, clit(99, IntegerType))))
    // a cross-domain literal (double vs integral envelope) is NOT provable
    assert(may(EqualTo(id, clit(99.0d, DoubleType))))
    assert(may(EqualTo(attr("other", LongType), clit(1L, LongType))))
    assert(ManifestSkipping.mayMatch(Seq(EqualTo(id, clit(99L, LongType))), -1L, Nil))
    // strings: equality against bounds + StartsWith
    val s = attr("v", StringType)
    val sCols = Seq(ColStat("v", 's', Some("bbb"), Some("mmm"), 0L))
    assert(!may(EqualTo(s, slit("aaa")), sCols))
    assert(may(EqualTo(s, slit("ccc")), sCols))
    assert(!may(EqualTo(s, slit("zzz")), sCols))
    assert(!may(StartsWith(s, slit("a")), sCols)) // min "bbb" > "a", no "a" prefix
    assert(may(StartsWith(s, slit("b")), sCols))
    assert(may(StartsWith(s, slit("mmm")), sCols)) // min ≤ "mmm" ≤ max
    assert(!may(StartsWith(s, slit("n")), sCols))  // max "mmm" < "n"
    // columns differing only in case are DISTINCT (caseSensitive=true
    // schemas): `x`'s envelope must answer for `x`, never `X`'s —
    // conflating them could skip a file that holds matching rows
    val caseCols = Seq(
      ColStat("x", 'i', Some("1"), Some("10"), 0L),
      ColStat("X", 'i', Some("100"), Some("200"), 0L))
    assert(may(EqualTo(attr("x", LongType), clit(5L, LongType)), caseCols))
    assert(!may(EqualTo(attr("x", LongType), clit(50L, LongType)), caseCols))
    assert(may(EqualTo(attr("X", LongType), clit(150L, LongType)), caseCols))
    assert(!may(EqualTo(attr("X", LongType), clit(5L, LongType)), caseCols))
  }

  test("serialize/deserialize round-trips column envelopes exactly; malformed blob degrades, never fails") {
    val st = Seq(
      FileStat("a.parquet", 10L, 5L, Seq(
        ColStat("id", 'i', Some("-3"), Some("42"), 0L),
        ColStat("v", 's', Some(""), None, 2L),
        ColStat("w", 's', None, None, -1L),
        ColStat("f", 'f', Some("1.5E-4"), Some("2.0"), 1L))),
      FileStat("b.parquet", 20L), // stats-less rides alongside
      FileStat("c.parquet", 30L, 0L, Nil)) // row count only
    val m = Manifest(9, "day", Seq(ManifestEntry("2024-01-01", "g-x/day=2024-01-01", Nil, st)))
    assert(ManifestTable.deserialize(ManifestTable.serialize(m)).contains(m))
    // a sha-valid manifest whose blob is garbage: entry survives with
    // (name, len) and no envelopes — skipping is advisory
    val payload = "graft-manifest\t1\t3\t\n\tg-x\t\tf0.parquet#10#@@notb64@@\t\n"
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = ManifestTable.deserialize((s"sha256:$sha\n" + payload).getBytes("UTF-8"))
    assert(got.exists(_.entries.head.stats == Seq(FileStat("f0.parquet", 10L))))
  }

  test("a manifest pushed past the old stats budget goes segmented and KEEPS envelopes") {
    val root = new Path(tmpDir("skip-budget") + "/t")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // envelopes sized to overflow the old 8 MB inline budget: ~40k
    // files × ~300 B. Round 15 shed every envelope table-wide here;
    // round 17 commits SEGMENTED instead, so the skipping tier keeps
    // its stats at exactly the scale it was built for.
    val fat = (0 until 40000).map { i =>
      FileStat(f"part-$i%05d.parquet", 100L, 10L, Seq(
        ColStat("text", 's', Some("m" * 24), Some("n" * 24), 0L),
        ColStat("id", 'i', Some(i.toString), Some((i + 1).toString), 0L),
        ColStat("ts", 't', Some("1700000000000000"), Some("1700000086400000"), 0L)))
    }
    val m = ManifestTable.commit(fs, root, "",
      Map("" -> Some(ManifestEntry("", "g-fat", Nil, fat))))
    assert(m.segRefs.nonEmpty, "past the inline budget the commit must segment")
    assert(m.entries.head.stats.size == 40000)
    assert(m.entries.head.stats.forall(s => s.cols.nonEmpty && s.rowCount >= 0),
      "segmentation must PRESERVE envelopes (the old format shed them all here)")
    val resolved = ManifestTable.resolve(fs, root).get
    assert(resolved.entries.head.stats.map(s => (s.name, s.len)) ==
      fat.map(s => (s.name, s.len)))
    assert(resolved.entries.head.stats.head.cols.size == 3)
  }

  test("a single monster bucket past the segment budget sheds bucket-locally") {
    val root = new Path(tmpDir("skip-budget-shed") + "/t")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val prev = ManifestTable.SegmentShedBytes
    ManifestTable.SegmentShedBytes = 64 << 10 // force the backstop on small data
    try {
      val fatPart = (0 until 2000).map(i =>
        FileStat(f"part-$i%05d.parquet", 100L, 10L,
          Seq(ColStat("id", 'i', Some(i.toString), Some((i + 1).toString), 0L))))
      val slim = (0 until 40).map(i =>
        FileStat(f"part-$i%05d.parquet", 100L, 10L,
          Seq(ColStat("id", 'i', Some(i.toString), Some((i + 1).toString), 0L))))
      // many small parts + one monster part; thresholds shrunk so the
      // table segments and ONLY the monster's bucket exceeds its budget
      val segPrev = (ManifestTable.SegmentizeBytes, ManifestTable.SegmentTargetBytes)
      ManifestTable.SegmentizeBytes = 32 << 10
      ManifestTable.SegmentTargetBytes = 16 << 10
      try {
        val updates: Map[String, Option[ManifestEntry]] =
          (0 until 50).map(i =>
            f"d$i%02d" -> Some(ManifestEntry(f"d$i%02d", f"day=d$i%02d", Nil, slim))).toMap +
            ("dfat" -> Some(ManifestEntry("dfat", "day=dfat", Nil, fatPart)))
        val m = ManifestTable.commit(fs, root, "day", updates)
        assert(m.segRefs.nonEmpty)
        val resolved = ManifestTable.resolve(fs, root).get
        val fat = resolved.entries.find(_.part == "dfat").get
        assert(fat.stats.forall(s => s.cols.isEmpty && s.rowCount < 0),
          "the monster bucket must shed ITS envelopes")
        assert(fat.stats.map(s => (s.name, s.len)) == fatPart.map(s => (s.name, s.len)),
          "the load-bearing (name, len) listing must survive the shed")
        // every OTHER bucket keeps its envelopes — unlike the old
        // table-wide strip (the shed is bucket-granular, so slim parts
        // sharing the monster's bucket legitimately shed with it)
        val b = resolved.segRefs.head.of
        val fatBucket = ManifestTable.bucketOf("dfat", b)
        val others = resolved.entries.filterNot(e =>
          ManifestTable.bucketOf(e.part, b) == fatBucket)
        assert(others.nonEmpty && others.forall(_.stats.forall(_.cols.nonEmpty)))
      } finally {
        ManifestTable.SegmentizeBytes = segPrev._1
        ManifestTable.SegmentTargetBytes = segPrev._2
      }
    } finally ManifestTable.SegmentShedBytes = prev
  }

  // ------------------------------------------------------- end to end

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

  /** day-partitioned manifested table: 10 days × 100 events, one file
    * per day, ts inside the day, text with a >MaxStringLen shared
    * prefix (truncation pressure on the string envelope).
    */
  private lazy val layout: String = {
    val dir = tmpDir("skip-e2e") + "/events"
    val base = to_date(lit("2024-03-01"))
    val day = date_add(base, (col("id") % 10).cast("int"))
    val df = spark.range(0, 1000).select(
      col("id"),
      (col("id") % 17).cast("double").as("value"),
      concat(lit("shared-prefix-0123456789-doc-"),
        format_string("%04d", col("id"))).as("text"),
      to_timestamp(concat(day.cast("string"),
        when(col("id") % 2 === 0, lit(" 06:00:00"))
          .otherwise(lit(" 18:00:00")))).as("ts"),
      day.as("day"))
    withMicros {
      ManifestWrite.write(df.repartition(col("day")), dir, "day", SaveMode.Overwrite)
    }
    dir
  }

  private def scansIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scansIn(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scansIn(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(scansIn)
    }

  private def scanOf(df: DataFrame): FileSourceScanExec = {
    df.collect()
    scansIn(df.queryExecution.executedPlan).head
  }

  private def filesRead(df: DataFrame): Long = scanOf(df).metrics("numFiles").value

  private def sortedCols(df: DataFrame): DataFrame =
    df.select(df.columns.sorted.map(col).toSeq: _*)

  private def parity(dir: String, partCol: String,
      filter: org.apache.spark.sql.Column): Unit = {
    val skipped = sortedCols(ManifestFileIndex.relation(spark, dir, partCol)).filter(filter)
    val legacy = sortedCols(ManifestTable.read(spark, dir, partCol = partCol)).filter(filter)
    val a = skipped.collect().map(_.toString).sorted.toSeq
    val b = legacy.collect().map(_.toString).sorted.toSeq
    assert(a == b, s"skipping changed results for $filter")
  }

  test("commit records footer envelopes: every parquet file carries id/value/text/ts stats") {
    val fs = new Path(layout).getFileSystem(spark.sessionState.newHadoopConf())
    val m = ManifestTable.resolve(fs, new Path(layout)).get
    assert(m.entries.size == 10)
    m.entries.foreach { e =>
      assert(e.stats.nonEmpty)
      e.stats.foreach { s =>
        assert(s.rowCount == 100L, s"rowCount ${s.rowCount} for ${e.part}/${s.name}")
        val byCol = s.cols.map(c => c.col -> c).toMap
        assert(byCol("id").tag == 'i' && byCol("id").min.isDefined)
        assert(byCol("value").tag == 'f')
        assert(byCol("text").tag == 's' &&
          byCol("text").min.get.length <= ParquetStats.MaxStringLen)
        assert(byCol("ts").tag == 't')
        assert(s.cols.forall(_.nullCount == 0L))
      }
    }
  }

  test("ts range with NO partition predicate: 7 of 10 files skipped, values exact") {
    val f = col("ts") >= lit("2024-03-04").cast("timestamp") &&
      col("ts") < lit("2024-03-07").cast("timestamp")
    parity(layout, "day", f)
    val n = filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(f))
    assert(n == 3, s"expected 3 of 10 files after ts skipping, scan read $n")
    // control: the same read WITHOUT the filter touches all 10
    val all = filesRead(ManifestFileIndex.relation(spark, layout, "day"))
    assert(all == 10, s"fixture should hold 10 files, scan read $all")
  }

  test("equality on a non-partition long column: covering envelopes keep, misses skip, values exact") {
    // ids are spread mod 10 across days, so every file's id envelope
    // [day, 990+day] covers 42 — the conservative KEEP side
    val f = col("id") === 42L
    parity(layout, "day", f)
    val n = filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(f))
    assert(n == 10, s"id envelopes cover 42 everywhere; fewer would be a FALSE skip: $n")
    // an out-of-range id proves the skip side: nothing can match
    val g = col("id") === 5000L
    parity(layout, "day", g)
    val z = filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(g))
    assert(z == 0, s"id=5000 is outside every envelope, scan read $z files")
  }

  test("string equality under truncated bounds: inside kept, outside skipped, parity both ways") {
    // every file's text bounds truncate at 24 chars of the 29-char
    // shared prefix — the adversarial case for a naive (non-envelope)
    // truncation
    val inside = col("text") === "shared-prefix-0123456789-doc-0042"
    parity(layout, "day", inside)
    assert(filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(inside)) == 10,
      "truncated envelopes cover every in-prefix value — a skip would be FALSE")
    val below = col("text") === "aaa"
    parity(layout, "day", below)
    assert(filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(below)) == 0)
    val above = col("text") === "zzz"
    parity(layout, "day", above)
    assert(filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(above)) == 0)
    val prefix = col("text").startsWith("shared-prefix")
    parity(layout, "day", prefix)
    assert(filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(prefix)) == 10)
    val deadPrefix = col("text").startsWith("zzz")
    parity(layout, "day", deadPrefix)
    assert(filesRead(ManifestFileIndex.relation(spark, layout, "day").filter(deadPrefix)) == 0)
  }

  test("all-null and no-null columns: IsNull / IsNotNull skip from null counts, values exact") {
    val dir = tmpDir("skip-nulls") + "/t"
    def half(lo: Long, hi: Long, nullHalf: Boolean) =
      spark.range(lo, hi).select(
        col("id"),
        (if (nullHalf) lit(null).cast("string") else lit("x")).as("half"),
        lit(null).cast("long").as("void"))
    // two appended generations, one file each: deterministic placement
    ManifestWrite.write(half(0, 50, nullHalf = true).coalesce(1), dir, "", SaveMode.Append)
    ManifestWrite.write(half(50, 100, nullHalf = false).coalesce(1), dir, "", SaveMode.Append)
    def rel = ManifestFileIndex.relation(spark, dir, "")
    def legacyRows(c: org.apache.spark.sql.Column) =
      sortedCols(ManifestTable.read(spark, dir)).filter(c)
        .collect().map(_.toString).sorted.toSeq
    def skipRows(c: org.apache.spark.sql.Column) =
      sortedCols(rel).filter(c).collect().map(_.toString).sorted.toSeq
    assert(skipRows(col("half").isNotNull) == legacyRows(col("half").isNotNull))
    assert(filesRead(rel.filter(col("half").isNotNull)) == 1,
      "the all-null file should be skipped for IsNotNull")
    assert(skipRows(col("half").isNull) == legacyRows(col("half").isNull))
    assert(filesRead(rel.filter(col("half").isNull)) == 1,
      "the no-null file should be skipped for IsNull")
    // a column that is all-null EVERYWHERE: equality can never match
    assert(skipRows(col("void") === 7L) == legacyRows(col("void") === 7L))
    assert(filesRead(rel.filter(col("void") === 7L)) == 0)
  }

  test("stats-less (pre-upgrade) entries are never skipped — and mixed tables stay exact") {
    val dir = tmpDir("skip-legacy") + "/t"
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    spark.range(0, 50).selectExpr("id", "cast(id as double) v")
      .write.parquet(new Path(root, "g-old").toString)
    fs.delete(new Path(new Path(root, "g-old"), "_SUCCESS"), false)
    ManifestTable.commit(fs, root, "",
      Map("g-old" -> Some(ManifestEntry("g-old", "g-old", Nil)))) // NO stats at all
    ManifestWrite.write(
      spark.range(100, 150).selectExpr("id", "cast(id as double) v").coalesce(1),
      dir, "", SaveMode.Append) // stats-bearing generation
    val rel = ManifestFileIndex.relation(spark, dir, "")
    val f = col("id") < 10L
    val got = rel.filter(f).as[(Long, Double)].collect().toMap
    assert(got == (0L until 10L).map(i => i -> i.toDouble).toMap,
      "legacy files must survive skipping untouched")
    // the stats-bearing file IS skippable for this filter; the legacy
    // generation is listed and kept in full
    val n = filesRead(rel.filter(f))
    val total = filesRead(rel)
    assert(n == total - 1, s"exactly the stats-bearing file should skip: read $n of $total")
  }

  test("mergeSchema + skipping: filters on a later-added column never skip files that predate it") {
    val dir = tmpDir("skip-evolve") + "/t"
    // generation 1: (id, v) — no `added` column, but HAS envelopes
    ManifestWrite.write(spark.range(0, 50)
      .selectExpr("id", "cast(id as double) v").coalesce(1),
      dir, "", SaveMode.Append)
    // generation 2: (id, v, added)
    ManifestWrite.write(spark.range(100, 150)
      .selectExpr("id", "cast(id as double) v", "id % 5 as added").coalesce(1),
      dir, "", SaveMode.Append)
    val rel = ManifestFileIndex.relation(spark, dir, "", mergeSchema = true)
    // `added IS NULL` matches every pre-evolution row: the old file has
    // envelopes but NONE for `added` — it must be kept, not skipped
    val nulls = rel.filter(col("added").isNull).select("id")
      .as[Long].collect().sorted.toSeq
    assert(nulls == (0L until 50L), s"pre-evolution rows lost: $nulls")
    // an equality on `added` can still SKIP the new file when out of
    // range, while the old file (no envelope for the column) is kept
    val n = filesRead(rel.filter(col("added") === 99L))
    assert(n == 1, s"expected only the pre-evolution file kept, read $n")
    assert(rel.filter(col("added") === 99L).count() == 0)
    // value parity for an in-range equality
    assert(rel.filter(col("added") === 3L).select("id").as[Long].collect().sorted.toSeq ==
      (100L until 150L).filter(_ % 5 == 3))
  }

  test("q149 runs green end-to-end and skips: the catalog query's own file-count proof") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.operators.StorageOps.manifestSkipRollup(spark, dir)
    val out = df.collect()
    assert(out.nonEmpty)
    val scan = scanOf(graft.operators.StorageOps.manifestSkipRollup(spark, dir))
    val n = scan.metrics("numFiles").value
    assert(n == 3, s"q149's 3-day ts window should read 3 of 30 files, read $n")
  }
}
