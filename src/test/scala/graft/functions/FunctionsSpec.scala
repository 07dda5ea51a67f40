package graft.functions

import graft.SparkSpec
import graft.operators.TextPrims
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(2.0f, 4.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
  ).toDF("id", "a", "b")

  test("CosineSimilarity expression matches the composed zip_with/aggregate formula bit-for-bit") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val pairs = e.toDF("id1", "e1", "l1").crossJoin(e.toDF("id2", "e2", "l2"))
      .filter($"id1" < $"id2")
    val composed = TextPrims.cosineD("e1", "e2")
    val native = CosineSimilarity($"e1", $"e2")
    val diffs = pairs.select(composed.as("c"), native.as("n"))
      .filter($"c" =!= $"n") // bit-exact equality required
      .count()
    assert(diffs == 0)
  }

  test("CosineSimilarity evals correctly and survives codegen") {
    val out = vecs.select($"id", round(CosineSimilarity($"a", $"b"), 9).as("c"))
      .orderBy($"id").as[(Long, Double)].collect()
    assert(out(0)._2 == 1.0) // parallel vectors
    assert(out(1)._2 == 0.0) // orthogonal vectors
  }

  test("CosineSimilarity over DOUBLE arrays matches composed cosineD bit-for-bit") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pairs = e.toDF("id1", "v1").crossJoin(e.toDF("id2", "v2")).filter($"id1" < $"id2")
    val diffs = pairs
      .select(TextPrims.cosineD("v1", "v2").as("c"), CosineSimilarity($"v1", $"v2").as("n"))
      .filter($"c" =!= $"n").count()
    assert(diffs == 0)
  }

  test("DotProduct matches the composed zip_with/aggregate dot (mixed float x double) bit-for-bit") {
    val plane = (1 to 64).map(i => ((i * 37) % 2001 - 1000).toDouble)
      .mkString("array(", "D, ", "D)")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val composed = expr(
      s"aggregate(zip_with(embedding, $plane, (x, v) -> cast(x as double) * v), 0D, (a, v) -> a + v)")
    val diffs = e
      .select(composed.as("c"), DotProduct($"embedding", expr(plane)).as("n"))
      .filter($"c" =!= $"n").count()
    assert(diffs == 0)
  }

  test("Int8Cosine matches the composed aggregate/zip_with integer formula bit-for-bit") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
      .select($"vec_id", expr(
        """transform(embedding, x -> cast(floor(cast(x as double) *
          |(127.0D / array_max(transform(embedding, y -> abs(cast(y as double))))) + 0.5D) as bigint))""".stripMargin)
        .as("v"))
    val pairs = e.toDF("id1", "v1").crossJoin(e.toDF("id2", "v2")).filter($"id1" < $"id2")
    def idot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0L, (acc, t) -> acc + t)")
    val composed = idot("v1", "v2").cast("double") /
      (sqrt(idot("v1", "v1").cast("double")) * sqrt(idot("v2", "v2").cast("double")))
    val diffs = pairs.select(composed.as("c"), Int8Cosine($"v1", $"v2").as("n"))
      .filter($"c" =!= $"n").count() // bit-exact equality required
    assert(diffs == 0)
  }

  test("SquaredDistance matches the composed aggregate/zip_with L2 formula bit-for-bit") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pairs = e.toDF("id1", "v1").crossJoin(e.toDF("id2", "v2")).filter($"id1" < $"id2")
    val composed =
      expr("aggregate(zip_with(v1, v2, (x, y) -> (x - y) * (x - y)), 0D, (a, t) -> a + t)")
    val diffs = pairs.select(composed.as("c"), SquaredDistance($"v1", $"v2").as("n"))
      .filter($"c" =!= $"n").count()
    assert(diffs == 0)
    // hand case + codegen survival
    val out = Seq((Array(1.0, 2.0), Array(3.0, 0.0))).toDF("a", "b")
      .select(SquaredDistance($"a", $"b")).as[Double].head()
    assert(out == 8.0)
  }

  test("native vector expressions propagate NULL on length mismatch and null elements (HOF parity)") {
    // the composed zip_with/aggregate forms NULL out on ragged or
    // null-element input; the native replacements must do the same,
    // never a silently truncated sum
    val df = Seq(
      ("ragged", Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 2.0, 3.0)),
      ("nullelem", Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      ("ok", Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
    ).toDF("k", "a", "b")
    val out = df.select($"k",
      DotProduct($"a", $"b").as("dot"),
      SquaredDistance($"a", $"b").as("sq"),
      CosineSimilarity($"a", $"b").as("cos"))
      .collect().map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(out("ragged") == ((true, true, true)))
    assert(out("nullelem") == ((true, true, true)))
    assert(out("ok") == ((false, false, false)))

    val li = Seq(
      ("ragged", Seq[java.lang.Long](1L), Seq[java.lang.Long](1L, 2L)),
      ("nullelem", Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L)),
      ("ok", Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),
    ).toDF("k", "a", "b")
    val outI = li.select($"k", Int8Cosine($"a", $"b").as("ic"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(outI("ragged") && outI("nullelem") && !outI("ok"))
  }

  test("ArrayJaccard matches size(intersect)/size(union) bit-for-bit over corpus shingles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
      .select($"doc_id", TextPrims.shingles3(split($"text", " ")).as("sh"))
      .filter(size(split($"text", " ")) >= 3)
    val pairs = docs.toDF("id1", "s1").crossJoin(docs.toDF("id2", "s2"))
      .filter($"id1" < $"id2")
    val composed = size(array_intersect($"s1", $"s2")).cast("double") /
      size(array_union($"s1", $"s2"))
    val diffs = pairs.select(composed.as("c"), ArrayJaccard($"s1", $"s2").as("n"))
      .filter($"c" =!= $"n").count()
    assert(diffs == 0)
  }

  test("ArrayJaccard edge cases: duplicates are set-collapsed, empty arrays, nulls ignored") {
    val df = Seq(
      (1L, Seq("a", "a", "b"), Seq("b", "b", "c")), // sets {a,b} {b,c} → 1/3
      (2L, Seq.empty[String], Seq("x")),            // 0/1 → 0
      (3L, Seq.empty[String], Seq.empty[String]),   // 0/0 → 0 by convention
    ).toDF("id", "a", "b")
    val out = df.select($"id", round(ArrayJaccard($"a", $"b"), 6).as("j"))
      .orderBy($"id").as[(Long, Double)].collect()
    assert(out(0)._2 == math.round(1.0 / 3 * 1e6) / 1e6)
    assert(out(1)._2 == 0.0)
    assert(out(2)._2 == 0.0)
  }

  test("RollingMinHash matches brute-force per-window polynomial; null under window") {
    def brute(s: String, w: Int = 8, b: Long = 31L): Option[Long] = {
      val bytes = s.getBytes("UTF-8")
      if (bytes.length < w) None
      else Some(bytes.sliding(w).map(_.foldLeft(0L)((h, c) => h * b + (c & 0xFFL))).min)
    }
    val docs = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaa", "exactly8", "short", "z" * 200 + "abcdefgh" + "z" * 200)
    val got = docs.toDF("s")
      .select(RollingMinHash($"s").as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == docs.map(brute(_)))
    // interpreted eval path agrees with codegen
    docs.foreach { s =>
      val e = RollingMinHash(
        org.apache.spark.sql.catalyst.expressions.Literal(s),
        RollingMinHash.DefaultWindow, RollingMinHash.DefaultBase)
      val interp = Option(e.eval(null)).map(_.asInstanceOf[Long])
      assert(interp == brute(s), s"interpreted eval mismatch for '$s'")
    }
  }

  test("MinHashAgg signature equals the k-column min formulation") {
    val shingles = Seq(
      (1L, "a b c"), (1L, "b c d"), (1L, "c d e"),
      (2L, "x y z"), (2L, "a b c"),
    ).toDF("doc_id", "s")
    val viaAgg = shingles.groupBy($"doc_id")
      .agg(MinHashAgg.column(8)($"s").as("sig"))
    val viaCols = shingles.groupBy($"doc_id").agg(
      min(TextPrims.hash64(concat(lit("0:"), $"s"))).as("m0"),
      (1 until 8).map(i => min(TextPrims.hash64(concat(lit(s"$i:"), $"s"))).as(s"m$i")): _*)
    val joined = viaAgg.join(viaCols, "doc_id")
    val bad = joined.filter(
      (0 until 8).map(i => element_at($"sig", i + 1) =!= col(s"m$i")).reduce(_ || _))
    assert(bad.count() == 0)
  }

  test("GraftExtensions: SQL functions usable after registration") {
    GraftExtensions.register(spark)
    val cos = spark.sql(
      "SELECT graft_cosine(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(1.0 as float), cast(0.0 as float))) AS c").head().getDouble(0)
    assert(cos == 1.0)
    val h = spark.sql("SELECT graft_hash64('abc') AS h").head().getLong(0)
    assert(h == 648541476951500027L) // the round-1 parity probe value
    // and graft_hash64 agrees with the Column-side primitive everywhere
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    docs.createOrReplaceTempView("graft_fn_docs")
    val viaSql = spark.sql("SELECT doc_id, graft_hash64(text) AS h FROM graft_fn_docs")
    val viaCol = docs.select($"doc_id", TextPrims.hash64($"text").as("h2"))
    assert(viaSql.join(viaCol, "doc_id").filter($"h" =!= $"h2").count() == 0)
    // rolling minhash via SQL == the Column-side expression
    val viaSqlRmh = spark.sql(
      "SELECT doc_id, graft_rolling_minhash(text) AS f FROM graft_fn_docs")
    val viaColRmh = docs.select($"doc_id", RollingMinHash($"text").as("f2"))
    assert(viaSqlRmh.join(viaColRmh, "doc_id").filter(
      $"f".isNotNull && $"f" =!= $"f2").count() == 0)
    // bloom: build a sketch of half the ids, the other half mostly misses
    docs.limit(50).createOrReplaceTempView("graft_fn_bloom_in")
    val hit = spark.sql(
      """WITH b AS (SELECT graft_bloom_agg(xxhash64(text)) AS bf FROM graft_fn_bloom_in)
        |SELECT count(*) AS n FROM graft_fn_docs
        |WHERE graft_might_contain((SELECT bf FROM b), xxhash64(text))""".stripMargin)
      .head().getLong(0)
    assert(hit >= 50, "bloom must contain every inserted value (no false negatives)")
  }
}
