package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("secureFilename strips separators/hostile chars, collapses runs, trims edges") {
    val got = Seq(
      "../../etc/passwd",
      "my file (1).csv",
      "tab\tand*star",
      "..hidden..",
      "中文 名字.txt",
    ).toDF("s").select(Normalize.secureFilename($"s")).as[String].collect().toSeq
    assert(got == Seq(
      "etc_passwd",
      "my_file_1_.csv",
      "tab_and_star",
      "hidden",
      "中文_名字.txt",
    ))
  }

  test("ClickHouse datetime clamp: out-of-range in EITHER direction → min (reference format_data_range)") {
    val rows = Seq(
      Timestamp.valueOf("1950-06-01 12:00:00"),
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2106-01-01 00:00:00"), // exactly max: kept
      Timestamp.valueOf("2200-01-01 00:00:00"), // above max: → MIN, not max
      null,
    ).toDF("ts").select(Normalize.clampClickHouseDateTime($"ts").cast("string"))
      .as[String].collect().toSeq
    assert(rows == Seq(
      "1971-01-01 00:00:00", "2024-01-01 00:00:00", "2106-01-01 00:00:00",
      "1971-01-01 00:00:00", null))
  }

  test("JSON value encodings: bytes→base64, timestamp→ISO-8601") {
    val df = Seq((Array[Byte](1, 2, 254.toByte), Timestamp.valueOf("2024-03-05 06:07:08.123")))
      .toDF("b", "ts")
    val row = df.select(
      Normalize.bytesToJsonValue($"b"),
      Normalize.timestampToJsonValue($"ts")).head()
    assert(row.getString(0) == java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 254.toByte)))
    assert(row.getString(1) == "2024-03-05T06:07:08.123Z") // UTC session tz
  }

  test("rowFingerprint distinguishes null from empty and is stable") {
    val df = Seq(
      (Some(""), "x"), (None, "x"), (Some(""), "x"),
    ).toDF("a", "b")
    val fps = df.select(Normalize.rowFingerprint(Seq($"a", $"b"))).as[String].collect()
    assert(fps(0) == fps(2)) // identical rows agree
    assert(fps(0) != fps(1)) // null vs empty differ
  }

  test("rowFingerprint: separator inside a value cannot fake a field boundary") {
    // ("ab", "c") vs ("a", "bc"): same concatenation without
    // escaping — must fingerprint differently.
    val df = Seq(("ab", "c"), ("a", "bc"), ("a\\", "b"), ("a", "\\b"))
      .toDF("a", "b")
    val fps = df.select(Normalize.rowFingerprint(Seq($"a", $"b"))).as[String].collect()
    assert(fps.distinct.length == 4)
  }
}
