package graft.merge

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The README merge golden (`README.md:285-307`, re-authored): userinfo ⋈
  * user on user_id = userid; right-overwrites-left; left vs full outer.
  */
class MergeJobSpec extends SparkSpec {
  import spark.implicits._

  // README example shape: userinfo(user_id, sex) ⋈ user(userid, addr)
  private def userinfo = Seq(("b111", "f"), ("b222", "m"), ("b333", "f"))
    .toDF("user_id", "sex")
  private def user = Seq(("b111", "addr1"), ("b222", "addr2"), ("c222", "addr9"))
    .toDF("userid", "addr")

  test("left-outer merge (code semantics): unmatched probe rows kept, right-only dropped") {
    val out = MergeJob.merge(userinfo, user, "user_id", "userid", "left")
    assert(out.columns.toSeq == Seq("user_id", "sex", "userid", "addr"))
    val rows = out.orderBy("user_id").collect()
    assert(rows.length == 3)
    assert(rows(2) == Row("b333", "f", null, null)) // unmatched keeps {} merge
  }

  test("full-outer merge (README-documented semantics): right-only row appears") {
    val out = MergeJob.merge(userinfo, user, "user_id", "userid", "full")
    assert(out.count() == 4)
    val rightOnly = out.filter($"userid" === "c222").collect()
    assert(rightOnly.length == 1)
    assert(rightOnly(0).getAs[String]("addr") == "addr9")
    assert(rightOnly(0).getAs[String]("user_id") == null)
  }

  test("column conflict: right overwrites left, left survives for unmatched rows") {
    val l = Seq(("k1", "lv1"), ("k2", "lv2")).toDF("k", "v")
    val r = Seq(("k1", "rv1")).toDF("k2", "v")
    val out = MergeJob.merge(l, r, "k", "k2", "left").orderBy("k")
    val vals = out.select("k", "v").as[(String, String)].collect().toMap
    assert(vals == Map("k1" -> "rv1", "k2" -> "lv2"))
  }

  test("join keys string-coerced with integral-float collapse: 3.0 matches 3") {
    val l = Seq((3.0, "left3"), (4.5, "left45")).toDF("k", "lv")
    val r = Seq((3L, "right3"), (4L, "right4")).toDF("k2", "rv")
    val out = MergeJob.merge(l, r, "k", "k2", "left").orderBy("k")
    val got = out.select("lv", "rv").as[(String, String)].collect().toSeq
    assert(got == Seq(("left3", "right3"), ("left45", null)))
  }

  test("broadcast hint applies on left join") {
    val l = Seq((1, "a")).toDF("k", "v")
    val r = Seq((1, "b")).toDF("k2", "w")
    val out = MergeJob.merge(l, r, "k", "k2", "left", broadcastRight = true)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
