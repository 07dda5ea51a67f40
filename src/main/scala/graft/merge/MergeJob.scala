package graft.merge

import graft.core.Transform
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `Migration2DB` two-source merge (P9, SURVEY.md §3.2;
  * `d22d/task.py:183-328`) as a real join.
  *
  * Reference semantics reproduced exactly:
  *  - equi-join with both keys coerced to string
  *    (`d22d/task.py:257,262`), integral floats collapsed first
  *    (`format_value`, `task.py:23-28`) so `3.0` matches `3`;
  *  - on column-name conflict the RIGHT side wins, falling back to the
  *    left for unmatched probe rows (`task.py:322-328`) —
  *    `coalesce(right, left)`;
  *  - output schema = union of both sides' columns (`task.py:273-280`);
  *  - join type: the code implements LEFT OUTER; the README documents
  *    FULL OUTER (`README.md:285-307`). Both offered; left is default
  *    (code wins over doc — decision recorded in SURVEY §2.2 P9).
  *
  * Scale: the reference builds ALL of side 2 in driver memory — an
  * unbounded broadcast. Here the build side gets a `broadcast` hint only
  * when `broadcastRight` (caller knows it's a dim); otherwise Catalyst
  * picks broadcast-hash vs shuffle join from stats, and AQE re-plans at
  * runtime. Full-outer never broadcasts (Spark requirement) — sort-merge
  * on the key, the correct plan at scale.
  */
object MergeJob {

  def merge(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      joinType: String = "left", // "left" (code) | "full" (README)
      broadcastRight: Boolean = false,
  ): DataFrame = {
    val l = left.alias("l")
    val r0 = right.alias("r")
    val r = if (broadcastRight && joinType != "full") broadcast(r0) else r0
    val cond = Transform.joinKey(col(s"l.$leftKey")) === Transform.joinKey(col(s"r.$rightKey"))
    val joined = l.join(r, cond, joinType)

    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val common = leftCols.toSet.intersect(rightCols.toSet)
    // Union schema, left's column order first then right-only columns;
    // conflicts resolve right-over-left (coalesce for unmatched rows).
    val out: Seq[Column] =
      leftCols.map { c =>
        if (common(c)) coalesce(col(s"r.$c"), col(s"l.$c")).as(c) else col(s"l.$c").as(c)
      } ++ rightCols.filterNot(common).map(c => col(s"r.$c").as(c))
    joined.select(out: _*)
  }
}
