package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual lever when AQE's skew-join
  * split isn't enough (e.g. one key holding 30% of a 100 TB fact
  * table):
  *
  *  - fact side: deterministic salt in [0, salts) derived from a hash
  *    of the whole row (spreads one hot key over `salts` reducers);
  *  - dim side: exploded to every salt value (dim grows ×salts — only
  *    viable for dimension-sized right sides);
  *  - join key becomes (key, salt) — same results, no hot partition.
  */
object SkewJoin {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      salts: Int = 16,
      joinType: String = "inner",
  ): DataFrame = {
    require(salts > 0)
    val saltCol = pmod(hash(fact.columns.map(col): _*), lit(salts))
    val f = fact.withColumn("__salt", saltCol)
    val d = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    f.join(d, f(factKey) === d(dimKey) && f("__salt") === d("__salt"), joinType)
      .drop("__salt")
  }
}
