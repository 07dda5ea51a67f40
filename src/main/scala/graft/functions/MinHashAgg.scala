package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import java.security.MessageDigest

/** One-pass MinHash signature aggregator (UDAF): folds a group's
  * shingles into a k-wide signature in a single buffer — the typed
  * `Aggregator` replacement for k parallel `min(hash_i(s))` agg columns
  * (one buffer update per row instead of k independent agg states), with
  * map-side partial aggregation and spilling for free.
  *
  * Hash family is the project-wide md5 scheme (`i + ":" + shingle` →
  * first 15 md5 hex chars → 60-bit long), so signatures are bit-equal
  * to the Column formulation in [[graft.operators.TextPrims.hash64]]
  * and to the DuckDB oracle.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Seq[Long]] {

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  private def hash64(s: String): Long = {
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = hash64(s"$i:$shingle")
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** `minhash_sig(shingleCol)` as an aggregate Column. */
  def column(k: Int)(shingles: Column): Column =
    udaf(new MinHashAgg(k), Encoders.STRING).apply(shingles)
}
