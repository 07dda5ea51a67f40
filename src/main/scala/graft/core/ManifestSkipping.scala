package graft.core

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Read-side half of manifest-level data skipping: decide, from a
  * file's recorded [[ColStat]] envelopes alone, whether the file MAY
  * hold a row satisfying the query's pushed data filters — the test
  * `ManifestFileIndex.listFiles` applies before a file enters the scan
  * (same seam Delta's `DataSkippingReader` and Iceberg's manifest
  * evaluator occupy).
  *
  * Conservatism contract (the only correctness property this module
  * has): `mayMatch == false` is returned ONLY when the envelope PROVES
  * no row can satisfy the filters. Every unrecognized expression
  * shape, type mismatch, missing bound, or unknown null count yields
  * `true` (keep the file). Skipping therefore never changes results —
  * `ManifestSkippingSpec` proves value parity against unskipped reads
  * on every shape below, plus adversarial truncation cases.
  *
  * Handled shapes (attribute vs literal, both orders): =, <=>, <, <=,
  * >, >=, IN/INSET, IsNull, IsNotNull, StartsWith, AND (conjuncts may
  * each prove a skip), OR (both arms must prove it), NOT (bail).
  * Null semantics: a comparison with a NULL literal can never be
  * satisfied (skip); IsNull skips files with zero recorded nulls;
  * IsNotNull skips provably all-null files.
  */
object ManifestSkipping {

  /** May any row of a file with these stats satisfy ALL `filters`?
    * `rowCount < 0` means unknown.
    */
  def mayMatch(filters: Seq[Expression], rowCount: Long,
      cols: Seq[ColStat]): Boolean = {
    if (cols.isEmpty && rowCount < 0) return true
    filters.forall(f => may(f, cols, rowCount))
  }

  /** EXACT name match: the filter attribute carries the relation
    * schema's casing, which came from the same parquet footers the
    * envelope names did — so exact equality is both sufficient and
    * the only safe choice (case-folding could conflate columns that
    * differ only in case under spark.sql.caseSensitive=true, turning
    * a skip into silent row loss). Linear scan: envelopes cap at
    * [[ParquetStats.MaxCols]] entries, no per-file map allocation.
    */
  private def statOf(cols: Seq[ColStat], a: Attribute): Option[ColStat] =
    cols.find(_.col == a.name)

  private def may(e: Expression, s: Seq[ColStat], rc: Long): Boolean =
    e match {
      case And(l, r) => may(l, s, rc) && may(r, s, rc)
      case Or(l, r)  => may(l, s, rc) || may(r, s, rc)
      case EqualTo(a: Attribute, Literal(v, dt)) => eqMay(s, rc, a, v, dt)
      case EqualTo(Literal(v, dt), a: Attribute) => eqMay(s, rc, a, v, dt)
      case EqualNullSafe(a: Attribute, Literal(v, dt)) =>
        if (v == null) nullMay(s, rc, a) else eqMay(s, rc, a, v, dt)
      case EqualNullSafe(Literal(v, dt), a: Attribute) =>
        if (v == null) nullMay(s, rc, a) else eqMay(s, rc, a, v, dt)
      case GreaterThan(a: Attribute, Literal(v, dt)) => cmpMay(s, rc, a, v, dt, 'G', strict = true)
      case GreaterThan(Literal(v, dt), a: Attribute) => cmpMay(s, rc, a, v, dt, 'L', strict = true)
      case GreaterThanOrEqual(a: Attribute, Literal(v, dt)) => cmpMay(s, rc, a, v, dt, 'G', strict = false)
      case GreaterThanOrEqual(Literal(v, dt), a: Attribute) => cmpMay(s, rc, a, v, dt, 'L', strict = false)
      case LessThan(a: Attribute, Literal(v, dt)) => cmpMay(s, rc, a, v, dt, 'L', strict = true)
      case LessThan(Literal(v, dt), a: Attribute) => cmpMay(s, rc, a, v, dt, 'G', strict = true)
      case LessThanOrEqual(a: Attribute, Literal(v, dt)) => cmpMay(s, rc, a, v, dt, 'L', strict = false)
      case LessThanOrEqual(Literal(v, dt), a: Attribute) => cmpMay(s, rc, a, v, dt, 'G', strict = false)
      case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
        list.exists { case Literal(v, dt) => eqMay(s, rc, a, v, dt); case _ => true }
      case InSet(a: Attribute, hset) =>
        // InSet loses the literal's DataType; recover it from the
        // attribute (the optimizer builds InSet from same-typed Ins)
        hset.exists(v => eqMay(s, rc, a, v, a.dataType))
      case IsNull(a: Attribute) => nullMay(s, rc, a)
      case IsNotNull(a: Attribute) =>
        statOf(s, a).forall(c => !(rc >= 0 && c.nullCount == rc))
      case StartsWith(a: Attribute, Literal(p: UTF8String, StringType)) if p != null =>
        statOf(s, a) match {
          case Some(c) if c.tag == 's' =>
            val pre = p.toString
            val belowAll = c.max.exists(mx => ParquetStats.cmpUtf8(mx, pre) < 0)
            val aboveAll = c.min.exists(mn => ParquetStats.cmpUtf8(mn, pre) > 0 &&
              !mn.startsWith(pre))
            val allNull = rc >= 0 && c.nullCount == rc
            !(belowAll || aboveAll || allNull)
          case _ => true
        }
      case _ => true
    }

  /** Can the file hold a NULL in `a`? */
  private def nullMay(s: Seq[ColStat], rc: Long, a: Attribute): Boolean = {
    val _ = rc
    statOf(s, a).forall(c => c.nullCount != 0L)
  }

  /** Can the file hold a non-null value of `a` equal to `v`? */
  private def eqMay(s: Seq[ColStat], rc: Long, a: Attribute,
      v: Any, dt: DataType): Boolean = {
    if (v == null) return false // `a = NULL` is never satisfied
    statOf(s, a) match {
      case Some(c) =>
        if (rc >= 0 && c.nullCount == rc) return false // provably all null
        canon(c.tag, v, dt) match {
          case Some(x) =>
            val below = c.min.exists(mn => ParquetStats.cmp(c.tag, x, mn) < 0)
            val above = c.max.exists(mx => ParquetStats.cmp(c.tag, x, mx) > 0)
            !(below || above)
          case None => true
        }
      case None => true
    }
  }

  /** Can the file hold a value of `a` that is >('G')/<('L') `v`
    * (strictly, or or-equal)?
    */
  private def cmpMay(s: Seq[ColStat], rc: Long, a: Attribute,
      v: Any, dt: DataType, dir: Char, strict: Boolean): Boolean = {
    if (v == null) return false
    statOf(s, a) match {
      case Some(c) =>
        if (rc >= 0 && c.nullCount == rc) return false
        canon(c.tag, v, dt) match {
          case Some(x) =>
            if (dir == 'G')
              // need some value > x (or >= x): impossible iff max < x
              // (or max < x when strict means max <= x fails too)
              !c.max.exists(mx => {
                val d = ParquetStats.cmp(c.tag, mx, x)
                if (strict) d <= 0 else d < 0
              })
            else
              !c.min.exists(mn => {
                val d = ParquetStats.cmp(c.tag, mn, x)
                if (strict) d >= 0 else d > 0
              })
          case None => true
        }
      case None => true
    }
  }

  /** Canonicalize a catalyst literal into the tag's string encoding;
    * None when the literal's type does not share the tag's comparison
    * domain (then nothing is provable and the file is kept). Floats
    * bail on NaN — Spark orders NaN above everything, parquet stats
    * exclude it, and no envelope argument survives that mismatch.
    */
  private def canon(tag: Char, v: Any, dt: DataType): Option[String] =
    (tag, dt) match {
      case ('i', ByteType)    => Some(v.asInstanceOf[Byte].toLong.toString)
      case ('i', ShortType)   => Some(v.asInstanceOf[Short].toLong.toString)
      case ('i', IntegerType) => Some(v.asInstanceOf[Int].toLong.toString)
      case ('i', LongType)    => Some(v.asInstanceOf[Long].toString)
      case ('f', FloatType) =>
        val d = v.asInstanceOf[Float].toDouble
        if (d.isNaN) None else Some(d.toString)
      case ('f', DoubleType) =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN) None else Some(d.toString)
      case ('d', DateType)      => Some(v.asInstanceOf[Int].toString)
      case ('t', TimestampType) => Some(v.asInstanceOf[Long].toString)
      case ('b', BooleanType)   => Some(v.asInstanceOf[Boolean].toString)
      case ('s', StringType)    => Some(v.toString) // UTF8String.toString
      case _ => None
    }
}
