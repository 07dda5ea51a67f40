package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sort order as a TABLE PROPERTY (round-18 verdict task 7, the
  * Delta `OPTIMIZE ZORDER BY` / Iceberg sort-order discipline): q136
  * and q140 prove that range-sorted and Z-ordered layouts are what
  * make footer/manifest envelope skipping selective — but as
  * write-time recipes, one compaction run without the recipe silently
  * destroys the clustering. The declared order now lives in the
  * manifest header (`"sort:<col>"` / `"zorder:<colA>,<colB>"`,
  * persisted and carried like `statsCols`), and EVERY partition
  * rewrite — [[graft.operators.StorageOps.compactDays]], erasure —
  * re-applies it, so skipping survives maintenance without operator
  * discipline.
  *
  * Shapes:
  *   - `sort:c` — `repartitionByRange` on `c` into the target file
  *     count (disjoint per-file ranges) + `sortWithinPartitions`
  *     (tight row-group envelopes). Any orderable type.
  *   - `zorder:a,b` — 16-bit-quantized Morton interleave of the two
  *     dimensions (numeric/date/timestamp), range-placed and sorted on
  *     the interleave; a contiguous z-range projects to a bounded box
  *     in BOTH dimensions, so envelopes stay tight on each.
  *     Quantization bounds come from the data being rewritten (bounds
  *     only need to CONTAIN the data; staleness wastes resolution,
  *     never correctness).
  *
  * Scale contract: ordering adds one range-shuffle to each rewrite —
  * the cost Delta's OPTIMIZE pays explicitly — and is applied
  * per-rewrite-batch, never table-wide.
  */
object TableOrder {

  final case class Order(kind: String, cols: Seq[String])

  /** Parse a manifest `order` field; "" → None; malformed → loud. */
  def parse(order: String): Option[Order] =
    if (order.isEmpty) None
    else order.split(":", 2) match {
      case Array("sort", c) if c.nonEmpty && !c.contains(",") => Some(Order("sort", Seq(c)))
      case Array("zorder", cs) =>
        val cols = cs.split(',').toSeq.filter(_.nonEmpty)
        require(cols.size == 2, s"zorder takes exactly two columns, got '$order'")
        Some(Order("zorder", cols))
      case _ => throw new IllegalArgumentException(
        s"unparseable table order '$order' — expected sort:<col> or zorder:<a>,<b>")
    }

  /** Declare (or clear, with "") the table's order — one CAS pointer
    * commit; the property is validated against the live schema's
    * column names when the table has a column mapping.
    */
  def set(spark: SparkSession, root: String, order: String): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val m = ManifestTable.resolve(fs, rootPath).getOrElse(
      throw new IllegalArgumentException(s"no manifested table at $root"))
    parse(order).foreach { o =>
      require(!o.cols.contains(m.partCol),
        s"the partition column '${m.partCol}' already clusters the layout " +
          "(directory-level) and cannot be in the sort order")
      if (m.cols.nonEmpty) {
        val live = m.cols.filterNot(_.dropped).map(_.logical).toSet
        val missing = o.cols.filterNot(live.contains)
        require(missing.isEmpty,
          s"order columns ${missing.mkString(", ")} not in the table " +
            s"(live: ${live.toSeq.sorted.mkString(", ")})")
      }
    }
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      val cur = ManifestTable.resolve(fs, rootPath).getOrElse(
        throw new IllegalStateException(s"table at $root vanished"))
      try {
        ManifestTable.commit(fs, rootPath, cur.partCol, Map.empty,
          expectedSeq = Some(cur.seq), order = Some(order)): Unit
        return
      } catch { case _: ManifestStaleException => }
    }
    throw new java.io.IOException(s"setOrder at $root lost the commit race 5 times")
  }

  private def toLongCol(df: DataFrame, c: String): Column = {
    df.schema.find(_.name == c).map(_.dataType) match {
      case Some(DateType) => datediff(col(c), to_date(lit("1970-01-01"))).cast("long")
      case Some(TimestampType) => unix_micros(col(c))
      case Some(_: NumericType) => col(c).cast("long")
      case Some(other) => throw new IllegalArgumentException(
        s"zorder column '$c' must be numeric/date/timestamp, got ${other.simpleString}")
      case None => throw new IllegalArgumentException(
        s"order column '$c' not in the frame (${df.columns.mkString(", ")})")
    }
  }

  /** Morton interleave of two 16-bit-quantized longs — pure built-in
    * shift/mask/or, stays inside whole-stage codegen.
    */
  private def interleaveBits(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Shape `df` into `files` output files per the declared order —
    * identity when the table declares none. `repartition(files)` is
    * the caller's fallback for unordered tables.
    */
  def shape(df: DataFrame, order: String, files: Int): DataFrame =
    parse(order) match {
      case None => df.repartition(files)
      case Some(Order("sort", Seq(c))) =>
        df.repartitionByRange(files, col(c)).sortWithinPartitions(c)
      case Some(Order("zorder", Seq(a, b))) =>
        val (la, lb) = (toLongCol(df, a), toLongCol(df, b))
        val bounds = df.agg(min(la), max(la), min(lb), max(lb)).head()
        if (bounds.isNullAt(0)) return df.repartition(files) // empty/all-null
        def quant(c: Column, lo: Long, hi: Long): Column =
          ((c - lit(lo)) * lit(65535L) / lit(math.max(hi - lo, 1L))).cast("long")
        val z = interleaveBits(
          quant(la, bounds.getLong(0), bounds.getLong(1)),
          quant(lb, bounds.getLong(2), bounds.getLong(3)))
        df.withColumn("__graft_z", z)
          .repartitionByRange(files, col("__graft_z"))
          .sortWithinPartitions("__graft_z")
          .drop("__graft_z")
      case Some(o) => throw new IllegalStateException(s"unreachable order $o")
    }
}
