package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property check for the SCD2 family: incremental apply (q116 core)
  * must equal the full rebuild (q115 core) for RANDOM CDC streams and
  * RANDOM cutoff fractions — tombstone-final keys, duplicate
  * timestamps, keys appearing only after the cutoff, and all-delete
  * histories included. Deterministic seeds so failures reproduce.
  */
class Scd2PropSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, event_id, event_type, value, ts-µs-offset): few users and
  // coarse timestamps on purpose — collisions and shared instants are
  // where ordering bugs live
  private val eventGen: Gen[(Long, Long, String, Double, Long)] = for {
    user <- Gen.chooseNum(1L, 6L)
    op <- Gen.frequency(4 -> "update", 2 -> "create", 1 -> "error")
    value <- Gen.chooseNum(-100.0, 100.0).map(x => math.rint(x * 100) / 100)
    tsOff <- Gen.chooseNum(0L, 50L).map(_ * 1000000L) // whole seconds
  } yield (user, 0L, op, value, tsOff)

  private def streams: Seq[(List[(Long, Long, String, Double, Long)], Int)] =
    (1 to 8).map { i =>
      val raw = Gen.resize(40, Gen.nonEmptyListOf(eventGen))
        .apply(Gen.Parameters.default, Seed(1000L + i)).get
      // unique event_ids (the tie-break key), assigned after generation
      val withIds = raw.zipWithIndex.map { case ((u, _, o, v, t), ix) =>
        (u, ix.toLong + 1, o, v, t)
      }
      (withIds, 1 + i % 9) // cutoff numerator over /10: 1..9
    }

  test("incremental SCD2 apply == full rebuild for random streams and cutoffs") {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for ((events, cutNum) <- streams) {
      val df = events.map { case (u, id, op, v, off) =>
        (u, id, op, v, new Timestamp(base + off / 1000))
      }.toDF("user_id", "event_id", "event_type", "value", "ts")
      val applied = ExtendedRelational.scd2ApplyEvents(df, cutNum, 10)
      val rebuilt = ExtendedRelational.scd2Versions(df)
      val diff1 = applied.except(rebuilt).count()
      val diff2 = rebuilt.except(applied).count()
      assert(diff1 == 0 && diff2 == 0,
        s"apply != rebuild at cut $cutNum/10 (apply-only=$diff1, rebuild-only=$diff2) for $events")
    }
  }
}
