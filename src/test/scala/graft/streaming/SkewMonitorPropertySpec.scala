package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The skew monitor's Misra–Gries fold against exact counting on
  * GENERATED skewed streams — the bound and accounting contracts that
  * make a bounded summary honest: every reported counter brackets its
  * true count via the exact decrement tally, the summary never exceeds
  * its budget, the row total is exact, and the fold is redelivery-
  * shaped (replaying a prefix through saved state changes nothing the
  * batch boundary could see). Pure driver-side — no streaming query,
  * so hundreds of cases stay fast. */
object SkewMonitorPropertySpec extends Properties("SkewMonitor") {

  // Zipf-ish skew: small key ids arrive much more often, so summaries
  // hold genuine heavy hitters while the tail forces decrement rounds
  private val keyGen: Gen[String] =
    Gen.frequency(
      8 -> Gen.choose(0, 2),
      3 -> Gen.choose(3, 9),
      2 -> Gen.choose(10, 99)).map(i => s"k$i")

  private val streamGen: Gen[(List[String], Int)] = for {
    n <- Gen.choose(0, 400)
    keys <- Gen.listOfN(n, keyGen)
    k <- Gen.choose(1, 8)
  } yield (keys, k)

  private def fold(keys: Seq[String], k: Int): Streams.SkewShardState =
    keys.foldLeft(Streams.SkewShardState(Map.empty, 0L, 0L)) {
      (st, key) => Streams.mgUpdate(st, key, k)
    }

  property("bounds bracket every true count; budget and total hold") =
    forAll(streamGen) { case (keys, k) =>
      val st = fold(keys, k)
      val exact = keys.groupBy(identity).view.mapValues(_.length.toLong)
      st.n == keys.length.toLong &&
        st.counts.size <= k &&
        st.counts.forall { case (key, c) =>
          val t = exact(key)
          c <= t && t <= c + st.decs
        } &&
        // an untracked key's count is at most the decrement tally —
        // the guarantee that lets the merged report call its winner
        exact.forall { case (key, t) =>
          st.counts.contains(key) || t <= st.decs
        }
    }

  property("batch boundaries are invisible to the fold") =
    forAll(streamGen, Gen.choose(0, 400)) { case ((keys, k), cutRaw) =>
      val cut = if (keys.isEmpty) 0 else cutRaw % (keys.length + 1)
      val (a, b) = keys.splitAt(cut)
      val resumed = b.foldLeft(fold(a, k)) {
        (st, key) => Streams.mgUpdate(st, key, k)
      }
      resumed == fold(keys, k)
    }
}
