package graft.queries

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** The whole stride-1 substring family (p131 strip, p133 verbatim-leak
  * screen, p134 surgery) against an independent driver-side reference
  * on generated corpora — the RrfPropertySpec discipline. The
  * generator plants shared blocks of RANDOM length at RANDOM offsets
  * across random doc subsets (so keeper choice, run gating, island
  * merging and off-grid alignment all vary per case), plus empty
  * texts and whole-doc duplicates; docs span ids on both sides of the
  * ≡ 7 (mod 29) eval split, so the screen and the surgery see real
  * eval/train overlap structure. */
object SubstringPropertySpec extends Properties("SubstringFamily") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val W = 10
  private val Gate = 30
  private val Pack = 1L << 20

  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def toks(text: String): Array[String] = text.split(" ", -1)

  /** (doc_id, start j) -> shingle hash, for all stride-1 starts. */
  private def starts(docs: Seq[(Long, String)])
      : Seq[(Long, Int, Long)] = docs.flatMap { case (id, text) =>
    val t = toks(text)
    if (t.length < W) Nil
    else (1 to t.length - (W - 1)).map(j =>
      (id, j, h60(t.slice(j - 1, j - 1 + W).mkString(" "))))
  }

  /** Maximal runs of consecutive ints: (first, length). */
  private def runsOf(js: Seq[Int]): Seq[(Int, Int)] = {
    val s = js.sorted
    if (s.isEmpty) Nil
    else s.tail.foldLeft(List((s.head, 1))) { case (acc, j) =>
      val (j0, m) = acc.head
      if (j == j0 + m) (j0, m + 1) :: acc.tail else (j, 1) :: acc
    }.reverse
  }

  /** The shared excision tail: drop gated runs' covered positions. */
  private def excise(docs: Seq[(Long, String)],
      gated: Map[Long, Seq[(Int, Int)]])
      : Set[(Long, Long, Long, Long, Long, String)] =
    docs.map { case (id, text) =>
      val t = toks(text)
      val rs = gated.getOrElse(id, Nil)
      val dropped = rs.flatMap { case (j0, m) =>
        j0 to (j0 + m + W - 2) }.toSet
      val clean = t.zipWithIndex.collect {
        case (w, i) if !dropped.contains(i + 1) => w }
      (id, t.length.toLong, rs.size.toLong,
        (t.length - clean.length).toLong, clean.length.toLong,
        md5Hex(clean.mkString(" ")))
    }.toSet

  private def refStrip(docs: Seq[(Long, String)])
      : Set[(Long, Long, Long, Long, Long, String)] = {
    val sp = starts(docs)
    val byHv = sp.groupBy(_._3)
    val cand = sp.filter { case (id, j, hv) =>
      val occ = byHv(hv)
      occ.size > 1 &&
        id * Pack + j != occ.map(o => o._1 * Pack + o._2).min
    }
    val gated = cand.groupBy(_._1).map { case (id, rows) =>
      id -> runsOf(rows.map(_._2)).filter(_._2 + W - 1 >= Gate)
    }
    excise(docs, gated)
  }

  private def isEval(id: Long): Boolean = id % 29 == 7

  /** Matched train starts against the eval slice's shingle set. */
  private def matchedStarts(docs: Seq[(Long, String)])
      : Map[Long, Seq[Int]] = {
    val sp = starts(docs)
    val evalHv = sp.collect { case (id, _, hv) if isEval(id) => hv }.toSet
    sp.collect { case (id, j, hv) if !isEval(id) && evalHv(hv) => (id, j) }
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2) }
  }

  private def refContam(docs: Seq[(Long, String)])
      : Set[(Long, Long, Long, Long, Int)] = {
    val ma = matchedStarts(docs)
    docs.filterNot(d => isEval(d._1)).map { case (id, text) =>
      val n = toks(text).length
      val js = ma.getOrElse(id, Nil)
      val mx = runsOf(js).map(_._2).maxOption.getOrElse(0)
      val overlap = if (mx > 0) mx + W - 1 else 0
      (id, (if (n >= W) n - (W - 1) else 0).toLong, js.size.toLong,
        overlap.toLong, if (overlap >= Gate) 1 else 0)
    }.toSet
  }

  private def refSurgery(docs: Seq[(Long, String)])
      : Set[(Long, Long, Long, Long, Long, String)] = {
    val ma = matchedStarts(docs)
    val gated = ma.map { case (id, js) =>
      id -> runsOf(js).filter(_._2 + W - 1 >= Gate) }
    excise(docs.filterNot(d => isEval(d._1)), gated)
  }

  // ---- generator: blocks of random width at random offsets ----
  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(30, 45) // spans the mod-29 eval slice
    empt <- Gen.listOfN(n, Gen.frequency(9 -> false, 1 -> true))
    fill <- Gen.listOfN(n, Gen.chooseNum(0, 8))
    nB <- Gen.chooseNum(1, 5)
    blocks <- Gen.listOfN(nB, for {
      len <- Gen.chooseNum(12, 45) // straddles the 30-token gate
      carriers <- Gen.listOfN(3, Gen.chooseNum(0, n - 1))
      offsets <- Gen.listOfN(3, Gen.chooseNum(0, 6))
    } yield (len, carriers.distinct, offsets))
    dup <- Gen.chooseNum(1, n - 1)
    dupOn <- Gen.oneOf(true, false)
  } yield {
    val texts = Array.tabulate(n) { i =>
      if (empt(i)) ""
      else (0 until fill(i)).map(j => s"u${i}x$j").mkString(" ")
    }
    blocks.zipWithIndex.foreach { case ((len, carriers, offs), k) =>
      val blk = (0 until len).map(i => s"b${k}w$i")
      carriers.zip(offs).foreach { case (c, off) =>
        val own = texts(c).split(" ", -1).filter(_.nonEmpty)
        val (pre, post) = own.splitAt(math.min(off, own.length))
        texts(c) = (pre ++ blk ++ post).mkString(" ")
      }
    }
    if (dupOn) texts(dup) = texts(0) // whole-doc duplicate
    (0 until n).map(i => (i.toLong, texts(i))).toList
  }

  property("p131 strip equals the independent reference") =
    forAll(corpusGen) { docs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Pipeline.substringStripOf(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long, String)].collect().toSet
      val want = refStrip(docs)
      if (got != want) println(s"STRIP MISMATCH\n got-want: " +
        s"${(got -- want).toSeq.sortBy(_._1).take(3)}\n want-got: " +
        s"${(want -- got).toSeq.sortBy(_._1).take(3)}")
      got == want
    }

  property("p133 screen equals the independent reference") =
    forAll(corpusGen) { docs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Pipeline.substringContamOf(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Int)].collect().toSet
      val want = refContam(docs)
      if (got != want) println(s"CONTAM MISMATCH\n got-want: " +
        s"${(got -- want).toSeq.sortBy(_._1).take(3)}\n want-got: " +
        s"${(want -- got).toSeq.sortBy(_._1).take(3)}")
      got == want
    }

  property("p134 surgery equals the independent reference") =
    forAll(corpusGen) { docs =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Pipeline.contamSurgeryOf(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Long, Long, String)].collect().toSet
      val want = refSurgery(docs)
      if (got != want) println(s"SURGERY MISMATCH\n got-want: " +
        s"${(got -- want).toSeq.sortBy(_._1).take(3)}\n want-got: " +
        s"${(want -- got).toSeq.sortBy(_._1).take(3)}")
      got == want
    }
}
