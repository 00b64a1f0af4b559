package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of probe rows share one hot key
    val probe = ((1 to 900).map(i => (1L, s"p$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"q$i"))).toDF("k", "pv")
    val build = (1 to 50).map(i => (i.toLong, s"b$i")).toDF("bk", "bv")
    val plain = probe.join(build, col("k") === col("bk"))
    val salted = SkewJoin.saltedInner(probe, build, "k", "bk", 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("same-named key columns on both sides resolve unambiguously") {
    val probe = Seq((1L, "p"), (2L, "q")).toDF("k", "pv")
    val build = Seq((1L, "b")).toDF("k", "bv")
    val got = SkewJoin.saltedInner(probe, build, "k", "k", 4)
    assert(got.count() == 1)
  }

  test("salt spreads the hot key over multiple partitions") {
    val probe = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salts = probe.withColumn("__salt",
      pmod(hash(probe.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 4) // one hot key fans out across most of 8 salt values
  }

  test("a pre-existing __salt column survives untouched") {
    val probe = Seq((1L, 7), (2L, 9)).toDF("k", "__salt")
    val build = Seq((1L, "b")).toDF("bk", "bv")
    val got = SkewJoin.saltedInner(probe, build, "k", "bk", 4)
    assert(got.columns.count(_ == "__salt") == 1)
    assert(got.select("__salt").head.getInt(0) == 7)
  }

  test("saltCols lets a probe with an unhashable column join") {
    val probe = Seq((1L, Map("a" -> 1)), (1L, Map("b" -> 2)))
      .toDF("k", "props") // map-typed column: hash() would throw on it
    val build = Seq((1L, "b")).toDF("bk", "bv")
    val got = SkewJoin.saltedInner(probe, build, "k", "bk", 4,
      saltCols = Seq("k"))
    assert(got.count() == 2)
  }
}
