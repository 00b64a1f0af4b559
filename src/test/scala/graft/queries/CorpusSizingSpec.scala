package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Boundary contract of the corpus-scaled sizing functions — the pure
  * threshold rules every scaled structure (k-means codebook, IVF
  * coarse quantizer, dedup-recall sample divisor, pairwise sign-bucket
  * width) derives from the corpus row count. The DuckDB twins are
  * generated from the SAME constants, so these boundaries are exactly
  * where gate outputs change shape across scale factors; a silent
  * off-by-one here would desynchronize the engines one row count away
  * from every corpus anyone tested. */
class CorpusSizingSpec extends AnyFunSuite {

  test("corpusCells: ceil-division with a floor, exact at boundaries") {
    // floor regime
    assert(Pipeline.corpusCells(0L, 8L, 64L) == 8L)
    assert(Pipeline.corpusCells(500L, 8L, 64L) == 8L)
    assert(Pipeline.corpusCells(512L, 8L, 64L) == 8L)
    // first count past the floor
    assert(Pipeline.corpusCells(513L, 8L, 64L) == 9L)
    // exact multiples vs one over
    assert(Pipeline.corpusCells(2048L, 8L, 64L) == 32L)
    assert(Pipeline.corpusCells(2049L, 8L, 64L) == 33L)
    // the gate corpora under the declared constants
    assert(Pipeline.corpusCells(500L, Pipeline.KmeansK.toLong,
      Pipeline.KmeansCellTarget) == 8L, "sf0.01 k-means floors at 8")
    assert(Pipeline.corpusCells(2000L, Pipeline.KmeansK.toLong,
      Pipeline.KmeansCellTarget) == 32L, "sf0.1 k-means scales to 32")
    assert(Pipeline.corpusCells(500L, Pipeline.IvfKFloor,
      Pipeline.IvfCellTarget) == 16L, "sf0.01 IVF floors at 16")
    assert(Pipeline.corpusCells(2000L, Pipeline.IvfKFloor,
      Pipeline.IvfCellTarget) == 63L, "sf0.1 IVF scales to 63")
  }

  test("annPairBits: smallest width covering the corpus at the cell " +
      "target, floored and capped") {
    assert(Pipeline.annPairBits(0L) == 4)
    assert(Pipeline.annPairBits(500L) == 4, "sf0.01 floors at 4 bits")
    assert(Pipeline.annPairBits(1024L) == 4, "64*2^4 exactly still 4")
    assert(Pipeline.annPairBits(1025L) == 5, "one over the boundary")
    assert(Pipeline.annPairBits(2000L) == 5, "sf0.1 regime")
    assert(Pipeline.annPairBits(2048L) == 5)
    assert(Pipeline.annPairBits(2049L) == 6)
    assert(Pipeline.annPairBits(20000L) == 9, "the 10x probe regime")
    // cap: corpus beyond 64*2^16 pins at the declared max width
    assert(Pipeline.annPairBits(64L << 16) == 16)
    assert(Pipeline.annPairBits((64L << 16) + 1) == 16)
    assert(Pipeline.annPairBits(Long.MaxValue / 2) == 16)
  }

  test("the generated SQL threshold CASE mirrors annPairBits' " +
      "boundaries literally") {
    val sql = Pipeline.sqlAnnPairBits("e")
    // every WHEN threshold is 64*2^(b-1) for b in 16..5, descending —
    // the exact complement of the Scala find; spot-check the literals
    assert(sql.contains(s"WHEN cnt > ${64L << 15} THEN 16"))
    assert(sql.contains(s"WHEN cnt > ${64L << 4} THEN 5"))
    assert(sql.contains("ELSE 4"))
    assert(!sql.contains("THEN 4 "), "4 is the ELSE, never a WHEN")
    // descending order: the 16-branch must appear before the 5-branch
    assert(sql.indexOf("THEN 16") < sql.indexOf("THEN 5"))
  }
}
