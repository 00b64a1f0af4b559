package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Round-trip property for the graft-txt DSv2 source: any table the
  * format CAN represent (INT/REAL/STRING columns; strings free of
  * tab/newline; no NULLs; rows that don't encode to an empty line)
  * must read back exactly — including every float the JVM can print
  * (±0.0, subnormals, ±Infinity, NaN), full-range ints, and
  * multi-byte/astral UTF-8 — and every value the format CANNOT
  * represent must be rejected loudly at write, never silently
  * dropped or shifted (the blank-line row loss this property found
  * is fenced in the writer). */
object TextTablePropertySpec extends Properties("TextTableRoundTrip") {

  private lazy val spark = graft.SparkSpec.spark

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft-txt-prop").toString

  // strings the format can hold: printable ASCII + multi-byte +
  // astral, spaces and leading/trailing spaces included, no tab/newline
  private val safeString: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.frequency(
      8 -> Gen.choose(' ', '~'),
      1 -> Gen.oneOf('é', 'ß', '中', '文', 'Ω'),
      1 -> Gen.const(' '))).map(_.mkString),
    1 -> Gen.oneOf("", " ", "  x  ", "a\"b'c", "\\backslash\\",
      "line with, punctuation!", "🚀🧪"))

  private val anyFloat: Gen[Float] = Gen.frequency(
    4 -> Gen.chooseNum(-1e9f, 1e9f),
    2 -> Gen.oneOf(0.0f, -0.0f, 1.5f, -0.25f, 1234.5625f),
    1 -> Gen.oneOf(Float.MinPositiveValue, Float.MaxValue,
      Float.NegativeInfinity, Float.PositiveInfinity, Float.NaN),
    1 -> Gen.choose(Int.MinValue, Int.MaxValue)
      .map(java.lang.Float.intBitsToFloat)
      .map(f => if (f.isNaN) Float.NaN else f)) // canonical NaN only

  private val anyInt: Gen[Int] = Gen.frequency(
    4 -> Gen.chooseNum(-1000000, 1000000),
    1 -> Gen.oneOf(0, -1, Int.MinValue, Int.MaxValue))

  private val colTypes: Gen[List[DataType]] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(IntegerType, FloatType, StringType)))

  private def rowFor(ts: List[DataType]): Gen[List[Any]] =
    Gen.sequence[List[Any], Any](ts.map {
      case IntegerType => anyInt
      case FloatType   => anyFloat
      case StringType  => safeString
    })

  private case class Table(types: List[DataType], rows: List[List[Any]])

  private val tableGen: Gen[Table] = for {
    ts <- colTypes
    n <- Gen.choose(0, 20)
    rows <- Gen.listOfN(n, rowFor(ts))
    // drop rows the format declares unrepresentable (they are the
    // subject of the rejection property below, not this one)
    kept = rows.filterNot(r => ts.length == 1 &&
      ts.head == StringType && r.head == "")
  } yield Table(ts, kept)

  private def cell(x: Any): String = x match {
    case f: Float => "f:" + java.lang.Float.floatToIntBits(f) // NaN/-0.0-exact
    case o        => String.valueOf(o)
  }

  property("every representable table reads back exactly") =
    forAll(tableGen) { t =>
      val schema = StructType(t.types.zipWithIndex.map { case (dt, i) =>
        StructField(s"c$i", dt, nullable = false)
      })
      val df = spark.createDataFrame(
        java.util.Arrays.asList(t.rows.map(r => Row(r: _*)): _*), schema)
      val dir = tmp()
      TextTables.write(df, dir)
      val back = TextTables.read(spark, dir).collect()
        .map(_.toSeq.map(cell)).sortBy(_.mkString("|"))
      val want = t.rows.map(_.map(cell)).sortBy(_.mkString("|"))
      val ok = back.toSeq == want
      if (!ok) println(s"COUNTEREXAMPLE types=${t.types}\n want=$want\n got=${back.toSeq}")
      ok
    }

  property("unrepresentable values are rejected loudly, never lost") =
    forAll(Gen.oneOf("tab\tin", "new\nline", "")) { bad =>
      import spark.implicits._
      val dir = tmp()
      val df = Seq("fine", bad, "alsofine").toDF("s")
      val thrown =
        try { TextTables.write(df, dir); false }
        catch { case e: Throwable =>
          def msgs(t: Throwable): Seq[String] =
            if (t == null) Nil
            else Option(t.getMessage).toSeq ++ msgs(t.getCause)
          msgs(e).exists(_.contains("graft-txt cannot represent"))
        }
      thrown
    }
}
