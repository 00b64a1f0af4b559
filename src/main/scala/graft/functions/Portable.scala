package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Deterministic, engine-portable building blocks for the data-pipeline
  * operators (dedup / LSH / ANN / text analysis).
  *
  * Everything here is chosen so the SAME value is computable in DuckDB by
  * the oracle SQL: md5 is a standard digest (unlike Spark's murmur `hash`,
  * whose seed/variant is engine-specific), and a 15-hex-digit prefix is a
  * 60-bit integer that fits a signed 64-bit long in both engines. At
  * cluster scale these are pure codegen-friendly expressions — no UDFs,
  * no driver-side state, fully partition-parallel.
  */
object Portable {

  /** 60-bit hash of a string: first 15 hex digits of md5, base-16→10.
    * DuckDB twin: `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded hash family for MinHash: h_i(s) = h60(i || ':' || s). */
  def h60Seeded(seed: Column, c: Column): Column =
    h60(concat(seed.cast(StringType), lit(":"), c))

  def sqlH60(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  def sqlH60Seeded(seed: String, s: String): String =
    sqlH60(s"CAST($seed AS VARCHAR) || ':' || $s")

  /** Whitespace tokens. DuckDB twin: `string_split(s, ' ')`. */
  def tokens(c: Column): Column = split(c, " ")

  /** Distinct w-word shingles of a token array (n-gram set for Jaccard /
    * MinHash). Guarded so short docs yield an empty set — Spark's
    * `sequence(1, n)` would count DOWN for n < 1, unlike DuckDB's
    * `generate_series`. DuckDB twin:
    * `list_distinct(list_transform(generate_series(1, len(t)-w+1),
    *    i -> array_to_string(t[i:i+w-1], ' ')))`. */
  def shingles(toks: Column, w: Int): Column =
    when(size(toks) >= w,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w))))))
      .otherwise(array().cast("array<string>"))

  def sqlShingles(t: String, w: Int): String =
    s"list_distinct(list_transform(generate_series(1, len($t)-${w - 1}), " +
      s"i -> array_to_string($t[i:i+${w - 1}], ' ')))"

  /** Element-wise double view of a float-array embedding. */
  def asDouble(vec: Column): Column =
    transform(vec, x => x.cast(DoubleType))

  /** Dot product via a left-to-right fold (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two double arrays, rounded to 6 decimals so the
    * last-ULP difference between two engines' summation orders can never
    * flip a comparison. */
  def cosine6(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)
}
