package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.{Session, SparkEntry, Tables}

/** Ad-hoc robustness probe: every doc-consuming query against a corpus
  * of pathological documents (empty text, 1 token, 2 tokens, all-stop,
  * one giant repeated token) — hunting the ANSI divide-by-zero class
  * the zero-norm cosine crash belonged to. */
object PathologyProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.local()
    import spark.implicits._
    val work = "/tmp/graft-pathology"
    val src = "/root/testdata/sf0.001"
    // pathological docs on ids 0..34 (covers the mod-29 eval slice)
    val texts = Seq("", "x", "x y", "the", "the the the the",
      "a b c d e f g h i j")
    val docs = (0 until 35).map { i =>
      (i.toLong, texts(i % texts.length), "en", s"src${i % 3}",
        texts(i % texts.length).length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode(SaveMode.Overwrite).parquet(s"$work/documents.parquet")
    // tiny embeddings incl. a zero vector; other tables pass through
    (0 until 35).map(i => (i.toLong,
        if (i == 3) Seq.fill(64)(0f)
        else (0 until 64).map(d => ((i * 7 + d * 3) % 9 - 4).toFloat),
        i.toLong % 5))
      .toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$work/embeddings.parquet")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$work/$t.parquet")
    }
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name.startsWith("p")) {
        try { fn(spark, work).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable =>
          bad += 1
          println(s"PATHOLOGY FAIL $name: " +
            s"${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(2)
              .mkString(" | ").take(300))
        }
      }
    }
    println(s"PATHOLOGY DONE failures=$bad")
    spark.stop()
  }
}
