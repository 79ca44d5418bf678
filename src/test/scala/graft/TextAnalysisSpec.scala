package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def tok(s: String): Long =
    Seq(s).toDF("t").select(TextAnalysis.tokenCount(col("t"))).head().getLong(0)

  test("whitespace token count edge cases") {
    assert(tok("a b c") == 3)
    assert(tok("  a   b  ") == 2)
    assert(tok("") == 0)
    assert(tok("   ") == 0)
    assert(tok("single") == 1)
  }

  test("BPE-ish token count splits letter runs, digit runs, punctuation") {
    val n = Seq("ab12,cd!").toDF("t")
      .select(TextAnalysis.bpeTokenCount(col("t"))).head().getLong(0)
    // ab | 12 | , | cd | ! → 5
    assert(n == 5)
  }

  test("langid picks the language with most marker hits, declared tie order") {
    val df = Seq(
      (1L, "the cat and the dog is here"),       // en
      (2L, "der hund und die katze ist hier"),   // de
      (3L, "xyzzy qwerty"),                      // no markers → und
      (4L, "the der")                            // 1-1 tie → en (declared first)
    ).toDF("doc_id", "text")
    df.write.mode("overwrite").parquet("/tmp/graft-text-test/documents.parquet")
    val got = TextAnalysis.langId(spark, "/tmp/graft-text-test")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "en"))
  }

  test("fingerprint is invariant to case/whitespace, distinct for different text") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), md5(TextAnalysis.normalizedText(col("text"))).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quality features on a known string") {
    Seq((1L, "the cat, the hat!")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/graft-text-q/documents.parquet")
    val r = TextAnalysis.quality(spark, "/tmp/graft-text-q").head()
    assert(r.getAs[Long]("n_chars") == 17)
    assert(r.getAs[Long]("n_tokens") == 4)
    assert(r.getAs[Long]("n_stopwords") == 2)   // two "the"
    assert(r.getAs[Long]("n_punct") == 2)       // , and !
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
  }
}
