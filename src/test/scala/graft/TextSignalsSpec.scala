package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Edge cases the sf corpora don't contain: single-word and empty documents
  * through the repetition signals (a 1-word doc must not evaluate
  * `sequence(1, 0)` / `element_at(ws, 0)`), and PII scrubbing on text with
  * zero, one and many matches. */
class TextSignalsSpec extends SparkSpec {

  private def signals(texts: Seq[String]) = {
    import spark.implicits._
    texts.toDF("text")
      .select(col("text"), split(trim(col("text")), " ").as("ws"))
      .select(col("text"), col("ws"), TextOps.wordBigrams(col("ws")).as("bg"))
      .select(
        col("text"),
        size(col("ws")).as("n_words"),
        TextOps.dupFraction(col("ws")).as("dup"),
        TextOps.topItemFraction(col("ws")).as("topw"),
        when(size(col("ws")) >= 2, TextOps.topItemFraction(col("bg")))
          .otherwise(lit(null).cast("double")).as("topb"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
  }

  test("repetition signals: repeats, all-distinct, single word, empty text") {
    // "a b a b a": 5 words, 2 distinct; top word a=3/5; bigrams "a b"×2,"b a"×2 → 2/4
    // "solo" and "": 1 "word" (split('') = [""]), bigram frac undefined
    val m = signals(Seq("a b a b a", "w x y z", "solo", "")).map(t => t._1 -> t).toMap
    assert(m("a b a b a") == (("a b a b a", 5, 0.6, 0.6, Some(0.5))))
    assert(m("w x y z") == (("w x y z", 4, 0.0, 0.25, Some(0.3333))))
    assert(m("solo") == (("solo", 1, 0.0, 1.0, None)))
    assert(m("") == (("", 1, 0.0, 1.0, None)))
  }

  test("PII scrub replaces all matches and counts them; clean text untouched") {
    import spark.implicits._
    val out = Seq(
      "mail me at a.b+c@x-corp.io or x@y.org, call 555-0100",
      "no pii here 12-34").toDF("t")
      .select(col("t"), TextOps.piiRedactionCount(col("t")).as("n"),
        TextOps.piiScrub(col("t")).as("clean"))
      .collect().map(r => (r.getInt(1), r.getString(2)))
    assert(out(0) == ((3, "mail me at <EMAIL> or <EMAIL>, call <PHONE>")))
    assert(out(1) == ((0, "no pii here 12-34")))
  }

  test("redaction count matches scrub order: phone-shaped email local part counts once") {
    import spark.implicits._
    // 555-1234@x.com matches BOTH patterns; scrub replaces it once (email
    // first), so the count must be 1 — phone matching runs on the
    // post-email-scrub text
    val out = Seq("reach 555-1234@x.com today", "dual 555-1234@x.com and 555-9999")
      .toDF("t")
      .select(TextOps.piiRedactionCount(col("t")).as("n"),
        TextOps.piiScrub(col("t")).as("clean"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out(0) == ((1, "reach <EMAIL> today")))
    assert(out(1) == ((2, "dual <EMAIL> and <PHONE>")))
  }
}
