package graft

import org.apache.spark.sql.functions._
import graft.functions.UnicodeNormalize
import graft.ops.DocOps

/** Native Unicode normalization expression: UAX #15 semantics, codegen
  * and interpreted parity, SQL registration, and the nfc_stats audit
  * built on it. */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café"           // é as U+00E9
  private val decomposed = "café"        // e + combining acute
  private val ligature = "ﬁle"            // ﬁ ligature + "le"

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    val df = Seq((1L, decomposed), (2L, composed), (3L, ligature))
      .toDF("id", "s")
    val got = df.select(col("id"),
      UnicodeNormalize.nfc(col("s")).as("nfc"),
      UnicodeNormalize.form(col("s"), "NFD").as("nfd"),
      UnicodeNormalize.form(col("s"), "NFKC").as("nfkc"))
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L)._1 == composed, "NFC must compose e+acute")
    assert(got(2L)._2 == decomposed, "NFD must decompose é")
    assert(got(1L)._1 == got(2L)._1, "NFC canonical-equal inputs agree")
    assert(got(3L)._3 == "file", "NFKC must fold the fi ligature")
    assert(got(3L)._1 == ligature, "NFC must NOT fold compatibility forms")
  }

  test("codegen and interpreted paths agree; nulls pass through") {
    val df = Seq(Some(decomposed), Some(composed), None, Some(""))
      .toDF("s")
    val viaCodegen = df.select(UnicodeNormalize.nfc(col("s")))
      .as[Option[String]].collect().toSeq
    // filter-side eval() exercises the interpreted path
    val interpreted = df
      .filter(UnicodeNormalize.nfc(col("s")) === lit(composed) ||
        col("s").isNull || col("s") === "")
      .count()
    assert(viaCodegen == Seq(Some(composed), Some(composed), None, Some("")))
    assert(interpreted == 4L)
  }

  test("SQL registration: graft_normalize works in expr, guards arity " +
    "and bad forms") {
    UnicodeNormalize.register(spark)
    val df = Seq(decomposed).toDF("s")
    assert(df.select(expr("graft_normalize(s)")).as[String].head() ==
      composed)
    assert(df.select(expr("graft_normalize(s, 'NFKD')")).as[String].head() ==
      "café")
    val badArity = intercept[Exception] {
      df.select(expr("graft_normalize(s, 'NFC', 'x')")).collect()
    }
    assert(badArity.getMessage.contains("1 or 2 arguments"))
    val badForm = intercept[Exception] {
      df.select(expr("graft_normalize(s, 'NFX')")).collect()
    }
    assert(badForm.getMessage.contains("NFC|NFD|NFKC|NFKD"))
  }

  test("nfc_stats audit: counts non-normal docs and post-NFC length") {
    val docs = Seq(
      (1L, decomposed, "srcA"),   // 5 code points -> 4 after NFC
      (2L, composed, "srcA"),     // already normal
      (3L, "plain ascii", "srcB")
    ).toDF("doc_id", "text", "source")
    val got = DocOps.nfcStats(docs)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("srcA") == ((2L, 1L, 8L)), got.toString) // 4 + 4 chars
    assert(got("srcB") == ((1L, 0L, 11L)), got.toString)
  }
}
