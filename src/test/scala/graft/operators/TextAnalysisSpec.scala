package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.functions.TextFunctions

/**
 * Tests for text-analysis operators on hand-built fixtures with known
 * counts (SURVEY.md §2.3 Tier B Q12: stats, quality, language-ID,
 * fingerprints).
 */
class TextAnalysisSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private def docs(rows: (Long, String, String)*) =
    spark.createDataFrame(rows.map { case (i, l, t) => Row(i, l, t) }.asJava, schema)

  test("stats aggregates exact integer sums and derived averages") {
    val df = docs((1L, "en", "a b c"), (2L, "en", "d e"), (3L, "de", "f"))
    val out = TextAnalysis.stats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getLong(1) == 2)        // n_docs
    assert(en.getLong(2) == 5 + 3)    // sum_chars: "a b c"=5, "d e"=3
    assert(en.getLong(3) == 3 + 2)    // sum_tokens
    assert(en.getDouble(4) == 4.0)    // avg_chars
    assert(en.getDouble(5) == 2.5)    // avg_tokens
  }

  test("quality computes token counts, TTR, stopword ratio, mean token length") {
    val df = docs((1L, "en", "the cat the cat"))
    val r = TextAnalysis.quality(df).collect().head
    assert(r.getInt(1) == 4)                    // n_tokens
    assert(r.getInt(2) == 2)                    // n_uniq_tokens
    assert(r.getInt(3) == 4)                    // n_bpe_tokens (4 alpha runs)
    assert(r.getDouble(4) == 0.5)               // ttr
    assert(r.getDouble(5) == 0.5)               // stop_ratio ("the" twice)
    assert(r.getDouble(6) == 3.0)               // mean token length
    assert(!r.getBoolean(7))                    // fails n_tokens >= 10 gate
  }

  test("langId votes by marker lists with deterministic tiebreak") {
    val df = docs(
      (1L, "?", "the cat and the dog"),          // en markers
      (2L, "?", "der hund und die katze ist"),   // de markers
      (3L, "?", "xyzzy plugh quux"))             // no markers → und
    val out = TextAnalysis.languageId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "und")
  }

  test("fingerprints: md5 matches a known digest, rolling hash is order-sensitive") {
    val df = docs((1L, "en", "ab"), (2L, "en", "ba"))
    val out = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // rolling hash "ab" = 97*31 + 98 = 3105; "ba" = 98*31 + 97 = 3135
    assert(out(1L).getLong(2) == 3105L)
    assert(out(2L).getLong(2) == 3135L)
    assert(out(1L).getString(1) == "187ef4436122d1cc2f40dc2b92f0eba0") // md5("ab")
  }

  test("simhash of identical token multisets is identical; permutations too (order-free)") {
    import org.apache.spark.sql.functions._
    val df = docs((1L, "en", "x y z"), (2L, "en", "z y x"), (3L, "en", "p q r"))
    val out = df.select(TextFunctions.simhash(split(col("text"), " ")).as("s"))
      .collect().map(_.getLong(0))
    assert(out(0) == out(1)) // simhash is a bag-of-tokens function
  }
}
