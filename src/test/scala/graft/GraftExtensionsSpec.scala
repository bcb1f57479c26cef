package graft

import graft.SparkSpec

/** SQL-surface tests: native expressions callable from spark.sql after
  * registration (same builders the SparkSessionExtensions plugin injects). */
class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions evaluate the native expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_rolling_hash('ab') AS h,
        |       graft_simhash32(array('x','y')) AS s,
        |       size(graft_shingle_hashes('a b c d', 3)) AS ns,
        |       size(graft_minhash_sig(array(5L, 9L), 16)) AS nk,
        |       graft_dot_f32(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       graft_srp_bucket(array(1.0F, 2.0F), 2, 8) AS b,
        |       graft_token_mode_count('spam spam ham') AS m,
        |       graft_feature_hash_summary('spam spam ham', 8) AS f,
        |       size(graft_shingle_hashes_all('x y x y x', 2)) AS na
        |""".stripMargin).collect().head
    assert(r.getLong(0) == 3105L)                 // 97*31+98
    assert(r.getLong(1) != 0L)
    assert(r.getInt(2) == 2)                      // "a b c", "b c d"
    assert(r.getInt(3) == 16)
    assert(r.getDouble(4) == 1.0 * 3.0 + 2.0 * 4.0)
    assert(r.getLong(5) >= 0L && r.getLong(5) < 256L) // 8-plane bucket range
    assert(r.getLong(6) == 2L)                    // "spam" twice
    assert(r.getSeq[Long](7)(1) == 3L)            // feature-hash l1 = 3 tokens
    assert(r.getInt(8) == 4)                      // multiset keeps repeats
  }

  test("non-literal width parameters are rejected with a clear error") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception](
      spark.sql("SELECT graft_minhash_sig(array(1L), cast(rand()*4 AS INT))").collect())
    assert(ex.getMessage.contains("integer literal"))
  }

  test("queries through SQL match the Column API on the corpus") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(50).cache()
    docs.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_rolling_hash(text) AS h FROM docs_ext")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = docs.select(col("doc_id"),
      graft.functions.TextFunctions.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }
}
