package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.config.LookupConfig

/**
 * Property-based tests (SURVEY.md §5): algebraic laws of the Lookup
 * operator over ScalaCheck-generated inputs — the row-count law of
 * left-outer joins, null-key exclusion, and alias defaulting. Generators
 * are sampled with fixed seeds so runs are reproducible.
 */
class LookupPropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val inSchema = StructType(Seq(
    StructField("k", IntegerType, nullable = true),
    StructField("payload", StringType, nullable = false)))
  private val lkSchema = StructType(Seq(
    StructField("k", IntegerType, nullable = true),
    StructField("v", StringType, nullable = false)))

  private val keyGen = Gen.oneOf(Gen.const(null: Integer), Gen.choose(0, 8).map(Int.box))
  private val caseGen = for {
    inRows <- Gen.listOfN(30, keyGen.map(k => Row(k, "p")))
    lkRows <- Gen.listOfN(12, keyGen.map(k => Row(k, "v")))
  } yield (inRows, lkRows)

  private def run(inRows: List[Row], lkRows: List[Row]) = {
    val in = spark.createDataFrame(inRows.asJava, inSchema)
    val lk = spark.createDataFrame(lkRows.asJava, lkSchema)
    LookupTransform(
      Map("in" -> in, "lk" -> lk),
      LookupConfig("lk", "k", "k", "v", outputField = Some("looked")))
  }

  test("row-count law: |lookup(L,R)| == sum over L of max(1, matches-in-R(k))") {
    samples(caseGen, 10).foreach { case (inRows, lkRows) =>
      val lkCounts = lkRows.groupBy(_.get(0)).view.mapValues(_.size).toMap
      val expected = inRows.map { r =>
        val k = r.get(0)
        if (k == null) 1L else math.max(1L, lkCounts.getOrElse(k, 0).toLong)
      }.sum
      assert(run(inRows, lkRows).count() == expected)
    }
  }

  test("null-key exclusion: no null input key ever acquires a lookup value") {
    samples(caseGen, 10).foreach { case (inRows, lkRows) =>
      val bad = run(inRows, lkRows).collect().filter(r => r.isNullAt(0) && !r.isNullAt(2))
      assert(bad.isEmpty)
    }
  }

  test("alias defaulting: omitted outputField always names the column lookupValueField") {
    val in = spark.createDataFrame(Seq(Row(Int.box(1), "p")).asJava, inSchema)
    val lk = spark.createDataFrame(Seq(Row(Int.box(1), "v")).asJava,
      StructType(Seq(StructField("k2", IntegerType, true), StructField("val2", StringType, false))))
    val out = LookupTransform(Map("in" -> in, "lk" -> lk), LookupConfig("lk", "k", "k2", "val2"))
    assert(out.columns.toSeq == Seq("k", "payload", "val2"))
  }
}
