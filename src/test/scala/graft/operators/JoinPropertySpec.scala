package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property-based tests for the round-3 join operators, seeded ScalaCheck
 * per repo convention: saltedJoin must equal the plain join for every
 * join type / salt / null pattern, the time-bucketed interval join must
 * equal the plain range join on boundary-heavy random timelines, and the
 * alternating-star components must equal min-label propagation on random
 * graphs — over random inputs, not just the crafted fixtures.
 */
class JoinPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.toString()).toSeq

  test("saltedJoin == plain join for random keyed data, every type and salt") {
    val spark0 = spark
    import spark0.implicits._
    // keys clustered in a tiny range (forces hot keys + misses) with nulls
    val keyGen = Gen.frequency(
      (8, Gen.choose(0L, 4L).map(Option(_))),
      (1, Gen.const(Option.empty[Long])))
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(keyGen, Gen.choose(0, 999)))
    samples(Gen.zip(rowsGen, rowsGen, Gen.oneOf(2, 5, 16)), 6).foreach {
      case (lrows, rrows, salt) =>
        val left = lrows.map { case (k, p) => (k, p.toLong) }.toDF("k", "lp")
        val right = rrows.map { case (k, p) => (k, p.toLong) }.toDF("rk", "rp")
        for (jt <- Seq("inner", "left", "right", "full")) {
          val plain = canon(left.join(right, left("k") === right("rk"), jt))
          val salted = canon(graft.SparkUtil.saltedJoin(
            left, right, "k", "rk", salt, jt))
          assert(salted == plain, s"joinType=$jt salt=$salt diverged")
        }
    }
  }

  test("bloomPrunedJoin == plain inner join for random keyed data") {
    val spark0 = spark
    import spark0.implicits._
    val keyGen = Gen.frequency(
      (8, Gen.choose(0L, 50L).map(Option(_))),
      (1, Gen.const(Option.empty[Long])))
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(keyGen, Gen.choose(0, 999)))
    samples(Gen.zip(rowsGen, rowsGen), 6).foreach { case (brows, srows) =>
      val big = brows.map { case (k, p) => (k, p.toLong) }.toDF("bk", "bp")
      val small = srows.map { case (k, p) => (k, p.toLong) }.toDF("sk", "sp")
      val plain = canon(big.join(small, big("bk") === small("sk")))
      // tiny filter (2^10 bits) to force false positives through the
      // verify path; the join must erase them
      val pruned = canon(graft.SparkUtil.bloomPrunedJoin(
        big, small, "bk", "sk", mBits = 1 << 10, k = 3))
      assert(pruned == plain)
    }
  }

  test("bucketed interval join == plain on boundary-heavy random timelines") {
    val spark0 = spark
    import spark0.implicits._
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val L = 60L // 1-minute lookback/bucket
    // times biased to exact bucket multiples and lookback edges
    val timeGen = Gen.frequency(
      (3, Gen.choose(0L, 20L).map(_ * L)),          // exact bucket edges
      (3, Gen.choose(1L, 20L).map(_ * L - L)),      // lookback-width offsets
      (4, Gen.choose(0L, 20L * L)))                 // anywhere
    val rowGen = Gen.zip(Gen.choose(0L, 2L), timeGen)
    samples(Gen.zip(Gen.nonEmptyListOf(rowGen), Gen.nonEmptyListOf(rowGen)), 6)
      .foreach { case (lrows, rrows) =>
        val left = lrows.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, ts(t)) }.toDF("lid", "k", "lt")
        val right = rrows.zipWithIndex
          .map { case ((k, t), i) => (i.toLong, k, ts(t)) }.toDF("rid", "rk", "rt")
        val plain = canon(IntervalJoin(left, right, "k", "rk", "lt", "rt", "1 minute"))
        val bucketed = canon(IntervalJoin.bucketed(left, right, "k", "rk", "lt", "rt", "1 minute"))
        assert(bucketed == plain)
      }
  }

  test("alternating stars == propagation on random graphs") {
    val spark0 = spark
    import spark0.implicits._
    val edgeGen = Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L))
      .suchThat { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    samples(Gen.nonEmptyListOf(edgeGen), 6).foreach { edges =>
      val df = edges.toDF("id_a", "id_b")
      val prop = ConnectedComponents(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val stars = ConnectedComponents(df, alternatingStars = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stars == prop, s"edges=$edges")
    }
  }
}
