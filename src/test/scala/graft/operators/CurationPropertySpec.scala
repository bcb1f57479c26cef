package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property-based tests for the round-6 curation operators, seeded
 * ScalaCheck per repo convention: each operator is checked against an
 * independent brute-force Scala formulation over random inputs, not
 * just the crafted fixtures.
 */
class CurationPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("capPerGroup == brute-force per-group best-n on random scored corpora") {
    val spark0 = spark
    import spark0.implicits._
    val rowGen = Gen.listOf(Gen.zip(Gen.choose(0L, 30L), Gen.oneOf("g1", "g2", "g3"),
      Gen.choose(0L, 5L))).map(_.distinctBy(_._1))
    samples(Gen.zip(rowGen, Gen.choose(1, 4)), 8).foreach { case (rows, n) =>
      if (rows.nonEmpty) {
        val df = rows.toDF("doc_id", "source", "score")
        val got = Sampling.capPerGroup(df, n, "source", "score")
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val want = rows.groupBy(_._2).values.flatMap { g =>
          g.sortBy(t => (-t._3, t._1)).take(n).map(_._1)
        }.toSet
        assert(got == want, s"rows=$rows n=$n")
      }
    }
  }

  test("preferencePairs == brute-force component extremes on random graphs") {
    val spark0 = spark
    import spark0.implicits._
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
      .map(_.filter(e => e._1 != e._2))
    val scoreGen = Gen.listOfN(10, Gen.choose(0L, 3L))
    samples(Gen.zip(edgeGen, scoreGen), 8).foreach { case (edges, scores) =>
      val ids = (0L to 9L).toSeq
      val vertices = ids.toDF("doc_id")
      val pairs = edges.toDF("id_a", "id_b")
      val scoreDf = ids.map(i => (i, scores(i.toInt))).toDF("doc_id", "score")
      val got = Dedup.preferencePairs(vertices, pairs, scoreDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // brute force: union-find components over the same edges
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = ids.groupBy(find).map { case (_, members) =>
        val comp = members.min
        val chosen = members.minBy(i => (-scores(i.toInt), i))
        val rejected = members.minBy(i => (scores(i.toInt), i))
        (comp, chosen, rejected, scores(chosen.toInt), scores(rejected.toInt))
      }.filter(t => t._4 > t._5).map(t => (t._1, t._2, t._3)).toSet
      assert(got == want, s"edges=$edges scores=$scores")
    }
  }

  test("winsorizeReport bounds sit at the pinned ranks on random multisets") {
    val spark0 = spark
    import spark0.implicits._
    val valsGen = Gen.nonEmptyListOf(Gen.choose(-50, 50))
    samples(valsGen, 8).foreach { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, "k", v.toDouble) }
      val df = rows.toDF("event_id", "event_type", "value")
      val r = Profiler.winsorizeReport(df, "event_type", "value", "event_id")
        .collect().head
      val sorted = rows.sortBy(t => (t._3, t._1)).map(_._3)
      val n = sorted.size
      val loR = math.max(1, (5 * n + 99) / 100)
      val hiR = n + 1 - math.max(1, (5 * n + 99) / 100)
      assert(r.getLong(1) == n.toLong)
      assert(r.getDouble(2) == sorted(loR - 1), s"vals=$vals")
      assert(r.getDouble(3) == sorted(hiR - 1), s"vals=$vals")
      assert(r.getLong(4) == sorted.count(_ < sorted(loR - 1)).toLong)
      assert(r.getLong(5) == sorted.count(_ > sorted(hiR - 1)).toLong)
    }
  }

  test("curriculumStages band sizes differ by at most one and order by difficulty") {
    val spark0 = spark
    import spark0.implicits._
    val docsGen = Gen.nonEmptyListOf(Gen.choose(1, 30))
      .map(_.zipWithIndex.map { case (len, i) =>
        (i.toLong, "en", ("w " * len).trim)
      })
    samples(docsGen, 6).foreach { docs =>
      val out = TextAnalysis.curriculumStages(docs.toDF("doc_id", "lang", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      val byStage = out.groupBy(_._3).view.mapValues(_.length)
      if (docs.size >= 4) {
        assert(byStage.values.max - byStage.values.min <= 1, s"docs=${docs.size}")
      }
      // easy stages never contain a harder doc than any later stage's easiest
      val sorted = out.sortBy(t => (t._2, t._1))
      assert(sorted.map(_._3).sameElements(sorted.map(_._3).sorted), "stage order")
    }
  }

  test("lengthBandPairs == naive all-pairs filter on random length multisets") {
    val spark0 = spark
    import spark0.implicits._
    val docsGen = Gen.listOf(Gen.choose(0, 12)).map(_.zipWithIndex.map {
      case (len, i) => (i.toLong, if (i % 2 == 0) "en" else "de", ("w " * len).trim)
    })
    samples(Gen.zip(docsGen, Gen.choose(0, 3)), 8).foreach { case (docs, d) =>
      if (docs.nonEmpty) {
        val got = Dedup.lengthBandPairs(docs.toDF("doc_id", "lang", "text"), d = d)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        def len(t: String) = t.split(" ", -1).length.toLong
        val want = (for {
          a <- docs; b <- docs
          if a._1 < b._1 && a._2 == b._2 &&
            math.abs(len(a._3) - len(b._3)) <= d
        } yield (a._1, b._1)).toSet
        assert(got == want, s"d=$d docs=${docs.map(x => (x._1, x._2, len(x._3)))}")
      }
    }
  }
}
