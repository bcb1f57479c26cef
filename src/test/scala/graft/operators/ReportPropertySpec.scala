package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property-based tests for the round-4 report/selection operators,
 * seeded ScalaCheck per repo convention: each operator is checked
 * against an independent brute-force Scala formulation over random
 * inputs, not just the crafted fixtures.
 */
class ReportPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("corpusDiff == brute-force snapshot classification on random snapshots") {
    val spark0 = spark
    import spark0.implicits._
    // small id space forces every verdict class; texts from a tiny
    // alphabet force hash-equal and hash-different collisions
    val snapGen = Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.oneOf("a", "b", "c")))
      .map(_.toMap) // last-wins dedup keeps ids unique per snapshot
    samples(Gen.zip(snapGen, snapGen), 8).foreach { case (oldM, newM) =>
      val oldDf = oldM.toSeq.toDF("doc_id", "text")
      val newDf = newM.toSeq.toDF("doc_id", "text")
      val got = Profiler.corpusDiff(oldDf, newDf).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = (oldM.keySet ++ newM.keySet).map { id =>
        id -> ((oldM.get(id), newM.get(id)) match {
          case (None, Some(_)) => "added"
          case (Some(_), None) => "removed"
          case (Some(a), Some(b)) if a == b => "unchanged"
          case _ => "changed"
        })
      }.toMap
      assert(got == want, s"old=$oldM new=$newM")
    }
  }

  test("joinSizeEstimate prediction == the actual join size on random multisets") {
    val spark0 = spark
    import spark0.implicits._
    val keysGen = Gen.nonEmptyListOf(Gen.choose(0L, 5L))
    samples(Gen.zip(keysGen, keysGen), 8).foreach { case (lk, rk) =>
      val l = lk.toDF("k")
      val r = rk.toDF("k")
      val est = Profiler.joinSizeEstimate(l, r, "k", "k", "t").collect().head
      val actual = l.join(r, "k").count()
      assert(est.getDecimal(2).longValueExact() == actual,
        s"predicted ${est.getDecimal(2)} vs actual $actual for l=$lk r=$rk")
      // the hot-key term is an upper bound member of the sum
      assert(est.getLong(3) <= actual || actual == 0)
    }
  }

  test("funnel == per-user brute-force greedy simulation on random event logs") {
    val spark0 = spark
    import spark0.implicits._
    val stages = Seq("s1", "s2", "s3")
    val gapMin = 10
    def ts(min: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(min * 60))
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 3L), Gen.oneOf(stages), Gen.choose(0L, 50L)))
    samples(evGen, 8).foreach { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, st, m), i) => (i.toLong, ts(m), u, st) }
        .toDF("event_id", "ts", "user_id", "event_type")
      val got = EventAnalytics.funnel(df, stages, maxGapMinutes = gapMin)
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
      // brute force: greedy first-match per user in minutes
      val byUser = evs.groupBy(_._1)
      def reached(stageIdx: Int): Long = byUser.values.count { es =>
        var t = es.filter(_._2 == stages.head).map(_._3).minOption
        var i = 1
        while (i <= stageIdx && t.isDefined) {
          val prev = t.get
          t = es.filter(e => e._2 == stages(i) &&
            e._3 > prev && e._3 <= prev + gapMin).map(_._3).minOption
          i += 1
        }
        t.isDefined
      }.toLong
      stages.indices.foreach { i =>
        assert(got(i) == reached(i), s"stage $i: got ${got(i)} want ${reached(i)} on $evs")
      }
    }
  }

  test("topShareSelection: minimal best-first prefix law on random scores") {
    val spark0 = spark
    import spark0.implicits._
    val rowsGen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 9L)))
    samples(Gen.zip(rowsGen, Gen.choose(1, 99)), 8).foreach { case (rows, pct) =>
      // unique ids, two groups
      val df = rows.zipWithIndex
        .map { case ((sc, g), i) => (i.toLong, s"g${g % 2}", sc) }
        .toDF("doc_id", "lang", "n_chars")
      val kept = Sampling.topShareSelection(df, pct, "n_chars")
        .collect().map(_.getLong(0)).toSet
      rows.zipWithIndex.map { case ((sc, g), i) => (i.toLong, s"g${g % 2}", sc) }
        .groupBy(_._2).foreach { case (g, docs) =>
          val total = docs.map(_._3).sum
          val order = docs.sortBy(d => (-d._3, d._1))
          val keptG = order.filter(d => kept(d._1))
          val droppedG = order.filterNot(d => kept(d._1))
          // kept is a PREFIX of the best-first order
          assert(order.takeWhile(d => kept(d._1)) == keptG, s"not a prefix in $g")
          // coverage: kept mass reaches pct% (when anything at all is kept
          // it is exactly the minimal such prefix)
          val keptMass = keptG.map(_._3).sum
          if (total > 0) {
            assert(keptMass * 100 >= pct.toLong * total, s"under-covered $g")
            if (keptG.nonEmpty) {
              val withoutLast = keptMass - keptG.last._3
              assert(withoutLast * 100 < pct.toLong * total, s"not minimal in $g")
            }
          }
          assert(droppedG.forall(d => !kept(d._1)))
        }
    }
  }

  test("compactionPlan: contiguous bins, loads bounded, nothing lost on random sizes") {
    val spark0 = spark
    import spark0.implicits._
    val sizesGen = Gen.nonEmptyListOf(Gen.choose(0L, 120L))
    samples(Gen.zip(sizesGen, Gen.choose(50L, 200L)), 8).foreach {
      case (sizes, target) =>
        val m = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("shard_id", "n_rows")
        val plan = graft.sources.IO.compactionPlan(m, target).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(plan.length == sizes.length)
        val byBin = plan.groupBy(_._3)
        val bins = byBin.keySet
        // contiguity holds exactly when no single file spans a full
        // target width; an oversized file advances the cumulative bin
        // counter past the gap (its own bin(s)) by design
        if (sizes.forall(_ < target))
          assert(bins == (0L until bins.size).toSet, s"bins not contiguous: $bins")
        byBin.values.foreach { files =>
          val load = files.map(_._2).sum
          val last = files.maxBy(_._1)._2
          assert(load - last < target, s"bin pre-overflow load >= target: $files")
        }
        // bin ids are monotone in file order (next-fit never goes back)
        val ordered = plan.sortBy(_._1).map(_._3)
        assert(ordered.zip(ordered.tail).forall { case (a, b) => b >= a })
    }
  }
}
