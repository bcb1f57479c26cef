package graft.operators

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  test("nodeStats: degrees and triangle participation, canonicalized edges") {
    val spark0 = spark
    import spark0.implicits._
    // triangle 1-2-3 plus a tail 3-4; edge (3,1) arrives reversed and
    // duplicated — canonicalization must collapse it
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L), (5L, 5L))
      .toDF("id_a", "id_b")
    val out = GraphOps.nodeStats(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // self-loop node 5 vanishes entirely
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((2L, 1L)))
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L) == ((3L, 1L)))
    assert(out(4L) == ((1L, 0L)))
  }

  test("pageRank: exact damped integer fixed-point on a path graph") {
    val spark0 = spark
    import spark0.implicits._
    // path 1-2-3, 2 rounds, scale 1e6, d = 85/100, teleport 150000:
    //   r1: n1 = n3 = 150000 + (85 * (1000000 // 2)) // 100 = 575000
    //       n2 = 150000 + (85 * 2000000) // 100 = 1850000
    //   r2: n1 = n3 = 150000 + (85 * (1850000 // 2)) // 100 = 936250
    //       n2 = 150000 + (85 * (575000 + 575000)) // 100 = 1127500
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = GraphOps.pageRank(edges, rounds = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((936250L, 1L)), 2L -> ((1127500L, 2L)),
      3L -> ((936250L, 1L))))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("pageRank conserves rank mass up to floor truncation on the co-engagement graph") {
    val edges = EventAnalytics.coEngagementEdges(
        graft.Tables.loadEvents(spark, sf("sf0.01")),
        org.apache.spark.sql.functions.get_json_object(
          org.apache.spark.sql.functions.col("props"), "$.k").cast("int"),
        minUsers = 15, maxItemsPerUser = 30)
      .select("item_a", "item_b")
    val out = GraphOps.pageRank(edges, rounds = 3).collect()
    val n = out.length.toLong
    val total = out.map(_.getLong(1)).sum
    // each round floors away < 2|E| + n units of mass — total stays
    // within a hair of the n·scale invariant and never exceeds it
    assert(total <= n * 1000000L, s"mass grew: $total vs ${n * 1000000L}")
    assert(total >= n * 1000000L * 99L / 100L,
      s"mass leaked: $total vs ${n * 1000000L}")
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("labelPropagation: majority vote with self-loop, deterministic ties") {
    val spark0 = spark
    import spark0.implicits._
    val nodes = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"))
      .toDF("doc_id", "lang")
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = GraphOps.labelPropagation(nodes, edges, rounds = 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    // round 1: node 3 ties a=2/b=2 -> 'a' (label asc); round 2: node 4
    // ties a=1/b=1 -> 'a'. Isolated node 5 keeps its seed via self-loop.
    assert(out == Map(
      1L -> (("a", false)), 2L -> (("a", false)), 3L -> (("a", true)),
      4L -> (("a", true)), 5L -> (("c", false))))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("labelPropagation round-1 equals one hand-run of the vote rule") {
    val spark0 = spark
    import spark0.implicits._
    val nodes = Seq((1L, "x"), (2L, "y"), (3L, "y")).toDF("id", "l")
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val out = GraphOps.labelPropagation(nodes, edges, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // node 1: self x + neighbors y,y -> y; nodes 2,3: self + node-1 'x'
    // tie y=1/x=1 -> ... x < y so both flip to x
    assert(out == Map(1L -> "y", 2L -> "x", 3L -> "x"))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("kCore: cascading peel empties a path; a triangle survives with its tail gone") {
    val spark0 = spark
    import spark0.implicits._
    // path 1-2-3-4-5, k=2: round 1 peels the endpoints, round 2 peels
    // the new endpoints, round 3 leaves nothing — a single round would
    // wrongly keep {2,3,4}
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(GraphOps.kCore(path, k = 2, rounds = 3).count() == 0)
    val oneRound = GraphOps.kCore(path, k = 2, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(oneRound == Set(3L)) // 3 keeps both neighbors after one peel... but its
    // neighbors are gone next round — the cascade is the point
    // triangle 1-2-3 with tail 3-4: tail peels, the clique is the 2-core
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val core = GraphOps.kCore(tri, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("kCore reaches its fixpoint on the near-dup graph: rounds+1 changes nothing") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(d, threshold = 0.6).select("id_a", "id_b")
    val at3 = GraphOps.kCore(pairs, k = 2, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val at4 = GraphOps.kCore(pairs, k = 2, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at3 == at4, "peeling had not converged at rounds=3")
    assert(at3.nonEmpty)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("degreeBands: bit-length bands with exact ranges on a star graph") {
    val spark0 = spark
    import spark0.implicits._
    // star: center 0 with 5 spokes -> degree 5 (band 3); spokes degree 1
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val out = GraphOps.degreeBands(star).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(1 -> ((5L, 1L, 1L)), 3 -> ((1L, 5L, 5L))))
  }

  test("nodeStats on the near-dup graph: degree bounds and triangle symmetry") {
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(d, threshold = 0.6).select("id_a", "id_b")
    val stats = GraphOps.nodeStats(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.nonEmpty)
    // each triangle contributes 3 node-participations
    assert(stats.map(_._3).sum % 3 == 0)
    // a node's triangles never exceed its wedge capacity deg*(deg-1)/2
    stats.foreach { case (id, deg, tri) =>
      assert(tri <= deg * (deg - 1) / 2, s"node $id: tri=$tri deg=$deg")
    }
    graft.SparkUtil.unpersistTrackedCaches()
  }
}
