package graft.operators

import graft.SparkSpec

/** Tests for min-label-propagation connected components: chains, isolated
  * vertices, multi-hop merges, and the near-dup pipeline composition. */
class ConnectedComponentsSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)], verts: Seq[Long] = Nil) = {
    val spark0 = spark
    import spark0.implicits._
    val v = if (verts.nonEmpty) Some(verts.toDF("id")) else None
    ConnectedComponents(edges.toDF("id_a", "id_b"), v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to the minimum id across multiple hops") {
    // 5-4, 4-3, 3-2, 2-1: diameter 4 forces several propagation rounds
    val out = cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate labels; isolated vertices self-label") {
    val out = cc(Seq((1L, 2L), (10L, 11L)), verts = Seq(1L, 2L, 10L, 11L, 99L))
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(10L) == 10L && out(11L) == 10L)
    assert(out(99L) == 99L)
  }

  test("two clusters bridged by one edge merge into one component") {
    val out = cc(Seq((1L, 2L), (3L, 4L), (2L, 3L)))
    assert(out.values.toSet == Set(1L))
  }

  test("empty edge set: every vertex self-labels (no NPE on the null SUM)") {
    // Round-1 regression guard: SUM over zero rows is NULL; a clean corpus
    // (zero near-dup pairs) must yield all-self-labeled, not crash.
    val out = cc(Nil, verts = Seq(1L, 2L, 3L))
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("reliable checkpointing matches local-checkpoint labels") {
    val spark0 = spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
    val reliable = ConnectedComponents(edges.toDF("id_a", "id_b"),
        reliableCheckpoints = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == cc(edges))
    // the reliable path really wrote checkpoint data to the fault-tolerant dir
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("null-endpoint edges drop identically in the fast path and the " +
      "iterative engine (no typed-decode NPE, no divergent dirty-input mode)") {
    val spark0 = spark
    import spark0.implicits._
    // nullable Long endpoints: (2,null)/(null,7) carry no connectivity
    // and must vanish in BOTH engines — before the shared isNotNull
    // filter the fast path threw a decode NPE here while the iterative
    // branch dropped the edges via join semantics (ADVICE r10).
    val dirty = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, null), (null, 7L), (5L, 6L)).toDF("id_a", "id_b")
    val verts = Some(Seq(1L, 2L, 5L, 6L, 7L).toDF("id"))
    def run(cutoff: Long) =
      ConnectedComponents(dirty, verts, localEdgeCutoff = cutoff)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run(ConnectedComponents.LocalEdgeCutoff)
    val iterative = run(0L) // cutoff 0 forces the distributed engine
    val expected = Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L)
    assert(fast == expected)
    assert(iterative == expected)
  }

  test("reliable checkpoints survive loss of executor-local blocks; " +
      "local checkpoints provably do not") {
    // The preemptible-cluster claim, exercised instead of argued: kill
    // every executor-held RDD block after the computation and read the
    // label table. `localCheckpoint` blocks live only on executors (a
    // lost node loses them and the truncated lineage cannot recompute);
    // reliable `checkpoint()` re-reads the checkpoint-dir files.
    val spark0 = spark
    import spark0.implicits._
    graft.SparkUtil.unpersistTrackedCaches()
    spark.catalog.clearCache()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_loss").toString
    spark.sparkContext.setCheckpointDir(dir)
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
      .toDF("id_a", "id_b")
    // induced block loss = drop every persisted RDD's blocks, the same
    // state a dead executor leaves behind for its partitions
    def loseExecutorBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    // cutoff 0 forces the multi-round iterative engine — the lineage
    // shape the checkpoint-per-round design exists for
    val local = ConnectedComponents(edges, localEdgeCutoff = 0L)
    loseExecutorBlocks()
    val eLocal = intercept[Exception] { local.collect() }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + chain(t.getCause)
    assert(chain(eLocal).toLowerCase.contains("checkpoint"),
      s"expected a lost-checkpoint-block failure, got: ${chain(eLocal)}")
    val reliable = ConnectedComponents(edges, reliableCheckpoints = true,
      localEdgeCutoff = 0L)
    loseExecutorBlocks()
    val out = reliable.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("cleaned corpus keeps exactly one representative per cluster") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val cleaned = graft.SparkEntry.queries("q51_dedup_corpus")(spark, sf())
    val pairs = Dedup.minhashLshPairs(docs).select("id_a", "id_b")
    val comp = ConnectedComponents(pairs, vertices = Some(docs.select("doc_id")))
    val clusters = comp.select("component").distinct().count()
    assert(cleaned.count() == clusters) // one doc per component
    assert(cleaned.count() < docs.count()) // dups actually removed
    // every kept doc is its own component representative
    val keptIds = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    val reps = comp.filter(org.apache.spark.sql.functions.col("id") ===
        org.apache.spark.sql.functions.col("component"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptIds == reps)
  }

  test("single-task union-find fast path == iterative propagation " +
      "(forced via localEdgeCutoff) on chains, bridges, and a real pair graph") {
    val spark0 = spark
    import spark0.implicits._
    def both(edges: Seq[(Long, Long)], verts: Seq[Long]): Unit = {
      val e = edges.toDF("id_a", "id_b")
      val v = Some(verts.toDF("id"))
      val fast = ConnectedComponents(e, v) // small + long ids -> fast path
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val iter = ConnectedComponents(e, v, localEdgeCutoff = -1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == iter, s"fast!=iterative for edges=$edges")
    }
    both(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)), Seq(1L, 2L, 3L, 4L, 5L, 9L))
    both(Seq((1L, 2L), (3L, 4L), (2L, 3L), (7L, 7L)), Seq(1L, 2L, 3L, 4L, 7L))
    // a real near-dup pair graph (same fixture family as the q99 dispatch)
    val d = spark.read.parquet(s"${sf()}/documents.parquet").limit(300)
    val pairs = Dedup.simhashPairs64(d).select("id_a", "id_b").cache()
    val v = Some(d.select("doc_id"))
    val fast = ConnectedComponents(pairs, v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iter = ConnectedComponents(pairs, v, localEdgeCutoff = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == iter)
    assert(fast.size == 300)
    graft.SparkUtil.unpersistTrackedCaches()
  }

  test("fast path stays OFF for non-long ids (schema dispatch, not a cast)") {
    val spark0 = spark
    import spark0.implicits._
    // int ids take the iterative engine and must still produce min labels
    val e = Seq((5, 4), (4, 3)).toDF("id_a", "id_b")
    val out = ConnectedComponents(e)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out == Map(3 -> 3, 4 -> 3, 5 -> 3))
  }

  test("alternating stars == propagation on fixtures and the q28 pair graph") {
    val spark0 = spark
    import spark0.implicits._
    def stars(edges: Seq[(Long, Long)], verts: Seq[Long] = Nil) = {
      val v = if (verts.nonEmpty) Some(verts.toDF("id")) else None
      ConnectedComponents(edges.toDF("id_a", "id_b"), v, alternatingStars = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // crafted fixtures: chain, disjoint + isolated, bridge merge, empty
    for ((edges, verts) <- Seq(
      (Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)), Nil),
      (Seq((1L, 2L), (10L, 11L)), Seq(1L, 2L, 10L, 11L, 99L)),
      (Seq((1L, 2L), (3L, 4L), (2L, 3L)), Nil),
      (Seq.empty[(Long, Long)], Seq(1L, 2L, 3L))))
      assert(stars(edges, verts) == cc(edges, verts), s"edges=$edges")
    // the real near-dup pair graph (q28's input) at sf0.001
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val pairs = Dedup.minhashLshPairs(docs).select("id_a", "id_b")
    val viaStars = ConnectedComponents(pairs, Some(docs.select("doc_id")),
        alternatingStars = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = ConnectedComponents(pairs, Some(docs.select("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStars == viaProp)
  }

  test("both engines converge on a deep chain inside the 25-round budget") {
    val spark0 = spark
    import spark0.implicits._
    // a 201-vertex chain has diameter 200: plain min-label propagation
    // would need ~200 rounds (over any sane cap). The star alternation
    // is O(log^2); propagation's pointer-doubling jump (labels take
    // their component's component each round) halves the remaining hop
    // distance per round — O(log diameter), so BOTH must finish well
    // inside the same 25-round budget (the q99 edge-form value chains
    // are exactly this shape at corpus scale)
    val chain = (1L to 200L).map(i => (i - 1, i))
    val out = ConnectedComponents(chain.toDF("id_a", "id_b"),
        alternatingStars = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 201 && out.values.forall(_ == 0L))
    val viaProp = ConnectedComponents(chain.toDF("id_a", "id_b"),
        maxIterations = 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaProp == out)
  }

  test("incremental labeling == full recompute over the union pair graph") {
    val spark0 = spark
    import spark0.implicits._
    // yesterday: {1,2,3} labeled 1, {7,8} labeled 7, singleton 9
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L),
      (9L, 9L)).toDF("id", "component")
    // today: edge bridging the two clusters + a brand-new pair
    val newEdges = Seq((3L, 8L), (20L, 21L)).toDF("id_a", "id_b")
    val verts = Some(Seq(1L, 2L, 3L, 7L, 8L, 9L, 20L, 21L).toDF("id"))
    val inc = ConnectedComponents.incremental(labels, newEdges, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = cc(Seq((1L, 2L), (2L, 3L), (7L, 8L), (3L, 8L), (20L, 21L)),
      Seq(1L, 2L, 3L, 7L, 8L, 9L, 20L, 21L))
    assert(inc == full)
    assert(inc(8L) == 1L && inc(9L) == 9L && inc(21L) == 20L)
    // no-delta case: stored labels replay unchanged (vertex set = the
    // labeled ids; extra vertices would correctly self-label as new)
    val noop = ConnectedComponents.incremental(labels,
      spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b"),
      Some(labels.select("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noop == labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("near-dup pipeline: planted dup pairs in documents form >=1 nontrivial cluster") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs).select("id_a", "id_b")
    val comp = ConnectedComponents(pairs,
      vertices = Some(docs.select("doc_id")))
    val sizes = comp.groupBy("component").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(sizes >= 1)
    assert(comp.count() == docs.count()) // every doc labeled exactly once
  }
}
