package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/**
 * Driver-run benchmark: every SparkEntry query against
 * `SPARK_GRAFT_SF_DIR`. The FULL per-query JSON (medians, spreads,
 * loadavgs) is written to `target/bench.json`; stdout ends with a
 * COMPACT one-line JSON summary sized to survive the driver's ~2 KB
 * tail capture.
 *
 * Each query runs once as warmup (whole-stage-codegen compilation, JIT,
 * parquet footer reads — one-time costs that say nothing about throughput
 * at scale) and then THREE timed times; the reported per-query number is
 * the MEDIAN, with min/max kept in the JSON. This machine is shared and
 * background load swings single samples 3-6× (BASELINE.md), which made
 * round-over-round single-sample comparison meaningless; the median of
 * three plus visible spread is the smallest fix that makes a regression
 * distinguishable from a noisy neighbor.
 */
object Bench {
  /** Parse a committed bench record (`records/bench_r*.json`): the `sf`
    * it ran at and its per-query medians. Jackson ships on the Spark
    * classpath; any parse failure → None (a malformed or missing record
    * must never kill a sweep). */
  def readBenchRecord(path: java.nio.file.Path): Option[(String, Map[String, Double])] =
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(java.nio.file.Files.readAllBytes(path))
      val sf = node.path("sf").asText("")
      val qn = node.path("queries")
      if (sf.isEmpty || !qn.isObject) None
      else {
        val b = Map.newBuilder[String, Double]
        qn.properties().forEach(e => b += e.getKey -> e.getValue.asDouble(-1.0))
        Some((sf, b.result()))
      }
    } catch { case NonFatal(_) => None }

  /** Newest committed record in `dir` whose recorded `sf` matches this
    * run's — "newest" by round number in the `bench_r<N>_...` filename. */
  def latestMatchingRecord(dir: java.nio.file.Path, sfDir: String)
      : Option[(java.nio.file.Path, Map[String, Double])] = {
    val Name = """bench_r(\d+)_.*\.json""".r
    def sameDir(a: String, b: String): Boolean =
      try java.nio.file.Paths.get(a).toAbsolutePath.normalize ==
        java.nio.file.Paths.get(b).toAbsolutePath.normalize
      catch { case NonFatal(_) => a == b }
    try {
      if (!java.nio.file.Files.isDirectory(dir)) return None
      import scala.jdk.CollectionConverters._
      val candidates = scala.util.Using(java.nio.file.Files.list(dir)) { s =>
        s.iterator().asScala.flatMap { p =>
          p.getFileName.toString match {
            case Name(r) => Some((r.toInt, p))
            case _       => None
          }
        }.toVector
      }.getOrElse(Vector.empty)
      val parsed = candidates.flatMap { case (r, p) =>
        readBenchRecord(p).collect {
          case (sf, qs) if sameDir(sf, sfDir) => (r, p, qs)
        }
      }
      if (parsed.isEmpty) None
      else {
        // Several records can share the newest round (a sweep plus its
        // quiet re-measures at the same sf); Files.list order is
        // unspecified. Merge the tied-round records PER QUERY, keeping
        // each query's minimum POSITIVE median: the earlier whole-record
        // tie-break (lowest median sum wins) let a partial or
        // all-refused record — every entry a -1 marker, sum 0 — displace
        // the real record wholesale and silently disable the
        // sustained-load re-measure for every query (ADVICE r15).
        // Per-query min keeps the quietest real sample of each query
        // regardless of which record holds it; non-positive markers
        // never contribute.
        val top = parsed.iterator.map(_._1).max
        val tied = parsed.filter(_._1 == top)
        val merged = tied.iterator.flatMap(_._3).filter(_._2 > 0)
          .toSeq.groupMapReduce(_._1)(_._2)(math.min)
        if (merged.isEmpty) None
        else {
          // Representative path (log line only): the record contributing
          // the most merged baselines, then lowest sum, then filename.
          val repr = tied.sortBy { case (_, p, qs) =>
            (-qs.count { case (k, v) => v > 0 && merged.get(k).contains(v) },
              qs.values.filter(_ >= 0).sum, p.getFileName.toString)
          }.head._2
          Some((repr, merged))
        }
      }
    } catch { case NonFatal(_) => None }
  }

  /** Designed guard refusals are CORRECT behavior, not failures: a
    * sweep record listing nine refusals under `failed` reads as nine
    * crashes (VERDICT r14 #2). Matched by the dedicated [[GuardRefusal]]
    * type the guards throw — matching on the broad
    * IllegalArgumentException class mis-filed genuine bugs that surface
    * as IAEs (bad config, array/encoder argument errors in Spark/JDK
    * library paths) as refusals and let a broken sweep exit 0
    * (ADVICE r15). Timeouts and engine errors stay failures. */
  def isDesignedRefusal(e: Throwable): Boolean =
    e.isInstanceOf[GuardRefusal]

  /** The sustained-load trigger (VERDICT r13): a burst that inflates all
    * samples uniformly never trips the intra-run spread check, so also
    * flag any median more than 3× its last committed quiet value — when
    * the excess is material (> 0.5 s), re-measure post-sweep. */
  def sustainedLoadSuspect(median: Double, quiet: Double): Boolean =
    quiet > 0 && median > 3.0 * quiet && median - quiet > 0.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // Scale-sweep knobs. WARMUP=0 skips the untimed warmup pass — at a
    // 100x probe scale every query is multi-second (JIT/codegen overhead
    // is relatively negligible) and the warmup would double a
    // multi-hour sweep. TIMEOUT_SEC arms a per-query watchdog that
    // cancels the query's job group: a straggler (e.g. an
    // output-quadratic query on a replicated corpus) is recorded as a
    // failure instead of stalling the whole sweep.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt > 0
    val timeoutSec = sys.env.get("SPARK_GRAFT_BENCH_TIMEOUT_SEC").map(_.toLong)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Optional scan-split knobs for layout probes (BASELINE.md round-10
    // coda): the scale-probe replicas are tiny files, so demonstrating
    // "a 10×-bigger warehouse ships more splits and absorbs scan growth
    // with parallelism" needs maxPartitionBytes/openCost sized to the
    // probe files rather than to a real warehouse's GB-scale files.
    // Unset (the driver's per-round runs), Spark defaults apply.
    sys.env.get("SPARK_GRAFT_MAX_PARTITION_BYTES").foreach(v =>
      builder.config("spark.sql.files.maxPartitionBytes", v))
    sys.env.get("SPARK_GRAFT_OPEN_COST_BYTES").foreach(v =>
      builder.config("spark.sql.files.openCostInBytes", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Sink into the `noop` format, not `count()`: count() lets Catalyst's
    // ColumnPruning delete every projected expression (a projection-only
    // query would be timed as a bare parquet scan). The noop sink fully
    // evaluates and serializes every output row while writing nothing.
    //
    // NonFatal only: a fatal error (OOM, stack overflow) leaves the JVM in
    // an unknown state — continuing would silently corrupt every number
    // after it, so fatals kill the run instead of being reported as a
    // per-query failure.
    // Monotonic per-invocation sequence in the job-group id: with a
    // name-only group, a watchdog that wins the race against its own
    // finally-interrupt (query finishing at ~the timeout boundary) could
    // cancel the NEXT sample of the same query — same group name — and
    // record a spurious FAILED measurement (ADVICE r11).
    val invocation = new java.util.concurrent.atomic.AtomicLong()
    // Queries that produced no samples split into designed guard
    // refusals (correct at-scale behavior) vs real failures; a name
    // lands here when any of its attempts hit a refusal.
    val refusedNames = scala.collection.mutable.Set.empty[String]
    def time(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val group = s"bench-$name-${invocation.incrementAndGet()}"
      // setJobGroup is driver-thread-local, so the group also covers any
      // eager plan-construction jobs (guard counts, codebook collects).
      val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      val watchdog = timeoutSec.map { secs =>
        val th = new Thread(() => {
          try {
            Thread.sleep(secs * 1000)
            fired.set(true)
            spark.sparkContext.cancelJobGroup(group)
          } catch { case _: InterruptedException => }
        }, s"bench-watchdog-$name")
        th.setDaemon(true); th.start(); th
      }
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() } catch {
        case NonFatal(e) =>
          val refusal = !fired.get && isDesignedRefusal(e)
          if (refusal) refusedNames += name
          val why = if (fired.get) s"TIMEOUT after ${timeoutSec.get}s"
            else if (refusal) "REFUSED (designed guard)" else "FAILED"
          System.err.println(s"bench $why $name: ${e.getClass.getName}: ${e.getMessage}")
          return None
      } finally {
        watchdog.foreach(_.interrupt())
        spark.sparkContext.clearJobGroup()
      }
      Some((System.nanoTime() - t0) / 1e9)
    }
    // Between runs: drop graft-internal operator caches and cached scans so
    // every sample pays the same (cold-cache) work.
    def reset(): Unit = { SparkUtil.unpersistTrackedCaches(); spark.catalog.clearCache() }
    // 1-minute load average at sample time: the adjudication record for
    // round-over-round comparison on this shared machine. BASELINE.md
    // documents 3-6× ambient swings; r5 and r8 each burned a round-trip
    // adjudicating a "regression" that was a noisy neighbor (r8: q120 at
    // 12.96 s under load vs 4.0 s quiet, unchanged code). Recording load
    // next to every median makes that diagnosis a file read.
    def loadavg(): Double =
      try java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/loadavg")).get(0)
        .split(" ")(0).toDouble
      catch { case NonFatal(_) => -1.0 }
    // Optional comma-separated query-name filter (substring match) for
    // focused re-measures: SPARK_GRAFT_BENCH_ONLY=q124,q132
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(pats) => SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }
      case None       => SparkEntry.queries
    }
    def sample(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        nRuns: Int = runs, doWarmup: Boolean = warmup): Seq[Double] = {
      if (doWarmup) time(name, fn) // warmup: codegen + JIT + footer cache
      val samples = (1 to nRuns).flatMap { _ => reset(); time(name, fn) }
      // Between queries: force a GC so the ContextCleaner reaps dead
      // broadcasts and shuffle state. Without it, a multi-hundred-query
      // run on a large heap almost never GCs, the single JVM accumulates
      // hundreds of executions' debris, and late queries measure 5-8×
      // slower than the same query in a short run (observed r6: q49
      // 19.7 s in the full sweep vs 2.4 s focused, identical code).
      reset(); System.gc()
      samples.sorted
    }
    // Price the shared-artifact builds as their OWN rows (VERDICT r11 #3):
    // the kNN-graph / pair-table consumers (q137/q221/q234, the cluster
    // and graph family) bench as artifact-amortized scans of a memoized
    // parquet file, which hid a q264-sized build cost on whichever query
    // touched the artifact first (q111 read as 200.6 s in the r11 100×
    // sweep for exactly this reason). Building — and timing — each
    // artifact up front makes every consumer uniformly amortized and the
    // build cost a first-class line in bench.json. Skipped under a query
    // filter (focused re-measures should not pay three builds).
    // SPARK_GRAFT_BENCH_ARTIFACTS=1 forces pricing under a filter too —
    // the scale sweeps run a filtered heavy set but still want the
    // artifact builds on the ledger.
    val priceArtifacts = only.isEmpty ||
      sys.env.get("SPARK_GRAFT_BENCH_ARTIFACTS").contains("1")
    val artifactTimes: Seq[(String, Double)] =
      if (!priceArtifacts) Seq.empty
      else Artifacts.all(spark, sfDir).map { case (key, build) =>
        val t = time(s"artifact_$key", (_, _) => build()).getOrElse(-1.0)
        System.err.println(f"bench artifact $key: $t%.2f s")
        reset(); System.gc()
        key -> t
      }
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val load = loadavg()
      val s = sample(name, fn)
      // Progress line per query (stderr, like the artifact lines): a
      // multi-hour scale sweep is otherwise a black box until the final
      // JSON — mid-sweep walls should be visible while they happen.
      val med = if (s.isEmpty) -1.0 else s(s.size / 2)
      System.err.println(f"bench query $name: $med%.2f s (load $load%.1f)")
      (name, fn, s, load)
    }
    // End-of-sweep outlier re-run: a query whose three samples spread
    // more than 2× (and whose spread is material, > 0.5 s) was probably
    // measured under a load transient — re-measure it once the sweep's
    // own burst is over and keep the RE-RUN unconditionally: it is the
    // post-burst measurement. (Keeping min-of-two-medians, as earlier
    // rounds did, is a one-sided selection that biases the headline
    // total optimistically instead of just de-noising it.) This kills
    // the q120-class false regression at the source instead of
    // adjudicating it a round later.
    val spreadCorrected = firstPass.map { case (name, fn, s, load) =>
      val wide = s.nonEmpty && s.head > 0 &&
        s.last / s.head > 2.0 && s.last - s.head > 0.5
      if (!wide) (name, s, load, false)
      else {
        val load2 = loadavg()
        val s2 = sample(name, fn)
        // own stderr tag (ADVICE r12): the re-run REPLACES the first-pass
        // median in the final JSON, so the log must stay reconcilable
        val med2 = if (s2.isEmpty) -1.0 else s2(s2.size / 2)
        System.err.println(f"bench rerun $name: $med2%.2f s (load $load2%.1f)")
        if (s2.nonEmpty) (name, s2, load2, true) else (name, s, load, true)
      }
    }
    // Sustained-load blind spot (VERDICT r13 "what's wrong" #1): the
    // intra-run trigger above only fires when a burst STRADDLES samples;
    // a burst that inflates all three uniformly sails through (r13: q49
    // sampled 20.3/24.8/30.5 s — 1.5× spread, no re-run — against a
    // 2.19 s quiet floor, an 11× error in the headline total). Second
    // trigger: compare each median against the newest committed record
    // for the SAME sf dir (records/bench_r*_*.json; override with
    // SPARK_GRAFT_BENCH_QUIET_RECORD=<path>, disable with =none) and
    // re-measure — post-sweep, unconditional replace, same rationale as
    // above — any query whose median trips sustainedLoadSuspect.
    val quietRecord: Option[(java.nio.file.Path, Map[String, Double])] =
      sys.env.get("SPARK_GRAFT_BENCH_QUIET_RECORD") match {
        case Some("none") => None
        case Some(p) =>
          readBenchRecord(java.nio.file.Paths.get(p)).collect {
            case (_, qs) => (java.nio.file.Paths.get(p), qs)
          }
        case None => latestMatchingRecord(java.nio.file.Paths.get("records"), sfDir)
      }
    quietRecord.foreach { case (p, _) =>
      System.err.println(s"bench quiet-record baseline: $p")
    }
    val vsRecordReruns = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = quietRecord match {
      case None => spreadCorrected
      case Some((_, quiet)) => spreadCorrected.map { case r @ (name, s, load, wide) =>
        val med = if (s.isEmpty) -1.0 else s(s.size / 2)
        quiet.get(name) match {
          case Some(q) if s.nonEmpty && sustainedLoadSuspect(med, q) =>
            val load2 = loadavg()
            val s2 = sample(name, selected(name))
            val med2 = if (s2.isEmpty) -1.0 else s2(s2.size / 2)
            System.err.println(
              f"bench rerun-vs-record $name: $med2%.2f s (load $load2%.1f, was $med%.2f s vs quiet record $q%.2f s)")
            vsRecordReruns += name
            if (s2.nonEmpty) (name, s2, load2, wide) else r
          case _ => r
        }
      }
    }
    // Warm re-measurement pass (VERDICT r11 #4): a no-warmup single-sample
    // sweep (WARMUP=0, RUNS=1 — the scale-probe configuration) overstates
    // a machinery family's FIRST query 3-15× (JIT-cold coda, BASELINE.md:
    // q14 183 s fresh-JVM vs 13.4 s warm median). With
    // SPARK_GRAFT_BENCH_WARM_RERUN_SEC=<thr> set, every query whose sweep
    // median is >= thr is re-run warm (median of 3, same JVM — codegen
    // and JIT now hot, data caches still reset per sample) and BOTH
    // columns ship in the JSON, so sweep adjudication needs no manual
    // re-measure pass.
    val warmRerunSec = sys.env.get("SPARK_GRAFT_BENCH_WARM_RERUN_SEC").map(_.toDouble)
    val warm: Seq[(String, Seq[Double])] = warmRerunSec match {
      case None => Seq.empty
      case Some(thr) => results.collect {
        case (name, s, _, _) if s.nonEmpty && s(s.size / 2) >= thr =>
          val sw = sample(name, selected(name), nRuns = 3, doWarmup = false)
          val medw = if (sw.isEmpty) -1.0 else sw(sw.size / 2)
          System.err.println(f"bench warm $name: $medw%.2f s")
          name -> sw
      }
    }
    def fmt(d: Double) = f"$d%.4f"
    val qs = results.map { case (k, s, _, _) =>
      val v = if (s.isEmpty) -1.0 else s(s.size / 2)
      s"\"" + k + "\":" + fmt(v)
    }.mkString("{", ",", "}")
    val spread = results.collect { case (k, s, _, _) if s.nonEmpty =>
      s"\"" + k + "\":[" + fmt(s.head) + "," + fmt(s.last) + "]"
    }.mkString("{", ",", "}")
    val loads = results.map { case (k, _, l, _) =>
      s"\"" + k + "\":" + f"$l%.2f"
    }.mkString("{", ",", "}")
    val reruns = results.collect { case (k, _, _, true) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val rerunsVsRecord = vsRecordReruns.map(k => s"\"" + k + "\"")
      .mkString("[", ",", "]")
    // Failed queries are reported as -1 markers and EXCLUDED from the
    // total (a -1 contribution would shrink the headline number).
    // Designed guard refusals ship under their OWN key: a sweep JSON
    // listing refusals as failures reads as crashes (VERDICT r14 #2).
    val noSample = results.collect { case (k, s, _, _) if s.isEmpty => k }
    val refusedKeys = noSample.filter(refusedNames.contains)
    val failedKeys = noSample.filterNot(refusedNames.contains)
    val failed = failedKeys.map(k => s"\"" + k + "\"").mkString("[", ",", "]")
    val refused = refusedKeys.map(k => s"\"" + k + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, s, _, _) if s.nonEmpty => s(s.size / 2) }.sum
    // Artifact builds are their own ledger line, NOT folded into the
    // query total (which stays comparable round-over-round); warm medians
    // are a second column next to the sweep numbers, never a replacement.
    val artifacts = artifactTimes.map { case (k, t) =>
      s"\"" + k + "\":" + fmt(t)
    }.mkString("{", ",", "}")
    val artifactsTotal = artifactTimes.collect { case (_, t) if t >= 0 => t }.sum
    val warmJson = warm.collect { case (k, s) if s.nonEmpty =>
      s"\"" + k + "\":" + fmt(s(s.size / 2))
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"spread_min_max":$spread,"loadavg":$loads,"rerun_wide_spread":$reruns,"rerun_vs_record":$rerunsVsRecord,"runs_per_query":$runs,"failed":$failed,"refused":$refused,"artifacts":$artifacts,"artifacts_total":${fmt(artifactsTotal)},"warm":$warmJson,"sf":"$sfDir"}"""
    // Persist the FULL per-query artifact to a file: the driver's stdout
    // capture keeps only a ~2 KB tail, which has truncated the inline
    // JSON mid-object in three rounds now (BENCH_r03/r08/r09 all shipped
    // parsed:null) — the file must survive independently of pipe limits.
    val fileName = if (only.isDefined) "target/bench_partial.json" else "target/bench.json"
    try {
      // Filtered runs must not clobber the full artifact the driver ingests.
      val out = java.nio.file.Paths.get(fileName).toAbsolutePath
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
      // One short, unambiguous pointer line: the driver should ingest the
      // file (tail-capture has truncated the inline JSON in past rounds).
      println(s"BENCH_JSON=$out")
    } catch { case NonFatal(e) => System.err.println(s"bench: file write failed: $e") }
    // The LAST stdout line is a COMPACT self-contained JSON sized to fit
    // whole inside the driver's ~2 KB tail capture: headline total + the
    // slowest queries' medians (as many as fit a 1.5 KB budget, 2-decimal
    // precision), plus counts and the pointer to the full artifact. A
    // 272-entry 4-decimal map is ~8 KB — guaranteed truncation, which is
    // exactly the parsed:null failure mode this replaces.
    def fmt2(d: Double) = f"$d%.2f"
    val byCost = results.filter(_._2.nonEmpty)
      .sortBy { case (_, s, _, _) => -s(s.size / 2) }
    val budget = 1500
    val head = s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","artifacts_total":${fmt2(artifactsTotal)},"sf":"$sfDir","runs_per_query":$runs,"queries_n":${results.size},"failed":$failed,"refused":$refused,"detail":"$fileName","top_queries":{"""
    val tailStr = "}}"
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = head.length + tailStr.length
    byCost.foreach { case (k, s, _, _) =>
      val e = "\"" + k + "\":" + fmt2(s(s.size / 2))
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
    }
    println(head + entries.mkString(",") + tailStr)
    spark.stop()
    // A bench with REAL failures is not a successful run; make rc reflect
    // it so downstream tooling can't mistake a broken round for a clean
    // one. Designed refusals are correct behavior and do not fail the run.
    if (failedKeys.nonEmpty) sys.exit(2)
  }
}
