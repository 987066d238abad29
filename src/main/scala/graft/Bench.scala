package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Method (v4, round 8 — recorded in BASELINE.md): a fixed warmup (two
  * representative queries — parquet scan + broadcast join + shuffle agg, and
  * tokenize + explode) runs untimed first so JVM/classloader/codegen startup
  * isn't charged to whichever query the map happens to order first; then each
  * query is timed as the MIN of 3 runs of a count() action, with 2 extra
  * runs for any query whose fastest run exceeds 1 s (the GC/scheduling-
  * variance family BASELINE.md's isolated-outlier table denoises by hand).
  *
  * Why min, not median (v2): wall-time noise under background load is
  * strictly ADDITIVE — GC pauses, page-cache misses, scheduler preemption
  * all inflate a run, nothing deflates one — so the minimum is the
  * max-likelihood estimate of the code's intrinsic cost and the median
  * still carries half the machine's load (round 7's official bench came in
  * 2.4× the idle number of the byte-identical commit). Queries whose
  * spread (max/min) stays > 2 even after 5 reps are emitted as "noisy" in
  * the stdout line so a reader knows which entries to cross-check against
  * the isolated-outlier table instead of trusting single-run deltas.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed page-cache warm of every source file: without it the first
    // run after any other process's IO measures disk, the second measures
    // cache, and two back-to-back totals of identical code diverge >15%
    // (observed round 8). Raw byte streams — no Spark schema involvement.
    locally {
      val buf = new Array[Byte](1 << 20)
      def slurp(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(slurp)
        else {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () }
          catch { case _: java.io.IOException => () }
          finally in.close()
        }
      slurp(new java.io.File(sfDir))
    }

    Seq("q_join_star", "q_tokenize").foreach { w =>
      SparkEntry.queries.get(w).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }

    // A failed query reports -1.0 (and logs to stderr) — a crash must not
    // masquerade as a fast green timing in the emitted JSON.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    // builder-local iteration aid: comma-separated query-name filter
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    // queries slower than this get extra reps — the slow family is exactly
    // where GC/scheduling variance concentrates, so the min needs more
    // samples to converge there
    val slowCutoffSec = 1.0
    val extraReps = 2
    // co-tenancy marker (BASELINE.md's additive-noise model): 1-min system
    // loadavg at start/end + core count, so a verdict can separate code
    // regressions from a loaded box without a re-run
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadavg
    val timed = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times =
        try {
          def run(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val base = (1 to reps).map(_ => run())
          if (base.min > slowCutoffSec) base ++ (1 to extraReps).map(_ => run())
          else base
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          Seq(-1.0)
        }
      name -> times
    }
    val results = timed.map { case (name, ts) => name -> ts.min }
    // still-noisy queries: spread > 2 with a non-trivial floor — the set a
    // reader must cross-check against BASELINE.md's isolated-outlier table
    val noisy = timed.collect {
      case (name, ts) if ts.min > 0.5 && ts.max / ts.min > 2.0 => name
    }.toSeq.sorted
    // The driver captures only a bounded tail of stdout (~2 KB observed in
    // BENCH_r03: a 2237-byte line came back front-truncated and parsed:null).
    // So the stdout line carries the total plus the SLOWEST queries up to a
    // hard byte budget, with the omitted remainder summarized; the complete
    // per-query map always lands in BENCH_LOCAL.json (method v3, BASELINE.md).
    import java.util.Locale
    def fmt(v: Double) = "%.3f".formatLocal(Locale.ROOT, v)
    def entry(kv: (String, Double)) = "\"" + kv._1 + "\":" + fmt(kv._2)
    val total = results.values.filter(_ >= 0).sum
    val loadJson = s""""load":{"start":${fmt(loadStart)},"end":${fmt(loadavg)},"cpus":${Runtime.getRuntime.availableProcessors}}"""
    val fullQs = results.map(entry).mkString("{", ",", "}")
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$fullQs,"noisy":${noisy.map("\"" + _ + "\"").mkString("[", ",", "]")},$loadJson,"sf":"$sfDir"}"""
    // failures (-1.0) first so they are never silently omitted, then slowest
    val ranked = results.toSeq.sortBy { case (_, v) => if (v < 0) Double.MinValue else -v }
    // the WHOLE stdout line must fit the driver's ~2 KB tail window —
    // round 14's line was front-truncated (total lost, parsed:null)
    // because only the queries map was budgeted while the noisy NAME
    // LIST grew with the suite. So: cap the noisy list to a strict
    // prefix of its own small budget (the full list is in
    // BENCH_LOCAL.json; noisy_n records how many there really are),
    // then give the queries map whatever the line budget leaves over.
    val lineBudget = 1800
    // strict prefix: stop at the FIRST overflow, so the kept set is
    // exactly "the first N" — skipping one long item while admitting
    // later short ones would misrepresent what was omitted
    def strictPrefix[A](items: Seq[A], budget: Int, len: A => Int): Seq[A] = {
      val kept = scala.collection.mutable.ArrayBuffer.empty[A]
      var used = 0
      var full = false
      items.foreach { it =>
        if (!full && used + len(it) + 1 <= budget) { kept += it; used += len(it) + 1 }
        else full = true
      }
      kept.toSeq
    }
    val noisyKept = strictPrefix[String](noisy, 220, _.length + 2)
    val noisyJson = noisyKept.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the full-map pointer is only valid when this run actually (re)writes
    // the file — a filtered run would point at a stale previous full map
    val fullRef =
      if (only.isEmpty) """"queries_full":"BENCH_LOCAL.json",""" else ""
    def lineWith(qs: String, omitted: Int, omittedSec: Double): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"n_queries":${results.size},"omitted":$omitted,"omitted_sec":${fmt(omittedSec)},"noisy":$noisyJson,"noisy_n":${noisy.size},$fullRef$loadJson,"sf":"$sfDir"}"""
    // queries budget = what the rest of the line leaves over (measured,
    // not guessed — name lengths and the noisy list vary per round)
    val budgetBytes = lineBudget - lineWith("{}", results.size, total).length
    val kept = strictPrefix[(String, Double)](ranked, budgetBytes,
      kv => entry(kv).length)
    val omitted = results.size - kept.size
    val omittedSec = total - kept.map(_._2).filter(_ >= 0).sum
    val qs = kept.map(entry).mkString("{", ",", "}")
    val line = lineWith(qs, omitted, omittedSec)
    // Redundant copy on disk in case stdout parsing fails again —
    // best-effort only (a backup-path IO failure must never suppress the
    // primary stdout line), and skipped for filtered runs whose partial
    // totals would masquerade as a full bench.
    if (only.isEmpty) {
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: java.io.IOException =>
        System.err.println(s"[bench] BENCH_LOCAL.json write failed: ${e.getMessage}")
      }
    }
    spark.stop()
    // Printed AFTER spark.stop() so no shutdown log line can land after it:
    // the driver reads the last stdout line as the bench JSON.
    println(line)
  }
}
