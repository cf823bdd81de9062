package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // AQE profile: Spark 4 enables adaptive execution + partition
    // coalescing BY DEFAULT, so the benched (and verified) plans are
    // the AQE plans a 100 TB deployment runs. SPARK_GRAFT_AQE=0 is the
    // A/B switch that pins fully static plans — used to demonstrate
    // results are byte-identical with and without runtime re-planning
    // (BASELINE.md records both profiles' timings).
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // deployment profile: engine functions + the lake DML text
      // surface are session extensions, exactly as a cluster would
      // set spark.sql.extensions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (executor threads, codegen compiler, shuffle
    // infra, hadoop-FS + parquet reader/writer paths) so the first
    // measured query isn't charged ~4s of JVM boot. Uses a scratch
    // file, never the benchmark tables; per-query work is unaffected.
    spark.range(100000).selectExpr("id % 10 AS k", "id AS v")
      .groupBy("k").sum("v").count()
    val warmDir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_bench_warm").toString
    spark.range(1000).write.mode("overwrite").parquet(warmDir)
    spark.read.parquet(warmDir).count()
    // Deterministic execution order: `queries` is a HashMap, so
    // iteration order was unspecified and whichever query ran first
    // absorbed residual first-use costs (parquet footer reads, codegen
    // of new operator shapes) — the r2/r3 driver benches blamed 5-11s
    // on arbitrary queries for exactly this reason. Sort by name.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Untimed warm pass (default on; SPARK_GRAFT_BENCH_WARM=0 skips):
    // runs every query once so the timed pass measures steady-state
    // execution, not first-use JIT/codegen/footer-cache effects. Write
    // queries are mode=overwrite, so the second run is equivalent.
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM", "1") != "0")
      ordered.foreach { case (_, fn) =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      }
    // Fail-loud: a query that throws must never bench as a near-zero
    // "success" — count it and surface `errors` in the JSON line so
    // the driver (and any regression diff) sees breakage immediately.
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // Three timed passes; the round's HEADLINE (`value`, `queries`) is
    // the per-query MEDIAN of the three — any single pass carries
    // ±20-30 % host contention (BASELINE.md), and r11 shipped a 241 s
    // contended pass-1 as the number while its own median was 137 s.
    // Pass 1's total is still reported (`first_pass_sec`) for
    // continuity with pre-r12 rounds whose `value` was pass 1.
    val passes = (1 to 3).map { pass =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => if (pass == 1) failed += name }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    val firstPass = passes.head
    val medians = firstPass.keys.map { n =>
      n -> passes.map(_(n)).sorted.apply(1)
    }.toMap
    // Locale-pinned formatting: the f-interpolator uses the JVM default
    // locale, which on comma-decimal locales emits "0,123" — invalid
    // JSON for the driver's strict parser.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val medianTotal = medians.values.sum
    val firstPassTotal = firstPass.values.sum
    // Three cost classes, so round-over-round COMPUTE movement stays
    // visible without manual exclusion:
    //  - write-IO: queries that deliberately time non-protocol table
    //    WRITES (bucketed builds, sink round-trips) — disk bandwidth;
    //  - protocol: the lake suite (every sink_lake_*/sql_lake_* query,
    //    caught BY PREFIX so a new lake query can never silently land
    //    in compute) — manifest CAS round trips, DML rewrites,
    //    micro-batch trigger floors; their cost is commit latency and
    //    changed-row volume, not scan/plan quality;
    //  - compute: everything else (the plan-quality signal).
    val writeIoQueries = Set("sink_parquet", "sink_partitioned",
      "sink_compacted", "sink_clustered",
      "sink_zorder", "sink_bloom", "csv_roundtrip", "orc_roundtrip",
      "join_bucketed")
    def isProtocol(n: String): Boolean =
      n.startsWith("sink_lake_") || n.startsWith("sql_lake_")
    // A renamed/removed sink query must not silently migrate its time
    // into the compute subtotal — surface the misses in the JSON (and
    // on stderr) instead of skewing round-over-round comparisons.
    val writeIoMissing = (writeIoQueries -- medians.keySet).toSeq.sorted
    if (writeIoMissing.nonEmpty)
      System.err.println(
        s"[bench] write-IO queries missing from the run: ${writeIoMissing.mkString(", ")}")
    val writeIo = medians.filter { case (n, _) => writeIoQueries(n) }.values.sum
    val protocol = medians.filter { case (n, _) => isProtocol(n) }.values.sum
    val compute = medianTotal - writeIo - protocol
    // Full per-query timings go to a file: with 100+ queries the map no
    // longer fits the driver's 2000-char output-tail buffer, and a
    // truncated line is unparseable.
    val full = firstPass.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val fullMed = medians.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = failed.size
    val errNames =
      if (failed.isEmpty) "[]"
      else failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val missingJson =
      writeIoMissing.map("\"" + _ + "\"").mkString("[", ",", "]")
    val protocolNames = medians.keys.filter(isProtocol).toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    // Failed queries exit in ~0.06s, so any errors>0 run has an
    // artificially low total/median — flag it so round-over-round
    // tooling never compares headline fields from a broken run.
    val invalidFlag = if (errs > 0) """"totals_invalid":true,""" else ""
    val fullPath = new java.io.File("BENCH_FULL.json")
    val w = new java.io.PrintWriter(fullPath, "UTF-8")
    try w.println(s"""{"metric":"total",$invalidFlag"value":${fmt(medianTotal)},"unit":"sec","value_is":"median_of_3_passes","first_pass_sec":${fmt(firstPassTotal)},"compute_sec":${fmt(compute)},"write_io_sec":${fmt(writeIo)},"protocol_sec":${fmt(protocol)},"write_io_queries":${writeIoQueries.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},"protocol_queries":$protocolNames,"write_io_missing":$missingJson,"aqe":$aqe,"errors":$errs,"failed":$errNames,"median_total_sec":${fmt(medianTotal)},"median_queries":$fullMed,"first_pass_queries":$full,"sf":"$sfDir"}""")
    finally w.close()
    // The printed line keeps the slowest queries, greedily, up to a
    // budget that leaves the whole line intact inside the tail buffer.
    val budget = 1600
    val slowFirst = medians.toSeq.sortBy { case (n, t) => (-t, n) }
    val picked = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    slowFirst.foreach { case (k, v) =>
      val ent = s"\"" + k + "\":" + fmt(v)
      if (used + ent.length + 1 <= budget) { picked += ent; used += ent.length + 1 }
    }
    val qs = picked.mkString("{", ",", "}")
    // Stop Spark BEFORE printing so no shutdown log line can land after
    // the JSON in the driver's combined-output tail.
    spark.stop()
    println(s"""{"metric":"total",$invalidFlag"value":${fmt(medianTotal)},"unit":"sec","value_is":"median_of_3_passes","first_pass_sec":${fmt(firstPassTotal)},"compute_sec":${fmt(compute)},"write_io_sec":${fmt(writeIo)},"protocol_sec":${fmt(protocol)},"median_total_sec":${fmt(medianTotal)},"aqe":$aqe,"errors":$errs,"queries":$qs,"n_queries":${medians.size},"queries_note":"per-query medians, slowest subset; all ${medians.size} in BENCH_FULL.json","sf":"$sfDir"}""")
  }
}
