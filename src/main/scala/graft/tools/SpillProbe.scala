package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** SPILL HONESTY probe (r16, the r15 verdict's #8): run the suite's
  * largest-shuffle queries under a deliberately memory-tight JVM and
  * prove they SPILL GRACEFULLY — same answers, no OOM — instead of
  * assuming executor memory always fits the working set. At 100 TB
  * it never does; an operator that only works when the shuffle fits
  * in RAM is not a scale design.
  *
  * Run OUTSIDE sbt so the heap is the experiment variable:
  *
  *   CP="/opt/spark/jars/[*]:target/scala-2.13/classes"  (real star)
  *   java -Xmx640m -cp "$CP" graft.tools.SpillProbe       # tight
  *   java -Xmx4g   -cp "$CP" graft.tools.SpillProbe       # roomy
  *
  * Prints one JSON line per query: wall seconds, task-metric spill
  * bytes (in-memory + on-disk), peak execution memory, and an
  * order-insensitive MD5 of the full result — the two runs must print
  * IDENTICAL hashes (graceful spill changes the cost, never the
  * answer). Queries: sql_tpch_q21 (the 4-way lineitem self-join — the
  * suite's largest shuffle) and llm_dup_clusters (iterative label
  * propagation — shuffle per round, lineage-truncated).
  */
object SpillProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val queries =
      if (args.nonEmpty) args.toSeq else Seq("sql_tpch_q21", "llm_dup_clusters")
    // SPARK_GRAFT_MEM_FRACTION squeezes the unified execution/storage
    // pool below the heap (sf0.1 working sets fit even a 640 MB heap
    // outright — peak execution 71 MB — so demonstrating the SPILL
    // path needs the pool, not just -Xmx, constrained)
    val memFrac = sys.env.get("SPARK_GRAFT_MEM_FRACTION")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    val spark = memFrac.fold(b0)(f => b0
      .config("spark.memory.fraction", f)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    val peakExec = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExec.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        }
    })

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    queries.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      memSpill.set(0L); diskSpill.set(0L); peakExec.set(0L)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener delivery is async
      // order-insensitive MULTISET hash: per-row digests (field-
      // separated — ("ab","c") must not alias ("a","bc")) sorted then
      // digested, so shuffle nondeterminism in row ORDER cannot alias
      // a difference while duplicated/lost rows always change the
      // hash (an XOR fold cancelled even-multiplicity differences —
      // the exact failure class a spill probe exists to catch)
      val md = java.security.MessageDigest.getInstance("MD5")
      val rowDigests = rows.map { r =>
        val h = md.digest(r.mkString("\u0001").getBytes("UTF-8"))
        md.reset()
        h.map("%02x".format(_)).mkString
      }.sorted
      val hash = md.digest(rowDigests.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      println(f"""{"probe":"spill","query":"$name","heap_mb":$heapMb,""" +
        f""""wall_sec":$wall%.2f,"rows":${rows.length},""" +
        f""""mem_spill_mb":${memSpill.get / 1048576},""" +
        f""""disk_spill_mb":${diskSpill.get / 1048576},""" +
        f""""peak_exec_mb":${peakExec.get / 1048576},"md5":"$hash"}""")
    }
    spark.stop()
  }
}
