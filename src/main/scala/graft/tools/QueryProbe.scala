package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB profile of one declared query (r16) — the tool the bench
  * lacks: BENCH_FULL.json says WHAT a query costs, this says WHERE.
  * Runs `SparkEntry.queries(<name>)` under a job listener (after one
  * untimed warm pass, optional) and prints every Spark job with its
  * wall time and call site, slowest first, plus the driver-side gap
  * (wall − Σ jobs: manifest IO, trigger coordination, planning).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.QueryProbe sink_lake_upsert_mor"
  */
object QueryProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warm = sys.env.getOrElse("SPARK_GRAFT_PROBE_WARM", "1") != "0"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, desc: String, start: Long,
      var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        jobs.put(j.jobId, Job(j.jobId, site, j.time))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(jobs.get(j.jobId)).foreach(_.end = j.time)
    })

    args.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      if (warm) { fn(spark, sfDir).count(); () }
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // async listener delivery
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.filter(_.end > 0)
        .map(j => (j.id, (j.end - j.start) / 1e3, j.desc, j.start, j.end))
      val jobSum = js.map(_._2).sum
      // jobs OVERLAP (broadcast exchanges, AQE, concurrent streaming
      // triggers), so wall − Σ(job walls) can go negative — the
      // driver gap is wall minus the MERGED busy intervals instead
      // (r16 review catch)
      var busyMs = 0L
      var hi = Long.MinValue
      js.sortBy(_._4).foreach { case (_, _, _, s0, e0) =>
        if (s0 > hi) { busyMs += e0 - s0; hi = e0 }
        else if (e0 > hi) { busyMs += e0 - hi; hi = e0 }
      }
      val busy = busyMs / 1e3
      println(f"[queryprobe] $name wall=$wall%.2f s jobs=${js.size} " +
        f"job_sum=$jobSum%.2f s busy=$busy%.2f s " +
        f"driver_gap=${wall - busy}%.2f s")
      js.sortBy(-_._2).take(25).foreach { case (id, sec, desc, _, _) =>
        println(f"[queryprobe]   job $id%4d $sec%6.2f s  $desc")
      }
    }
    spark.stop()
  }
}
