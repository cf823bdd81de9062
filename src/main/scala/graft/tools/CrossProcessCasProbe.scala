package graft.tools

import graft.streaming.LakeSink
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CROSS-PROCESS optimistic-concurrency probe (r12): the manifest CAS
  * is a hard link (`Files.createLink` → link(2), EEXIST on conflict),
  * which must serialize writers across JVM BOUNDARIES, not just
  * threads — LakeConcurrencySpec's races are in-process; this probe
  * FORKS TWO WRITER JVMs against one lake and checks the outcomes
  * that only hold if no commit was ever lost:
  *
  *  1. LOST-UPDATE COUNTER: both children run
  *     `UPDATE v = v + 1 WHERE id = 7` N times each (every pair of
  *     runs is a TRUE conflict on the same segment — the retry
  *     protocol's worst case). Final v MUST equal N_a + N_b: a single
  *     clobbered manifest or stale-read rewrite shows up as a lower
  *     count.
  *  2. DISJOINT DML: child A updates grp='a' rows, child B grp='b'
  *     rows, interleaved with the counter — each group's final value
  *     must reflect exactly its writer's increments.
  *  3. SERIALIZED HISTORY: every successful DML is exactly one
  *     manifest version; the version count must equal
  *     ingest + N_a_total + N_b_total (each child reports its
  *     successful-commit count through its exit file).
  *
  * The probe must run under plain `java -cp` (not sbt) so children
  * inherit a real classpath — the Spark jars directory glob plus
  * `target/scala-2.13/classes`.
  */
object CrossProcessCasProbe {

  private val counterOps = 20
  private val groupOps = 10

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "child") { child(args(1), args(2)); return }

    val dir = java.nio.file.Files
      .createTempDirectory("graft_xproc_lake").toString
    val spark = session("parent")
    import spark.implicits._
    LakeSink.createTable(dir, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
    // 4 segments: id 0-19, grp = a|b, v = 0; the counter row id=7 in seg 1
    (0 until 4).foreach { s =>
      val rows = (0 until 5).map { j =>
        val id = s * 5L + j
        (id, if (id % 2 == 0) "a" else "b", 0L)
      }
      LakeSink.appendSegment(spark, dir,
        rows.toDF("id", "grp", "v").coalesce(1), s"seg_b$s")
    }
    val v0 = LakeSink.readManifest(dir).version
    require(v0 == 5L, s"ingest produced v$v0, expected 5")

    val cp = System.getProperty("java.class.path")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    def fork(name: String): (Process, java.io.File) = {
      val rf = java.io.File.createTempFile(s"graft_xproc_$name", ".json")
      val pb = new ProcessBuilder(javaBin, "-Xmx3g", "-cp", cp,
        "graft.tools.CrossProcessCasProbe", "child", name,
        dir + "|" + rf.getAbsolutePath)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile(
        s"graft_xproc_${name}_log", ".txt"))
      (pb.start(), rf)
    }
    val t0 = System.nanoTime()
    val (pa, ra) = fork("a")
    val (pb, rb) = fork("b")
    require(pa.waitFor(600, java.util.concurrent.TimeUnit.SECONDS) &&
      pb.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
      "a child writer JVM hung")
    require(pa.exitValue() == 0 && pb.exitValue() == 0,
      s"child exit codes: a=${pa.exitValue()} b=${pb.exitValue()}")
    val wall = (System.nanoTime() - t0) / 1e9

    def readCounts(f: java.io.File): (Long, Long) = {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val p = s.trim.split(',')
      (p(0).toLong, p(1).toLong)
    }
    val (ctrA, grpA) = readCounts(ra)
    val (ctrB, grpB) = readCounts(rb)
    require(ctrA == counterOps && ctrB == counterOps &&
      grpA == groupOps && grpB == groupOps,
      s"children under-committed: a=($ctrA,$grpA) b=($ctrB,$grpB) — " +
        "a writer exhausted its retries; see the child logs")

    // 1. lost-update counter
    val fin = LakeSink.readTable(spark, dir)
    val counter = fin.filter(col("id") === 7L).head().getLong(2)
    require(counter == ctrA + ctrB,
      s"LOST UPDATE across processes: counter=$counter, " +
        s"expected ${ctrA + ctrB}")
    // 2. disjoint groups: every grp row got exactly its writer's adds
    //    (id=7 is grp b; it also carries the counter adds)
    val aBad = fin.filter(col("grp") === "a" && col("v") =!= grpA).count()
    val bBad = fin.filter(col("grp") === "b" && col("id") =!= 7L &&
      col("v") =!= grpB).count()
    val row7 = fin.filter(col("id") === 7L).head().getLong(2)
    require(aBad == 0 && bBad == 0 && row7 == ctrA + ctrB,
      s"disjoint updates corrupted: aBad=$aBad bBad=$bBad")
    // 3. serialized history: one version per successful commit
    val vFin = LakeSink.readManifest(dir).version
    val expectedV = v0 + ctrA + ctrB + grpA + grpB
    require(vFin == expectedV,
      s"history gap: v$vFin, expected v$expectedV " +
        "(every DML must be exactly one version)")

    println(f"""{"probe":"cross_process_cas","writers":2,""" +
      f""""counter_ops":${ctrA + ctrB},"group_ops":${grpA + grpB},""" +
      f""""final_counter":$counter,"versions":$vFin,""" +
      f""""lost_updates":0,"wall_sec":$wall%.1f}""")
  }

  /** One writer JVM: `counterOps` conflicting increments on id=7 plus
    * `groupOps` increments on its own group — each op retried until
    * its commit LANDS (an exhausted optimistic retry backs off and
    * re-runs; correctness needs exactly-N landed commits, and the
    * counter invariant would catch a double-apply). Writes
    * "landedCounter,landedGroup" to its result file. */
  private def child(name: String, packed: String): Unit = {
    val Array(dir, resultFile) = packed.split('|')
    val spark = session(s"child-$name")
    val grp = if (name == "a") "a" else "b"
    var ctr = 0L
    var grpN = 0L
    val rnd = new java.util.Random(name.hashCode)
    def landed(body: => Unit): Unit = {
      var done = false
      while (!done) {
        try { body; done = true }
        catch {
          case e: RuntimeException
              if String.valueOf(e.getMessage).contains("consecutive") =>
            Thread.sleep(50 + rnd.nextInt(100)) // contention backoff
        }
      }
    }
    (0 until counterOps).foreach { _ =>
      landed {
        LakeSink.updateWhere(spark, dir, col("id") === 7L,
          Map("v" -> (col("v") + 1L)))
      }
      ctr += 1
      if (ctr % 2 == 0 && grpN < groupOps) {
        landed {
          LakeSink.updateWhere(spark, dir,
            col("grp") === grp && col("id") =!= 7L,
            Map("v" -> (col("v") + 1L)))
        }
        grpN += 1
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(resultFile),
      s"$ctr,$grpN".getBytes("UTF-8"))
    spark.stop()
  }

  private def session(tag: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-xproc-$tag")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
