package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Seam probe (r18): confirm CollectMetrics (`df.observe`) delivers
  * its metrics when the action is a DataFrameWriter V1 parquet write
  * — the mechanism every fused validate+write+stats path in
  * [[graft.streaming.LakeSink]] rests on (writeSegmentObserved) —
  * including the zero-task EMPTY write (a fused merge-insert pass
  * may write no rows; get() must return count 0, not block).
  * Prints the observed maps and the wall time of get() after each
  * write returns; measured ~7-30 ms delivery. */
object ObserveWriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "s")
    val obs = new Observation("probe_write_obs")
    val out = java.nio.file.Files
      .createTempDirectory("observe_probe").toString + "/seg"
    df.observe(obs,
        count(lit(1)).as("rows"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        count(when(col("k") > 900L, lit(1))).as("viol"))
      .select(col("k").as("kp"), col("s"))
      .write.mode("overwrite").parquet(out)
    val t0 = System.nanoTime()
    val m = obs.get
    println(s"[observeprobe] get() took ${(System.nanoTime() - t0) / 1e6} ms")
    println(s"[observeprobe] metrics = $m")
    assert(m("rows") == 1000L && m("k_min") == 1L &&
      m("k_max") == 1000L && m("viol") == 100L,
      s"unexpected metrics: $m")
    println("[observeprobe] OK — observe survives a V1 parquet write " +
      "under a projection")
    // the empty-write case: a fused merge-insert pass may write ZERO
    // rows — metrics must still deliver (count 0, null min/max), not
    // leave get() blocked
    val obs2 = new Observation("probe_write_obs_empty")
    val out2 = java.nio.file.Files
      .createTempDirectory("observe_probe2").toString + "/seg"
    df.filter(col("k") < 0L).observe(obs2,
        count(lit(1)).as("rows"), min(col("k")).as("k_min"))
      .write.mode("overwrite").parquet(out2)
    val t1 = System.nanoTime()
    val m2 = obs2.get
    println(s"[observeprobe] empty get() took " +
      s"${(System.nanoTime() - t1) / 1e6} ms; metrics = $m2")
    assert(m2("rows") == 0L && m2("k_min") == null,
      s"unexpected empty-write metrics: $m2")
    println("[observeprobe] OK — empty write delivers zero-row metrics")
    spark.stop()
  }
}
