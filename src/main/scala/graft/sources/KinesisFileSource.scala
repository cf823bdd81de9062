package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-kinesis-file` — a DataSourceV2 MICRO-BATCH SOURCE that
  * replays Kinesis-style envelope fixtures shard-by-shard, exercising
  * the exact SPI seam a real Kinesis connector plugs into
  * (`MicroBatchStream`: offsets, partition planning, checkpoint
  * restart). No Kinesis jar ships in this container (SURVEY.md §0), so
  * the "stream" is a directory of text files; everything ABOVE the
  * byte-reading is the real consumer contract:
  *
  *  - record    = one line `shard \t sequence_number \t partition_key
  *    \t base64(data)`; shard identity lives IN the record, not in the
  *    file name, so the file layout can change (resharding) without
  *    touching consumer state.
  *  - shard     = unit of parallelism and ordering: one
  *    `InputPartition` per shard per micro-batch; the reader restores
  *    per-shard sequence order (Kinesis guarantees order within a
  *    shard, never across shards).
  *  - offset    = `{shard → highest consumed sequence_number}`,
  *    JSON-serialized through the DSv2 offset API — the exact
  *    checkpoint a KCL consumer keeps in its lease table. Restart
  *    resumes strictly after the committed sequence numbers; a shard
  *    unknown to the checkpoint starts from the beginning (a child of
  *    a split, or a brand-new shard).
  *  - admission = `maxRecordsPerShardPerBatch` caps how far each
  *    trigger advances per shard (the `get_records` Limit parameter),
  *    so a backlog drains as a sequence of bounded micro-batches.
  *
  * Scale honesty: a PRODUCTION connector maps one shard to one remote
  * byte-stream; this fixture reader scans every file and filters to
  * its shard (read amplification O(shards × bytes)) and sorts one
  * shard's backlog in memory — acceptable for fixtures, stated here so
  * nobody mistakes the file-IO path for the scale design. The DSv2
  * surface above it (offsets, per-shard partitions, restart, rate
  * limit) IS the scale design.
  *
  * Also exposes BATCH_READ over the same files, so a fixture can be
  * read as a plain DataFrame and checked against the DuckDB oracle —
  * that is what upgrades the §2 streaming-source row from tests-only
  * to oracle-checked (`source_kinesis_dsv2`).
  */
class KinesisFileProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kinesis-file"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisFileSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisFileTable(properties.asScala.toMap)
}

object KinesisFileSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("partition_key", StringType, nullable = false),
    StructField("data", StringType, nullable = false)))

  final case class Record(shard: String, seq: Long, pk: String, data: String)

  /** Parse one envelope line; malformed input fails loud — a consumer
    * that silently drops records is the worst Kinesis bug. */
  def parseLine(line: String): Record = {
    val f = line.split('\t')
    require(f.length == 4, s"malformed envelope line (${f.length} fields): " +
      line.take(120))
    Record(f(0), f(1).toLong, f(2), f(3))
  }

  def listFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    require(d.isDirectory, s"graft-kinesis-file path is not a directory: $dir")
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".txt"))
      .map(_.getPath).sorted.toSeq
  }

  def readAll(files: Seq[String]): Iterator[Record] =
    files.iterator.flatMap { p =>
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(p)).asScala.iterator
        .filter(_.nonEmpty).map(parseLine)
    }

  /** Highest sequence number present per shard — the "tip" of each
    * shard, i.e. what `latestOffset` reports before rate capping. */
  def availableOffsets(dir: String): Map[String, Long] =
    readAll(listFiles(dir)).foldLeft(Map.empty[String, Long]) { (m, r) =>
      m.updated(r.shard, math.max(m.getOrElse(r.shard, Long.MinValue), r.seq))
    }

  /** Per-shard end offsets advancing at most `maxPerShard` RECORDS past
    * `base` — admission control by record count (the `get_records`
    * Limit semantic), not sequence arithmetic: shard-local sequence
    * numbers are sparse (e.g. a global id sharded by partition key),
    * so `base + N` would be wrong in both directions. A shard with
    * nothing new keeps its base offset. */
  def cappedOffsets(dir: String, base: Map[String, Long],
      maxPerShard: Long): Map[String, Long] =
    readAll(listFiles(dir)).toSeq.groupBy(_.shard).map { case (shard, rs) =>
      val from = base.getOrElse(shard, Long.MinValue)
      val newSeqs = rs.iterator.map(_.seq).filter(_ > from).toArray.sorted
      val end =
        if (newSeqs.isEmpty) from
        else if (maxPerShard >= newSeqs.length) newSeqs.last
        else newSeqs(maxPerShard.toInt - 1)
      shard -> end
    }.filter(_._2 != Long.MinValue)
}

/** Offset = per-shard highest consumed sequence number. Case class so
  * the engine's offset equality (did anything new arrive?) is
  * structural. JSON keys sorted for a canonical, diffable form. */
final case class ShardOffsets(seqs: Map[String, Long]) extends Offset {
  override def json(): String =
    seqs.toSeq.sortBy(_._1)
      .map { case (s, n) => s""""$s":$n""" }
      .mkString("{", ",", "}")
}

object ShardOffsets {
  private val entry = """"([^"]+)"\s*:\s*(-?\d+)""".r
  def fromJson(json: String): ShardOffsets =
    ShardOffsets(entry.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap)
}

class KinesisFileTable(properties: Map[String, String])
    extends Table with SupportsRead {
  private val dir = properties.getOrElse("path",
    sys.error("graft-kinesis-file requires a path"))
  override def name(): String = s"graft-kinesis-file:$dir"
  override def schema(): StructType = KinesisFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new KinesisFileScan(dir,
      Option(options.get("maxRecordsPerShardPerBatch")).map(_.toLong)
        .getOrElse(Long.MaxValue))
}

class KinesisFileScan(dir: String, maxPerShard: Long) extends Scan {
  override def readSchema(): StructType = KinesisFileSource.schema
  override def toBatch: Batch = new KinesisFileBatch(dir)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new KinesisFileMicroBatchStream(dir, maxPerShard)
}

/** One micro-batch slice of one shard: records with
  * fromSeq < sequence_number <= toSeq, in sequence order. */
final case class ShardSlicePartition(shard: String, files: Seq[String],
    fromSeq: Long, toSeq: Long) extends InputPartition

/** Stateless by design: admission control receives the start offset
  * from the engine (`SupportsAdmissionControl.latestOffset(start,
  * limit)`), so the stream keeps NO consumption state of its own —
  * the checkpoint is the single source of truth, which is what makes
  * restart and resharding correct for free. (A plain
  * `MicroBatchStream.latestOffset()` MUST report everything available:
  * rate-capping it starves `processAllAvailable`, which compares
  * committed offsets against the capped report and concludes the
  * stream is caught up after one batch.) */
class KinesisFileMicroBatchStream(dir: String, maxPerShard: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = ShardOffsets(Map.empty)

  override def deserializeOffset(json: String): Offset =
    ShardOffsets.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerShard == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerShard)

  /** The engine's per-trigger admitted end: at most `limit` records
    * PER SHARD past `start` (the get_records Limit semantic). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val base = start.asInstanceOf[ShardOffsets].seqs
    val cap = limit match {
      case _: ReadAllAvailable => Long.MaxValue
      case m: ReadMaxRows => m.maxRows()
      case _ => maxPerShard
    }
    ShardOffsets(KinesisFileSource.cappedOffsets(dir, base, cap))
  }

  /** True tip of every shard, uncapped — what tells the engine (and
    * processAllAvailable) how far behind the admitted offset is. */
  override def reportLatestOffset(): Offset =
    ShardOffsets(KinesisFileSource.availableOffsets(dir))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl.latestOffset(start, limit) is used")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].seqs
    val e = end.asInstanceOf[ShardOffsets].seqs
    val files = KinesisFileSource.listFiles(dir)
    e.toSeq.sortBy(_._1).flatMap { case (shard, to) =>
      val from = s.getOrElse(shard, Long.MinValue)
      if (to > from) Some(ShardSlicePartition(shard, files, from, to)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisFileReaderFactory

  override def commit(end: Offset): Unit = () // files never truncate
  override def stop(): Unit = ()
}

/** Batch read = every record, one partition per shard (full range). */
class KinesisFileBatch(dir: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val files = KinesisFileSource.listFiles(dir)
    KinesisFileSource.availableOffsets(dir).toSeq.sortBy(_._1).map {
      case (shard, tip) =>
        ShardSlicePartition(shard, files, Long.MinValue, tip): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisFileReaderFactory
}

class KinesisFileReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardSlicePartition]
    new PartitionReader[InternalRow] {
      // restore per-shard sequence order across files: a resharded
      // fixture may spread one shard's records over several files
      private val it = KinesisFileSource.readAll(p.files)
        .filter(r => r.shard == p.shard && r.seq > p.fromSeq && r.seq <= p.toSeq)
        .toArray.sortBy(_.seq).iterator
      private var cur: KinesisFileSource.Record = _
      override def next(): Boolean = {
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(cur.shard), cur.seq,
        UTF8String.fromString(cur.pk), UTF8String.fromString(cur.data)))
      override def close(): Unit = ()
    }
  }
}
