package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** A continuously-ingesting parquet lake with PERIODIC COMPACTION —
  * the long-lived-sink maintenance op a streaming pipeline needs once
  * it has run for months: micro-batches land as small segments, and
  * every K batches the accumulated small segments are rewritten into
  * one compacted segment (the `sink_compacted` rewrite), WITHOUT ever
  * exposing readers to duplicates or loss, even if the process dies
  * between the compaction write and its commit.
  *
  * The atomicity mechanism is a MANIFEST POINTER, the core idea every
  * table format (Iceberg/Delta/Hudi) builds on: data files are
  * invisible until a manifest version lists them, and publishing a new
  * manifest version is a single atomic rename. So:
  *
  *  - ingest: write `seg_b<batchId>` (mode=overwrite → replay-safe),
  *    then commit manifest v+1 = v ∪ {seg_b<batchId>}. A batch
  *    replayed after a crash overwrites its own segment and skips the
  *    manifest add (already present) — idempotent.
  *  - compaction: rewrite all live b-segments into `seg_c<batchId>`
  *    (again overwrite), then commit manifest v+1 that swaps the
  *    b-segments for the one c-segment, then best-effort delete the
  *    orphaned b-segment dirs. A crash BETWEEN the compacted write
  *    and the manifest commit leaves the manifest unchanged — readers
  *    still see the b-segments exactly once; on restart the batch
  *    replays, the compacted segment is overwritten, and the commit
  *    completes. A crash after commit but before cleanup leaves
  *    orphaned dirs no manifest references — invisible to readers.
  *
  * The manifest also carries `maxb`, the highest batchId ever
  * ingested. It closes the OTHER crash window: die after the
  * compaction commit (which removed seg_b<id> from the manifest) but
  * before the streaming checkpoint commit, and the batch replays in
  * full — without `maxb` the replayed ingest would re-add its
  * b-segment next to the c-segment that already holds those rows
  * (duplication). With it, a replayed batch whose id ≤ maxb skips the
  * manifest add and deletes its freshly-rewritten orphan dir.
  *
  * On a real object store the atomic rename becomes a conditional put
  * / log append (the same contract); everything else is unchanged.
  * Readers are always consistent: they resolve the highest committed
  * manifest version and read exactly the segments it lists.
  */
object LakeSink {

  /** Committed lake state: manifest version, highest ingested batchId,
    * live segment dirs, and — since the schema-evolution support — the
    * table's current schema generation and (for generation > 0) its
    * full schema as Spark JSON. Keeping the SCHEMA IN THE MANIFEST is
    * the table-format move that matters at 100 TB: readers never merge
    * a million parquet footers to discover columns (Spark's
    * `mergeSchema` is a full metadata scan); the manifest is the one
    * source of truth, exactly as in Iceberg/Delta. `schemaV == 0` ⇒
    * pre-evolution lake, schema comes from the (homogeneous) segment
    * footers as before.
    *
    * `stats` carries per-segment min/max for BIGINT columns the writer
    * chose to track (time keys, id keys — the deployment profile
    * stores event time as epoch-µs BIGINT precisely so it has usable
    * stats). Stats in the MANIFEST, not parquet footers, is the
    * Delta/Iceberg file-skipping design: planning a selective read or
    * DML over a million-segment lake consults one manifest instead of
    * opening a million footers. Stats are advisory bounds — a segment
    * with no recorded stats for a column is always scanned, so readers
    * stay correct on mixed lakes. */
  /** Per-column segment statistics (r11: beyond BIGINT min/max —
    * string min/max and null counts, so `WHERE event_type = 'error'`
    * DML/reads and `IS NULL` predicates prune too). `nulls == -1`
    * means unknown (legacy manifests recorded none): null-based
    * pruning then stays off for that entry while min/max pruning keeps
    * working — advisory-bounds semantics throughout. */
  sealed trait ColStat { def nulls: Long }
  final case class LongStat(lo: Long, hi: Long,
      nulls: Long = -1L) extends ColStat
  final case class StrStat(lo: String, hi: String,
      nulls: Long = -1L) extends ColStat

  /** One segment's DELETION VECTOR (r12, merge-on-read point DML):
    * `file` names a parquet dir under `outDir/_dv/` holding the
    * segment's deleted row positions as (file_name, row_index) pairs;
    * `rows` is the cumulative deleted-row count (observability — the
    * DV file is authoritative). DV files are immutable: a second
    * point delete on the same segment writes a NEW file carrying the
    * union and the manifest entry is replaced; superseded files
    * become [[vacuum]] orphans. */
  final case class DvRef(file: String, rows: Long)

  /** One WHEN-clause of a general MERGE (r12) — the argument form of
    * [[mergeClauses]]. Conditions and value expressions are SQL text
    * over the aliases `t` (target row) and `s` (source row): `Update`
    * and `Delete` serve both the MATCHED side (t and s in scope) and
    * the NOT MATCHED BY SOURCE side (t only — s columns are NULL);
    * `Insert` serves the NOT MATCHED side (s only). `set`/`values` of
    * `None` means the star form (`UPDATE SET *` / `INSERT *` — every
    * target column from the same-named source column); an explicit
    * list assigns named target columns, `Insert` filling unassigned
    * columns with typed NULL (the SQL MERGE default). Clauses fire
    * FIRST-MATCH-WINS in list order, rows firing no clause pass
    * through unchanged — standard SQL MERGE semantics. */
  sealed trait MergeClause { def cond: Option[String] }
  object MergeClause {
    final case class Update(cond: Option[String],
        set: Option[Seq[(String, String)]]) extends MergeClause
    final case class Delete(cond: Option[String]) extends MergeClause
    final case class Insert(cond: Option[String],
        values: Option[Seq[(String, String)]]) extends MergeClause
  }

  /** One segment's PARTITION VALUE (r12, Hive/Delta partition-column /
    * Iceberg partition-spec analog): every row of the segment has
    * `col == value` (`col` is the PHYSICAL column name — partition
    * facts follow the bytes across renames; `value = None` is the NULL
    * partition), and the segment held `rows` rows when written. The
    * fact is what makes retention DML metadata-only: a predicate
    * referencing only the partition column is decided per segment on
    * the manifest alone — TRUE drops the segment with zero data jobs,
    * FALSE skips it. `col` is recorded PER SEGMENT, not read from the
    * table-level spec, so changing the spec later (partition
    * evolution) leaves old segments deciding under the column they
    * were actually written by. */
  final case class PartVal(col: String, value: Option[String], rows: Long,
      subs: Seq[(String, Option[String])] = Nil) {
    /** Every (column, value) fact this segment carries: the primary
      * dimension plus the r15 composite dimensions (`subs`) — a
      * (day × tenant)-partitioned segment records both, so retention
      * and backfill predicates over EITHER (or both) decide it by
      * metadata. Old manifests parse with `subs = Nil` (single-column
      * facts) — fully backward compatible. */
    def facts: Seq[(String, Option[String])] = (col, value) +: subs
  }

  final case class Manifest(version: Long, maxB: Long, segs: Seq[String],
      schemaV: Long = 0L, schemaJson: Option[String] = None,
      stats: Map[String, Map[String, ColStat]] = Map.empty,
      txns: Map[String, Long] = Map.empty,
      expects: Map[String, String] = Map.empty,
      // Per-VERSION commit annotations (events, not cumulative state):
      // `cdcSegs` are THIS version's change-data segments (row-level
      // pre/post images a DML wrote alongside its rewrite — Delta's
      // _change_data files; invisible to table readers, consumed by
      // [[changesCdcBetween]]); `dataChange = false` marks a commit
      // that rearranged bytes without changing rows (compaction —
      // Delta's dataChange=false AddFile), which a change feed skips.
      cdcSegs: Seq[String] = Nil,
      dataChange: Boolean = true,
      // Cumulative per-segment deletion vectors (merge-on-read state,
      // keyed by live segment): every reader reconciles them at scan,
      // compaction applies them physically, vacuum GCs their files.
      dv: Map[String, DvRef] = Map.empty,
      // COLUMN MAPPING (r12, Delta columnMapping / Iceberg field-id
      // analog): logical column name → PHYSICAL name as written in
      // parquet files. Empty = identity (pre-mapping lakes, physical
      // == logical, zero overhead). Activated by the first RENAME/DROP
      // COLUMN, after which it is TOTAL over the logical schema:
      // renames change only the logical key (metadata-only — old
      // segments keep reading through the stable physical id), drops
      // remove the entry (the physical column lingers in old files,
      // unselected), and later ADD COLUMNs mint fresh physical names
      // so a re-added name can never resurrect lingering data.
      colmap: Map[String, String] = Map.empty,
      // PARTITION SPEC (r12): the PHYSICAL column new partitioned
      // appends split by (None = unpartitioned table). A declared
      // table property like the schema — carried across commits,
      // changeable by partition evolution without touching data.
      partSpec: Option[String] = None,
      // Cumulative per-segment partition values (keyed by live
      // segment, like stats/dv): the manifest facts that let
      // partition-covered DML drop whole segments with zero data jobs.
      parts: Map[String, PartVal] = Map.empty,
      // Per-VERSION annotation (like cdcSegs): segments THIS version
      // dropped whole by partition-covered metadata delete under
      // cdc=true — the change feed reads the (dead but vacuum-retained)
      // segment files themselves as delete rows, so even a
      // metadata-only drop costs O(0) at DML time and O(dropped rows)
      // only when a feed consumer actually reads the window.
      cdcDropSegs: Seq[String] = Nil,
      // BLOOM COLUMNS (r12, Delta bloom-filter index / Iceberg-puffin
      // analog): PHYSICAL columns every staged segment writes a bloom
      // sidecar for (`_blooms/<seg>.<col>.bloom`). A declared table
      // property like partSpec — carried across commits. The sidecars
      // themselves are ADVISORY and not listed here: they live at a
      // deterministic path keyed by the (immutable-once-committed)
      // segment name, a missing file just means scan — which keeps
      // clones, imports, pre-declaration segments, and crash orphans
      // correct with zero bookkeeping. They answer the point-predicate
      // question min/max stats cannot: on a high-cardinality column
      // with uniform layout every segment's [min,max] spans every
      // probe, but `WHERE id = x` bloom-prunes to the segments that
      // MAY hold x.
      bloomCols: Seq[String] = Nil,
      // COPY INTO load history (r15, Delta's COPY INTO file-dedup
      // ledger): identity hashes (of the absolute source path) of
      // landing-zone files already loaded by [[copyInto]]. CUMULATIVE
      // and APPEND-ONLY — unlike stats/dv/parts it is NOT keyed by
      // live segment and survives the segment's deletion, because
      // "this landing-zone file was ingested" stays true after
      // retention DML removes the rows (re-running the load must not
      // resurrect deleted data). Delta carries the same ledger; each
      // entry is one short hash line, so a snapshot's ledger cost is
      // O(files ever loaded) — the same order as its per-segment
      // lines.
      copied: Set[String] = Set.empty,
      // PROTOCOL VERSION GATE (r15, Delta's minReaderVersion /
      // minWriterVersion): the minimum engine capability this
      // manifest's FEATURES require. Some state is unreadable-if-
      // ignored (a reader that skips `dvec=` lines RESURRECTS deleted
      // rows; one that skips `colmap=` misreads renamed columns) and
      // some is uncarryable-if-ignored (a writer that drops `expect=`
      // stops enforcing contracts; one that drops `copy=` breaks load
      // idempotency) — silently wrong, not loudly broken. Writers
      // compute these from the state they commit ([[requiredReader]]
      // / [[requiredWriter]]); readers refuse manifests above
      // [[supportedReader]], writers refuse to commit against parents
      // above [[supportedWriter]]. Absent headers parse as 1 (all
      // pre-gate manifests). */
      minReader: Long = 1L,
      minWriter: Long = 1L,
      // PER-SEGMENT ROW COUNTS (r17, the r16 verdict's #7): physical
      // rows each live segment holds, recorded once at segment-commit
      // time (Delta's AddFile numRecords / Iceberg's record_count).
      // ADVISORY like stats — a missing entry falls back to the
      // segment's parquet footers, so legacy manifests, foreign
      // writers, and readers that skip `segrows=` lines all stay
      // correct (no protocol-gate bump). What it buys: receipts and
      // row-count answers (EXPORT, DESCRIBE DETAIL) become O(manifest)
      // instead of O(segments) serial driver footer opens — at
      // thousands of segments the footer walk contradicted EXPORT's
      // own O(links)-metadata claim.
      segRows: Map[String, Long] = Map.empty) {
    /** Physical rows in a live segment: the manifest's recorded count,
      * or -1 when unrecorded (caller falls back to footer reads). */
    def rowsOf(seg: String): Long = segRows.getOrElse(seg, -1L)
    /** Columns any live segment tracks stats for (PHYSICAL names —
      * stats follow the bytes, surviving renames). */
    def trackedCols: Seq[String] =
      stats.values.flatMap(_.keys).toSeq.distinct.sorted
    /** Physical name of a logical column. */
    def physicalOf(logical: String): String =
      colmap.getOrElse(logical, logical)
    /** Logical name currently mapped to a physical column, if any
      * (None = dropped or never existed). */
    def logicalOf(physical: String): Option[String] =
      if (colmap.isEmpty) Some(physical)
      else colmap.collectFirst { case (l, p) if p == physical => l }
  }

  /** Highest manifest feature generations THIS engine understands.
    * Reader 2 = deletion vectors + column mapping (unreadable-if-
    * ignored); writer 2 = expectations + DV supersession, writer 3 =
    * the COPY INTO ledger (uncarryable-if-ignored). Bump when a new
    * feature joins one of those classes. */
  val supportedReader: Long = 2L
  val supportedWriter: Long = 3L

  /** Reader generation the given state requires. */
  private def requiredReader(dv: Map[String, DvRef],
      colmap: Map[String, String]): Long =
    if (dv.nonEmpty || colmap.nonEmpty) 2L else 1L

  /** Writer generation the given state requires. */
  private def requiredWriter(dv: Map[String, DvRef],
      expects: Map[String, String], copied: Set[String]): Long =
    if (copied.nonEmpty) 3L
    else if (dv.nonEmpty || expects.nonEmpty) 2L
    else 1L

  /** Loud refusal a reader raises on a manifest from the future. */
  private def gateReader(outDir: String, v: Long, minReader: Long): Unit =
    if (minReader > supportedReader)
      sys.error(s"manifest v$v at $outDir requires reader version " +
        s"$minReader; this engine supports $supportedReader — its " +
        "features would be silently misread (not skipped): upgrade " +
        "the engine before reading this table")

  /** Loud refusal a writer raises before committing against a parent
    * whose features it could not carry forward. */
  private def gateWriter(outDir: String, parent: Manifest): Unit =
    if (parent.minWriter > supportedWriter)
      sys.error(s"lake at $outDir (v${parent.version}) requires " +
        s"writer version ${parent.minWriter}; this engine supports " +
        s"$supportedWriter — committing would silently drop protocol " +
        "state: upgrade the engine before writing to this table")

  private def manifestDir(outDir: String): Path = Paths.get(outDir, "_manifest")

  /** Directory listing that CLOSES the underlying stream — `Files.list`
    * holds a directory file descriptor until closed, and iterator-style
    * consumption never closes it, so every history()/vacuum()/tip-read
    * call would leak one fd (a real leak on the user-facing audit path
    * of a long-lived writer). */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Committed manifest versions at `outDir`, ascending. */
  private def manifestVersions(outDir: String): Seq[Long] = {
    val md = manifestDir(outDir)
    if (!Files.isDirectory(md)) Nil
    else listDir(md)
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{10}\\.txt") =>
        s.substring(1, 11).toLong }
      .sorted
  }

  /** Parse one committed manifest file. Header lines (`maxb=`,
    * `schemav=`, `schema=`, repeated `stats=seg|col|min|max`,
    * repeated `txn=app|lastBatchId`) precede the segment list; segment
    * names never contain `=` so the split is unambiguous, and old
    * manifests without the newer headers parse as schemaV 0 / no
    * stats / no txns. */
  private def parseManifest(outDir: String, v: Long): Manifest =
    parseSnapshotLines(outDir, v, Files.readAllLines(
      manifestDir(outDir).resolve(f"v$v%010d.txt")).asScala
      .filter(_.nonEmpty).toSeq)

  /** Decode one stats payload (the part after `stats=`/`strstats=`)
    * to (seg, col, stat). */
  private def parseStatPayload(outDir: String, v: Long, l: String,
      isStr: Boolean): (String, String, ColStat) = {
    def unb64(s: String): String =
      new String(java.util.Base64.getDecoder.decode(s), "UTF-8")
    l.split('|') match {
      case Array(seg, c, lo, hi) if !isStr => // pre-r11: no null count
        (seg, c, LongStat(lo.toLong, hi.toLong, -1L))
      case Array(seg, c, lo, hi, n) =>
        (seg, c,
          if (isStr) StrStat(unb64(lo), unb64(hi), n.toLong)
          else LongStat(lo.toLong, hi.toLong, n.toLong))
      case _ => sys.error(s"manifest v$v at $outDir: bad stats line $l")
    }
  }

  private def parseSnapshotLines(outDir: String, v: Long,
      lines0: Seq[String]): Manifest = {
    val lines = lines0
    val (headers, segs) = lines.partition(_.contains("="))
    val (statLines, rest00) = headers.partition(_.startsWith("stats="))
    val (strStatLines, rest0) = rest00.partition(_.startsWith("strstats="))
    val (txnLines, rest1) = rest0.partition(_.startsWith("txn="))
    val (dvLines, rest2) = rest1.partition(_.startsWith("dvec="))
    val (cmLines, rest3) = rest2.partition(_.startsWith("colmap="))
    val (partLines, rest4) = rest3.partition(_.startsWith("part="))
    val (cdcDropLines, rest45) = rest4.partition(_.startsWith("cdcdrop="))
    val (rowsLines, rest46) = rest45.partition(_.startsWith("segrows="))
    val (copyLines, rest5) = rest46.partition(_.startsWith("copy="))
    val (cdcLines, rest) = rest5.partition(_.startsWith("cdc="))
    val (expectLines, scalarHeaders) = rest.partition(_.startsWith("expect="))
    val h = scalarHeaders.map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    val maxB = h.getOrElse("maxb",
      sys.error(s"manifest v$v at $outDir missing maxb header")).toLong
    val stats =
      (statLines.map(l =>
          parseStatPayload(outDir, v, l.stripPrefix("stats="), isStr = false)) ++
        strStatLines.map(l =>
          parseStatPayload(outDir, v, l.stripPrefix("strstats="), isStr = true)))
      .groupBy(_._1)
      .map { case (seg, rows) =>
        seg -> rows.map { case (_, c, st) => c -> st }.toMap
      }
    val txns = txnLines.map { l =>
      l.stripPrefix("txn=").split('|') match {
        case Array(app, id) => app -> id.toLong
        case _ => sys.error(s"manifest v$v at $outDir: bad txn line $l")
      }
    }.toMap
    // name|sql, split once — the SQL side may itself contain '|'
    val expects = expectLines.map { l =>
      l.stripPrefix("expect=").split("\\|", 2) match {
        case Array(n, sql) => n -> sql
        case _ => sys.error(s"manifest v$v at $outDir: bad expect line $l")
      }
    }.toMap
    Manifest(v, maxB, segs, h.get("schemav").map(_.toLong).getOrElse(0L),
      h.get("schema"), stats, txns, expects,
      cdcLines.map(_.stripPrefix("cdc=")),
      !h.get("datachange").contains("0"),
      dvLines.map(l => parseDvPayload(outDir, v, l.stripPrefix("dvec="))).toMap,
      cmLines.map(l => parseColmapPayload(outDir, v,
        l.stripPrefix("colmap="))).toMap,
      h.get("partspec"),
      partLines.map(l => parsePartPayload(outDir, v,
        l.stripPrefix("part="))).toMap,
      cdcDropLines.map(_.stripPrefix("cdcdrop=")),
      h.get("bloomcols").map(_.split('|').toSeq).getOrElse(Nil),
      copyLines.map(_.stripPrefix("copy=")).toSet,
      {
        val mr = h.get("minreader").map(_.toLong).getOrElse(1L)
        gateReader(outDir, v, mr)
        mr
      },
      h.get("minwriter").map(_.toLong).getOrElse(1L),
      rowsLines.map(l => parseSegRowsPayload(outDir, v,
        l.stripPrefix("segrows="))).toMap)
  }

  /** Decode one segment-rows payload (`seg|rows`). */
  private def parseSegRowsPayload(outDir: String, v: Long,
      l: String): (String, Long) = l.split('|') match {
    case Array(seg, rows) => seg -> rows.toLong
    case _ => sys.error(s"manifest v$v at $outDir: bad segrows line $l")
  }

  /** Decode one partition-value payload (`seg|col|rows|b64(value)`
    * with optional trailing `|col2|b64(value2)…` pairs for composite
    * specs, r15; an empty value field = NULL partition). */
  private def parsePartPayload(outDir: String, v: Long,
      l: String): (String, PartVal) = {
    def dec(enc: String): Option[String] =
      if (enc.isEmpty) None
      else Some(new String(
        java.util.Base64.getDecoder.decode(enc), "UTF-8"))
    l.split("\\|", -1) match {
      case arr if arr.length >= 4 && arr.length % 2 == 0 =>
        val Array(seg, c, rows, enc) = arr.take(4)
        seg -> PartVal(c, dec(enc), rows.toLong,
          arr.drop(4).grouped(2).map {
            case Array(sc, se) => sc -> dec(se)
          }.toSeq)
      case _ => sys.error(s"manifest v$v at $outDir: bad part line $l")
    }
  }

  private def partLine(seg: String, pv: PartVal): String = {
    def enc(v: Option[String]): String =
      v.fold("")(s => java.util.Base64.getEncoder
        .encodeToString(s.getBytes("UTF-8")))
    s"part=$seg|${pv.col}|${pv.rows}|${enc(pv.value)}" +
      pv.subs.map { case (c, v) => s"|$c|${enc(v)}" }.mkString
  }

  /** Decode one column-mapping payload (`logical|physical`). */
  private def parseColmapPayload(outDir: String, v: Long,
      l: String): (String, String) = l.split('|') match {
    case Array(lg, ph) => lg -> ph
    case _ => sys.error(s"manifest v$v at $outDir: bad colmap line $l")
  }

  /** Decode one deletion-vector payload (`seg|file|rows`). */
  private def parseDvPayload(outDir: String, v: Long,
      l: String): (String, DvRef) = l.split('|') match {
    case Array(seg, file, rows) => seg -> DvRef(file, rows.toLong)
    case _ => sys.error(s"manifest v$v at $outDir: bad dvec line $l")
  }

  // ---- manifest LOG: delta records + periodic checkpoints ------------
  // A full-snapshot manifest per commit is O(segments) WRITE per commit
  // and O(segments) per tip read — at millions of segments/commits the
  // cumulative write volume is quadratic, the failure mode Delta/Iceberg
  // solve with an incremental log + periodic checkpoint. Same here:
  // most version files are small DELTA records (the segments this
  // commit added/removed plus the compact scalar state), and every
  // [[snapshotInterval]]-th version is a full SNAPSHOT. Reconstruction
  // walks back ≤ interval files to the nearest snapshot and replays
  // forward — commit cost O(edit), tip-read O(segments + interval·edit),
  // cumulative manifest bytes O(commits·edit + commits·segments/interval).
  // The CAS is untouched: one hard-linked file per version, whatever its
  // kind, so racing writers still serialize per version; mixed chains
  // (external tools committing full snapshots via [[commitManifest]])
  // remain valid — any snapshot resets the walk-back.

  /** Every k-th version is a full snapshot; the rest are deltas. 32
    * bounds walk-back reads at 32 small files while keeping snapshot
    * write amplification to segments/32 per commit on average. */
  val snapshotInterval: Int = 32

  /** One committed version file: a full snapshot, or a delta against
    * its immediate parent. Scalar state (maxB, txns, expects, schemaV)
    * is stored in full on every record — it is compact; only the
    * O(segments) parts (segment list, per-segment stats) are
    * differential. `schemaJson` is written only when the generation
    * changed; reconstruction carries it forward otherwise. */
  private final case class DeltaRec(version: Long, maxB: Long,
      adds: Seq[String], removes: Set[String],
      addStats: Map[String, Map[String, ColStat]],
      schemaV: Long, schemaJson: Option[String],
      txns: Map[String, Long], expects: Map[String, String],
      cdcSegs: Seq[String], dataChange: Boolean,
      dvSets: Map[String, DvRef], colmap: Map[String, String],
      partSpec: Option[String], addParts: Map[String, PartVal],
      cdcDropSegs: Seq[String], bloomCols: Seq[String],
      addCopied: Set[String], minReader: Long, minWriter: Long,
      addRows: Map[String, Long])

  private def parseDelta(outDir: String, v: Long,
      lines: Seq[String]): DeltaRec = {
    val h = scala.collection.mutable.Map.empty[String, String]
    val adds = Seq.newBuilder[String]
    val removes = Set.newBuilder[String]
    val statLines = Seq.newBuilder[(String, String, ColStat)]
    val txns = Map.newBuilder[String, Long]
    val expects = Map.newBuilder[String, String]
    val cdcSegs = Seq.newBuilder[String]
    val dvSets = Map.newBuilder[String, DvRef]
    val colmap = Map.newBuilder[String, String]
    val addParts = Map.newBuilder[String, PartVal]
    val cdcDropSegs = Seq.newBuilder[String]
    val addCopied = Set.newBuilder[String]
    val addRows = Map.newBuilder[String, Long]
    lines.foreach { l =>
      val i = l.indexOf('=')
      require(i > 0, s"manifest delta v$v at $outDir: bad line $l")
      val (k, value) = (l.substring(0, i), l.substring(i + 1))
      k match {
        case "delta" =>
        case "add" => adds += value
        case "remove" => removes += value
        case "cdc" => cdcSegs += value
        case "cdcdrop" => cdcDropSegs += value
        case "copy" => addCopied += value
        case "dvec" => dvSets += parseDvPayload(outDir, v, value)
        case "colmap" => colmap += parseColmapPayload(outDir, v, value)
        case "part" => addParts += parsePartPayload(outDir, v, value)
        case "segrows" => addRows += parseSegRowsPayload(outDir, v, value)
        case "stats" =>
          statLines += parseStatPayload(outDir, v, value, isStr = false)
        case "strstats" =>
          statLines += parseStatPayload(outDir, v, value, isStr = true)
        case "txn" => value.split('|') match {
          case Array(app, id) => txns += app -> id.toLong
          case _ => sys.error(s"manifest delta v$v at $outDir: bad txn line $l")
        }
        case "expect" => value.split("\\|", 2) match {
          case Array(n, sql) => expects += n -> sql
          case _ => sys.error(s"manifest delta v$v at $outDir: bad expect line $l")
        }
        case other => h(other) = value
      }
    }
    val addStats = statLines.result().groupBy(_._1).map { case (seg, rows) =>
      seg -> rows.map { case (_, c, st) => c -> st }.toMap
    }
    DeltaRec(v,
      h.getOrElse("maxb",
        sys.error(s"manifest delta v$v at $outDir missing maxb")).toLong,
      adds.result(), removes.result(), addStats,
      h.get("schemav").map(_.toLong).getOrElse(0L), h.get("schema"),
      txns.result(), expects.result(), cdcSegs.result(),
      !h.get("datachange").contains("0"), dvSets.result(),
      colmap.result(), h.get("partspec"), addParts.result(),
      cdcDropSegs.result(),
      h.get("bloomcols").map(_.split('|').toSeq).getOrElse(Nil),
      addCopied.result(),
      {
        val mr = h.get("minreader").map(_.toLong).getOrElse(1L)
        gateReader(outDir, v, mr)
        mr
      },
      h.get("minwriter").map(_.toLong).getOrElse(1L),
      addRows.result())
  }

  /** Auxiliary CHECKPOINT file for version `v` (Delta's
    * `.checkpoint` move): same snapshot format as a full manifest,
    * written OUTSIDE the CAS (deterministic content for a given
    * committed state, so rewrites are idempotent). [[vacuum]]
    * materializes one at the retention boundary before deleting the
    * older files a delta chain would otherwise need for
    * reconstruction. */
  private def snapPath(outDir: String, v: Long): Path =
    manifestDir(outDir).resolve(f"v$v%010d.snap")

  /** Parse version `v` as whichever kind it is. A `.snap` checkpoint,
    * when present, short-circuits the walk-back (it IS the
    * reconstructed state). */
  private def parseVersionFile(outDir: String,
      v: Long): Either[DeltaRec, Manifest] = {
    val snap = snapPath(outDir, v)
    if (Files.exists(snap))
      return Right(parseSnapshotLines(outDir, v,
        Files.readAllLines(snap).asScala.filter(_.nonEmpty).toSeq))
    val lines = Files.readAllLines(
      manifestDir(outDir).resolve(f"v$v%010d.txt")).asScala
      .filter(_.nonEmpty).toSeq
    if (lines.headOption.contains("delta=1"))
      Left(parseDelta(outDir, v, lines))
    else Right(parseSnapshotLines(outDir, v, lines))
  }

  private def applyDelta(acc: Manifest, d: DeltaRec): Manifest =
    Manifest(d.version, d.maxB,
      acc.segs.filterNot(d.removes) ++ d.adds,
      d.schemaV,
      if (d.schemaV != acc.schemaV) d.schemaJson else acc.schemaJson,
      (acc.stats -- d.removes) ++ d.addStats,
      d.txns, d.expects, d.cdcSegs, d.dataChange,
      (acc.dv -- d.removes) ++ d.dvSets, d.colmap, d.partSpec,
      (acc.parts -- d.removes) ++ d.addParts, d.cdcDropSegs,
      d.bloomCols,
      acc.copied ++ d.addCopied,
      // never auto-downgrade along a delta chain (Delta's rule): a
      // purge that empties dv does not re-admit old readers mid-log
      math.max(acc.minReader, d.minReader),
      math.max(acc.minWriter, d.minWriter),
      (acc.segRows -- d.removes) ++ d.addRows)

  /** Reconstruct the committed state at version `v`: walk back to the
    * nearest snapshot (≤ [[snapshotInterval]] small files, or the
    * implicit empty v0), replay deltas forward. */
  private[graft] def manifestAt(outDir: String, v: Long): Manifest = {
    if (v == 0L) return Manifest(0L, -1L, Nil)
    var deltas = List.empty[DeltaRec]
    var cur = v
    var base: Manifest = null
    while (base == null) {
      if (cur == 0L) base = Manifest(0L, -1L, Nil)
      else parseVersionFile(outDir, cur) match {
        case Right(m) => base = m
        case Left(d) => deltas ::= d; cur -= 1
      }
    }
    deltas.foldLeft(base)(applyDelta)
  }

  /** Highest committed manifest. Version 0 = empty lake. */
  def readManifest(outDir: String): Manifest = {
    val versions = manifestVersions(outDir)
    if (versions.isEmpty) Manifest(0L, -1L, Nil)
    else manifestAt(outDir, versions.max)
  }

  /** Commit `m` (= parent.version + 1) through the manifest LOG:
    * a delta record against `parent` normally, a full snapshot on
    * every [[snapshotInterval]]-th version. Same CAS semantics as
    * [[commitManifest]] (false = version already taken). This is the
    * committer every internal writer uses; [[commitManifest]] remains
    * the always-snapshot primitive for callers without the parent in
    * hand. */
  def commitNext(outDir: String, parent: Manifest, m: Manifest): Boolean = {
    val parentSegs = parent.segs.toSet
    val liveSet = m.segs.toSet
    val adds = m.segs.filterNot(parentSegs)
    val removes = parent.segs.filterNot(liveSet).toSet
    // differential stats: entries new or changed vs the parent (live
    // segments only — commitManifest applies the same liveness rule)
    val addStats = m.stats.filter { case (seg, st) =>
      liveSet(seg) && !parent.stats.get(seg).contains(st) }
    val dvSets = m.dv.filter { case (seg, r) =>
      liveSet(seg) && !parent.dv.get(seg).contains(r) }
    val addParts = m.parts.filter { case (seg, p) =>
      liveSet(seg) && !parent.parts.get(seg).contains(p) }
    commitEditRecord(outDir, parent, m, removes, adds, addStats, dvSets,
      addParts, m.copied -- parent.copied)
  }

  /** [[commitNext]] for a caller that already KNOWS its edit (the DML
    * retry loop, the ingest sink): skips the O(segments) parent/next
    * diff, so a delta commit's cost is O(edit) — the property the log
    * exists for (measured: ManifestScaleProbe). The caller contract is
    * that `m` = `parent` minus `removed` plus `added` with `addedStats`
    * the only stats changes; [[commitNext]] is the checked general
    * path that derives the edit instead of trusting it. */
  def commitEditRecord(outDir: String, parent: Manifest, m: Manifest,
      removed: Set[String], added: Seq[String],
      addedStats: Map[String, Map[String, ColStat]],
      dvSets: Map[String, DvRef] = Map.empty,
      addedParts: Map[String, PartVal] = Map.empty,
      addedCopied: Set[String] = Set.empty): Boolean = {
    require(m.version == parent.version + 1,
      s"commit needs consecutive versions, got parent " +
        s"v${parent.version} -> v${m.version}")
    gateWriter(outDir, parent)
    val mr = math.max(parent.minReader, requiredReader(m.dv, m.colmap))
    val mw = math.max(parent.minWriter,
      requiredWriter(m.dv, m.expects, m.copied))
    // SEGMENT ROW COUNTS (r17): record each ADDED segment's physical
    // row count once, here — the one gate every committed segment
    // passes through. Priority: a count the caller already carries
    // (m.segRows), then the partition fact's count (partitioned
    // appends already counted), then one footer read of the segment
    // just written (O(its files) — the same order as the write
    // itself; a later EXPORT/DETAIL over thousands of segments then
    // reads the manifest instead of thousands of footers). Advisory:
    // a segment whose directory is not readable here (external
    // tooling committing names it never materialized) simply records
    // nothing and readers fall back to footers.
    val rowsForAdded: Map[String, Long] = added.flatMap { s =>
      m.segRows.get(s).orElse(m.parts.get(s).map(_.rows))
        .orElse(try Some(segmentFooterRows(outDir, s))
                catch { case _: Exception => None })
        .map(s -> _)
    }.toMap
    val mRows = m.copy(segRows =
      (m.segRows -- removed) ++ rowsForAdded)
    if (m.version % snapshotInterval == 0)
      // the snapshot must carry the parent's declared minimums too
      // (r16): a full snapshot that re-derived them from state alone
      // would DOWNGRADE a chain whose mins were raised by a feature
      // this engine can't see — the delta path's never-downgrade rule
      // applies to every record kind
      return commitManifest(outDir, m.version, m.maxB, m.segs, m.schemaV,
        m.schemaJson, m.stats, m.txns, m.expects, m.cdcSegs, m.dataChange,
        m.dv, m.colmap, m.partSpec, m.parts, m.cdcDropSegs, m.bloomCols,
        m.copied, minReaderFloor = mr, minWriterFloor = mw,
        segRows = mRows.segRows)
    val lines = Seq("delta=1", s"maxb=${m.maxB}") ++
      (if (m.schemaV > 0L) Seq(s"schemav=${m.schemaV}") else Nil) ++
      (if (m.schemaV != parent.schemaV) m.schemaJson.map(j => s"schema=$j")
       else None) ++
      (if (mr > 1L) Seq(s"minreader=$mr") else Nil) ++
      (if (mw > 1L) Seq(s"minwriter=$mw") else Nil) ++
      (if (m.dataChange) Nil else Seq("datachange=0")) ++
      m.txns.toSeq.sorted.map { case (a, id) => s"txn=$a|$id" } ++
      m.expects.toSeq.sorted.map { case (n, q) => s"expect=$n|$q" } ++
      m.colmap.toSeq.sorted.map { case (lg, ph) => s"colmap=$lg|$ph" } ++
      m.partSpec.map(c => s"partspec=$c") ++
      (if (m.bloomCols.nonEmpty)
        Seq(s"bloomcols=${m.bloomCols.mkString("|")}") else Nil) ++
      m.cdcSegs.map(s => s"cdc=$s") ++
      m.cdcDropSegs.map(s => s"cdcdrop=$s") ++
      dvSets.toSeq.sortBy(_._1).map { case (seg, r) =>
        s"dvec=$seg|${r.file}|${r.rows}" } ++
      addedParts.toSeq.sortBy(_._1).map { case (seg, p) =>
        partLine(seg, p) } ++
      addedCopied.toSeq.sorted.map(id => s"copy=$id") ++
      rowsForAdded.toSeq.sortBy(_._1).map { case (seg, n) =>
        s"segrows=$seg|$n" } ++
      added.map(s => s"add=$s") ++
      removed.toSeq.sorted.map(s => s"remove=$s") ++
      addedStats.toSeq.flatMap { case (seg, byCol) =>
        byCol.toSeq.map { case (c, st) => statLine(seg, c, st) }
      }.sorted
    val md = manifestDir(outDir)
    Files.createDirectories(md)
    val tmp = Files.createTempFile(md, s"tmp_v${m.version}-", ".inprogress")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    try {
      Files.createLink(md.resolve(f"v${m.version}%010d.txt"), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** Publish manifest version `v` atomically with FAIL-IF-EXISTS
    * semantics (write temp + hard-link to the final name). Returns
    * false if `v` is already committed — the replay/lost-race case;
    * the caller re-reads and decides.
    *
    * NOT a rename: `Files.move(…, ATOMIC_MOVE)` maps to rename(2),
    * which silently REPLACES an existing target on POSIX — the method
    * would never return false and a racing commit would clobber a
    * committed manifest. `Files.createLink(target, tmp)` maps to
    * link(2), which fails with EEXIST, giving a true compare-and-set.
    * On an object store this becomes the conditional put / if-none-
    * match primitive. */
  def commitManifest(outDir: String, v: Long, maxB: Long,
      segs: Seq[String], schemaV: Long = 0L,
      schemaJson: Option[String] = None,
      stats: Map[String, Map[String, ColStat]] = Map.empty,
      txns: Map[String, Long] = Map.empty,
      expects: Map[String, String] = Map.empty,
      cdcSegs: Seq[String] = Nil, dataChange: Boolean = true,
      dv: Map[String, DvRef] = Map.empty,
      colmap: Map[String, String] = Map.empty,
      partSpec: Option[String] = None,
      parts: Map[String, PartVal] = Map.empty,
      cdcDropSegs: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      copied: Set[String] = Set.empty,
      minReaderFloor: Long = 1L,
      minWriterFloor: Long = 1L,
      segRows: Map[String, Long] = Map.empty): Boolean = {
    val md = manifestDir(outDir)
    Files.createDirectories(md)
    val tmp = Files.createTempFile(md, s"tmp_v$v-", ".inprogress")
    Files.write(tmp, snapshotLines(maxB, segs, schemaV, schemaJson,
      stats, txns, expects, cdcSegs, dataChange, dv, colmap, partSpec,
      parts, cdcDropSegs, bloomCols, copied,
      minReaderFloor, minWriterFloor, segRows).mkString("\n")
      .getBytes("UTF-8"))
    try {
      Files.createLink(md.resolve(f"v$v%010d.txt"), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** One serialized stats line. Numeric: `stats=seg|c|lo|hi|nulls`
    * (the pre-r11 4-field form parses back with nulls = -1 unknown).
    * String: `strstats=seg|c|b64(lo)|b64(hi)|nulls` — base64 keeps
    * arbitrary string bounds (pipes, newlines, unicode) inside the
    * line-oriented format. */
  private def statLine(seg: String, c: String, st: ColStat): String = {
    def b64(s: String): String = java.util.Base64.getEncoder
      .encodeToString(s.getBytes("UTF-8"))
    st match {
      case LongStat(lo, hi, n) => s"stats=$seg|$c|$lo|$hi|$n"
      case StrStat(lo, hi, n) => s"strstats=$seg|$c|${b64(lo)}|${b64(hi)}|$n"
    }
  }

  /** Full-snapshot serialization (deterministic bytes for a given
    * logical state — stats/txn/expect lines sorted, segment order
    * preserved). Stats only for segments the version lists; set
    * membership, not Seq.contains — a linear scan per stats entry is
    * O(S²) per commit, at odds with the million-segment design. */
  private def snapshotLines(maxB: Long, segs: Seq[String], schemaV: Long,
      schemaJson: Option[String],
      stats: Map[String, Map[String, ColStat]],
      txns: Map[String, Long], expects: Map[String, String],
      cdcSegs: Seq[String] = Nil,
      dataChange: Boolean = true,
      dv: Map[String, DvRef] = Map.empty,
      colmap: Map[String, String] = Map.empty,
      partSpec: Option[String] = None,
      parts: Map[String, PartVal] = Map.empty,
      cdcDropSegs: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      copied: Set[String] = Set.empty,
      minReaderFloor: Long = 1L,
      minWriterFloor: Long = 1L,
      segRows: Map[String, Long] = Map.empty): Seq[String] = {
    val live = segs.toSet
    val statLines = stats.toSeq
      .filter { case (seg, _) => live(seg) }
      .flatMap { case (seg, byCol) =>
        byCol.toSeq.map { case (c, st) => statLine(seg, c, st) }
      }.sorted
    val txnLines = txns.toSeq.sorted.map { case (a, id) => s"txn=$a|$id" }
    val expectLines =
      expects.toSeq.sorted.map { case (n, q) => s"expect=$n|$q" }
    val dvLines = dv.toSeq.filter { case (seg, _) => live(seg) }
      .sortBy(_._1).map { case (seg, r) => s"dvec=$seg|${r.file}|${r.rows}" }
    val cmLines =
      colmap.toSeq.sorted.map { case (lg, ph) => s"colmap=$lg|$ph" }
    val partLines = parts.toSeq.filter { case (seg, _) => live(seg) }
      .sortBy(_._1).map { case (seg, p) => partLine(seg, p) }
    val rowsLines = segRows.toSeq.filter { case (seg, _) => live(seg) }
      .sortBy(_._1).map { case (seg, n) => s"segrows=$seg|$n" }
    val cdcLines = cdcSegs.map(s => s"cdc=$s") ++
      cdcDropSegs.map(s => s"cdcdrop=$s") ++
      (if (dataChange) Nil else Seq("datachange=0"))
    val bloomLine =
      if (bloomCols.nonEmpty) Seq(s"bloomcols=${bloomCols.mkString("|")}")
      else Nil
    val copyLines = copied.toSeq.sorted.map(id => s"copy=$id")
    // protocol gate headers: max of the state's requirements and the
    // caller's floor — the parent chain's declared minimums (r16,
    // never-downgrade: a snapshot/checkpoint/RESTORE/CLONE re-deriving
    // from state alone would silently re-admit writers the chain had
    // fenced out). Emitted only above the baseline — pre-gate
    // manifests stay byte-identical.
    val mr = math.max(minReaderFloor, requiredReader(dv, colmap))
    val mw = math.max(minWriterFloor, requiredWriter(dv, expects, copied))
    val gateLines =
      (if (mr > 1L) Seq(s"minreader=$mr") else Nil) ++
      (if (mw > 1L) Seq(s"minwriter=$mw") else Nil)
    (s"maxb=$maxB" +:
      ((if (schemaV > 0L) Seq(s"schemav=$schemaV") ++
        schemaJson.map(j => s"schema=$j")
       else Nil) ++ gateLines ++
        partSpec.map(c => s"partspec=$c").toSeq ++ bloomLine ++
        statLines ++ txnLines ++ expectLines ++ cmLines ++
        partLines ++ rowsLines ++ dvLines ++ cdcLines ++ copyLines)) ++ segs
  }

  /** Attempts a DML re-plan loop makes before giving up — each retry
    * costs a full re-plan (reads + rewrites), so a table busy enough to
    * lose 8 straight races needs coordination, not more retries. */
  private val dmlMaxAttempts = 8

  /** OPTIMISTIC-CONCURRENCY commit for copy-on-write DML: publish an
    * edit (drop `removed`, add `added`) computed against `base`, even
    * if other writers committed since — the Delta/Iceberg retry
    * protocol. On a lost CAS the tip is re-read and the edit re-staged
    * when it still COMMUTES with what landed in between: every base
    * segment must still be live (concurrent commits only APPENDED),
    * and schema/expectations/our-txn state must be unmoved. Committing
    * then serializes this DML BEFORE the concurrent appends
    * (WriteSerializable, Delta's default level: the final table equals
    * the serial history "this DML, then those appends" — appended rows
    * are deliberately not re-examined by the already-planned rewrite).
    *
    * Returns Some(committed version) — possibly several versions past
    * `base` — or None on a TRUE CONFLICT: a base segment this DML read
    * was itself rewritten or dropped (its replacement may hold rows
    * the predicate should see, so the staged rewrite is stale), the
    * schema or expectation set changed, or our (appId, batchId) txn
    * got recorded by someone else. The caller re-plans against the new
    * tip; segments already written by the stale attempt become orphans
    * for [[vacuum]]. */
  private def tryCommitEdit(outDir: String, base: Manifest,
      removed: Set[String], added: Seq[String],
      addedStats: Map[String, Map[String, ColStat]],
      txn: Option[(String, Long)],
      cdcSegs: Seq[String] = Nil,
      dvSets: Map[String, DvRef] = Map.empty,
      addedParts: Map[String, PartVal] = Map.empty,
      cdcDropSegs: Seq[String] = Nil,
      dataChange: Boolean = true,
      // MERGE WITH SCHEMA EVOLUTION (r15): a (schemaV, schemaJson,
      // colmap) bump riding the SAME CAS as the data edit — the
      // widened schema and the merged rows become visible atomically.
      // Racing schema changes stay true conflicts (the commutes check
      // pins base.schemaV).
      newSchema: Option[(Long, String, Map[String, String])] = None,
      // r17: row counts the caller already knows for `added` segments
      // (DML censuses count them anyway) — commitEditRecord then
      // records them with ZERO footer reads; segments not listed fall
      // back to the partition fact or one footer read at the gate.
      addedRows: Map[String, Long] = Map.empty)
      : Option[Long] = {
    val baseSegs = base.segs.toSet
    // resolve every added segment's row count ONCE, before the CAS
    // loop (r18, advisor: the commit gate's footer fallback otherwise
    // re-read every added segment's footers on EACH lost race) — same
    // priority order as the gate: caller-known count, partition fact,
    // one footer read; unreadable segments record nothing (advisory)
    val addedRowsFull: Map[String, Long] = added.flatMap { s =>
      addedRows.get(s).orElse(addedParts.get(s).map(_.rows))
        .orElse(try Some(segmentFooterRows(outDir, s))
                catch { case _: Exception => None })
        .map(s -> _)
    }.toMap
    var tip = base
    while (true) {
      val segs = tip.segs.filterNot(removed) ++ added
      val stats = (tip.stats -- removed) ++ addedStats
      val txns = txn.fold(tip.txns) { case (a, id) => tip.txns + (a -> id) }
      val dv = (tip.dv -- removed) ++ dvSets
      val parts = (tip.parts -- removed) ++ addedParts
      if (commitEditRecord(outDir, tip,
          Manifest(tip.version + 1, tip.maxB, segs,
            newSchema.fold(tip.schemaV)(_._1),
            newSchema.fold(tip.schemaJson)(s => Some(s._2)),
            stats, txns, tip.expects, cdcSegs,
            dataChange = dataChange, dv = dv,
            colmap = newSchema.fold(tip.colmap)(_._3),
            partSpec = tip.partSpec, parts = parts,
            cdcDropSegs = cdcDropSegs, bloomCols = tip.bloomCols,
            copied = tip.copied,
            // carry the chain's row counts — a snapshot-interval
            // commit writes FULL state, so omitting them here would
            // silently drop every prior segment's count (r17 review)
            segRows = (tip.segRows -- removed) ++ addedRowsFull),
          removed, added, addedStats, dvSets, addedParts))
        return Some(tip.version + 1)
      val now = readManifest(outDir)
      val nowSegs = now.segs.toSet
      val commutes = now.schemaV == base.schemaV &&
        now.expects == base.expects &&
        baseSegs.forall(nowSegs) &&
        // a concurrent DELETION VECTOR landed on a segment this edit
        // read: the staged rewrite/DV was planned against the pre-DV
        // row set and would resurrect the concurrently-deleted rows —
        // a true conflict, exactly like a segment rewrite
        baseSegs.forall(s => now.dv.get(s) == base.dv.get(s)) &&
        txn.forall { case (a, id) =>
          now.txns.getOrElse(a, Long.MinValue) < id }
      if (!commutes) return None
      tip = now
    }
    None // unreachable
  }

  /** CREATE TABLE: initialize an EMPTY lake with a recorded schema —
    * one metadata-only commit (version 1, zero segments, schema
    * generation 1), the Delta/Iceberg CREATE TABLE analog. Enables the
    * subscribe-first topology: a change-feed consumer can attach to
    * the table (the source reads the schema from the manifest and
    * idles until data arrives) BEFORE any producer has committed —
    * without this, consumer deployment would be ordered after first
    * ingest. [[appendSegment]], expectations and evolution all accept
    * the created-but-empty state. Returns the committed version (1). */
  def createTable(outDir: String,
      schema: org.apache.spark.sql.types.StructType,
      partitionBy: Option[String] = None): Long = {
    val m = readManifest(outDir)
    require(m.version == 0L,
      s"lake at $outDir already has commits (v${m.version})")
    // `partitionBy` may be a COMPOSITE spec (r15): comma-separated
    // columns ("day,tenant") — each segment then records one fact per
    // dimension, so retention/backfill predicates over any subset of
    // the dimensions stay metadata-only.
    val spec = partitionBy.map(normalizePartSpec(schema, _))
    require(commitManifest(outDir, 1L, -1L, Nil, 1L, Some(schema.json),
      partSpec = spec),
      s"create table at $outDir lost a manifest race")
    1L
  }

  /** Validate and normalize a (possibly composite, comma-separated)
    * partition spec against `schema`: trim, require each column
    * partitionable, refuse duplicates. */
  private def normalizePartSpec(
      schema: org.apache.spark.sql.types.StructType,
      spec: String): String = {
    val cols = spec.split(",").map(_.trim).toSeq
    require(cols.nonEmpty && cols.forall(_.nonEmpty),
      s"bad partition spec '$spec'")
    require(cols.distinct.size == cols.size,
      s"partition spec '$spec' repeats a column")
    cols.foreach(c => requirePartitionable(schema, c))
    cols.mkString(",")
  }

  /** Partition columns must be integral or string — the two types a
    * partition value round-trips losslessly through the manifest's
    * line format and the staged write's directory names. */
  private def requirePartitionable(
      schema: org.apache.spark.sql.types.StructType, c: String): Unit = {
    import org.apache.spark.sql.types._
    val f = schema.fields.find(_.name == c).getOrElse(
      sys.error(s"no column $c to partition by " +
        s"(has ${schema.fieldNames.mkString(", ")})"))
    require(Seq[DataType](LongType, IntegerType, ShortType, ByteType,
      StringType).contains(f.dataType),
      s"partition column $c must be integral or string, is ${f.dataType}")
  }

  /** PARTITION EVOLUTION: declare (or change) the partition column of
    * an existing table — a METADATA-ONLY commit, Iceberg's
    * update-partition-spec. Existing segments keep whatever partition
    * value (and column) they were written under; only FUTURE
    * [[appendPartitioned]] batches split by the new column. Mixed
    * layouts stay correct everywhere because partition facts are
    * per-segment ([[PartVal.col]]), not global. Returns the committed
    * version. */
  def evolvePartitionSpec(spark: SparkSession, outDir: String,
      column: String): Long = {
    val m = readManifest(outDir)
    requireTable(m, outDir)
    val cur = tableSchema(spark, outDir, m)
    val spec = normalizePartSpec(cur, column)
    require(commitNext(outDir, m, m.copy(version = m.version + 1,
      partSpec = Some(spec.split(",").map(m.physicalOf).mkString(",")),
      cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)),
      s"partition-spec change at $outDir lost a manifest race")
    m.version + 1
  }

  /** A lake a writer/metadata op can target: has data, or was
    * CREATE-TABLE'd (schema recorded, possibly zero segments yet). */
  private def requireTable(m: Manifest, outDir: String): Unit =
    require(m.segs.nonEmpty || m.schemaJson.isDefined,
      s"lake at $outDir has no committed segments and no recorded " +
        "schema — createTable first or commit data")

  /** PHYSICAL file schema under the column mapping: the logical
    * schema with each field renamed to its stable physical name.
    * Identity when the mapping is inactive. */
  private def physicalSchema(
      logical: org.apache.spark.sql.types.StructType,
      m: Manifest): org.apache.spark.sql.types.StructType =
    if (m.colmap.isEmpty) logical
    else org.apache.spark.sql.types.StructType(
      logical.fields.map(f => f.copy(name = m.physicalOf(f.name))))

  /** Rename a PHYSICAL-columned frame back to logical names (the read
    * seam); `extraCols` pass through unmapped (feed/positional
    * columns). Dropped physical columns are simply not selected —
    * that is how DROP COLUMN is metadata-only. */
  private def dephysicalize(df: DataFrame, m: Manifest,
      logical: org.apache.spark.sql.types.StructType,
      extraCols: Seq[String] = Nil): DataFrame =
    if (m.colmap.isEmpty) df
    else {
      import org.apache.spark.sql.functions.col
      df.select(logical.fields.toSeq.map(f =>
        col(m.physicalOf(f.name)).as(f.name)) ++
        extraCols.map(col): _*)
    }

  /** Rename a LOGICAL-columned frame to physical names (the write
    * seam — every segment/cdc file on disk carries physical names);
    * non-mapped columns (feed columns) pass through. */
  private def physicalize(df: DataFrame, m: Manifest): DataFrame =
    if (m.colmap.isEmpty) df
    else {
      import org.apache.spark.sql.functions.col
      df.select(df.columns.map(c =>
        if (m.colmap.contains(c)) col(c).as(m.colmap(c)) else col(c))
        .toSeq: _*)
    }

  /** Reader honoring the manifest's schema, when one is recorded: the
    * unified schema is APPLIED to the scan, so pre-evolution segments
    * surface the added columns as NULL without any footer merging —
    * the parquet reader fills absent columns per file. Under an
    * active column mapping the applied schema is the PHYSICAL one
    * (files carry physical names); [[readSegments]] renames back. */
  /** Per-JVM memo of footer-INFERRED segment schemas, keyed by the
    * segment's first part-file PATH (r18). Part-file names carry the
    * writing job's UUID, so a re-created directory under the same
    * name always misses the memo and re-infers — the key is identity
    * of the bytes, not of the path. Without this, every read of a
    * lake whose manifest predates schema recording pays a full
    * DataSource schema-inference pass PER ACTION (LoadFloorProbe:
    * 64-112 ms vs 5-6 ms schema-supplied). Metadata only — never
    * rows; a fresh JVM re-infers from the footers. */
  private val inferredSchemas = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def inferSegSchema(spark: SparkSession, outDir: String,
      seg: String): org.apache.spark.sql.types.StructType = {
    val dir = new java.io.File(outDir, seg)
    val first = Option(dir.listFiles()).flatMap(_.iterator
      .map(_.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .minOption)
    first match {
      case Some(n) => inferredSchemas.computeIfAbsent(
        new java.io.File(dir, n).getPath,
        _ => spark.read.parquet(dir.getPath).schema)
      case None => spark.read.parquet(dir.getPath).schema
    }
  }

  /** Schema-supplying segment reader: the manifest's recorded schema
    * (physicalized under an active column mapping) when present, else
    * the memoized footer inference of the manifest's first segment
    * (pre-evolution lakes are schema-homogeneous — the documented
    * [[tableSchema]] contract, and exactly what the previous bare
    * `spark.read` inferred from the first footer of the scanned set). */
  private def reader(spark: SparkSession, outDir: String, m: Manifest) =
    m.schemaJson match {
      case Some(j) => spark.read.schema(physicalSchema(
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType], m))
      case None if m.segs.nonEmpty =>
        spark.read.schema(inferSegSchema(spark, outDir, m.segs.head))
      case None => spark.read
    }

  /** Every deletion-vector file has this exact shape (written by the
    * staged DV writes: `__dv_s` is stripped as the partition column).
    * Supplying it skips a schema-inference pass per DV-reconciling
    * read. */
  private val dvFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("file_name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("row_index",
      org.apache.spark.sql.types.LongType)))

  private def readDv(spark: SparkSession, paths: Seq[String]) =
    spark.read.schema(dvFileSchema).parquet(paths: _*)

  /** Read a just-staged per-segment directory back with its schema
    * SUPPLIED (the written frame's data columns, `__dv_s` restored as
    * the string partition column) — the stats re-read over staged
    * bytes was paying a schema-inference pass per verb (r18). The
    * caller passes the exact schema of the frame it just wrote, so
    * this is identical to inference minus the footer pass. */
  private def readStaged(spark: SparkSession, stage: String,
      written: org.apache.spark.sql.types.StructType) =
    spark.read.schema(org.apache.spark.sql.types.StructType(
      written.fields.filterNot(_.name == "__dv_s") :+
        org.apache.spark.sql.types.StructField("__dv_s",
          org.apache.spark.sql.types.StringType))).parquet(stage)

  /** The table's current schema: the manifest's, or (pre-evolution
    * lakes) the homogeneous segment footer (memoized per written
    * segment — see [[inferredSchemas]]). */
  def tableSchema(spark: SparkSession, outDir: String,
      m: Manifest): org.apache.spark.sql.types.StructType =
    m.schemaJson match {
      case Some(j) => org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      case None => inferSegSchema(spark, outDir, m.segs.head)
    }

  /** DELETION-VECTOR-RECONCILING segment read — the merge-on-read seam
    * every table read goes through: segments without a DV scan as one
    * plain parquet read; DV'd segments scan WITH the parquet reader's
    * positional metadata (`_metadata.file_name` + `row_index` — free,
    * no data-column cost) and drop deleted positions via a BROADCAST
    * anti-join against the manifest-referenced DV files. The DV side
    * is O(deleted rows) — for the point-DML workload DVs exist for,
    * a few rows against a 100 TB scan, so the anti-join is a broadcast
    * hash probe inside the scan stage, never a shuffle. File NAMES
    * (not paths) key the join: part-file names carry a per-job UUID,
    * so they are unique across segments and stable under any
    * mount/URI-prefix difference between writer and reader. */
  private def readSegments(spark: SparkSession, outDir: String,
      m: Manifest, segs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    if (segs.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        tableSchema(spark, outDir, m))
    val (dvSegs, clean) = segs.partition(m.dv.contains)
    val parts = Seq.newBuilder[DataFrame]
    if (clean.nonEmpty)
      parts += reader(spark, outDir, m).parquet(clean.map(s => s"$outDir/$s"): _*)
    if (dvSegs.nonEmpty) {
      val df = reader(spark, outDir, m)
        .parquet(dvSegs.map(s => s"$outDir/$s"): _*)
        .withColumn("__dv_f", col("_metadata.file_name"))
        .withColumn("__dv_i", col("_metadata.row_index"))
      val dv = readDv(spark,
        dvSegs.map(s => s"$outDir/_dv/${m.dv(s).file}"))
      parts += df.join(broadcast(dv),
          df("__dv_f") === dv("file_name") &&
            df("__dv_i") === dv("row_index"), "left_anti")
        .drop("__dv_f", "__dv_i")
    }
    // Under an active column mapping the scan produced PHYSICAL names
    // (the applied schema selects stable ids out of the files) — every
    // consumer speaks logical; rename back at the one shared seam.
    // (colmap non-empty ⇒ schemaJson recorded, so the schema fetch
    // never touches a parquet footer; the common identity case skips
    // it entirely.)
    val joined = parts.result().reduce(_.unionByName(_))
    if (m.colmap.isEmpty) joined
    else dephysicalize(joined, m, tableSchema(spark, outDir, m))
  }

  /** The positional ride-along columns [[readSegmentWithPos]] attaches
    * (as a Set so it doubles as a filter predicate over column names). */
  private val posCols = Set("__dv_f", "__dv_i")

  /** Read one segment's LIVE rows with their (file_name, row_index)
    * positions attached as `__dv_f`/`__dv_i` — the planning read DML
    * verbs use: counts and predicates see only live rows, and the
    * matched positions are exactly what a merge-on-read DV write
    * records. */
  private def readSegmentWithPos(spark: SparkSession, outDir: String,
      m: Manifest, seg: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val raw = reader(spark, outDir, m).parquet(s"$outDir/$seg")
      .withColumn("__dv_f", col("_metadata.file_name"))
      .withColumn("__dv_i", col("_metadata.row_index"))
    val live = m.dv.get(seg) match {
      case None => raw
      case Some(r) =>
        val dv = readDv(spark, Seq(s"$outDir/_dv/${r.file}"))
        raw.join(broadcast(dv),
          raw("__dv_f") === dv("file_name") &&
            raw("__dv_i") === dv("row_index"), "left_anti")
    }
    // logical names for the DML verbs' predicates; positions ride along
    if (m.colmap.isEmpty) live
    else dephysicalize(live, m, tableSchema(spark, outDir, m),
      Seq("__dv_f", "__dv_i"))
  }

  /** Read MANY segments' LIVE rows in ONE scan with their positions
    * (`__dv_f`/`__dv_i`) AND their owning segment (`__dv_s`, parsed
    * from `_metadata.file_path` — the path component under the table
    * root) attached. This is the batched-DML planning read (r15): a
    * verb that touches S segments plans them all with ONE
    * grouped-by-`__dv_s` aggregate over this frame instead of S
    * sequential per-segment jobs — the driver-side O(S) job-submission
    * ceiling the r14 verdict named is gone, while stats/partition/
    * bloom pruning still trims `segs` BEFORE the scan (metadata-only,
    * zero jobs, unchanged). DV reconciliation is one broadcast
    * anti-join against the union of the segments' DV files (file
    * names are globally unique, so one join serves all segments). */
  private def readSegmentsWithPos(spark: SparkSession, outDir: String,
      m: Manifest, segs: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, regexp_extract}
    require(segs.nonEmpty, "positional read of no segments")
    val segRe = java.util.regex.Pattern.quote(
      new java.io.File(outDir).getAbsolutePath) + "/([^/]+)/"
    val raw = reader(spark, outDir, m).parquet(segs.map(s => s"$outDir/$s"): _*)
      .withColumn("__dv_f", col("_metadata.file_name"))
      .withColumn("__dv_i", col("_metadata.row_index"))
      .withColumn("__dv_s",
        regexp_extract(col("_metadata.file_path"), segRe, 1))
    val dvSegs = segs.filter(m.dv.contains)
    val live =
      if (dvSegs.isEmpty) raw
      else {
        val dv = readDv(spark,
          dvSegs.map(s => s"$outDir/_dv/${m.dv(s).file}"))
        raw.join(broadcast(dv),
          raw("__dv_f") === dv("file_name") &&
            raw("__dv_i") === dv("row_index"), "left_anti")
      }
    if (m.colmap.isEmpty) live
    else dephysicalize(live, m, tableSchema(spark, outDir, m),
      Seq("__dv_f", "__dv_i", "__dv_s"))
  }

  /** ONE staged partitioned write fanning a `__dv_s`-carrying frame
    * out to per-segment directories (the llm_dedup_dv ingest trick,
    * now the shared write seam of every batched DML verb): data files
    * land under `stage/__dv_s=<seg>/` WITHOUT the `__dv_s` column
    * (partitionBy strips it), and the caller moves each directory to
    * its final segment name before the manifest CAS. `onePerSeg`
    * shuffles by segment first so each segment lands as a single file
    * (the DV-file shape); rewrites skip the shuffle and let each
    * segment take as many files as the scan's natural partitioning
    * produced (a segment is a directory — multi-file is fine).
    * Returns seg -> staged directory. A crash between write and move
    * leaves the stage dir an unreferenced orphan, exactly a
    * half-written segment's contract ([[vacuum]] hygiene). */
  private def writeStagedBySegment(df: DataFrame, stage: String,
      onePerSeg: Boolean = false): Map[String, java.io.File] = {
    import org.apache.spark.sql.functions.col
    val out = if (onePerSeg) df.repartition(col("__dv_s")) else df
    out.write.partitionBy("__dv_s").parquet(stage)
    new java.io.File(stage).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__dv_s="))
      .map(f => f.getName.stripPrefix("__dv_s=") -> f).toMap
  }

  /** [[segmentStats]] GROUPed BY `__dv_s` — per-segment min/max/null
    * bounds for MANY just-staged segments in ONE job (reading the
    * stage dir back restores `__dv_s` as a partition column). */
  private def segmentStatsGrouped(df: DataFrame, cols: Seq[String])
      : Map[String, Map[String, ColStat]] = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min, when}
    import org.apache.spark.sql.types.{LongType, StringType}
    val typed = cols.flatMap(c => df.schema.fields.collectFirst {
      case f if f.name == c &&
        (f.dataType == LongType || f.dataType == StringType) =>
        (c, f.dataType == LongType)
    })
    if (typed.isEmpty) return Map.empty
    val aggs = typed.flatMap { case (c, _) =>
      Seq(min(col(c)), max(col(c)),
        count(when(col(c).isNull, lit(1)))) }
    df.groupBy(col("__dv_s")).agg(aggs.head, aggs.tail: _*)
      .collect().map { row =>
        row.getString(0) -> typed.zipWithIndex.flatMap {
          case ((c, isLong), i) =>
            val (mnI, mxI, nI) = (1 + 3 * i, 2 + 3 * i, 3 + 3 * i)
            if (row.isNullAt(mnI) || row.isNullAt(mxI)) None
            else if (isLong)
              Some(c -> LongStat(row.getLong(mnI), row.getLong(mxI),
                row.getLong(nI)))
            else
              Some(c -> StrStat(row.getString(mnI), row.getString(mxI),
                row.getLong(nI)))
        }.toMap
      }.toMap
  }

  /** Read the lake AS OF its current committed manifest — exactly the
    * listed segments, never a partially-published one. */
  def readTable(spark: SparkSession, outDir: String): DataFrame = {
    val m = readManifest(outDir)
    require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
    readSegments(spark, outDir, m, m.segs)
  }

  /** One-job stats collection over `df` for the BIGINT and STRING
    * columns in `cols` (absent or other-typed columns are skipped —
    * stats are advisory bounds, and no stats is always safe): min,
    * max, and NULL COUNT per column. All-NULL columns record no
    * min/max entry. Writers call this once per segment they
    * materialize; the cost is one scan of data that was just written
    * (in a production writer the bounds come for free from the
    * parquet writer's own footer accumulation). */
  def segmentStats(df: DataFrame,
      cols: Seq[String]): Map[String, ColStat] = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min, when}
    import org.apache.spark.sql.types.{LongType, StringType}
    val typed = cols.flatMap(c => df.schema.fields.collectFirst {
      case f if f.name == c &&
        (f.dataType == LongType || f.dataType == StringType) =>
        (c, f.dataType == LongType)
    })
    if (typed.isEmpty) return Map.empty
    val aggs = typed.flatMap { case (c, _) =>
      Seq(min(col(c)), max(col(c)),
        count(when(col(c).isNull, lit(1)))) }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    typed.zipWithIndex.flatMap { case ((c, isLong), i) =>
      val (mnI, mxI, nI) = (3 * i, 3 * i + 1, 3 * i + 2)
      if (row.isNullAt(mnI) || row.isNullAt(mxI)) None
      else if (isLong)
        Some(c -> LongStat(row.getLong(mnI), row.getLong(mxI),
          row.getLong(nI)))
      else
        Some(c -> StrStat(row.getString(mnI), row.getString(mxI),
          row.getLong(nI)))
    }.toMap
  }

  /** Does segment `seg` possibly hold rows with `column` ∈ [lo, hi]?
    * TRUE when no stats are recorded or the recorded stat is not
    * numeric (must scan — correctness over skipping); FALSE only when
    * recorded bounds are disjoint from the probe range. */
  private def mayOverlap(m: Manifest, seg: String, column: String,
      lo: Long, hi: Long): Boolean =
    m.stats.get(seg).flatMap(_.get(column)) match {
      case Some(LongStat(mn, mx, _)) => mx >= lo && mn <= hi
      case _ => true
    }

  /** Segment-level verdict for one prune hint: false ONLY when the
    * recorded stats (or a bloom sidecar, for point sets) prove no row
    * can satisfy it. Type-mismatched or absent stats always scan. */
  private def mayMatchHint(m: Manifest, outDir: String, seg: String,
      hint: PruneHint): Boolean = hint match {
    case NumRange(c, lo, hi) => mayOverlap(m, seg, c, lo, hi)
    case StrRange(c, lo, hi) =>
      m.stats.get(seg).flatMap(_.get(c)) match {
        case Some(StrStat(mn, mx, _)) => mx >= lo && mn <= hi
        case _ => true
      }
    case MustBeNull(c) =>
      m.stats.get(seg).flatMap(_.get(c)) match {
        // nulls == 0 proves no NULL row; -1 = unknown, must scan
        case Some(st) => st.nulls != 0L
        case None => true
      }
    // point set: the segment survives iff SOME probe value passes both
    // its recorded range AND its bloom sidecar (each is a may-contain
    // bound; their conjunction is too)
    case PointSet(c, dt, values) => values.exists { v =>
      val rangeMay = m.stats.get(seg).flatMap(_.get(c)) match {
        case Some(LongStat(mn, mx, _)) => v match {
          case l: Long => l >= mn && l <= mx
          case _ => true
        }
        case Some(StrStat(mn, mx, _)) => v match {
          case s: String => s >= mn && s <= mx
          case _ => true
        }
        case _ => true
      }
      rangeMay && bloomMayContain(outDir, seg, c, dt, v)
    }
  }

  /** Re-key a LOGICAL-columned hint to the PHYSICAL name manifest
    * stats are recorded under (stats follow the bytes across renames);
    * identity when the mapping is inactive. */
  private def hintPhysical(h: PruneHint, m: Manifest): PruneHint =
    if (m.colmap.isEmpty) h
    else h match {
      case NumRange(c, lo, hi) => NumRange(m.physicalOf(c), lo, hi)
      case StrRange(c, lo, hi) => StrRange(m.physicalOf(c), lo, hi)
      case MustBeNull(c) => MustBeNull(m.physicalOf(c))
      case PointSet(c, dt, vs) => PointSet(m.physicalOf(c), dt, vs)
    }

  /** A constraint every predicate-TRUE row provably satisfies, usable
    * for manifest-stats pruning. */
  sealed trait PruneHint
  /** `col` ∈ [lo, hi] (BIGINT bounds). */
  final case class NumRange(col: String, lo: Long, hi: Long) extends PruneHint
  /** `col` ∈ [lo, hi] lexicographically (STRING bounds — equality
    * contributes lo == hi). */
  final case class StrRange(col: String, lo: String, hi: String) extends PruneHint
  /** every matching row has `col IS NULL` — prunes segments whose
    * recorded null count is zero. */
  final case class MustBeNull(col: String) extends PruneHint
  /** every matching row has `col` ∈ `values` (an equality or IN-list
    * predicate) — prunes through min/max AND the per-segment bloom
    * sidecars, the hint class that works where ranges cannot: point
    * probes on high-cardinality columns with uniform layout. `dt` is
    * the column's table type (the bloom hashes typed values; a Long
    * and a String of the same digits must not collide by accident). */
  final case class PointSet(col: String,
      dt: org.apache.spark.sql.types.DataType,
      values: Seq[Any]) extends PruneHint

  /** Compile `cond` into a per-PARTITION-VALUE decider for segments
    * carrying partition facts on the PHYSICAL columns `physCols`
    * (one column pre-r15, a composite (day × tenant)-style tuple
    * since): Some(f) when the predicate is deterministic and
    * references ONLY those columns — then every row of such a segment
    * has the same `cond` truth value, so `f(values)` decides the
    * WHOLE segment from the manifest (true = every row matches,
    * false = none does; NULL evaluations are false, exactly SQL DML's
    * keep-NULL rule). None = undecidable per partition (other columns
    * referenced, unanalyzable, or a partition column was dropped) —
    * callers fall back to the normal scan path. Evaluation is an
    * interpreted Catalyst predicate over a single in-memory row: ZERO
    * Spark jobs, arbitrary expression shape (`pmod(day, 7) = 3 AND
    * tenant = 'x'` works, not just ranges). */
  private def partitionDecider(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      cond: org.apache.spark.sql.Column, m: Manifest,
      physCols: Seq[String])
      : Option[Map[String, Option[String]] => Boolean] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.types._
    val logicals = physCols.map(c => m.logicalOf(c) match {
      case Some(l) => c -> l
      case None => return None
    })
    val logicalSet = logicals.map(_._2).toSet
    val analyzed =
      try spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .filter(cond).queryExecution.analyzed
      catch { case _: Exception => return None }
    analyzed.collectFirst { case f: Filter => (f.condition, f.child.output) }
      .flatMap { case (e, out) =>
        if (!e.deterministic || !e.references.forall(a =>
            logicalSet.contains(a.name)))
          None
        else {
          val bound = BindReferences.bindReference(e, AttributeSeq(out))
          val pred = Predicate.createInterpreted(bound)
          val slots = logicals.map { case (phys, logical) =>
            (phys, out.indexWhere(_.name == logical),
              schema.fields.find(_.name == logical).get.dataType)
          }
          Some((values: Map[String, Option[String]]) => {
            val row = new GenericInternalRow(out.length) // all-NULL base
            slots.foreach { case (phys, ord, dt) =>
              values.getOrElse(phys, None).foreach { v =>
                val conv: Any = dt match {
                  case LongType => v.toLong
                  case IntegerType => v.toInt
                  case ShortType => v.toShort
                  case ByteType => v.toByte
                  case StringType =>
                    org.apache.spark.unsafe.types.UTF8String.fromString(v)
                  case other => sys.error(
                    s"partition column $phys has unsupported type $other")
                }
                row.update(ord, conv)
              }
            }
            pred.eval(row)
          })
        }
      }
  }

  /** FULL-MATCH proof obligations for `cond` (r12): the dual of
    * [[inferPruneHints]]. Pruning asks "can any row match?" and skips
    * on NO; this asks "does EVERY row provably match?" and lets
    * [[deleteWhere]] drop a whole segment by METADATA — which is what
    * makes `DELETE WHERE ts < cutoff` metadata-only on any
    * stats-tracked time-ordered layout (a streaming ingest with
    * `statsCols` on the event-time column, say) with NO partition
    * declaration at all.
    *
    * Returns one proof check per TOP-LEVEL CONJUNCT, or None when any
    * conjunct has an unprovable shape (disjunctions, IS NULL,
    * arithmetic, non-literal sides) — all conjuncts proving TRUE on a
    * segment's recorded stats implies the whole predicate is TRUE for
    * every live row. Soundness with ADVISORY (superset) bounds: the
    * recorded range contains the true range, so `recorded_hi < K`
    * implies `true_hi < K` — stale-wide bounds can only FAIL a proof,
    * never fake one; every check also requires `nulls == 0` (a NULL
    * evaluation is not TRUE, and DV deletes only shrink null counts).
    * Checks key PHYSICAL stat names via the column mapping. */
  def inferFullMatchChecks(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      cond: org.apache.spark.sql.Column,
      m: Manifest): Option[Seq[Map[String, ColStat] => Boolean]] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val condExpr =
      try {
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .filter(cond).queryExecution.analyzed
          .collectFirst { case f: Filter => f.condition }
      } catch { case _: Exception => None }
    if (condExpr.isEmpty) return None
    def name(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def numLit(e: Expression): Option[Long] =
      if (!e.foldable) None
      else e.dataType match {
        case LongType => Option(e.eval()).map(_.asInstanceOf[Long])
        case IntegerType => Option(e.eval()).map(_.asInstanceOf[Int].toLong)
        case ShortType => Option(e.eval()).map(_.asInstanceOf[Short].toLong)
        case ByteType => Option(e.eval()).map(_.asInstanceOf[Byte].toLong)
        case _ => None
      }
    def strLit(e: Expression): Option[String] =
      if (e.foldable && e.dataType == StringType)
        Option(e.eval()).map(_.toString)
      else None
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def chk(logical: String)(f: ColStat => Boolean)
        : Map[String, ColStat] => Boolean = {
      val phys = m.physicalOf(logical)
      st => st.get(phys).exists(s => s.nulls == 0L && f(s))
    }
    // (col ⋈ lit) in either spelling; flip=false means the column is
    // on the LEFT of the operator as written.
    def numCmp(l: Expression, r: Expression)(
        onCol: (String, Long, Boolean) => Map[String, ColStat] => Boolean)
        : Option[Map[String, ColStat] => Boolean] =
      (for (n <- name(l); v <- numLit(r)) yield onCol(n, v, false))
        .orElse(for (n <- name(r); v <- numLit(l)) yield onCol(n, v, true))
    val checks = conjuncts(condExpr.get).map {
      case GreaterThanOrEqual(l, r) => numCmp(l, r) {
        case (n, v, false) => chk(n) { // c >= v: lo >= v
          case LongStat(lo, _, _) => lo >= v; case _ => false }
        case (n, v, true) => chk(n) { // v >= c: hi <= v
          case LongStat(_, hi, _) => hi <= v; case _ => false }
      }
      case GreaterThan(l, r) => numCmp(l, r) {
        case (n, v, false) => chk(n) {
          case LongStat(lo, _, _) => lo > v; case _ => false }
        case (n, v, true) => chk(n) {
          case LongStat(_, hi, _) => hi < v; case _ => false }
      }
      case LessThanOrEqual(l, r) => numCmp(l, r) {
        case (n, v, false) => chk(n) {
          case LongStat(_, hi, _) => hi <= v; case _ => false }
        case (n, v, true) => chk(n) {
          case LongStat(lo, _, _) => lo >= v; case _ => false }
      }
      case LessThan(l, r) => numCmp(l, r) {
        case (n, v, false) => chk(n) {
          case LongStat(_, hi, _) => hi < v; case _ => false }
        case (n, v, true) => chk(n) {
          case LongStat(lo, _, _) => lo > v; case _ => false }
      }
      case EqualTo(l, r) =>
        numCmp(l, r) { case (n, v, _) => chk(n) {
          case LongStat(lo, hi, _) => lo == v && hi == v; case _ => false }
        }.orElse(
          (for (n <- name(l); v <- strLit(r)) yield (n, v))
            .orElse(for (n <- name(r); v <- strLit(l)) yield (n, v))
            .map { case (n, v) => chk(n) {
              case StrStat(lo, hi, _) => lo == v && hi == v
              case _ => false } })
      case Between(in, lo, hi, _) =>
        for (n <- name(in); l <- numLit(lo); h <- numLit(hi))
          yield chk(n) {
            case LongStat(slo, shi, _) => slo >= l && shi <= h
            case _ => false }
      case _ => None
    }
    if (checks.isEmpty || checks.exists(_.isEmpty)) None
    else Some(checks.map(_.get))
  }

  /** Live row count of a segment from its parquet FOOTERS — a
    * driver-side metadata read (no Spark job), used when a proof
    * drops a segment the planner never scanned. */
  private def segmentFooterRows(outDir: String, seg: String): Long = {
    val conf = new org.apache.hadoop.conf.Configuration()
    listDir(Paths.get(outDir, seg))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p.toUri), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
  }

  /** ALL safe prune hints for `cond` over the stats-tracked columns —
    * the r11 generalization of [[inferPruneHint]]: numeric ranges,
    * string ranges/equalities, and IS NULL constraints, one hint per
    * qualifying tracked column. A segment is skipped when ANY hint
    * disproves it. Soundness argument as in [[inferPruneHint]]:
    * top-level conjuncts only, column-vs-literal comparisons only. */
  def inferPruneHints(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      cond: org.apache.spark.sql.Column,
      tracked: Seq[String],
      pointCols: Seq[String] = Nil): Seq[PruneHint] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.types.{LongType, StringType}
    val condExpr =
      try {
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .filter(cond).queryExecution.analyzed
          .collectFirst { case f: Filter => f.condition }
      } catch { case _: Exception => None }
    if (condExpr.isEmpty) return Nil
    def name(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def strLit(e: Expression): Option[String] =
      if (e.foldable && e.dataType == StringType)
        Option(e.eval()).map(_.toString)
      else None
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val cs = conjuncts(condExpr.get)
    val trackedSet = tracked.toSet
    // string equality / IS NULL hints (numeric ranges come from the
    // existing extractor below)
    val strHints = cs.flatMap {
      case EqualTo(l, r) =>
        (for (n <- name(l); v <- strLit(r)) yield StrRange(n, v, v))
          .orElse(for (n <- name(r); v <- strLit(l)) yield StrRange(n, v, v))
      case IsNull(e) => name(e).map(MustBeNull)
      case _ => None
    }.filter {
      case StrRange(c, _, _) => trackedSet(c)
      case MustBeNull(c) => trackedSet(c)
      case _ => false
    }
    val numHint = inferPruneHint(spark, schema, cond, tracked)
      .map { case (c, lo, hi) => NumRange(c, lo, hi) }
    // point-set hints from equality / IN-list conjuncts: consulted
    // against min/max AND bloom sidecars, so they prune where ranges
    // cannot (point probes on high-cardinality uniform columns).
    // BIGINT and STRING columns only (the typed-probe contract);
    // IN-lists capped — a thousand-value IN is a join, not a probe.
    val pointable = (tracked ++ pointCols).toSet
    def colDt(n: String) = schema.fields.find(_.name == n).map(_.dataType)
    def asValue(dt: org.apache.spark.sql.types.DataType,
        v: Any): Option[Any] = (dt, v) match {
      case (LongType, l: java.lang.Long) => Some(l)
      case (StringType, u: org.apache.spark.unsafe.types.UTF8String) =>
        Some(u.toString)
      case (StringType, s: String) => Some(s)
      case _ => None
    }
    val pointHints = cs.flatMap {
      case EqualTo(l, r) =>
        def side(a: Expression, b: Expression) = for {
          n <- name(a) if pointable(n)
          dt <- colDt(n) if b.foldable
          raw <- Option(b.eval())
          v <- asValue(dt, raw)
        } yield PointSet(n, dt, Seq(v))
        side(l, r).orElse(side(r, l))
      case In(a, list) if list.nonEmpty && list.size <= 64 &&
          list.forall(_.foldable) =>
        for {
          n <- name(a) if pointable(n)
          dt <- colDt(n)
          vs <- Some(list.flatMap(e =>
            Option(e.eval()).flatMap(asValue(dt, _))))
          if vs.size == list.size // any non-convertible value → no hint
        } yield PointSet(n, dt, vs)
      case InSet(a, hset) if hset.nonEmpty && hset.size <= 64 =>
        for {
          n <- name(a) if pointable(n)
          dt <- colDt(n)
          vs <- Some(hset.toSeq.flatMap(asValue(dt, _)))
          if vs.size == hset.size
        } yield PointSet(n, dt, vs)
      case _ => None
    }
    numHint.toSeq ++ strHints ++ pointHints
  }

  /** Derive a safe prune range for `cond` over the stats-tracked
    * columns, so DML plans its touched-set from the manifest with NO
    * caller hint — the automatic partition-predicate extraction every
    * warehouse DML planner performs. Sound by construction: only
    * TOP-LEVEL CONJUNCTS are inspected (every predicate-TRUE row
    * satisfies each conjunct), and only direct column-vs-literal
    * comparisons contribute bounds; anything else (disjunctions,
    * arithmetic over the column, non-literal sides) contributes
    * nothing, which can only widen the range. Returns the first
    * tracked column with at least one bound. */
  def inferPruneHint(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      cond: org.apache.spark.sql.Column,
      tracked: Seq[String]): Option[(String, Long, Long)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    // Columns are lazy ColumnNode graphs in Spark 4 (the Connect
    // refactor) — `UnresolvedFunction(">=")`, `SqlExpression(text)` —
    // not typed Catalyst comparisons. Resolving the predicate through
    // the ANALYZER against the table schema yields the canonical tree
    // (typed comparisons, coercion casts materialized), which is the
    // only shape worth pattern-matching. An unanalyzable predicate
    // infers nothing (the DML itself will surface the real error).
    val condExpr =
      try {
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .filter(cond).queryExecution.analyzed
          .collectFirst { case f: Filter => f.condition }
      } catch { case _: Exception => None }
    if (condExpr.isEmpty) return None
    def name(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // literal side: Literal or Cast(Literal) after type coercion —
    // foldable, integral-typed, evaluated once (Between keeps its
    // bounds uncoerced, so bare INT literals appear too)
    def lit(e: Expression): Option[Long] = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      if (!e.foldable) None
      else e.dataType match {
        case LongType => Option(e.eval()).map(_.asInstanceOf[Long])
        case IntegerType => Option(e.eval()).map(_.asInstanceOf[Int].toLong)
        case ShortType => Option(e.eval()).map(_.asInstanceOf[Short].toLong)
        case ByteType => Option(e.eval()).map(_.asInstanceOf[Byte].toLong)
        case _ => None
      }
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // (attr-name, literal, attr-on-left?) for a column-vs-literal
    // comparison in either spelling (`c >= 5` / `5 <= c`).
    def sides(l: Expression, r: Expression): Option[(String, Long, Boolean)] =
      (for (n <- name(l); v <- lit(r)) yield (n, v, true))
        .orElse(for (n <- name(r); v <- lit(l)) yield (n, v, false))
    // (col, lowerBound?, upperBound?) per conjunct; strict bounds on
    // BIGINTs tighten by one — segments are pruned on closed ranges.
    val bounds = conjuncts(condExpr.get).flatMap {
      case GreaterThanOrEqual(l, r) => sides(l, r).map {
        case (n, v, true) => (n, Some(v), None)        // c >= v
        case (n, v, false) => (n, None, Some(v))       // v >= c
      }
      case GreaterThan(l, r) => sides(l, r).map {
        case (n, v, true) => (n, Some(v + 1), None)    // c > v
        case (n, v, false) => (n, None, Some(v - 1))   // v > c
      }
      case LessThanOrEqual(l, r) => sides(l, r).map {
        case (n, v, true) => (n, None, Some(v))        // c <= v
        case (n, v, false) => (n, Some(v), None)       // v <= c
      }
      case LessThan(l, r) => sides(l, r).map {
        case (n, v, true) => (n, None, Some(v - 1))    // c < v
        case (n, v, false) => (n, Some(v + 1), None)   // v < c
      }
      case EqualTo(l, r) => sides(l, r).map {
        case (n, v, _) => (n, Some(v), Some(v))
      }
      // `x BETWEEN lo AND hi` survives analysis as the
      // RuntimeReplaceable Between node (expanded only later, in the
      // optimizer) — match it directly.
      case Between(in, lo, hi, _) =>
        for (n <- name(in); l <- lit(lo); h <- lit(hi))
          yield (n, Some(l), Some(h))
      case _ => None
    }
    tracked.iterator.flatMap { c =>
      val mine = bounds.filter(_._1 == c)
      if (mine.isEmpty) None
      else {
        val lo = mine.flatMap(_._2).maxOption.getOrElse(Long.MinValue)
        val hi = mine.flatMap(_._3).minOption.getOrElse(Long.MaxValue)
        Some((c, lo, hi))
      }
    }.nextOption()
  }

  /** STATS-PRUNED READ — the manifest-level FILE SKIPPING every lake
    * format ships (Delta data skipping / Iceberg manifest filtering):
    * resolve the current manifest, drop every segment whose recorded
    * [min,max] for `column` is disjoint from [lo, hi], scan only the
    * rest, with the residual `BETWEEN` filter still applied (stats are
    * a superset bound, not an answer). At 100 TB this is the
    * difference between a time-range query opening three segments and
    * opening three million — and it is planned from ONE manifest read,
    * zero data IO. Segments without stats for the column are always
    * scanned, so mixed lakes stay correct. Returns (filtered frame,
    * segments scanned, segments total). */
  def readTableWhere(spark: SparkSession, outDir: String, column: String,
      lo: Long, hi: Long): (DataFrame, Seq[String], Int) = {
    import org.apache.spark.sql.functions.col
    require(lo <= hi, s"empty probe range [$lo, $hi]")
    val m = readManifest(outDir)
    require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
    // `column` is logical; stats key the physical name
    val scanned = m.segs.filter(
      mayOverlap(m, _, m.physicalOf(column), lo, hi))
    (readSegments(spark, outDir, m, scanned)
      .filter(col(column) >= lo && col(column) <= hi),
      scanned, m.segs.size)
  }

  /** STATS-PRUNED STRING POINT READ — [[readTableWhere]] for a string
    * equality predicate (`WHERE event_type = 'error'`): drop every
    * segment whose recorded string [min,max] for `column` excludes
    * `value`, scan the rest with the residual filter applied. Same
    * advisory-bounds contract: segments without string stats for the
    * column are always scanned. Returns (filtered frame, segments
    * scanned, segments total). */
  def readTableWhereEq(spark: SparkSession, outDir: String, column: String,
      value: String): (DataFrame, Seq[String], Int) = {
    import org.apache.spark.sql.functions.col
    val m = readManifest(outDir)
    require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
    val hint = StrRange(m.physicalOf(column), value, value)
    val scanned = m.segs.filter(mayMatchHint(m, outDir, _, hint))
    (readSegments(spark, outDir, m, scanned)
      .filter(col(column) === value), scanned, m.segs.size)
  }

  // ---- BLOOM-FILTER SEGMENT SKIPPING (r12) ----------------------------
  // Min/max stats answer range questions; they are BLIND to point
  // probes on high-cardinality columns with uniform layout (every
  // segment's [min,max] spans every id — a GDPR `DELETE WHERE id = x`
  // scans the whole lake). The answer every format ships (Delta
  // bloom-filter index, Iceberg puffin blobs) is a per-segment BLOOM
  // SIDECAR: ~10 bits/row buys a ~1% false-positive rate, so a point
  // DML/read opens the one segment that holds the key plus ~1% of the
  // rest, planned driver-side from files ~1% the size of the data.
  //
  // Design: sidecars live at the DETERMINISTIC path
  // `_blooms/<seg>.<physCol>.bloom`, keyed by the immutable-once-
  // committed segment name, and are ADVISORY — a missing/unreadable
  // file means scan. That one rule keeps every hard case correct with
  // zero bookkeeping: pre-declaration segments, shallow clones (the
  // sidecar is hard-link-cloned or absent), imports, crash orphans
  // (CAS-losing attempts leave sidecars vacuum GCs by name), time
  // travel (old segments keep their sidecars until vacuumed). The
  // manifest carries only the DECLARATION (`bloomcols=`, physical
  // names — stable across renames like stats). Bits are set by
  // double hashing with Spark's own xxhash64 so the distributed build
  // and the driver-side probe share one hash definition by
  // construction.

  /** Second-hash salt (mixed via `xxhash64(col, lit(salt))`) and probe
    * count: k = 7 at 10 bits/row is the standard ~0.8%-fpp point. */
  private val BloomSalt = 0x9E3779B97F4A7C15L
  private val BloomHashes = 7
  private val BloomBitsPerRow = 10L
  /** Sidecar size cap (16 MiB of bits): a pathologically large segment
    * degrades fpp instead of materializing an unbounded driver-side
    * array — advisory contract, still correct. */
  private val BloomMaxBits = 1L << 27

  private def bloomPath(outDir: String, seg: String, physCol: String): Path =
    Paths.get(outDir, "_blooms", s"$seg.$physCol.bloom")

  private def bloomBitsFor(rows: Long): Long = {
    val want = math.max(1024L, rows * BloomBitsPerRow)
    math.min(((want + 63L) / 64L) * 64L, BloomMaxBits)
  }

  /** Build + write bloom sidecars for a freshly STAGED segment, one
    * per declared bloom column present in its files. One distributed
    * pass per column (hash pair projected, per-partition bitsets
    * OR-reduced); the sidecar is in place before the commit CAS that
    * makes the segment visible, so readers never see a segment whose
    * sidecar is still being written — a lost CAS orphans both
    * together. Columns are PHYSICAL (the staged files' own names). */
  private[graft] def writeSegmentBlooms(spark: SparkSession,
      outDir: String, seg: String, bloomCols: Seq[String],
      rowsKnown: Option[Long] = None): Unit = {
    if (bloomCols.isEmpty) return
    val df = spark.read.parquet(s"$outDir/$seg")
    val present = bloomCols.filter(df.columns.contains)
    if (present.isEmpty) return
    // bloom sizing only needs the row count — callers that just wrote
    // the segment pass the count they already observed (r18), saving
    // the per-segment footer walk on every bloom-tracked write
    val rows = rowsKnown.getOrElse(segmentFooterRows(outDir, seg))
    Files.createDirectories(Paths.get(outDir, "_blooms"))
    present.foreach { c =>
      val bits = bloomBitsFor(rows)
      val words = (bits / 64L).toInt
      val k = BloomHashes
      import org.apache.spark.sql.functions.{col, lit, xxhash64}
      // an EMPTY segment gets an all-zero bloom with no Spark job —
      // it (correctly) excludes every probe
      val merged =
        if (rows == 0L) new Array[Long](words)
        else df
          .select(xxhash64(col(c)).as("h1"),
            xxhash64(col(c), lit(BloomSalt)).as("h2"))
          .rdd.mapPartitions { it =>
            val arr = new Array[Long](words)
            it.foreach { r =>
              val h1 = r.getLong(0); val h2 = r.getLong(1)
              var i = 0
              while (i < k) {
                val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, bits)
                arr((pos >>> 6).toInt) |= 1L << (pos & 63L)
                i += 1
              }
            }
            Iterator.single(arr)
          }.treeReduce { (a, b) =>
            var i = 0
            while (i < a.length) { a(i) |= b(i); i += 1 }
            a
          }
      val tmp = Files.createTempFile(Paths.get(outDir, "_blooms"),
        s"tmp_$seg.$c-", ".inprogress")
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(
          Files.newOutputStream(tmp)))
      try {
        out.writeLong(bits); out.writeInt(k)
        merged.foreach(out.writeLong)
      } finally out.close()
      Files.move(tmp, bloomPath(outDir, seg, c),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Tiny driver-side sidecar cache — a DML probing one key against
    * 10 k candidate segments must not re-read each file per hint
    * evaluation. Bounded (drop-all past 256 entries), keyed by path;
    * safe because a committed segment's sidecar never changes
    * (rewrites mint new segment names). */
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Int, Array[Long])]()

  /** Driver-side may-contain probe against the segment's sidecar for
    * `physCol`. TRUE when the sidecar is absent/foreign-format
    * (advisory — scan), or when all k probed bits are set. The typed
    * literal is hashed through the SAME xxhash64 expressions the
    * build projected, evaluated locally — one hash definition, two
    * execution sites. */
  private[graft] def bloomMayContain(outDir: String, seg: String,
      physCol: String, dt: org.apache.spark.sql.types.DataType,
      value: Any): Boolean = {
    val p = bloomPath(outDir, seg, physCol)
    val key = p.toString
    var cached = bloomCache.get(key)
    if (cached == null) {
      if (!Files.exists(p)) return true
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(Files.newInputStream(p)))
      try {
        val bits = in.readLong()
        val k = in.readInt()
        if (bits <= 0L || bits % 64L != 0L || k <= 0 || k > 64) return true
        val words = new Array[Long]((bits / 64L).toInt)
        var i = 0
        while (i < words.length) { words(i) = in.readLong(); i += 1 }
        cached = (bits, k, words)
      } catch { case _: java.io.IOException => return true }
      finally in.close()
      if (bloomCache.size >= 256) bloomCache.clear()
      bloomCache.put(key, cached)
    }
    val (bits, k, words) = cached
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val litE = Literal.create(value, dt)
    val h1 = XxHash64(Seq(litE), 42L).eval(null).asInstanceOf[Long]
    val h2 = XxHash64(Seq(litE, Literal(BloomSalt)), 42L)
      .eval(null).asInstanceOf[Long]
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, bits)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L)
        return false
      i += 1
    }
    true
  }

  /** ANALYZE — backfill per-segment artifacts for segments written
    * BEFORE the relevant declaration: min/max/null stats for `cols`
    * (segments already covering every requested column are skipped)
    * and bloom sidecars for the table's declared bloom columns
    * (segments whose sidecar files exist are skipped). One scan per
    * backfilled segment, ONE metadata commit for the stats (sidecars
    * are advisory files — they become effective the moment they
    * exist). This is how a live table adopts stats/bloom pruning
    * without waiting for OPTIMIZE to rewrite it: declare, ANALYZE,
    * done — no data moved. Columns are logical names; stats key
    * physical (they follow the bytes). Idempotent; re-running
    * analyzes nothing. Returns (committed version — unchanged when
    * no stats were added, segments analyzed). */
  def analyzeTable(spark: SparkSession, outDir: String,
      cols: Seq[String]): (Long, Int) = {
    val m = readManifest(outDir)
    require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
    val schema = tableSchema(spark, outDir, m)
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"no column $c to analyze (has ${schema.fieldNames.mkString(", ")})"))
    val phys = cols.map(m.physicalOf)
    val analyzed = scala.collection.mutable.Set.empty[String]
    val addStats = Map.newBuilder[String, Map[String, ColStat]]
    m.segs.foreach { seg =>
      val have = m.stats.getOrElse(seg, Map.empty).keySet
      val missingStats = phys.filterNot(have)
      if (missingStats.nonEmpty) {
        // stats describe the FILE bytes (pre-DV), same as write-time
        // stats — a DV only ever narrows the live set, so file-level
        // bounds stay a sound superset
        val df = spark.read.parquet(s"$outDir/$seg")
        val present = missingStats.filter(df.columns.contains)
        if (present.nonEmpty) {
          addStats += seg ->
            (m.stats.getOrElse(seg, Map.empty) ++
              segmentStats(df, present))
          analyzed += seg
        }
      }
      val missingBlooms = m.bloomCols.filterNot(c =>
        Files.exists(bloomPath(outDir, seg, c)))
      if (missingBlooms.nonEmpty) {
        writeSegmentBlooms(spark, outDir, seg, missingBlooms)
        analyzed += seg
      }
    }
    val stats = addStats.result()
    if (stats.isEmpty) return (m.version, analyzed.size)
    require(commitNext(outDir, m, m.copy(version = m.version + 1,
      stats = m.stats ++ stats,
      // rows did not change — a change feed skips this commit, same
      // class as compaction's dataChange=false
      cdcSegs = Nil, cdcDropSegs = Nil, dataChange = false)),
      s"ANALYZE at $outDir lost a manifest race — re-run (idempotent)")
    (m.version + 1, analyzed.size)
  }

  /** Declare the table's bloom columns (metadata-only commit, like
    * partition evolution): every SUBSEQUENT staged segment writes
    * sidecars for them; existing segments stay sidecar-less (advisory
    * — scanned) until a rewrite or OPTIMIZE re-stages them — or
    * [[analyzeTable]] backfills them in place. Columns
    * must be BIGINT-family or STRING (the typed-literal probe types);
    * empty clears the declaration. Returns the committed version. */
  def setBloomColumns(spark: SparkSession, outDir: String,
      logicalCols: Seq[String]): Long = {
    import org.apache.spark.sql.types._
    val m = readManifest(outDir)
    requireTable(m, outDir)
    val schema = tableSchema(spark, outDir, m)
    val phys = logicalCols.map { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        sys.error(s"no column $c to bloom-index " +
          s"(has ${schema.fieldNames.mkString(", ")})"))
      require(Seq[DataType](LongType, IntegerType, ShortType, ByteType,
        StringType).contains(f.dataType),
        s"bloom column $c must be integral or string, is ${f.dataType}")
      require(!c.contains('|'), s"bloom column name must not contain '|': $c")
      m.physicalOf(c)
    }
    require(commitNext(outDir, m, m.copy(version = m.version + 1,
      bloomCols = phys.distinct,
      cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)),
      s"bloom declaration at $outDir lost a manifest race")
    m.version + 1
  }

  /** BLOOM-PRUNED POINT READ — [[readTableWhere]] for an equality /
    * IN-list predicate on a bloom-indexed column: drop every segment
    * whose min/max range AND bloom sidecar both exclude every probed
    * value, scan the rest with the residual filter applied. Values
    * are typed by the table schema. Returns (filtered frame, segments
    * scanned, segments total). */
  def readTableWhereIn(spark: SparkSession, outDir: String,
      column: String, values: Seq[Any]): (DataFrame, Seq[String], Int) = {
    import org.apache.spark.sql.functions.col
    require(values.nonEmpty, "empty probe set")
    val m = readManifest(outDir)
    require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
    val dt = tableSchema(spark, outDir, m)
      .fields.find(_.name == column).getOrElse(
        sys.error(s"no column $column to probe")).dataType
    val hint = PointSet(m.physicalOf(column), dt, values)
    val scanned = m.segs.filter(mayMatchHint(m, outDir, _, hint))
    if (scanned.isEmpty) {
      // provably empty: zero data IO, typed empty frame
      (readSegments(spark, outDir, m, m.segs.take(1))
        .filter(col(column).isin(values: _*)).limit(0),
        scanned, m.segs.size)
    } else
      (readSegments(spark, outDir, m, scanned)
        .filter(col(column).isin(values: _*)), scanned, m.segs.size)
  }

  /** Number of parquet data files a segment holds (compaction's
    * observable effect). */
  def segmentFileCount(outDir: String, seg: String): Int =
    listDir(Paths.get(outDir, seg))
      .count(_.getFileName.toString.endsWith(".parquet"))

  /** TIME TRAVEL: read the lake as of a specific committed manifest
    * version. Valid as long as the version's segments have not been
    * vacuumed — [[vacuum]] states the retention contract. */
  def readTableAsOf(spark: SparkSession, outDir: String,
      version: Long): DataFrame = {
    val p = manifestDir(outDir).resolve(f"v$version%010d.txt")
    require(Files.exists(p), s"lake at $outDir has no manifest v$version")
    val m = manifestAt(outDir, version)
    require(m.segs.nonEmpty, s"manifest v$version lists no segments")
    // Time travel is schema travel too: each version reads under the
    // schema IT recorded — and under ITS deletion vectors, so a
    // pre-point-delete version still shows the rows a later DV hid.
    readSegments(spark, outDir, m, m.segs)
  }

  // ---- TIMESTAMP-based time travel (r12) ------------------------------
  // The manifest CAS publishes one immutable file per version (hard
  // link, never rewritten), so that file's modification time IS the
  // commit time — exactly how Delta resolves TIMESTAMP AS OF (commit
  // file mtime). No manifest format change needed; the resolution is
  // one metadata listing over the retained log. Retention contract:
  // vacuum deletes old version files, so the timestamp horizon equals
  // the time-travel horizon, and a timestamp older than the earliest
  // retained commit refuses loudly.

  /** Epoch-microsecond commit time of version `v` (the CAS-published
    * manifest file's mtime — immutable once linked). */
  def commitTimestampMicros(outDir: String, v: Long): Long = {
    val p = manifestDir(outDir).resolve(f"v$v%010d.txt")
    require(Files.exists(p),
      s"lake at $outDir has no manifest v$v (vacuumed or never committed)")
    val i = Files.getLastModifiedTime(p).toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** TIME-BASED retention (`VACUUM … RETAIN n HOURS`, the spelling
    * every lake format's operators actually run): retain every
    * version committed within the trailing `hours` of the NEWEST
    * commit — measured on the log's own commit clock (the same clock
    * `TIMESTAMP AS OF` resolves by), not wall time, so the horizon is
    * reproducible and a paused table doesn't silently lose all but
    * one version the moment anyone vacuums it. At least the tip is
    * always retained. Delegates to [[vacuum]]'s version-count
    * machinery (checkpoint materialization, live-set union, DV/cdc
    * retention all inherited). */
  def vacuumRetainHours(outDir: String, hours: Long): (Int, Int) = {
    require(hours >= 0, s"negative retention: $hours hours")
    val versions = manifestVersions(outDir)
    if (versions.isEmpty) return (0, 0)
    val cut = commitTimestampMicros(outDir, versions.max) -
      hours * 3600L * 1000000L
    val keep = versions.count(commitTimestampMicros(outDir, _) >= cut)
    vacuum(outDir, math.max(1, keep))
  }

  /** Latest committed version whose commit time ≤ `tsMicros` — the
    * `TIMESTAMP AS OF` resolution rule (a timestamp between two
    * commits resolves to the earlier one: the table AS IT WAS at that
    * instant). Refuses a timestamp older than the earliest retained
    * commit (vacuumed history) or a lake with no commits. */
  def versionAtOrBefore(outDir: String, tsMicros: Long): Long = {
    val versions = manifestVersions(outDir)
    require(versions.nonEmpty, s"lake at $outDir has no commits")
    val at = versions.filter(commitTimestampMicros(outDir, _) <= tsMicros)
    require(at.nonEmpty,
      s"timestamp $tsMicros µs precedes the earliest retained commit " +
        s"(v${versions.min}) of $outDir — older history was vacuumed")
    at.max
  }

  /** Earliest committed version whose commit time ≥ `tsMicros` — the
    * FROM-bound rule for timestamp-windowed change feeds (changes
    * committed at or after the instant). Refuses a timestamp past the
    * newest commit. */
  def firstVersionAtOrAfter(outDir: String, tsMicros: Long): Long = {
    val versions = manifestVersions(outDir)
    require(versions.nonEmpty, s"lake at $outDir has no commits")
    val at = versions.filter(commitTimestampMicros(outDir, _) >= tsMicros)
    require(at.nonEmpty,
      s"timestamp $tsMicros µs is past the newest commit " +
        s"(v${versions.max}) of $outDir")
    at.min
  }

  /** TIME TRAVEL by timestamp: [[readTableAsOf]] at
    * [[versionAtOrBefore]]'s resolution. */
  def readTableAsOfTimestamp(spark: SparkSession, outDir: String,
      tsMicros: Long): DataFrame =
    readTableAsOf(spark, outDir, versionAtOrBefore(outDir, tsMicros))

  // ---- RESTORE (r12) --------------------------------------------------

  /** RESTORE the table to an earlier committed version — Delta's
    * `RESTORE TABLE`, the undo verb time travel exists for: one
    * METADATA commit whose table state (segment list, per-segment
    * stats, deletion vectors, partition facts, schema generation and
    * column mapping) is the target version's, verbatim. History stays
    * intact: the restore lands as a NEW version on top, the undone
    * versions remain time-travelable until vacuum ages them out, and
    * a second restore can undo the undo. No data file is read,
    * written, or moved (cdc images aside) — at 100 TB a restore costs
    * one manifest write, which is the entire point: recovering from a
    * bad backfill must not cost a table rewrite.
    *
    * Deliberately NOT restored (operational state, not table data):
    * `maxB` and `txns` (the streaming sink's replay-idempotence
    * watermarks — restoring them would re-admit already-ingested
    * batches as duplicates on the next trigger), and `expects`
    * (data-quality contracts; an undo of data must not silently undo
    * a later-tightened expectation). The partition SPEC follows the
    * same rule (future-write config stays), while the partition FACTS
    * travel with the segments they describe.
    *
    * With `cdc = true` the commit records explicit row-level change
    * images, so a change-data-feed consumer rides through the restore
    * reading exactly the diff: live rows of segments the restore
    * removes → `delete`, live rows of segments it re-adds → `insert`,
    * and for segments live on BOTH sides whose deletion vectors
    * differ, the positional diff (rows a later DV hid → `insert`
    * back, rows only the target's DV hid → `delete`). Cost is
    * O(changed rows), never O(table). A restore ACROSS a schema
    * generation refuses under cdc=true: one feed window cannot carry
    * images under two schemas (consumers must re-snapshot — Delta's
    * CDF has the same schema-boundary rule). With cdc=false on a
    * CDC-consumed table, [[changesCdcBetween]] refuses the window
    * loudly if segments were removed — the standing fail-loud rule
    * for untracked rewrites.
    *
    * The commit is a FULL SNAPSHOT record, not a delta: a restore may
    * need to UNSET a surviving segment's deletion vector, which the
    * delta line format cannot express (`dvec=` only sets). Restores
    * are rare operator actions; O(live segments) metadata is the
    * simple-correct price. CAS losses follow the DML optimistic-retry
    * protocol; a cdc image staged by a losing attempt is a vacuum
    * orphan like any staged rewrite.
    *
    * Returns (newVersion, segmentsRestored, segmentsRemoved) —
    * (currentVersion, 0, 0) when the table is already at the target
    * state. */
  def restoreTable(spark: SparkSession, outDir: String, toVersion: Long,
      cdc: Boolean = false,
      beforeCommit: () => Unit = () => ()): (Long, Int, Int) = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    require(toVersion >= 1L, s"cannot RESTORE to v$toVersion")
    val tp = manifestDir(outDir).resolve(f"v$toVersion%010d.txt")
    require(Files.exists(tp),
      s"lake at $outDir has no manifest v$toVersion (vacuumed or never " +
        "committed) — the RESTORE horizon is the vacuum retention horizon")
    val t = manifestAt(outDir, toVersion)
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m = readManifest(outDir)
      // RESTORE is a write against the TIP (r16): a tip whose declared
      // minWriter exceeds this engine must refuse — committing the
      // restored state would silently drop the future protocol state
      // the gate exists to protect (same rule as every DML path)
      gateWriter(outDir, m)
      require(toVersion <= m.version,
        s"RESTORE target v$toVersion is past the tip v${m.version}")
      if (m.segs == t.segs && m.dv == t.dv && m.schemaV == t.schemaV)
        return (m.version, 0, 0)
      val missing = t.segs.filterNot(s =>
        Files.exists(Paths.get(outDir, s)))
      require(missing.isEmpty,
        s"RESTORE to v$toVersion needs vacuumed segments " +
          missing.mkString(", "))
      val mSet = m.segs.toSet
      val tSet = t.segs.toSet
      val removedSegs = m.segs.filterNot(tSet)
      val addedSegs = t.segs.filterNot(mSet)
      val nonce = java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
      val cdcSeg = s"seg_cdc_r$nonce"
      var cdcRows = false
      if (cdc) {
        require(t.schemaV == m.schemaV && t.colmap == m.colmap,
          s"RESTORE to v$toVersion crosses a schema generation " +
            s"(${t.schemaV} vs ${m.schemaV}) — change images under two " +
            "schemas cannot share one feed window; restore with " +
            "cdc=false and re-snapshot feed consumers")
        if (removedSegs.nonEmpty) {
          physicalize(readSegments(spark, outDir, m, removedSegs)
            .withColumn("_change_type", lit("delete")), m)
            .write.mode("append").parquet(s"$outDir/$cdcSeg")
          cdcRows = true
        }
        if (addedSegs.nonEmpty) {
          physicalize(readSegments(spark, outDir, t, addedSegs)
            .withColumn("_change_type", lit("insert")), t)
            .write.mode("append").parquet(s"$outDir/$cdcSeg")
          cdcRows = true
        }
        // surviving segments whose DV state differs: positional diff
        mSet.intersect(tSet).toSeq.sorted
          .filter(s => m.dv.get(s) != t.dv.get(s)).foreach { seg =>
            def positions(mm: Manifest): Option[DataFrame] =
              mm.dv.get(seg).map(r =>
                readDv(spark, Seq(s"$outDir/_dv/${r.file}")))
            val raw = reader(spark, outDir, m).parquet(s"$outDir/$seg")
              .withColumn("__dv_f", col("_metadata.file_name"))
              .withColumn("__dv_i", col("_metadata.row_index"))
            // the raw scan already carries PHYSICAL names (cdc files
            // speak physical, like every file on disk) — no rename seam
            def imageAt(pos: DataFrame, change: String): Unit = {
              raw.join(broadcast(pos),
                  raw("__dv_f") === pos("file_name") &&
                    raw("__dv_i") === pos("row_index"), "left_semi")
                .drop("__dv_f", "__dv_i")
                .withColumn("_change_type", lit(change))
                .write.mode("append").parquet(s"$outDir/$cdcSeg")
              cdcRows = true
            }
            val posM = positions(m)
            val posT = positions(t)
            def diff(a: Option[DataFrame], b: Option[DataFrame])
                : Option[DataFrame] = a.map { af =>
              b.fold(af)(bf => af.join(broadcast(bf),
                af("file_name") === bf("file_name") &&
                  af("row_index") === bf("row_index"), "left_anti"))
            }
            // hidden now, live after restore → the rows come back
            diff(posM, posT).foreach(p => imageAt(p, "insert"))
            // live now, hidden after restore → the rows go away
            diff(posT, posM).foreach(p => imageAt(p, "delete"))
          }
      }
      beforeCommit()
      if (commitManifest(outDir, m.version + 1, m.maxB, t.segs,
          t.schemaV, t.schemaJson, t.stats, m.txns, m.expects,
          cdcSegs = if (cdcRows) Seq(cdcSeg) else Nil,
          dataChange = true, dv = t.dv, colmap = t.colmap,
          partSpec = m.partSpec, parts = t.parts,
          bloomCols = m.bloomCols,
          // like txns: the load-history ledger is append-only TIP
          // state — a restore undoes data, not the fact that a
          // landing-zone file was already ingested (a post-restore
          // COPY INTO re-run must not duplicate it)
          copied = m.copied,
          // never-downgrade (r16): the restored snapshot keeps the
          // HIGHEST declared minimums seen on the chain — undoing
          // data must not re-admit writers the tip had fenced out
          minReaderFloor = math.max(m.minReader, t.minReader),
          minWriterFloor = math.max(m.minWriter, t.minWriter),
          segRows = t.segRows))
        return (m.version + 1, addedSegs.size, removedSegs.size)
      // lost the CAS — re-plan against the new tip
    }
    sys.error(s"restore at $outDir: $dmlMaxAttempts consecutive CAS " +
      "losses (concurrent writers) — coordinate the writers or retry")
  }

  /** [[restoreTable]] at [[versionAtOrBefore]]'s resolution — the
    * `RESTORE TABLE … TO TIMESTAMP AS OF` spelling. */
  def restoreTableToTimestamp(spark: SparkSession, outDir: String,
      tsMicros: Long, cdc: Boolean = false): (Long, Int, Int) =
    restoreTable(spark, outDir, versionAtOrBefore(outDir, tsMicros), cdc)

  // ---- SHALLOW CLONE (r12) --------------------------------------------

  /** SHALLOW CLONE: publish `dstDir` as an independent lake whose v1
    * state is `srcDir`'s state at `version` (default: the tip),
    * sharing every data byte with the source via HARD LINKS — the
    * zero-copy branch Delta calls shallow clone, and the way a 100 TB
    * table gets a dev/test/staging branch in O(files) metadata ops
    * with zero data movement. Each segment dir (and each
    * deletion-vector dir the target version references) is re-created
    * under the clone as a tree of hard links to the source's files;
    * on an object store the link step becomes the manifest-level
    * file-reference copy every table format's clone does — same
    * contract, the bytes never move either way.
    *
    * STRONGER than Delta's shallow clone on the one axis that bites
    * operators: VACUUM on the source cannot break the clone. A
    * vacuumed file's inode survives while any link references it (the
    * clone holds one), and the protocol never mutates a data file in
    * place (every rewrite mints a new segment name), so source and
    * clone stay independent forever — there is no "vacuum on the
    * source invalidates clones" caveat to schedule around, and no
    * reference-counting GC to build: each table's vacuum drops its
    * own links, the filesystem frees an inode when the last link
    * goes.
    *
    * The clone is a NEW table operationally: fresh history starting
    * at v1 (time travel into pre-clone versions happens on the
    * SOURCE, which still has them), no cdc history carried (a feed
    * consumer attaches from the clone's own snapshot), and maxB/txns
    * RESET — a stream that wrote to the source must use a fresh
    * checkpoint against the clone, or its replayed batch ids would be
    * admitted/skipped by the wrong table's watermark (Delta's clone
    * docs state the same new-checkpoint rule). Expectations, column
    * mapping, and the partition spec DO carry: they describe the data
    * and its layout, not a writer's progress.
    *
    * Same-filesystem requirement is inherent to hard links; a
    * cross-device clone target fails loudly rather than silently
    * degrading to a full copy (at 100 TB "shallow" must never
    * surprise-cost a table scan of IO).
    *
    * Returns (segments, filesLinked, bytesShared). */
  def cloneTable(spark: SparkSession, srcDir: String, dstDir: String,
      version: Option[Long] = None): (Int, Int, Long) = {
    require(Paths.get(srcDir).toAbsolutePath.normalize !=
      Paths.get(dstDir).toAbsolutePath.normalize,
      s"clone target equals the source: $srcDir")
    val srcTip = readManifest(srcDir)
    require(srcTip.version >= 1L, s"lake at $srcDir has no commits")
    val v = version.getOrElse(srcTip.version)
    require(Files.exists(manifestDir(srcDir).resolve(f"v$v%010d.txt")),
      s"lake at $srcDir has no manifest v$v (vacuumed or never " +
        "committed) — the clone horizon is the vacuum retention horizon")
    val t = manifestAt(srcDir, v)
    // the clone re-expresses the source state through THIS engine's
    // writer (r16): a source whose declared minWriter exceeds it must
    // refuse — the clone's v1 would silently drop the protocol state
    // those minimums guard
    gateWriter(srcDir, t)
    require(readManifest(dstDir).version == 0L,
      s"clone target $dstDir already holds a lake")
    var files = 0
    var bytes = 0L
    def linkTree(rel: String): Unit = {
      val from = Paths.get(srcDir, rel)
      require(Files.isDirectory(from),
        s"clone source is missing $rel (vacuumed mid-clone?)")
      val toBase = Paths.get(dstDir, rel)
      val s = Files.walk(from)
      try s.iterator().asScala.foreach { p =>
        val to = toBase.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(to)
        else {
          Files.createLink(to, p)
          files += 1
          bytes += Files.size(p)
        }
      } finally s.close()
    }
    t.segs.foreach(linkTree)
    t.dv.values.map(_.file).toSet.foreach((f: String) => linkTree(s"_dv/$f"))
    require(commitManifest(dstDir, 1L, -1L, t.segs, t.schemaV,
      t.schemaJson, t.stats, Map.empty, t.expects, Nil,
      dataChange = true, t.dv, t.colmap, t.partSpec, t.parts,
      bloomCols = t.bloomCols, copied = t.copied,
      // the clone's v1 inherits the source version's declared
      // minimums (r16 never-downgrade) — branching must not re-admit
      // writers the source had fenced out
      minReaderFloor = t.minReader, minWriterFloor = t.minWriter,
      segRows = t.segRows),
      s"clone commit at $dstDir lost a manifest race")
    (t.segs.size, files, bytes)
  }

  // ---- EXPORT (r16) ---------------------------------------------------

  /** EXPORT TABLE: materialize the CURRENT manifest version as a
    * plain-parquet directory ANY engine can read — DuckDB, Trino,
    * pandas — with zero graft-protocol knowledge. This is the escape
    * hatch the r15 verdict named missing #2: only this engine reads a
    * graft lake (manifest + DVs + column mapping); a 100 TB shop must
    * be able to hand the data to a foreign reader without it. The
    * exported layout carries none of the protocol: ONE FLAT directory
    * of parquet files — no `_manifest`, no `_dv`, no subdirectories,
    * LOGICAL column names, deleted rows physically absent, and every
    * file under the SAME schema (name-for-name, type-for-type) — so a
    * naive `spark.read.parquet(dir)`, `read_parquet('<dir>/[*].parquet')`,
    * or pandas read with ZERO options sees exactly what [[readTable]]
    * returns.
    *
    * Zero-copy where the protocol allows ([[cloneTable]]'s trick): a
    * segment with no deletion vector, under no column mapping, whose
    * footer schema already equals the table schema is HARD-LINKED
    * (O(files) metadata ops, no data bytes — the common case: at
    * steady state DV debt is a purge-bounded sliver). Everything else
    * — DV'd segments (deleted positions must not resurrect in the
    * export), mapped tables (files carry physical ids), pre-evolution
    * segments (stale footer schema) — is REWRITTEN through
    * [[readSegments]], the same seam every engine read uses, in ONE
    * batched scan/write (one job, not one per segment). Cost at
    * 100 TB: O(links) + O(rewritten bytes), and the rewrite set is
    * exactly the protocol debt.
    *
    * The export is a DEAD COPY by design — a snapshot for foreign
    * readers, not a second table: later DML on the source never
    * mutates linked bytes (rewrites mint new segments; vacuum only
    * unlinks the lake's own names — the clone independence argument).
    * Target must not already hold files (a partial prior export must
    * be cleaned explicitly; silently merging two exports would
    * double-count). A target on a DIFFERENT FILESYSTEM (r18, the r17
    * verdict's #4: `Files.createLink` threw raw on EXDEV) degrades
    * per file to `Files.copy` — the receipt's `copied` count is the
    * price paid; on an object store the same seam becomes a
    * server-side copy of the clean segments' objects.
    *
    * PARTITIONED export (r17, the r16 verdict's #3): `partitionBy`
    * emits the standard Hive `col=value/` layout instead of the flat
    * one, so foreign engines PRUNE on the partition column (DuckDB
    * `hive_partitioning=1`, Spark/Trino natively). COMPOSITE specs
    * (r18, the r17 verdict's #2: one column only, while the lake's
    * own partition specs compose) are comma-separated — `"day,
    * tenant"` nests `day=v/tenant=v/` directories in spec order.
    * Always a rewrite — deliberately: re-bucketing by value is
    * inherently data movement (the source layout is
    * segment-oriented), and a uniform layout (partition values in
    * DIRECTORY NAMES only, never repeated inside files) is what
    * every foreign reader agrees on; linking partition-fact segments
    * would mix files-with-column into a layout whose other files
    * lack it. Cost: O(table bytes) in ONE distributed job — the same
    * scan/shuffle any engine pays to re-partition.
    *
    * INCREMENTAL export (r17, #4): `sinceVersion = Some(a)` exports
    * ONLY the segments versions a+1..target added, APPENDING to a
    * target that already holds the version-a export — so refreshing a
    * foreign copy costs O(changed segments), not O(table). Sound only
    * when the window is APPEND-ONLY; anything an append-only delta
    * cannot represent in a dead-copy directory refuses LOUD: a
    * removed/rewritten base segment (compaction, DML), a DV change on
    * a base segment (new deletions), schema evolution, or a column-
    * mapping change. The combined directory then equals
    * `readTableAsOf(target)` exactly.
    *
    * The combined-directory contract is CHECKED, not trusted (r18 —
    * the r17 verdict's #3 and the advisor's fresh-target hole: the
    * commonest misuse, an empty or wrong-version target, silently
    * produced an incomplete directory that still read cleanly).
    * Every export stamps an underscore-hidden receipt
    * (`_graft_export.txt`: exported version + layout; `_`-prefixed,
    * so Spark/DuckDB/pandas globs never see it), and an incremental
    * export REFUSES unless the target carries one whose version
    * equals `sinceVersion` and whose layout (flat vs partition spec)
    * equals this export's — a flat delta can never silently land in
    * a partitioned tree or vice versa.
    *
    * Returns (version exported, files hard-linked, files copied —
    * the cross-filesystem fallback, segments rewritten, live rows
    * exported — the DELTA's rows when incremental). */
  def exportTable(spark: SparkSession, lakeDir: String,
      outDir: String, version: Option[Long] = None,
      partitionBy: Option[String] = None,
      sinceVersion: Option[Long] = None): (Long, Int, Int, Int, Long) = {
    // time-travel export (r16): hand a foreign reader ANY retained
    // version, not just the tip — the audit/repro handoff ("give me
    // the table as the model saw it"), same horizon as RESTORE/clone
    // (the vacuum retention boundary)
    val m = version.fold(readManifest(lakeDir)) { v =>
      require(Files.exists(manifestDir(lakeDir).resolve(f"v$v%010d.txt")),
        s"lake at $lakeDir has no manifest v$v (vacuumed or never " +
          "committed) — the export horizon is the vacuum retention " +
          "horizon")
      manifestAt(lakeDir, v)
    }
    requireTable(m, lakeDir)
    // incremental: the exported segment set narrows to the window's
    // additions, behind the append-only guards
    val expSegs: Seq[String] = sinceVersion match {
      case None => m.segs
      case Some(a) =>
        require(a < m.version,
          s"SINCE VERSION $a is not below the export version " +
            s"${m.version} — nothing can be incremental about it")
        val base = manifestAt(lakeDir, a)
        val liveNow = m.segs.toSet
        val gone = base.segs.filterNot(liveNow)
        require(gone.isEmpty,
          s"versions ${a + 1}..${m.version} are not append-only: " +
            s"${gone.size} base segment(s) were removed or rewritten " +
            s"(${gone.take(3).mkString(", ")}…) — a dead-copy " +
            "directory cannot represent removals; run a full export")
        base.segs.foreach { s =>
          require(m.dv.get(s) == base.dv.get(s),
            s"segment $s changed its deletion vector after v$a — new " +
              "deletions cannot be represented by appended files; " +
              "run a full export")
        }
        require(m.schemaV == base.schemaV,
          s"schema evolved in the window (v${base.schemaV} → " +
            s"v${m.schemaV}) — the combined directory would be " +
            "schema-ragged; run a full export")
        require(m.colmap == base.colmap,
          "column mapping changed in the window; run a full export")
        m.segs.filterNot(base.segs.toSet)
    }
    val out = Paths.get(outDir)
    val pcols: Seq[String] =
      partitionBy.toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    sinceVersion match {
      case None =>
        // a FULL export never merges into leftovers
        require(!Files.isDirectory(out) || listDir(out).isEmpty,
          s"export target $outDir already holds files — exports never " +
            "merge; clean the target or pick a fresh one")
      case Some(a) =>
        // an INCREMENTAL export exists to append to the prior export —
        // and PROVES one is there (r18): the target must carry the
        // receipt of exactly the version-a export in exactly this
        // layout, or the combined directory would silently be
        // incomplete (fresh/wrong-version target) or mixed-layout
        // (flat delta into a partitioned tree, or vice versa)
        val mk = readExportMarker(out)
        require(mk.isDefined,
          s"SINCE VERSION $a: target $outDir holds no prior export " +
            "receipt (_graft_export.txt) — an incremental export can " +
            "only append to a directory a previous EXPORT TABLE " +
            "wrote; run a full export first")
        val (prevV, prevCols) = mk.get
        require(prevV == a,
          s"SINCE VERSION $a: target $outDir holds the export of " +
            s"version $prevV — the delta a+1..tip only composes onto " +
            s"the version-$a export; export SINCE VERSION $prevV, or " +
            "run a full export into a clean target")
        require(prevCols == pcols,
          s"export layouts cannot mix: target $outDir holds a " +
            s"${layoutName(prevCols)} export, this export is " +
            s"${layoutName(pcols)} — a combined directory must keep " +
            "ONE layout; run a full export into a clean target")
    }
    Files.createDirectories(out)
    val cur = tableSchema(spark, lakeDir, m)
    val dvRows = expSegs.flatMap(m.dv.get).map(_.rows).sum
    val rows = expSegs.map(s =>
      m.segRows.getOrElse(s, segmentFooterRows(lakeDir, s))).sum - dvRows
    if (pcols.nonEmpty) {
      pcols.foreach(pcol => require(cur.fieldNames.contains(pcol),
        s"PARTITIONED BY ($pcol): no such column in " +
          cur.fieldNames.mkString(", ")))
      if (expSegs.nonEmpty) {
        val dataCols = cur.fieldNames.filterNot(pcols.contains)
        readSegments(spark, lakeDir, m, expSegs)
          .select((dataCols ++ pcols).map(org.apache.spark.sql
            .functions.col).toSeq: _*)
          .write.mode("append").partitionBy(pcols: _*)
          .parquet(out.toString)
      }
      require(listDir(out).exists(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(pcols.head + "=")) ||
          expSegs.isEmpty,
        s"partitioned export produced no ${pcols.head}= directories")
      writeExportMarker(out, m.version, pcols)
      return (m.version, 0, 0, expSegs.size, rows)
    }
    val want = cur.fields.map(f => (f.name, f.dataType)).toSeq
    // Link-eligible = byte-identical semantics for a plain reader.
    // Footer probing is reserved for lakes whose schema has EVOLVED
    // (schemaV > 1 — only then can a live segment's footer lag the
    // table schema; every ingest path REQUIREs footer == table schema
    // at write time otherwise): probing every clean segment made
    // classification O(segments) serial driver reads, against this
    // verb's own O(links)-metadata claim (r16 review catch).
    val maybeStale = m.schemaV > 1L
    val (linkable, rewrite) = expSegs.partition { s =>
      m.colmap.isEmpty && !m.dv.contains(s) && (!maybeStale || {
        val foot = spark.read.parquet(s"$lakeDir/$s").schema
        foot.fields.map(f => (f.name, f.dataType)).toSeq == want
      })
    }
    // FLAT layout — every file at the top level, prefixed by its
    // segment so names stay unique. Nested seg dirs would defeat the
    // point: Spark's default reader does not recurse into non-`k=v`
    // subdirectories, so "plain" must mean one directory of files
    // that `spark.read.parquet(dir)`, `read_parquet('dir/[*].pq')`,
    // and pandas all take with zero options.
    var files = 0
    var copies = 0
    linkable.foreach { s =>
      listDir(Paths.get(lakeDir, s)).foreach { p =>
        if (Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet")) {
          if (linkOrCopy(out.resolve(s + "__" + p.getFileName.toString), p))
            files += 1
          else copies += 1
        }
      }
    }
    if (rewrite.nonEmpty) {
      // one batched scan of every protocol-debt segment: DVs
      // reconciled, physical ids renamed back, schema aligned —
      // project to the table schema so old-generation files come out
      // column-complete and column-ordered like the linked ones. The
      // write lands in an underscore-hidden staging dir (ignored by
      // readers even if a crash strands it), then hoists its parquet
      // parts to the flat top level.
      import org.apache.spark.sql.functions.col
      val tmp = out.resolve("_graft_export_stage")
      readSegments(spark, lakeDir, m, rewrite)
        .select(cur.fieldNames.map(col).toSeq: _*)
        .write.mode("overwrite").parquet(tmp.toString)
      listDir(tmp).foreach { p =>
        if (Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          Files.move(p,
            out.resolve("rewritten__" + p.getFileName.toString))
      }
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
    // receipt row count from MANIFEST-carried segment counts (r17 —
    // the r16 verdict's #7: serial footer opens were O(segments) per
    // export, against the verb's own O(links)-metadata claim); only
    // segments a legacy manifest never counted fall back to footers
    writeExportMarker(out, m.version, Nil)
    (m.version, files, copies, rewrite.size, rows)
  }

  /** Hard-link `src` as `target`, degrading to a byte copy when the
    * filesystem refuses the link (EXDEV — target off the lake's
    * volume; the object-store analogue is a server-side copy). True =
    * linked, false = copied; anything else (target exists, source
    * unreadable) stays LOUD. */
  private def linkOrCopy(target: java.nio.file.Path,
      src: java.nio.file.Path): Boolean =
    try { Files.createLink(target, src); true }
    catch {
      case e: java.nio.file.FileAlreadyExistsException => throw e
      case _: java.nio.file.FileSystemException |
           _: UnsupportedOperationException =>
        Files.copy(src, target); false
    }

  /** The export receipt stamped into every export target
    * (`_graft_export.txt`: the exported version and layout). The `_`
    * prefix keeps it invisible to Spark/DuckDB/pandas parquet reads —
    * the exported directory stays "plain" — while giving the
    * INCREMENTAL verb something to verify the base against (r18). */
  private def exportMarker(out: java.nio.file.Path): java.nio.file.Path =
    out.resolve("_graft_export.txt")

  private def layoutName(pcols: Seq[String]): String =
    if (pcols.isEmpty) "flat" else s"PARTITIONED BY (${pcols.mkString(", ")})"

  private def writeExportMarker(out: java.nio.file.Path, v: Long,
      pcols: Seq[String]): Unit =
    Files.write(exportMarker(out),
      (s"version=$v\nlayout=" +
        (if (pcols.isEmpty) "flat" else "part:" + pcols.mkString(","))
      ).getBytes("UTF-8"))

  private def readExportMarker(
      out: java.nio.file.Path): Option[(Long, Seq[String])] = {
    val p = exportMarker(out)
    if (!Files.isRegularFile(p)) None
    else {
      val kv = new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator.flatMap { ln =>
          ln.split("=", 2) match {
            case Array(k, v) => Some(k -> v)
            case _ => None
          }
        }.toMap
      for (v <- kv.get("version"); lay <- kv.get("layout")) yield
        (v.toLong,
          if (lay == "flat") Nil
          else lay.stripPrefix("part:").split(",").toSeq)
    }
  }

  // ---- IMPORT / CONVERT (r12) -----------------------------------------

  /** Zero-copy IMPORT of an existing plain-parquet directory as a lake
    * segment — the `CONVERT TO DELTA` move: adopting data the lake
    * protocol did not write must not cost a rewrite of that data. The
    * source dir's parquet files are HARD-LINKED into a fresh segment
    * (O(files) metadata ops, zero data bytes — same trick as
    * [[cloneTable]], same object-store degradation note) and one
    * commit publishes it; `statsCols` computes min/max/null segment
    * stats during the import (ONE scan — the only data IO, and it is
    * optional), so the imported segment prunes like native ones.
    *
    * The source directory is never modified (a hard link lives in the
    * TARGET directory), and no later lake operation can change the
    * shared bytes: DML rewrites mint new segments, vacuum only
    * unlinks the lake's own names. The plain-parquet source stays
    * readable as plain parquet forever.
    *
    * Into an EMPTY dir this creates the table (v1). Into an existing
    * lake it appends, requiring the imported footer schema to match
    * the table schema name-for-name (loud refusal otherwise — a
    * mis-pathed import must never silently widen a table); lakes with
    * an ACTIVE COLUMN MAPPING refuse imports (foreign files carry
    * logical names, the lake's files carry physical ids — adopting
    * them unrewritten would corrupt the mapping invariant).
    *
    * Returns (committedVersion, filesLinked, rowsImported). */
  def importParquetDir(spark: SparkSession, srcDir: String,
      lakeDir: String, statsCols: Seq[String] = Nil): (Long, Int, Long) = {
    val src = Paths.get(srcDir)
    require(Files.isDirectory(src), s"no parquet directory at $srcDir")
    val parts = listDir(src).filter(p =>
      Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
    require(parts.nonEmpty, s"$srcDir holds no .parquet files")
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m = readManifest(lakeDir)
      require(m.colmap.isEmpty,
        s"lake at $lakeDir has an active column mapping — imported " +
          "files carry logical column names and cannot join a " +
          "physical-id table without a rewrite")
      if (m.segs.nonEmpty || m.schemaJson.isDefined) {
        val cur = tableSchema(spark, lakeDir, m).fieldNames.toSeq
        val imp = spark.read.parquet(srcDir).schema.fieldNames.toSeq
        require(imp == cur,
          s"imported schema (${imp.mkString(", ")}) does not match " +
            s"table schema (${cur.mkString(", ")}) at $lakeDir")
      }
      val nonce = java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
      val seg = s"seg_imp_$nonce"
      val to = Paths.get(lakeDir, seg)
      Files.createDirectories(to)
      parts.foreach(p =>
        Files.createLink(to.resolve(p.getFileName.toString), p))
      val rows = segmentFooterRows(lakeDir, seg)
      val stats =
        if (statsCols.isEmpty) Map.empty[String, Map[String, ColStat]]
        else Map(seg -> segmentStats(
          spark.read.parquet(s"$lakeDir/$seg"), statsCols))
      writeSegmentBlooms(spark, lakeDir, seg, m.bloomCols)
      if (commitNext(lakeDir, m, m.copy(version = m.version + 1,
          segs = m.segs :+ seg, stats = m.stats ++ stats,
          cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)))
        return (m.version + 1, parts.size, rows)
      // lost the CAS — drop the staged links and re-plan
      org.apache.commons.io.FileUtils.deleteQuietly(to.toFile)
    }
    sys.error(s"import at $lakeDir: $dmlMaxAttempts consecutive CAS " +
      "losses (concurrent writers) — coordinate the writers or retry")
  }

  /** Load-history identity of one landing-zone file: a short hash of
    * its ABSOLUTE normalized path. Path-keyed like Delta's COPY INTO
    * ledger: re-dropping a file under the same name is a skip (the
    * idempotency contract retries depend on), the same bytes landing
    * under a new name load again. */
  private def copyId(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(p.toAbsolutePath.normalize.toString.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }

  /** COPY INTO — IDEMPOTENT incremental file ingestion, Delta's
    * landing-zone verb (and [[importParquetDir]]'s missing half: the
    * import loads everything every call; re-running it duplicates).
    * Each `.parquet` file under `srcDir` is identified by [[copyId]]
    * and checked against the manifest's cumulative `copied` ledger:
    * already-loaded files SKIP, new files HARD-LINK into one fresh
    * segment each (zero data bytes moved, stats optionally computed —
    * the import contract) and ONE manifest CAS publishes them all,
    * appending their identities to the ledger in the same commit. A
    * run that finds nothing new COMMITS NOTHING.
    *
    * The contract this buys at 100 TB: an hourly pipeline re-running
    * `COPY INTO` over a landing prefix after ANY failure — crashed
    * loader, lost CAS, orchestrator retry — loads each dropped file
    * exactly once, paying O(new files) per run, never O(prefix). The
    * ledger is append-only and independent of segment liveness:
    * retention DML that drops a loaded segment does NOT make a re-run
    * resurrect the deleted rows, and RESTORE keeps the tip ledger
    * (undoing data never forgets what was ingested). OPTIMIZE /
    * purge / clone / `REPLACE TABLE … AS` all carry it — like the
    * `txn` guards, an idempotence ledger survives redefinition (a
    * re-run loader must stay a no-op on the replaced table too).
    * A file REWRITTEN IN PLACE under its old name
    * is skipped by design — landing zones are immutable-drop
    * conventions, and silently double-ingesting a mutated file is
    * the worse failure; drop corrections under new names.
    *
    * Same adoption rules as import: footer schema must match the
    * table schema name-for-name; lakes with an active column mapping
    * refuse (foreign files carry logical names).
    *
    * Returns (committed version — the current tip when nothing
    * loaded —, files loaded, files skipped, rows loaded). */
  def copyInto(spark: SparkSession, srcDir: String, lakeDir: String,
      statsCols: Seq[String] = Nil,
      beforeCommit: () => Unit = () => ()): (Long, Int, Int, Long) = {
    val src = Paths.get(srcDir)
    require(Files.isDirectory(src), s"no parquet directory at $srcDir")
    val parts = listDir(src).filter(p =>
      Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
    require(parts.nonEmpty, s"$srcDir holds no .parquet files")
    val withIds = parts.map(p => p -> copyId(p))
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m = readManifest(lakeDir)
      require(m.colmap.isEmpty,
        s"lake at $lakeDir has an active column mapping — copied " +
          "files carry logical column names and cannot join a " +
          "physical-id table without a rewrite")
      val fresh = withIds.filterNot { case (_, id) => m.copied(id) }
      // nothing new → nothing to validate or commit: the no-op re-run
      // an orchestrator fires every tick costs manifest metadata only
      // (CopyLedgerProbe pins 0 Spark jobs, wall flat in ledger size)
      if (fresh.isEmpty)
        return (m.version, 0, parts.size, 0L)
      if (m.segs.nonEmpty || m.schemaJson.isDefined) {
        val cur = tableSchema(spark, lakeDir, m).fieldNames.toSeq
        val imp = spark.read.parquet(srcDir).schema.fieldNames.toSeq
        require(imp == cur,
          s"copied schema (${imp.mkString(", ")}) does not match " +
            s"table schema (${cur.mkString(", ")}) at $lakeDir")
      }
      // one single-file segment per source file, named by identity —
      // deterministic, so a crashed prior attempt's orphan dir is
      // safely re-staged, and CAS-loss retries re-link the same names.
      // Re-staging must distinguish a stale ORPHAN (crashed attempt —
      // delete and re-link) from a segment a CONCURRENT copier
      // committed since `m` was read (r16): that one is LIVE data
      // whose id the CAS retry will find in the ledger — unlinking it
      // even briefly breaks readers, and is the first half of the
      // hung-loader + orchestrator-retry data-loss scenario. Re-read
      // the tip right before touching disk and skip ids it has
      // loaded; the commit below still CASes against `m`, so a raced
      // tip just means one wasted staging pass, never a wrong commit.
      val tip = readManifest(lakeDir)
      val tipLive = tip.segs.toSet
      val staged = fresh.filterNot { case (_, id) =>
        tip.copied(id) || tipLive(s"seg_cp_$id")
      }.map { case (p, id) =>
        val seg = s"seg_cp_$id"
        val to = Paths.get(lakeDir, seg)
        val dst = to.resolve(p.getFileName.toString)
        // NON-DESTRUCTIVE re-stage (r16 review catch): every stager of
        // this id produces the identical dir (one hard link to the
        // same source inode), so a dir that ALREADY has exactly that
        // content is reusable as-is — whether it came from our own
        // crashed attempt or a concurrent copier that commits between
        // the tip read above and now. Deleting-then-relinking here
        // left a window where a crash stranded a committed manifest
        // pointing at a missing dir; only a dir with WRONG content (a
        // partial orphan, never committable) is torn down.
        val reusable = Files.isDirectory(to) && Files.exists(dst) &&
          Files.isSameFile(dst, p) && listDir(to).size == 1
        if (!reusable) {
          org.apache.commons.io.FileUtils.deleteQuietly(to.toFile)
          Files.createDirectories(to)
          Files.createLink(dst, p)
        }
        (seg, id)
      }
      if (staged.nonEmpty) {
        val rows = staged.map { case (seg, _) =>
          segmentFooterRows(lakeDir, seg) }.sum
        val stats =
          if (statsCols.isEmpty) Map.empty[String, Map[String, ColStat]]
          else staged.map { case (seg, _) =>
            seg -> segmentStats(
              spark.read.parquet(s"$lakeDir/$seg"), statsCols)
          }.toMap
        staged.foreach { case (seg, _) =>
          writeSegmentBlooms(spark, lakeDir, seg, m.bloomCols) }
        beforeCommit()
        if (commitNext(lakeDir, m, m.copy(version = m.version + 1,
            segs = m.segs ++ staged.map(_._1), stats = m.stats ++ stats,
            copied = m.copied ++ staged.map(_._2),
            cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)))
          return (m.version + 1, staged.size,
            parts.size - staged.size, rows)
        // Lost the CAS — the winner may have COMMITTED some of these
        // very ids (hung loader + orchestrator retry over one landing
        // prefix): deleting a dir the new tip references would
        // permanently break the table — the id is in the ledger, so
        // no retry ever re-stages it, and the manifest points at
        // missing files. Delete ONLY dirs the re-read tip references
        // by neither ledger nor live segment set (r16; same rule as
        // replaceTableAs: ours-but-unreferenced files are vacuum
        // orphans at worst).
        val now = readManifest(lakeDir)
        val nowLive = now.segs.toSet
        staged.foreach { case (seg, id) =>
          if (!now.copied(id) && !nowLive(seg))
            org.apache.commons.io.FileUtils.deleteQuietly(
              Paths.get(lakeDir, seg).toFile) }
      }
      // staged.isEmpty: every fresh file was loaded by a concurrent
      // copier after `m` was read — loop; the re-read ledger will
      // classify them as skips
    }
    sys.error(s"COPY INTO at $lakeDir: $dmlMaxAttempts consecutive CAS " +
      "losses (concurrent writers) — coordinate the writers or retry")
  }

  /** DESCRIBE DETAIL: one-row table-level summary — current version,
    * live segment/file/byte counts, exact LIVE row count (parquet
    * footer record counts minus deletion-vector debt — footers are
    * driver-side metadata reads, no Spark job), merge-on-read debt,
    * schema generation and partition spec. The operator dashboard
    * surface Delta ships; the row count answers `count(*)` from
    * metadata alone. Cost model at scale: O(live segments) driver
    * metadata reads, zero data IO — and on a manifest with partition
    * facts or stats the segment row counts are already resident. */
  def tableDetail(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val m = readManifest(outDir)
    requireTable(m, outDir)
    var files = 0L
    var bytes = 0L
    m.segs.foreach { s =>
      listDir(Paths.get(outDir, s)).foreach { p =>
        if (Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet")) {
          files += 1
          bytes += Files.size(p)
        }
      }
    }
    val rawRows = m.segs.map(s =>
      m.segRows.getOrElse(s, segmentFooterRows(outDir, s))).sum
    val dvRows = m.segs.flatMap(m.dv.get).map(_.rows).sum
    // DV DEBT FRACTION in parts-per-million (r15) — the number a
    // 100 TB operator reads to decide when `REORG … APPLY (PURGE)`
    // pays off; integer ppm keeps the column oracle-exact.
    val debtPpm = if (rawRows == 0L) 0L else dvRows * 1000000L / rawRows
    Seq((m.version, m.segs.size.toLong, files, rawRows - dvRows, bytes,
      m.dv.size.toLong, dvRows, debtPpm, m.copied.size.toLong,
      m.schemaV,
      m.partSpec.map(_.split(",").map(p =>
        m.logicalOf(p).getOrElse(p)).mkString(",")).orNull))
      .toDF("version", "num_segments", "num_files", "num_rows",
        "size_bytes", "num_dv_segments", "dv_rows", "dv_debt_ppm",
        // COPY INTO load-ledger size (r15): how many landing files
        // this table has ever ingested — the at-a-glance check that a
        // re-run pipeline is actually deduplicating
        "num_copied_files",
        "schema_generation", "partition_col")
  }

  /** SHOW PARTITIONS: the table's partition layout from the manifest
    * alone — one row per (column, value) with its live segment count
    * and recorded rows (DV debt subtracted), ordered for determinism.
    * Zero data IO at any scale; segments without a recorded fact are
    * summarized in a trailing `(unpartitioned)` row so operators see
    * what retention can and cannot drop by metadata. */
  def showPartitions(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val m = readManifest(outDir)
    // one row per (column, value) — a composite-partitioned segment
    // (r15) contributes a row to EVERY dimension it records
    val grouped = m.segs
      .flatMap(s => m.parts.get(s).toSeq.flatMap(pv =>
        pv.facts.map { case (c, v) => ((c, v), s) }))
      .groupBy(_._1)
      .toSeq
      .map { case ((c, v), xs) =>
        val segs = xs.map(_._2)
        val rows = segs.map(s => m.parts(s).rows).sum -
          segs.flatMap(m.dv.get).map(_.rows).sum
        (c, v.orNull, segs.size.toLong, rows)
      }
      .sortBy { case (c, v, _, _) => (c, String.valueOf(v)) }
    val bare = m.segs.filterNot(m.parts.contains)
    val all = grouped ++
      (if (bare.isEmpty) Nil
       else Seq(("(unpartitioned)", null: String, bare.size.toLong, -1L)))
    all.toDF("column", "value", "n_segments", "n_rows")
  }

  /** DESCRIBE HISTORY: the retained manifest log as a DataFrame —
    * one row per committed version still inside the vacuum retention
    * horizon, with the version's segment count, schema generation,
    * and what the commit DID relative to its predecessor (appended /
    * rewrote / dropped segment counts — derived by diffing adjacent
    * retained manifests, metadata only, zero data IO). The audit
    * surface every lake format ships; at 100 TB it reads a handful
    * of manifest files, never the data. */
  def history(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    val versions = manifestVersions(outDir)
    // Incremental reconstruction along the retained (contiguous) log:
    // the first version via walk-back, each later one by applying its
    // own record — O(log) total, not O(versions · walk-back).
    val manifests = versions.headOption.fold(Seq.empty[Manifest]) { v0 =>
      versions.tail.scanLeft(manifestAt(outDir, v0)) { (acc, v) =>
        parseVersionFile(outDir, v) match {
          case Right(m) => m
          case Left(d) => applyDelta(acc, d)
        }
      }
    }
    val tip = versions.lastOption.getOrElse(0L)
    val rows = manifests.zipWithIndex.map { case (m, i) =>
      val prevSegs: Set[String] =
        if (i == 0) Set.empty else manifests(i - 1).segs.toSet
      val added = m.segs.count(!prevSegs(_))
      val removed = (prevSegs -- m.segs).size
      // DV DEBT observability (r15): per-version deletion-vector
      // census — how many segments carry merge-on-read debt and how
      // many rows it hides — so a 100 TB operator reads WHEN the debt
      // accumulated and when a REORG PURGE / OPTIMIZE paid it off,
      // from the same metadata walk (zero data IO).
      (m.version, m.segs.size.toLong, m.schemaV,
        m.expects.size.toLong, added.toLong, removed.toLong,
        m.dv.size.toLong, m.dv.values.map(_.rows).sum,
        m.version == tip)
    }
    rows.toDF("version", "n_segments", "schema_v", "n_expectations",
      "segs_added", "segs_removed", "n_dv_segments", "dv_rows",
      "is_current")
  }

  /** INCREMENTAL READ (change feed): the rows ADDED between committed
    * versions `fromV` (exclusive; 0 = the beginning) and `toV`
    * (inclusive), resolved as the segments `toV` lists that `fromV`
    * did not — a pure manifest diff, zero data IO to plan, which is
    * how a downstream consumer tails a 100 TB lake without ever
    * re-reading it. Valid over APPEND-ONLY version windows: if any
    * `fromV` segment was rewritten or dropped inside the window
    * (copy-on-write DML, compaction), a segment diff can no longer
    * represent the delta as pure appends, and the method refuses
    * rather than emit rewritten copies of old rows as "changes" —
    * the same contract under which Delta's change feed requires CDC
    * files once DML enters the log. The caller then falls back to a
    * snapshot diff of [[readTableAsOf]] at the two versions. Both
    * manifests must still be within the [[vacuum]] retention horizon.
    * Reads under `toV`'s schema. */
  def changesBetween(spark: SparkSession, outDir: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV >= 0L && fromV <= toV,
      s"bad change-feed window v$fromV..v$toV")
    val md = manifestDir(outDir)
    Seq(fromV, toV).filter(_ > 0L).foreach { v =>
      require(Files.exists(md.resolve(f"v$v%010d.txt")),
        s"lake at $outDir has no manifest v$v (vacuumed or never committed)")
    }
    val mf = manifestAt(outDir, fromV)
    // Append-only means EVERY step in the window only adds segments —
    // checking the endpoints alone would miss a segment added and then
    // rewritten inside the window (its rewritten copy would be emitted
    // as if it were new rows). The walk reads only manifest files
    // (metadata, no data IO) and reconstructs incrementally — one
    // record applied per step, never a per-version walk-back; vacuum
    // retains a contiguous suffix of versions, so if any intermediate
    // is within retention they all are, and the existence check above
    // already gated the endpoints.
    var prev = mf
    (fromV + 1 to toV).foreach { v =>
      require(Files.exists(md.resolve(f"v$v%010d.txt")),
        s"manifest v$v inside window v$fromV..v$toV was vacuumed — " +
          "the change feed horizon is the vacuum retention horizon")
      val cur = parseVersionFile(outDir, v) match {
        case Right(m) => m
        case Left(d) => applyDelta(prev, d)
      }
      val removed = prev.segs.toSet -- cur.segs
      require(removed.isEmpty,
        s"version window v$fromV..v$toV is not append-only (v$v " +
          s"rewrote or dropped ${removed.toSeq.sorted.mkString(", ")} " +
          "via DML/compaction) — diff snapshots via readTableAsOf")
      // a deletion vector hides rows WITHOUT removing a segment — just
      // as much a non-append as a rewrite, and just as refused here
      val dvChanged = cur.dv.filter { case (s, r) =>
        !prev.dv.get(s).contains(r) }
      require(dvChanged.isEmpty,
        s"version window v$fromV..v$toV is not append-only (v$v added " +
          s"deletion vectors on ${dvChanged.keys.toSeq.sorted.mkString(", ")}" +
          ") — diff snapshots via readTableAsOf")
      prev = cur
    }
    val mt = prev
    // window verified append-only ⇒ the added segments carry no DVs
    // at toV; readSegments handles the empty case with mt's schema
    readSegments(spark, outDir, mt, mt.segs.filterNot(mf.segs.toSet))
  }

  /** CHANGE DATA FEED read (Delta CDF / `table_changes` analog): every
    * row-level change between committed versions `fromV` (exclusive)
    * and `toV` (inclusive), as the table's columns plus
    * `_change_type` ('insert' | 'delete' | 'update_preimage' |
    * 'update_postimage') and `_commit_version`. Where
    * [[changesBetween]] REFUSES a window containing copy-on-write DML
    * (a segment diff cannot represent a rewrite as appends), this
    * walk consumes the CHANGE-DATA SEGMENTS the DML recorded in its
    * commit (`cdc=` manifest lines, written by
    * deleteWhere/updateWhere/mergeInto with `cdc = true`):
    *
    *  - a version with cdc segments emits exactly those rows;
    *  - a plain append emits its added segments as 'insert';
    *  - a `dataChange = false` commit (compaction) emits NOTHING —
    *    layout moved, rows did not;
    *  - a DML committed WITHOUT change data still refuses, loudly —
    *    emitting its rewritten segments as changes would be wrong.
    *
    * Planning is pure manifest metadata (no data IO); the data read
    * is bounded by the rows that actually changed — the property that
    * lets a downstream keep a 100 TB table's derived views fresh
    * without ever re-diffing it. The feed horizon is the [[vacuum]]
    * retention horizon, like time travel. */
  def changesCdcBetween(spark: SparkSession, outDir: String,
      fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromV >= 0L && fromV <= toV,
      s"bad CDC window v$fromV..v$toV")
    val md = manifestDir(outDir)
    Seq(fromV, toV).filter(_ > 0L).foreach { v =>
      require(Files.exists(md.resolve(f"v$v%010d.txt")),
        s"lake at $outDir has no manifest v$v (vacuumed or never committed)")
    }
    var prev = manifestAt(outDir, fromV)
    val parts = Seq.newBuilder[DataFrame]
    (fromV + 1 to toV).foreach { v =>
      require(Files.exists(md.resolve(f"v$v%010d.txt")),
        s"manifest v$v inside CDC window v$fromV..v$toV was vacuumed — " +
          "the change feed horizon is the vacuum retention horizon")
      val cur = parseVersionFile(outDir, v) match {
        case Right(mm) => mm
        case Left(d) => applyDelta(prev, d)
      }
      val prevSet = prev.segs.toSet
      val dropSet = cur.cdcDropSegs.toSet
      // partition-covered metadata drops: the DROPPED segment's own
      // files ARE the change data — every live row became a delete
      // (the drop path guarantees no deletion vector was attached, so
      // the raw read is exactly the dead live-set). Read under the
      // PRE-drop manifest: the segment was live there.
      if (cur.cdcDropSegs.nonEmpty)
        parts += reader(spark, outDir, prev)
          .parquet(cur.cdcDropSegs.map(s => s"$outDir/$s"): _*)
          .withColumn("_change_type", lit("delete"))
          .withColumn("_commit_version", lit(v))
      val removed = prevSet -- cur.segs -- dropSet
      val addedSegs = cur.segs.filterNot(prevSet)
      // deletion vectors hide rows without touching the segment list —
      // a DV-writing commit is row-level change and needs change data
      val dvChanged = cur.dv.exists { case (s, r) =>
        !prev.dv.get(s).contains(r) }
      if (cur.cdcSegs.nonEmpty) {
        parts += spark.read
          .parquet(cur.cdcSegs.map(s => s"$outDir/$s"): _*)
          .withColumn("_commit_version", lit(v))
      } else if (!cur.dataChange) {
        // compaction / layout-only: bytes moved, rows did not
      } else if (removed.isEmpty && !dvChanged) {
        if (addedSegs.nonEmpty)
          parts += reader(spark, outDir, cur)
            .parquet(addedSegs.map(s => s"$outDir/$s"): _*)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(v))
      } else {
        sys.error(s"version v$v of $outDir rewrote, dropped, or " +
          "deletion-vectored " +
          s"${(removed ++ cur.dv.keySet.filter(s => !prev.dv.get(s)
            .contains(cur.dv(s)))).toSeq.sorted.mkString(", ")} " +
          "without recording change data (DML ran with cdc = false) — " +
          "the CDC feed cannot represent it; re-run DML with cdc = true " +
          "or diff snapshots via readTableAsOf")
      }
      prev = cur
    }
    val ps = parts.result()
    if (ps.isEmpty) {
      val base = tableSchema(spark, outDir, prev)
        .add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.LongType)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], base)
    }
    else {
      import org.apache.spark.sql.functions.col
      // allowMissingColumns: a window straddling a schema evolution has
      // pre-evolution change rows without the added columns — they
      // surface as NULL, the same rule the table reader applies
      val unioned = ps.reduce(_.unionByName(_, allowMissingColumns = true))
      // STABLE column order regardless of which part came first (cdc
      // segments carry _change_type before _commit_version is appended;
      // insert parts append both): every caller — the TVF, the
      // streaming source, a bare API read — gets table columns in
      // schema order, then the two feed columns. A window entirely
      // before a trailing ADD COLUMN has no rows for the new column:
      // surface it as typed NULL, as the table reader would.
      val have = unioned.columns.toSet
      // Under an active column mapping every part carries PHYSICAL
      // names (cdc files and segments alike — physical ids are STABLE
      // across renames, so a pre-rename cdc file and a post-rename one
      // hold the SAME physical column); select them back to the feed
      // window's end-of-window LOGICAL names, exactly the table
      // reader's rule.
      val ordered = tableSchema(spark, outDir, prev).fields.toSeq.map { f =>
        val ph = prev.physicalOf(f.name)
        if (have(ph)) col(ph).as(f.name)
        else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      } ++ Seq(col("_change_type"), col("_commit_version"))
      unioned.select(ordered: _*)
    }
  }

  /** VACUUM: delete segment dirs no retained manifest references, and
    * manifest versions older than the newest `retainVersions`. Orphans
    * arise from compaction inputs whose best-effort cleanup was
    * skipped by a crash, and from crash-replayed batches — both
    * invisible to readers but paying storage forever. Retention is the
    * time-travel horizon: after `vacuum(retainVersions = k)`, every
    * one of the newest k versions still reads correctly (asserted in
    * StreamingSpec); older versions are gone by contract — exactly
    * Delta/Iceberg VACUUM semantics. Never run with a concurrent
    * writer racing the manifest (same rule as any lake vacuum).
    * Returns (segments deleted, manifest versions deleted). */
  def vacuum(outDir: String, retainVersions: Int = 2): (Int, Int) = {
    require(retainVersions >= 1, "must retain at least the live version")
    val md = manifestDir(outDir)
    val versions = manifestVersions(outDir)
    if (versions.isEmpty) return (0, 0)
    val retained = versions.takeRight(retainVersions)
    // The log is differential: a retained DELTA version reconstructs
    // through files below the retention boundary. Before deleting
    // them, MATERIALIZE the boundary state as a `.snap` checkpoint
    // (idempotent, deterministic bytes, written outside the CAS —
    // Delta's checkpoint move), so every retained version keeps
    // reconstructing from files that survive the vacuum.
    val oldestRetained = retained.head
    if (parseVersionFile(outDir, oldestRetained).isLeft) {
      val b = manifestAt(outDir, oldestRetained)
      Files.write(snapPath(outDir, oldestRetained),
        snapshotLines(b.maxB, b.segs, b.schemaV, b.schemaJson, b.stats,
          b.txns, b.expects, b.cdcSegs, b.dataChange, b.dv, b.colmap,
          b.partSpec, b.parts, b.cdcDropSegs, b.bloomCols, b.copied,
          // checkpoints carry the chain's declared minimums (r16):
          // reconstruction resets at a .snap, so dropping them here
          // would downgrade every later version's gate
          b.minReader, b.minWriter, b.segRows)
          .mkString("\n").getBytes("UTF-8"))
    }
    // Live segments = union over the retained versions, reconstructed
    // incrementally along the contiguous suffix (the boundary .snap
    // makes the first reconstruction one file read). A retained
    // version's CHANGE-DATA segments stay live with it — the CDC feed
    // horizon is the vacuum retention horizon, same as time travel.
    // Deletion-vector files referenced by any retained version stay
    // too (time travel reconciles each version under ITS DVs);
    // superseded/unreferenced DV files are GC'd like segment orphans.
    val live = scala.collection.mutable.Set.empty[String]
    val liveDv = scala.collection.mutable.Set.empty[String]
    var acc = manifestAt(outDir, oldestRetained)
    live ++= acc.segs
    live ++= acc.cdcSegs
    // a retained partition-drop version reads the DROPPED segment's
    // own files as its change data — they stay live with the version
    live ++= acc.cdcDropSegs
    liveDv ++= acc.dv.values.map(_.file)
    retained.tail.foreach { v =>
      acc = parseVersionFile(outDir, v) match {
        case Right(m) => m
        case Left(d) => applyDelta(acc, d)
      }
      live ++= acc.segs
      live ++= acc.cdcSegs
      live ++= acc.cdcDropSegs
      liveDv ++= acc.dv.values.map(_.file)
    }
    val segDirs = listDir(Paths.get(outDir))
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("seg_"))
    val dvRoot = Paths.get(outDir, "_dv")
    val dvOrphans =
      if (!Files.isDirectory(dvRoot)) Nil
      else listDir(dvRoot).filterNot(p => liveDv(p.getFileName.toString))
    // Bloom sidecars (`_blooms/<seg>.<col>.bloom`) live and die with
    // their segment — advisory files at deterministic paths, so the
    // GC rule is pure name prefixing, no manifest references to walk.
    val bloomRoot = Paths.get(outDir, "_blooms")
    val bloomOrphans =
      if (!Files.isDirectory(bloomRoot)) Nil
      else listDir(bloomRoot).filterNot { p =>
        live(p.getFileName.toString.takeWhile(_ != '.')) }
    val orphans = segDirs.filterNot(p => live(p.getFileName.toString)) ++
      dvOrphans ++ bloomOrphans
    orphans.foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
    val stale = versions.dropRight(retainVersions)
    stale.foreach { v =>
      Files.deleteIfExists(md.resolve(f"v$v%010d.txt"))
      Files.deleteIfExists(snapPath(outDir, v))
    }
    (orphans.size, stale.size)
  }

  /** Row-level DELETE, copy-on-write — the verb that completes the
    * lake protocol (ingest / compact / time-travel / vacuum / delete;
    * Delta's DELETE works the same way). Per live segment: rows
    * matching `cond` present? If none, the segment survives untouched
    * — deletes touching one day of a year-partitioned lake rewrite
    * one day, the write amplification bound that matters at 100 TB
    * (at warehouse scale the touched-set is planned from footer
    * min/max stats instead of a residual count scan). A fully-matching
    * segment is dropped from the manifest without any write. A
    * partially-matching one is rewritten WITHOUT the matching rows
    * into a fresh `seg_d<version>_<n>` dir. Nothing is visible until
    * the single manifest CAS at the end — a crash mid-delete leaves
    * readers on the old version with some invisible orphan dirs for
    * [[vacuum]]; the old version keeps time-traveling to the
    * pre-delete rows until vacuumed (retention contract unchanged).
    *
    * NULL predicates follow SQL DELETE: only rows where `cond`
    * evaluates TRUE are removed; FALSE and NULL rows are both
    * retained (mirroring updateWhere's `when(cond, …).otherwise`).
    * `cond` must be deterministic — each touched segment is cached for
    * the duration of its count + rewrite so the predicate is evaluated
    * against one materialization, but a non-deterministic predicate
    * would still make replays/retries diverge from the returned
    * counts (the same contract every lake DML engine states).
    *
    * `pruneHint = Some((column, lo, hi))` asserts that every
    * predicate-TRUE row has `column` ∈ [lo, hi] (the partition-
    * predicate / residual split every warehouse DML planner performs):
    * segments whose manifest stats are disjoint from the hint range
    * then survive by reference WITHOUT ANY SPARK JOB — the touched-set
    * is planned from the manifest, which is what the scaladoc above
    * means by "planned from footer min/max stats" and what bounds a
    * one-day delete on a 100 TB lake to one day of IO. The hint is a
    * caller contract, not checked; a hint wider than the predicate is
    * always safe, a narrower one loses rows.
    *
    * `dvMaxFraction > 0` enables MERGE-ON-READ for partially-matching
    * segments: when matched rows ≤ fraction × live rows, the delete
    * writes a per-segment DELETION VECTOR (the matched positions,
    * O(deleted rows)) instead of rewriting the segment — Delta's
    * deletion-vector design, the 100 TB answer to point-DML write
    * amplification. Readers reconcile DVs at scan (broadcast
    * anti-join on file-name + row-index), [[compact]] applies them
    * physically, [[vacuum]] GCs superseded DV files, and the change
    * feed/CDC contracts treat a DV commit exactly like a rewrite.
    * Fully-matching segments still drop by metadata; 0.0 (default)
    * keeps pure copy-on-write.
    *
    * Returns (committed version, segments rewritten, segments dropped,
    * rows deleted); a no-match delete commits nothing and returns the
    * current version. A DV-mode delete reports the affected segments
    * as neither rewritten nor dropped (they survive, minus rows) —
    * the manifest's `dv` entries are the receipt.
    *
    * CONCURRENCY: a lost manifest race triggers the optimistic retry
    * protocol ([[tryCommitEdit]]) — commit as-staged when concurrent
    * commits only appended (this delete serializes before them), full
    * re-plan against the new tip when a segment this delete read was
    * itself rewritten (true conflict); abort only after
    * [[dmlMaxAttempts]] straight losses. Never a lost update: every
    * commit lands via the CAS against a tip whose segments the staged
    * edit provably read-or-commutes-with. */
  /** One planning attempt's staged DELETE edit — everything a caller
    * needs to commit it (or combine it with its own additions in the
    * SAME commit, the [[replaceWhere]] move). Staged segment/DV/cdc
    * files referenced here are invisible until a manifest CAS lists
    * them; a lost CAS turns them into [[vacuum]] orphans. */
  private final case class DeleteEdit(
      removed: Set[String], added: Seq[String],
      addedStats: Map[String, Map[String, ColStat]],
      addedParts: Map[String, PartVal],
      dvSets: Map[String, DvRef],
      cdcSeg: String, cdcRows: Boolean, cdcDrops: Seq[String],
      rewritten: Int, dropped: Int, deleted: Long, dvWrites: Int,
      // r17: per-added-segment row counts the census already knows —
      // the commit gate records them with zero footer reads
      addedRows: Map[String, Long] = Map.empty) {
    def isNoop: Boolean = rewritten == 0 && dropped == 0 && dvWrites == 0
  }

  def deleteWhere(spark: SparkSession, outDir: String,
      cond: org.apache.spark.sql.Column,
      pruneHint: Option[(String, Long, Long)] = None,
      beforeCommit: () => Unit = () => (),
      cdc: Boolean = false,
      dvMaxFraction: Double = 0.0)
      : (Long, Int, Int, Long) = {
    require(dvMaxFraction >= 0.0 && dvMaxFraction <= 1.0,
      s"dvMaxFraction must be in [0,1], got $dvMaxFraction")
    // `beforeCommit` is the race-injection seam (the
    // beforeMaintenanceCommit pattern): it runs after each attempt's
    // planning/rewrites and before its commit — the exact window a
    // concurrent writer's commit forces the optimistic retry protocol.
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m = readManifest(outDir)
      require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
      val nonce = java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
      val e = planDeleteEdits(spark, outDir, m, Some(cond), pruneHint,
        cdc, dvMaxFraction, nonce)
      if (e.isNoop) return (m.version, 0, 0, 0L)
      beforeCommit()
      tryCommitEdit(outDir, m, e.removed, e.added, e.addedStats, None,
        cdcSegs = if (e.cdcRows) Seq(e.cdcSeg) else Nil,
        dvSets = e.dvSets,
        addedParts = e.addedParts,
        cdcDropSegs = e.cdcDrops,
        addedRows = e.addedRows) match {
        case Some(v) => return (v, e.rewritten, e.dropped, e.deleted)
        case None => // true conflict — re-plan against the new tip
      }
    }
    sys.error(s"delete at $outDir: $dmlMaxAttempts consecutive true " +
      "conflicts (concurrent writers rewriting the same segments) — " +
      "coordinate the writers or retry later")
  }

  /** Plan ONE attempt's delete edit against manifest `m` — the whole
    * metadata-first decision ladder [[deleteWhere]] documents
    * (partition facts → stats-proven full match → stats pruning →
    * scan, with DV and CDC variants), extracted so [[replaceWhere]]
    * can stage the same edit and commit it TOGETHER with its append.
    * `condOpt = None` means the WHOLE TABLE (INSERT OVERWRITE): every
    * segment drops by metadata with rows counted from parquet footers
    * minus DV debt — zero data jobs; under cdc a DV-carrying segment
    * reads its LIVE rows as explicit delete images (dead rows must not
    * re-enter the feed), plain segments ride the `cdcdrop=` path. */
  private def planDeleteEdits(spark: SparkSession, outDir: String,
      m: Manifest, condOpt: Option[org.apache.spark.sql.Column],
      pruneHint: Option[(String, Long, Long)],
      cdc: Boolean, dvMaxFraction: Double,
      nonce: String): DeleteEdit = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, when}
    val cdcSeg = s"seg_cdc_d$nonce"
    condOpt match {
      case None =>
        var dropped = 0
        var deleted = 0L
        var cdcRows = false
        val removed = Set.newBuilder[String]
        val cdcDrops = Seq.newBuilder[String]
        m.segs.foreach { seg =>
          // manifest-carried count first (r18) — the footer walk is
          // the foreign-writer fallback, not the steady-state path
          val live = m.segRows.getOrElse(seg,
            segmentFooterRows(outDir, seg)) -
            m.dv.get(seg).map(_.rows).getOrElse(0L)
          if (cdc && m.dv.contains(seg)) {
            physicalize(readSegments(spark, outDir, m, Seq(seg))
              .withColumn("_change_type", lit("delete")), m)
              .write.mode("append").parquet(s"$outDir/$cdcSeg")
            cdcRows = true
          } else if (cdc) cdcDrops += seg
          dropped += 1
          removed += seg
          deleted += live
        }
        return DeleteEdit(removed.result(), Nil, Map.empty, Map.empty,
          Map.empty, cdcSeg, cdcRows, cdcDrops.result(),
          0, dropped, deleted, 0)
      case Some(_) =>
    }
    val cond: org.apache.spark.sql.Column = condOpt.get
    locally {
      val tracked = m.trackedCols
      // No explicit hint? Derive ALL safe hints from the predicate's
      // own conjuncts over the tracked columns (numeric + string +
      // IS NULL) — SQL DML gets file skipping for free.
      // Inference runs in LOGICAL space (the predicate and the table
      // schema speak logical); the resulting hints re-key to the
      // PHYSICAL names manifest stats live under.
      val trackedLogical =
        if (m.colmap.isEmpty) tracked else tracked.flatMap(m.logicalOf(_))
      // one schema fetch per attempt (a recorded-schema lake parses it
      // from the manifest — zero jobs; a schema-less lake pays ONE
      // footer read, not one per use)
      lazy val schemaOnce = tableSchema(spark, outDir, m)
      val bloomLogical = m.bloomCols.flatMap(m.logicalOf(_))
      val hints: Seq[PruneHint] =
        (pruneHint.map { case (c, lo, hi) => NumRange(c, lo, hi) } match {
          case Some(h) => Seq(h)
          case None =>
            if (trackedLogical.isEmpty && bloomLogical.isEmpty) Nil
            else inferPruneHints(spark, schemaOnce, cond, trackedLogical,
              bloomLogical)
        }).map(hintPhysical(_, m))
      // Written-segment names carry the caller's per-attempt NONCE:
      // two racing writers both staging rewrites for version v+1 must
      // never share a dir — the CAS loser's in-flight write would
      // silently replace the winner's committed data (the one
      // corruption the manifest protocol alone cannot see). A stale
      // attempt's dirs become vacuum orphans.
      var rewritten = 0
      var dropped = 0
      var deleted = 0L
      val removed = Set.newBuilder[String]
      val added = Seq.newBuilder[String]
      val addedStats = Map.newBuilder[String, Map[String, ColStat]]
      val addedParts = Map.newBuilder[String, PartVal]
      val addedRows = Map.newBuilder[String, Long]
      // CHANGE DATA FEED: the deleted rows, written once alongside the
      // rewrite (Delta's _change_data move) into one per-DML cdc
      // segment the commit records — the only extra IO is the changed
      // rows themselves, and [[changesCdcBetween]] never has to diff
      // snapshots. Orphaned on a lost CAS like any staged rewrite.
      var cdcRows = false
      val dvSets = Map.newBuilder[String, DvRef]
      var dvWrites = 0
      // PARTITION-COVERED planning (zero data jobs): each segment with
      // recorded partition facts is decided on the manifest alone
      // when the predicate references only its fact columns — since
      // r15 a segment may carry a COMPOSITE fact tuple ((day ×
      // tenant)-style), so `DELETE WHERE day < cutoff AND tenant = x`
      // is metadata-only too. One compiled decider per distinct
      // recorded column SET (mixed sets = partition evolution; each
      // segment decides under ITS OWN).
      val deciders = scala.collection.mutable.Map
        .empty[Seq[String], Option[Map[String, Option[String]] => Boolean]]
      def deciderFor(cs: Seq[String])
          : Option[Map[String, Option[String]] => Boolean] =
        deciders.getOrElseUpdate(cs, partitionDecider(spark,
          schemaOnce, cond, m, cs))
      // STATS-PROVEN full match (the partition decider's stats twin):
      // when every top-level conjunct is provable from a segment's
      // recorded min/max/null stats, the whole segment drops by
      // metadata — retention on a stats-tracked time-ordered layout
      // (streaming ingest with statsCols) without any partition spec.
      val fullChecks: Option[Seq[Map[String, ColStat] => Boolean]] =
        if (m.stats.isEmpty) None
        else inferFullMatchChecks(spark, schemaOnce, cond, m)
      val cdcDrops = Seq.newBuilder[String]
      var cdcDropped = false
      // Metadata ladder per segment, DRIVER-side (zero jobs):
      // partition-covered decisions, stats-proven full matches, and
      // hint pruning classify every segment; only the surviving scan
      // class enters the ONE batched planning job below.
      val scanSegs = Seq.newBuilder[(String, Int)]
      m.segs.zipWithIndex.foreach { case (seg, i) =>
        val pvOpt = m.parts.get(seg)
        val partDecision: Option[Boolean] =
          pvOpt.flatMap(pv => deciderFor(pv.facts.map(_._1))
            .map(f => f(pv.facts.toMap)))
        val statsFull = partDecision.isEmpty && fullChecks.exists { cs =>
          val st = m.stats.getOrElse(seg, Map.empty[String, ColStat])
          st.nonEmpty && cs.forall(c => c(st))
        }
        if (partDecision.contains(false)) {
          // no row of this partition can match — skip, zero jobs
        } else if (statsFull && (m.dv.get(seg).isEmpty || !cdc)) {
          // every live row provably matches: metadata-only drop; rows
          // from the parquet footers (driver-side, no Spark job) minus
          // any deletion-vector debt. cdcdrop rule as below.
          dropped += 1
          removed += seg
          deleted += m.segRows.getOrElse(seg,
            segmentFooterRows(outDir, seg)) -
            m.dv.get(seg).map(_.rows).getOrElse(0L)
          if (cdc) { cdcDrops += seg; cdcDropped = true }
        } else if (partDecision.contains(true) &&
            (m.dv.get(seg).isEmpty || !cdc)) {
          // EVERY live row matches: metadata-only drop. Row count from
          // the manifest (minus any deletion-vector debt); with cdc on,
          // the commit records the dropped segment as its own change
          // data (`cdcdrop=`) — the feed reads the dead files as
          // deletes, so even the feed costs this DML zero IO. (A
          // DV-carrying segment under cdc falls through to the scan
          // path instead: its dead rows must not re-enter the feed.)
          dropped += 1
          removed += seg
          deleted += pvOpt.get.rows - m.dv.get(seg).map(_.rows).getOrElse(0L)
          if (cdc) { cdcDrops += seg; cdcDropped = true }
        } else if (!hints.exists(h => !mayMatchHint(m, outDir, seg, h)))
          scanSegs += ((seg, i))
      }
      val scan = scanSegs.result()
      if (scan.nonEmpty) {
        // BATCHED PLANNING (r15): the whole scan class counts in ONE
        // grouped-by-segment job over one DV-reconciling positional
        // read (counts and predicates see only LIVE rows; the matched
        // positions are exactly what a merge-on-read write records) —
        // before r15 this was one sequential Spark job per segment,
        // the r14 verdict's driver-side O(segments) ceiling. Write
        // passes re-scan with pushed filters instead of caching: a
        // constant number of full-parallelism scans beats caching an
        // unbounded multi-segment working set.
        val pos = readSegmentsWithPos(spark, outDir, m, scan.map(_._1))
        val perSeg = pos.groupBy(col("__dv_s"))
          .agg(count(lit(1)), count(when(cond, lit(1))))
          .collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        def countsOf(seg: String): (Long, Long) =
          perSeg.getOrElse(seg, (0L, 0L))
        val touched = scan.filter { case (seg, _) => countsOf(seg)._2 > 0L }
        if (touched.nonEmpty) {
          deleted += touched.map(t => countsOf(t._1)._2).sum
          // Write passes re-scope the path list to exactly the
          // segments they touch (`__dv_s` is a COMPUTED column —
          // filtering on it would not prune files): a 3-segment delete
          // on a 5000-segment scan set re-reads 3 segments, not 5000.
          def posOf(segs: Seq[(String, Int)]) =
            readSegmentsWithPos(spark, outDir, m, segs.map(_._1))
          if (cdc) {
            // CHANGE DATA FEED: all segments' deleted rows in ONE
            // write alongside the edit (Delta's _change_data move) —
            // the only extra IO is the changed rows themselves.
            physicalize(posOf(touched).filter(coalesce(cond, lit(false)))
              .drop("__dv_f", "__dv_i", "__dv_s")
              .withColumn("_change_type", lit("delete")), m)
              .write.mode("append").parquet(s"$outDir/$cdcSeg")
            cdcRows = true
          }
          // Classification from the counts (unchanged rules): a fully-
          // matching segment drops by metadata; a partial match within
          // the DV threshold writes a deletion vector; the rest
          // rewrite copy-on-write.
          val (fullSegs, partial) = touched.partition { case (seg, _) =>
            val (total, matches) = countsOf(seg); matches == total }
          fullSegs.foreach { case (seg, _) => dropped += 1; removed += seg }
          val (morSegs, cowSegs) = partial.partition { case (seg, _) =>
            val (total, matches) = countsOf(seg)
            dvMaxFraction > 0.0 &&
              matches <= (total * dvMaxFraction).toLong
          }
          if (morSegs.nonEmpty) {
            // MERGE-ON-READ point deletes, batched: ALL segments'
            // matched positions (each unioned with the segment's
            // previous DV — files are immutable, a new delete
            // supersedes) land via ONE staged per-segment write —
            // total write cost O(deleted rows), total job cost O(1).
            // At 100 TB this turns a GDPR-style few-row delete from a
            // rewrite into kilobyte writes; readers reconcile,
            // OPTIMIZE applies physically, vacuum GCs superseded
            // files. Stats stay as recorded: a DV only narrows the
            // true bounds, so stale min/max remain advisory-sound.
            val newDel = posOf(morSegs).filter(coalesce(cond, lit(false)))
              .select(col("__dv_s"), col("__dv_f").as("file_name"),
                col("__dv_i").as("row_index"))
            val withOld = morSegs.map(_._1).filter(m.dv.contains)
              .foldLeft(newDel) { (acc, s) =>
                acc.unionByName(readDv(spark,
                    Seq(s"$outDir/_dv/${m.dv(s).file}"))
                  .withColumn("__dv_s", lit(s))
                  .select(col("__dv_s"), col("file_name"),
                    col("row_index")))
              }
            val dvStage = s"$outDir/_stage_dvd_$nonce"
            val dvDirs = writeStagedBySegment(withOld, dvStage,
              onePerSeg = true)
            java.nio.file.Files.createDirectories(
              java.nio.file.Paths.get(outDir, "_dv"))
            morSegs.foreach { case (seg, i) =>
              val dvName = s"dv_${nonce}_$i"
              java.nio.file.Files.move(dvDirs(seg).toPath,
                java.nio.file.Paths.get(outDir, "_dv", dvName))
              dvSets += seg -> DvRef(dvName,
                m.dv.get(seg).map(_.rows).getOrElse(0L) +
                  countsOf(seg)._2)
              dvWrites += 1
            }
            org.apache.commons.io.FileUtils.deleteQuietly(
              new java.io.File(dvStage))
          }
          if (cowSegs.nonEmpty) {
            // Copy-on-write rewrites, batched through ONE staged
            // per-segment write plus ONE grouped stats job, path-
            // scoped to exactly the CoW segments. keep = NOT TRUE,
            // i.e. FALSE or NULL — SQL DELETE keeps NULL-predicate
            // rows.
            val keep = posOf(cowSegs).filter(!coalesce(cond, lit(false)))
              .drop("__dv_f", "__dv_i")
            val cowStage = s"$outDir/_stage_cowd_$nonce"
            val keepPhys = physicalize(keep, m)
            val cowDirs = writeStagedBySegment(keepPhys, cowStage)
            val cowStats =
              if (tracked.isEmpty) Map.empty[String, Map[String, ColStat]]
              else segmentStatsGrouped(
                readStaged(spark, cowStage, keepPhys.schema), tracked)
            cowSegs.foreach { case (seg, i) =>
              val newSeg = f"seg_d${m.version + 1}%010d_${i}_$nonce"
              java.nio.file.Files.move(cowDirs(seg).toPath,
                java.nio.file.Paths.get(outDir, newSeg))
              rewritten += 1
              removed += seg
              added += newSeg
              cowStats.get(seg).foreach(st => addedStats += newSeg -> st)
              writeSegmentBlooms(spark, outDir, newSeg, m.bloomCols)
              // a delete-rewrite keeps a SUBSET of the segment's rows,
              // so the partition fact survives with the new count
              val (total, matches) = countsOf(seg)
              m.parts.get(seg).foreach(pv => addedParts +=
                newSeg -> pv.copy(rows = total - matches))
              addedRows += newSeg -> (total - matches)
            }
            org.apache.commons.io.FileUtils.deleteQuietly(
              new java.io.File(cowStage))
          }
        }
      }
      DeleteEdit(removed.result(), added.result(), addedStats.result(),
        addedParts.result(), dvSets.result(), cdcSeg, cdcRows,
        if (cdcDropped) cdcDrops.result() else Nil,
        rewritten, dropped, deleted, dvWrites, addedRows.result())
    }
  }

  /** Row-level UPDATE, copy-on-write — [[deleteWhere]]'s companion,
    * same protocol: segments with no matching rows survive by
    * reference; a matching segment is rewritten with `assignments`
    * applied to its matching rows (non-matching rows pass through
    * bit-identical); one manifest CAS publishes, the crash window and
    * time-travel/vacuum semantics are exactly deleteWhere's. Returns
    * (committed version, segments rewritten, rows updated).
    * `pruneHint` is [[deleteWhere]]'s: manifest-stats-disjoint
    * segments survive by reference with zero Spark jobs. Lost manifest
    * races follow [[deleteWhere]]'s optimistic retry protocol.
    *
    * `dvMaxFraction > 0` enables MERGE-ON-READ updates (specified
    * r13, implemented r14 — completing the deletion-vector story
    * [[deleteWhere]] opened):
    * a segment whose match fraction is within the threshold (and
    * strictly partial — a fully-matching segment writes the same
    * bytes either way, so it stays a rewrite) is NOT rewritten;
    * instead the matched positions join the segment's deletion
    * vector (superseding union, exactly the delete path) and the
    * POST-IMAGE rows are appended as new segments — the write cost
    * is O(updated rows), not O(segment rows). Post-images are
    * grouped by their surviving partition fact (an update keeps the
    * row's partition value unless the partition column itself is
    * assigned), one appended segment per group, so partition
    * pruning and metadata-only retention keep working on the moved
    * rows; DV'd source segments keep their fact with the original
    * row count (the DV is the liveness correction, exactly the
    * delete-DV rule). Readers reconcile at scan, OPTIMIZE applies
    * DVs physically, vacuum GCs superseded files; the CDC images
    * are identical to the copy-on-write path's, so a feed consumer
    * cannot tell which storage strategy served an update. */
  def updateWhere(spark: SparkSession, outDir: String,
      cond: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column],
      pruneHint: Option[(String, Long, Long)] = None,
      beforeCommit: () => Unit = () => (),
      cdc: Boolean = false,
      dvMaxFraction: Double = 0.0)
      : (Long, Int, Long) = {
    require(dvMaxFraction >= 0.0 && dvMaxFraction <= 1.0,
      s"dvMaxFraction must be in [0,1], got $dvMaxFraction")
    import org.apache.spark.sql.functions.{coalesce, count, expr, col, lit, sum, when}
    require(assignments.nonEmpty, "UPDATE with no assignments")
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m = readManifest(outDir)
      require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
      val checks = m.expects.toSeq.sortBy(_._1)
      val tracked = m.trackedCols
      // No explicit hint? Derive ALL safe hints from the predicate's
      // own conjuncts over the tracked columns (numeric + string +
      // IS NULL) — SQL DML gets file skipping for free.
      // Inference runs in LOGICAL space (the predicate and the table
      // schema speak logical); the resulting hints re-key to the
      // PHYSICAL names manifest stats live under.
      val trackedLogical =
        if (m.colmap.isEmpty) tracked else tracked.flatMap(m.logicalOf(_))
      val bloomLogical = m.bloomCols.flatMap(m.logicalOf(_))
      val schema = tableSchema(spark, outDir, m)
      val hints: Seq[PruneHint] =
        (pruneHint.map { case (c, lo, hi) => NumRange(c, lo, hi) } match {
          case Some(h) => Seq(h)
          case None =>
            if (trackedLogical.isEmpty && bloomLogical.isEmpty) Nil
            else inferPruneHints(spark, schema,
              cond, trackedLogical, bloomLogical)
        }).map(hintPhysical(_, m))
      val nonce = java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
      var rewritten = 0
      var updated = 0L
      val removed = Set.newBuilder[String]
      val added = Seq.newBuilder[String]
      val addedStats = Map.newBuilder[String, Map[String, ColStat]]
      val addedParts = Map.newBuilder[String, PartVal]
      val addedRows = Map.newBuilder[String, Long]
      // Change data feed: pre- AND post-images of updated rows (the
      // Delta CDF update_preimage/update_postimage pair), one cdc
      // segment per DML, recorded by the commit.
      val cdcSeg = s"seg_cdc_u$nonce"
      var cdcRows = false
      val dvSets = Map.newBuilder[String, DvRef]
      var dvWrites = 0
      // Metadata pruning stays per segment and DRIVER-side (zero
      // jobs); only the surviving scan set enters the batched read.
      val scanSegs = m.segs.zipWithIndex.filter { case (seg, _) =>
        !hints.exists(h => !mayMatchHint(m, outDir, seg, h)) }
      if (scanSegs.isEmpty) return (m.version, 0, 0L)
      val cols = schema.fieldNames.toSeq
      // A misspelled assignment column must error, not silently no-op.
      val unknown = assignments.keySet -- cols
      require(unknown.isEmpty,
        s"UPDATE assigns column(s) not in table schema: " +
          unknown.toSeq.sorted.mkString(", "))
      // BATCHED PLANNING (r15): the whole touched set plans in ONE
      // grouped-by-segment job over one DV-reconciling positional
      // read — per segment: total live rows, matching rows, and
      // per-expectation POST-IMAGE violation counts. Before r15 this
      // was one sequential Spark job PER SEGMENT (the r14 verdict's
      // driver-side O(segments) ceiling: a broad UPDATE on a 100 TB
      // table touching thousands of segments paid thousands of
      // serial job submissions while the cluster idled).
      // The match flag and every assignment right-hand side are
      // evaluated against the OLD row inside the same projection,
      // then the expectations judge the post-image values — CHECK-
      // constraint semantics on every write path, not just appends.
      // Registration is NOT VALID (no historical scan), so only rows
      // this UPDATE writes NEW VALUES for are checked; untouched rows
      // riding a copy-on-write rewrite are not re-judged.
      // Right-hand sides are guarded by the match flag (lazy CaseWhen
      // branch): SQL UPDATE evaluates SET expressions ONLY on
      // matching rows — an RHS that errors on a non-matching row
      // (ANSI division by zero under `WHERE w > 0`, SET `v = x / w`)
      // must not fail the statement. Unmatched rows carry their old
      // values, which the __m-guarded aggregates below never judge.
      // The write passes re-scan (filters pushed to the parquet scan)
      // instead of caching: a constant number of full-parallelism
      // scans beats caching an unbounded multi-segment working set —
      // per-segment caching was bounded, a batched cache would be the
      // whole touched byte-range.
      val pos = readSegmentsWithPos(spark, outDir, m, scanSegs.map(_._1))
      val flagged = pos.select(
        col("__dv_s") +:
          coalesce(cond, lit(false)).as("__m") +:
          cols.map(c => assignments.get(c)
            .map(v => when(coalesce(cond, lit(false)), v)
              .otherwise(col(c)).as(c))
            .getOrElse(col(c))): _*)
      val aggs = count(lit(1)) +:
        count(when(col("__m"), lit(1))) +:
        checks.map { case (_, sql) =>
          sum(when(col("__m") && !coalesce(expr(sql), lit(false)),
            1L).otherwise(0L)) }
      val perSeg = flagged.groupBy(col("__dv_s"))
        .agg(aggs.head, aggs.tail: _*)
        .collect().map(r => r.getString(0) -> r).toMap
      def matchesOf(seg: String): Long =
        perSeg.get(seg).map(_.getLong(2)).getOrElse(0L)
      // CHECK gate over the WHOLE statement, before any write.
      val bad = checks.zipWithIndex.map { case ((n, _), j) =>
        n -> perSeg.valuesIterator.map(_.getLong(j + 3)).sum }
        .filter(_._2 > 0L)
      require(bad.isEmpty,
        s"UPDATE at $outDir would write rows violating " +
          "expectation(s): " +
          bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
      val touched = scanSegs.filter { case (seg, _) => matchesOf(seg) > 0L }
      if (touched.isEmpty) return (m.version, 0, 0L)
      updated = touched.map { case (seg, _) => matchesOf(seg) }.sum
      // Write passes re-scope the path list to exactly the segments
      // they touch (`__dv_s` is a COMPUTED column — filtering on it
      // would not prune files): a 3-segment update on a 5000-segment
      // scan set re-reads 3 segments, not 5000.
      def posOf(segs: Seq[(String, Int)]) =
        readSegmentsWithPos(spark, outDir, m, segs.map(_._1))
      val posT = posOf(touched)
      // Post-image of the matched rows: every right-hand side against
      // the OLD row in one projection (chained withColumn would feed
      // already-updated columns into later assignments) — shared by
      // the CDC images and the merge-on-read append, so a feed
      // consumer cannot tell which storage strategy served the update.
      def matchedPostOf(p: DataFrame) = p.filter(cond).select(
        col("__dv_s") +: cols.map(c =>
          assignments.get(c).map(_.as(c)).getOrElse(col(c))): _*)
      if (cdc) {
        physicalize(posT.filter(cond).drop("__dv_f", "__dv_i", "__dv_s")
          .withColumn("_change_type", lit("update_preimage")), m)
          .write.mode("append").parquet(s"$outDir/$cdcSeg")
        physicalize(matchedPostOf(posT).drop("__dv_s")
          .withColumn("_change_type", lit("update_postimage")), m)
          .write.mode("append").parquet(s"$outDir/$cdcSeg")
        cdcRows = true
      }
      // Storage-strategy split per segment (unchanged rules): MERGE-
      // ON-READ when the match fraction is within the threshold and
      // strictly partial (a fully-matching segment writes the same
      // bytes either way, so it stays a rewrite); COPY-ON-WRITE else.
      val (morSegs, cowSegs) = touched.partition { case (seg, _) =>
        val r = perSeg(seg)
        val (total, matches) = (r.getLong(1), r.getLong(2))
        dvMaxFraction > 0.0 && matches < total &&
          matches <= (total * dvMaxFraction).toLong
      }
      if (morSegs.nonEmpty) {
        // MERGE-ON-READ point updates, batched: ALL segments' matched
        // positions join their deletion vectors (superseding union:
        // files are immutable, the exact delete-DV rule) via ONE
        // staged per-segment write, and ALL post-image rows append as
        // one new segment per source segment via a second — total
        // write cost O(updated rows), total job cost O(1). The DV'd
        // source keeps its partition fact with the ORIGINAL row count
        // (the DV is the liveness correction) and its recorded stats
        // (stale-superset bounds stay advisory-sound).
        val posM = posOf(morSegs)
        val newDel = posM.filter(coalesce(cond, lit(false)))
          .select(col("__dv_s"), col("__dv_f").as("file_name"),
            col("__dv_i").as("row_index"))
        val withOld = morSegs.map(_._1).filter(m.dv.contains)
          .foldLeft(newDel) { (acc, s) =>
            acc.unionByName(readDv(spark,
                Seq(s"$outDir/_dv/${m.dv(s).file}"))
              .withColumn("__dv_s", lit(s))
              .select(col("__dv_s"), col("file_name"), col("row_index")))
          }
        val dvStage = s"$outDir/_stage_dvu_$nonce"
        val dvDirs = writeStagedBySegment(withOld, dvStage,
          onePerSeg = true)
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(outDir, "_dv"))
        val postStage = s"$outDir/_stage_postu_$nonce"
        val postPhys = physicalize(matchedPostOf(posM), m)
        val postDirs = writeStagedBySegment(postPhys, postStage)
        val postStats =
          if (tracked.isEmpty) Map.empty[String, Map[String, ColStat]]
          else segmentStatsGrouped(
            readStaged(spark, postStage, postPhys.schema), tracked)
        morSegs.foreach { case (seg, i) =>
          val dvName = s"dv_${nonce}_$i"
          java.nio.file.Files.move(dvDirs(seg).toPath,
            java.nio.file.Paths.get(outDir, "_dv", dvName))
          dvSets += seg -> DvRef(dvName,
            m.dv.get(seg).map(_.rows).getOrElse(0L) + matchesOf(seg))
          dvWrites += 1
          val postSeg = f"seg_u${m.version + 1}%010d_${i}p_$nonce"
          java.nio.file.Files.move(postDirs(seg).toPath,
            java.nio.file.Paths.get(outDir, postSeg))
          added += postSeg
          postStats.get(seg).foreach(st => addedStats += postSeg -> st)
          writeSegmentBlooms(spark, outDir, postSeg, m.bloomCols)
          // post-image rows keep the row's partition values unless
          // any fact column (primary or composite) is assigned
          m.parts.get(seg).foreach { pv =>
            if (!pv.facts.exists { case (c, _) =>
                m.logicalOf(c).exists(assignments.contains) })
              addedParts += postSeg -> pv.copy(rows = matchesOf(seg))
          }
          addedRows += postSeg -> matchesOf(seg)
        }
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dvStage))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(postStage))
      }
      if (cowSegs.nonEmpty) {
        // Copy-on-write rewrites, batched: matching rows take their
        // assignments, non-matching rows pass through bit-identical,
        // each segment's dv entry (if any) retires with the segment —
        // ALL rewrites through ONE staged per-segment write plus ONE
        // grouped stats job over the staged bytes, path-scoped to
        // exactly the CoW segments.
        val out = posOf(cowSegs).select(
          col("__dv_s") +: cols.map { c =>
            assignments.get(c) match {
              case Some(v) => when(cond, v).otherwise(col(c)).as(c)
              case None => col(c)
            }
          }: _*)
        val cowStage = s"$outDir/_stage_cowu_$nonce"
        val outPhys = physicalize(out, m)
        val cowDirs = writeStagedBySegment(outPhys, cowStage)
        val cowStats =
          if (tracked.isEmpty) Map.empty[String, Map[String, ColStat]]
          else segmentStatsGrouped(
            readStaged(spark, cowStage, outPhys.schema), tracked)
        cowSegs.foreach { case (seg, i) =>
          val newSeg = f"seg_u${m.version + 1}%010d_${i}_$nonce"
          java.nio.file.Files.move(cowDirs(seg).toPath,
            java.nio.file.Paths.get(outDir, newSeg))
          rewritten += 1
          removed += seg
          added += newSeg
          cowStats.get(seg).foreach(st => addedStats += newSeg -> st)
          writeSegmentBlooms(spark, outDir, newSeg, m.bloomCols)
          // an update keeps every row; the partition facts survive
          // unless any fact column (primary or composite) was assigned
          m.parts.get(seg).foreach { pv =>
            if (!pv.facts.exists { case (c, _) =>
                m.logicalOf(c).exists(assignments.contains) })
              addedParts += newSeg -> pv
          }
          // an update keeps every LIVE row (the positional read
          // reconciled the retiring DV)
          perSeg.get(seg).foreach(r => addedRows += newSeg -> r.getLong(1))
        }
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(cowStage))
      }
      if (rewritten == 0 && dvWrites == 0) return (m.version, 0, 0L)
      beforeCommit()
      tryCommitEdit(outDir, m, removed.result(), added.result(),
        addedStats.result(), None,
        cdcSegs = if (cdcRows) Seq(cdcSeg) else Nil,
        dvSets = dvSets.result(),
        addedParts = addedParts.result(),
        addedRows = addedRows.result()) match {
        case Some(v) => return (v, rewritten, updated)
        case None => // true conflict — re-plan against the new tip
      }
    }
    sys.error(s"update at $outDir: $dmlMaxAttempts consecutive true " +
      "conflicts (concurrent writers rewriting the same segments) — " +
      "coordinate the writers or retry later")
  }

  /** MAINTENANCE COMPACTION as a standalone protocol op, with an
    * optional LAYOUT-PRESERVING mode: `clusterBy` non-empty rewrites
    * the compacted segment range-partitioned + sorted on those
    * columns, so compaction and the `sink_clustered` skipping lever
    * compose — the rewrite every compaction pays anyway ALSO buys
    * row-group/page min-max locality on the cluster keys, instead of
    * concatenating segments into a layout-less blob that a later
    * OPTIMIZE would have to rewrite again. Same crash contract as the
    * streaming compaction: the segment is fully written before the one
    * manifest CAS; a crash in between leaves readers on the old
    * version and an orphan dir for [[vacuum]]. Schema generation is
    * propagated. Returns (committed version, input segments compacted);
    * a 0/1-segment lake is a no-op. */
  def compact(spark: SparkSession, outDir: String, targetFiles: Int = 2,
      clusterBy: Seq[String] = Nil,
      zorderBy: Option[(String, String)] = None): (Long, Int) = {
    import org.apache.spark.sql.functions.{col, max}
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "compact takes clusterBy OR zorderBy, not both")
    val m = readManifest(outDir)
    require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
    if (m.segs.size <= 1 && m.dv.isEmpty) return (m.version, 0)
    // DV-reconciling read: compaction PHYSICALLY APPLIES deletion
    // vectors — the rewritten segment holds only live rows and the new
    // manifest carries no dv entries (they die with the replaced
    // segments), which is the merge-on-read lifecycle: DML writes
    // O(deleted rows), OPTIMIZE folds the debt into the layout.
    val df = readSegments(spark, outDir, m, m.segs)
    val out =
      if (zorderBy.isDefined) {
        // OPTIMIZE ZORDER BY: the compaction rewrite lays the segment
        // on the Morton curve over TWO hot dimensions, so each output
        // file carries tight min/max on both (graft.functions.ZOrder —
        // bounds from the ACTUAL data, the always-stretch rule). The
        // key is layout-only and never reaches the table's columns.
        val (xc, yc) = zorderBy.get
        val b = df.agg(max(col(xc)).cast("long"),
          max(col(yc)).cast("long")).head()
        require(!b.isNullAt(0) && !b.isNullAt(1),
          s"zorder columns $xc/$yc have no non-null values")
        val z = graft.functions.ZOrder.zvalue(
          col(xc), col(yc), b.getLong(0), b.getLong(1))
        df.withColumn("__z", z)
          .repartitionByRange(targetFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
      }
      else if (clusterBy.isEmpty) df.repartition(targetFiles)
      else df.repartitionByRange(targetFiles, clusterBy.map(col): _*)
        .sortWithinPartitions(clusterBy.map(col): _*)
    val cseg = f"seg_c${m.version + 1}%010d"
    out.write.mode("overwrite").parquet(s"$outDir/$cseg")
    // Stats for the rebaselined segment track the LOGICAL names (the
    // file now physically carries them — see the colmap-reset note
    // below); a tracked physical whose logical was dropped has no
    // surviving column to track.
    val tracked = m.trackedCols.flatMap(m.logicalOf(_))
    val cstats =
      if (tracked.isEmpty) Map.empty[String, Map[String, ColStat]]
      else Map(cseg -> segmentStats(
        spark.read.schema(out.schema).parquet(s"$outDir/$cseg"),
        tracked))
    // compaction re-baselines the column mapping, so the compacted
    // segment's sidecars carry the LOGICAL (= new physical) names
    writeSegmentBlooms(spark, outDir, cseg,
      m.bloomCols.flatMap(m.logicalOf(_)))
    // The positional Manifest deliberately RESETS dv (the rewrite
    // applied every deletion vector) AND colmap (the rewrite was
    // written from the LOGICAL read, so the new segment's file columns
    // ARE the logical names — compaction re-baselines the mapping and
    // physically sheds dropped columns' lingering bytes, for free,
    // inside the rewrite it was going to pay anyway).
    require(commitNext(outDir, m, Manifest(m.version + 1, m.maxB, Seq(cseg),
      m.schemaV, m.schemaJson, cstats, m.txns, m.expects,
      dataChange = false,
      // partSpec survives (a declared table property, like the
      // schema) — RE-KEYED to the logical names because compaction
      // re-baselines the column mapping (physical == logical again);
      // a spec any of whose logical columns was dropped dies with the
      // drop. Per-segment partition VALUES do not survive: the
      // compacted segment spans partitions, so it simply has no
      // recorded value and later partition-covered DML reads it the
      // normal way.
      partSpec = m.partSpec.flatMap { s =>
        val ls = s.split(",").toSeq.map(m.logicalOf(_))
        if (ls.forall(_.isDefined)) Some(ls.flatten.mkString(","))
        else None
      },
      // bloom columns are declared physical; compaction re-baselines
      // the mapping to logical names, so the declaration follows —
      // dropped columns' blooms die with the drop
      bloomCols = m.bloomCols.flatMap(m.logicalOf(_)),
      // the COPY INTO load ledger survives layout changes: a re-run
      // after OPTIMIZE must still skip already-ingested files
      copied = m.copied)),
      s"compaction at $outDir lost a manifest race at v${m.version + 1}")
    // Input segments stay on disk (DML convention: the pre-compaction
    // version keeps time-traveling until vacuum) — unlike the
    // streaming path's eager cleanup, this op follows the
    // delete/update/merge retention contract.
    (m.version + 1, m.segs.size)
  }

  /** INCREMENTAL DELETION-VECTOR PURGE (r14) — the `REORG TABLE …
    * APPLY (PURGE)` maintenance verb: rewrite ONLY the segments
    * carrying deletion vectors (each rewritten segment holds the live
    * rows; its dv entry retires with it), leaving every clean segment
    * untouched BY REFERENCE. Maintenance cost is O(DV debt), not
    * O(table) — a 100 TB lake with a handful of DV'd segments pays a
    * handful of segment rewrites, where full OPTIMIZE rewrites
    * everything (and collapses per-segment partition facts). Facts
    * survive with the LIVE row count (the rewrite makes the DV's
    * correction physical); stats are refreshed from the rewritten
    * bytes (the one moment stale-superset bounds can tighten for
    * free); blooms rewritten. The commit is LAYOUT-ONLY
    * (dataChange = false): rows did not change, so a change-feed
    * window spanning a purge stays readable without change data —
    * exactly compaction's CDC contract. Same crash contract as every
    * DML: segments fully written before one manifest CAS, orphans
    * vacuum, optimistic retry on a lost race (`beforeCommit` is the
    * race-injection seam, [[deleteWhere]]'s pattern). Returns
    * (committed version, segments purged); a DV-free lake is a
    * no-op. */
  def purgeDv(spark: SparkSession, outDir: String,
      beforeCommit: () => Unit = () => ()): (Long, Int) = {
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m = readManifest(outDir)
      requireTable(m, outDir)
      if (m.dv.isEmpty) return (m.version, 0)
      val tracked = m.trackedCols
      val nonce = java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong())
      val removed = Set.newBuilder[String]
      val added = Seq.newBuilder[String]
      val addedStats = Map.newBuilder[String, Map[String, ColStat]]
      val addedParts = Map.newBuilder[String, PartVal]
      val addedRows = Map.newBuilder[String, Long]
      // BATCHED (r15): ONE DV-reconciling positional read of every
      // debt-carrying segment, ONE staged per-segment write, ONE
      // grouped stats job — job cost O(1) in the number of DV'd
      // segments (was one sequential rewrite job per segment, the
      // "8 sequential per-segment jobs" shape BASELINE.md's r14 row
      // measured). Write cost stays O(DV debt): clean segments never
      // enter the read.
      val dvSegs = m.segs.zipWithIndex.filter(t => m.dv.contains(t._1))
      val pos = readSegmentsWithPos(spark, outDir, m, dvSegs.map(_._1))
      val stage = s"$outDir/_stage_purge_$nonce"
      val purgePhys = physicalize(pos.drop("__dv_f", "__dv_i"), m)
      val dirs = writeStagedBySegment(purgePhys, stage)
      val stats =
        if (tracked.isEmpty) Map.empty[String, Map[String, ColStat]]
        else segmentStatsGrouped(
          readStaged(spark, stage, purgePhys.schema), tracked)
      dvSegs.foreach { case (seg, i) =>
        val dvRef = m.dv(seg)
        val newSeg = f"seg_p${m.version + 1}%010d_${i}_$nonce"
        // a DV'd segment always has ≥1 live row (a fully-dead segment
        // drops by metadata at DML time, never carries a DV) — a
        // missing staged dir here is an invariant violation, fail loud
        java.nio.file.Files.move(dirs(seg).toPath,
          java.nio.file.Paths.get(outDir, newSeg))
        removed += seg
        added += newSeg
        stats.get(seg).foreach(st => addedStats += newSeg -> st)
        writeSegmentBlooms(spark, outDir, newSeg, m.bloomCols)
        m.parts.get(seg).foreach { pv =>
          addedParts += newSeg -> pv.copy(rows = pv.rows - dvRef.rows)
        }
        // the purge makes the DV's correction physical: live = old − dv
        m.segRows.get(seg).foreach(r =>
          addedRows += newSeg -> (r - dvRef.rows))
      }
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(stage))
      val purged = m.dv.size
      beforeCommit()
      tryCommitEdit(outDir, m, removed.result(), added.result(),
        addedStats.result(), None,
        addedParts = addedParts.result(),
        dataChange = false,
        addedRows = addedRows.result()) match {
        case Some(v) => return (v, purged)
        case None => // true conflict — re-plan against the new tip
      }
    }
    sys.error(s"purge at $outDir: $dmlMaxAttempts consecutive true " +
      "conflicts (concurrent writers rewriting the same segments) — " +
      "coordinate the writers or retry later")
  }

  /** PARTITION-PRESERVING compaction: rewrite each partition's small
    * segments into `targetFiles` file(s) PER PARTITION VALUE, keeping
    * the manifest partition facts alive across the rewrite — plain
    * [[compact]] merges everything into one layout-less segment and
    * forfeits them, which is right for an unpartitioned table and
    * wrong for a retention-managed one (the next `DELETE WHERE day <
    * cutoff` would have to scan). Per (column, value) group with more
    * than one segment or any deletion-vector debt: DV-reconciling
    * read, one rewrite, stats recomputed, fact re-recorded with the
    * group's LIVE row count (recorded rows minus DV debt — both
    * manifest numbers, no counting scan). Segments without a recorded
    * fact are left untouched; the column mapping is NOT re-baselined
    * (only grouped segments rewrite, so files keep physical names).
    * `dataChange = false` — bytes moved, rows did not; the change
    * feed skips it. Returns (committed version, partition groups
    * compacted); nothing to do commits nothing. */
  def compactPartitions(spark: SparkSession, outDir: String,
      targetFiles: Int = 1): (Long, Int) = {
    val m = readManifest(outDir)
    require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
    // group by the FULL fact tuple (r15: a composite-partitioned
    // segment compacts only with segments sharing every dimension)
    val groups = m.segs
      .flatMap(s => m.parts.get(s).map(pv => (pv.facts, s)))
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2) }
      .filter { case (_, segs) =>
        segs.size > 1 || segs.exists(m.dv.contains) }
      .toSeq.sortBy(_._1.toString)
    if (groups.isEmpty) return (m.version, 0)
    val nonce = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    val removed = Set.newBuilder[String]
    val added = Seq.newBuilder[String]
    val addStats = Map.newBuilder[String, Map[String, ColStat]]
    val addParts = Map.newBuilder[String, PartVal]
    val tracked = m.trackedCols
    groups.zipWithIndex.foreach { case ((facts, segs), i) =>
      val df = readSegments(spark, outDir, m, segs) // logical + DV-applied
      val newSeg = f"seg_pc${m.version + 1}%010d_${i}_$nonce"
      val grpPhys = physicalize(df.repartition(targetFiles), m)
      grpPhys.write.mode("overwrite").parquet(s"$outDir/$newSeg")
      val liveRows = segs.map(s => m.parts(s).rows).sum -
        segs.flatMap(m.dv.get).map(_.rows).sum
      removed ++= segs
      added += newSeg
      addParts += newSeg -> PartVal(facts.head._1, facts.head._2,
        liveRows, facts.tail)
      if (tracked.nonEmpty)
        addStats += newSeg -> segmentStats(
          spark.read.schema(grpPhys.schema)
            .parquet(s"$outDir/$newSeg"), tracked)
      writeSegmentBlooms(spark, outDir, newSeg, m.bloomCols)
    }
    val rm = removed.result()
    val next = m.copy(version = m.version + 1,
      segs = m.segs.filterNot(rm) ++ added.result(),
      stats = (m.stats -- rm) ++ addStats.result(),
      parts = (m.parts -- rm) ++ addParts.result(),
      dv = m.dv -- rm,
      cdcSegs = Nil, cdcDropSegs = Nil, dataChange = false)
    require(commitEditRecord(outDir, m, next, rm, added.result(),
      addStats.result(), addedParts = addParts.result()),
      s"partition compaction at $outDir lost a manifest race")
    (m.version + 1, groups.size)
  }

  /** Register a table EXPECTATION (data contract): a boolean SQL
    * predicate over the table's columns that every subsequently
    * appended batch must satisfy ([[appendSegment]] enforces it with
    * CHECK-constraint fail-loud semantics; SQL `INSERT INTO` goes
    * through the same path). A METADATA-ONLY manifest commit — the
    * DLT-expectations / Delta-constraints design: the contract lives
    * WITH the table, so every writer sees it, not just the pipeline
    * that happened to add validation code. Applies to new data;
    * existing segments are not re-validated (`ADD CONSTRAINT ...
    * NOT VALID` semantics). Returns the committed version. */
  def addExpectation(spark: SparkSession, outDir: String, name: String,
      condSql: String): Long = {
    require(!name.contains('|') && name.nonEmpty,
      s"expectation name must be non-empty without '|': $name")
    // The manifest is line-oriented: a multi-line condition (legal SQL
    // that passes analysis) would be written as one `expect=` header
    // whose continuation lines later parse as segment names, poisoning
    // every subsequent read of the table. Refuse at registration.
    require(!condSql.exists(c => c == '\n' || c == '\r'),
      "expectation SQL must be single-line (the manifest is " +
        "line-oriented); rewrite the condition without newlines")
    val m = readManifest(outDir)
    requireTable(m, outDir)
    require(!m.expects.contains(name),
      s"expectation $name already registered on lake at $outDir")
    // fail at registration, not first append, if the SQL is unparsable
    // or references absent columns
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      tableSchema(spark, outDir, m))
      .filter(org.apache.spark.sql.functions.expr(condSql))
      .queryExecution.assertAnalyzed()
    // cdcSegs/dataChange are PER-VERSION annotations — a copy of the
    // parent must not re-assert them (a DML parent's change segment
    // would be emitted twice by the CDC walk)
    require(commitNext(outDir, m, m.copy(version = m.version + 1,
      expects = m.expects + (name -> condSql),
      cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)),
      s"expectation registration at $outDir lost a manifest race")
    m.version + 1
  }

  /** Split a batch into (passing, quarantined) against the table's
    * registered expectations — the DROP/quarantine flow: append the
    * passing side, route the quarantined side to a dead-letter table
    * for inspection. Rows where any expectation is FALSE or NULL
    * quarantine (a NULL check result is not a pass — same rule as
    * the fail-loud path). */
  def splitByExpectations(spark: SparkSession, outDir: String,
      df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.expr
    val m = readManifest(outDir)
    if (m.expects.isEmpty) return (df, df.limit(0))
    val passAll = m.expects.values
      .map(sql => expr(sql) <=> org.apache.spark.sql.functions.lit(true))
      .reduce(_ && _)
    (df.filter(passAll), df.filter(!passAll))
  }

  /** SCHEMA EVOLUTION: add a nullable column — a METADATA-ONLY commit,
    * the defining property of lake-format evolution (Iceberg/Delta
    * ADD COLUMN): zero segments rewritten, one manifest CAS that bumps
    * the schema generation and records the widened schema. Readers of
    * the new version see the column as NULL on every pre-evolution
    * segment (schema applied at scan, absent-column fill — no footer
    * merging); time travel to older versions reads under THEIR
    * recorded schema. Subsequent DML rewrites materialize the column
    * in whatever segments they touch. Returns the new schema
    * generation. */
  def evolveAddColumn(spark: SparkSession, outDir: String, name: String,
      dataType: org.apache.spark.sql.types.DataType): Long = {
    val m = readManifest(outDir)
    requireTable(m, outDir)
    val cur = tableSchema(spark, outDir, m)
    require(!cur.fieldNames.exists(_.equalsIgnoreCase(name)),
      s"column $name already exists in lake at $outDir")
    val wider = cur.add(name, dataType, nullable = true)
    // Under an ACTIVE column mapping, an added column mints a FRESH
    // physical name: if `name` was ever dropped, old segments still
    // physically hold its bytes, and an identity-mapped re-add would
    // RESURRECT them through the applied-schema read. A fresh physical
    // name can never alias lingering data ([[mintPhysical]] proves
    // non-collision against every retained version's physical schema).
    val cm =
      if (m.colmap.isEmpty) m.colmap
      else m.colmap + (name -> mintPhysical(spark, outDir, m, name))
    // per-version annotations reset — see addExpectation's note
    require(commitNext(outDir, m, m.copy(version = m.version + 1,
      schemaV = m.schemaV + 1, schemaJson = Some(wider.json),
      colmap = cm, cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)),
      s"schema evolution at $outDir lost a manifest race")
    m.schemaV + 1
  }

  /** The column mapping to commit when a rename/drop ACTIVATES it: the
    * identity map over the current logical schema. Every column a
    * segment file already holds keeps reading under its original name
    * (now its stable physical id); only the renamed/dropped entry then
    * diverges. */
  private def activatedColmap(m: Manifest,
      logical: org.apache.spark.sql.types.StructType): Map[String, String] =
    if (m.colmap.nonEmpty) m.colmap
    else logical.fieldNames.map(n => n -> n).toMap

  /** Mint a physical column name no RETAINED version's physical schema
    * has ever used (walking the manifest log — metadata only, and DDL
    * is rare): `<name>_p<k>` with the first non-colliding k. Collision
    * matters because the applied-schema read selects BY PHYSICAL NAME
    * from old files — a reused name would read a dead column's bytes. */
  private def mintPhysical(spark: SparkSession, outDir: String,
      m: Manifest, name: String): String = {
    val used = manifestVersions(outDir).flatMap { v =>
      val mv = manifestAt(outDir, v)
      mv.schemaJson.toSeq.flatMap { j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.toSeq.map(mv.physicalOf)
      }
    }.toSet ++ m.colmap.values
    Iterator.from(m.schemaV.toInt + 1).map(k => s"${name}_p$k")
      .find(!used(_)).get
  }

  /** Every registered expectation must still ANALYZE against `schema`
    * — a rename/drop that broke an expectation would otherwise fail
    * every later append with an unrelated-looking error. Refuses with
    * the offending expectation's name. */
  private def requireExpectsAnalyze(spark: SparkSession, m: Manifest,
      schema: org.apache.spark.sql.types.StructType, op: String): Unit =
    m.expects.foreach { case (n, sql) =>
      try spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .filter(org.apache.spark.sql.functions.expr(sql))
        .queryExecution.assertAnalyzed()
      catch { case e: Exception => throw new IllegalArgumentException(
        s"$op would break expectation '$n' ($sql) — drop the " +
          "expectation first", e) }
    }

  /** SCHEMA EVOLUTION: RENAME COLUMN — a METADATA-ONLY commit via
    * COLUMN MAPPING (Delta's columnMapping=name / Iceberg field-id
    * analog). The first rename activates the mapping (identity over
    * the current schema), then moves only the LOGICAL key: the
    * physical name in every already-written segment file is untouched
    * and stable, so zero segments rewrite, old versions time-travel
    * under their own names, and the change feed keeps reading
    * pre-rename cdc files through the same stable physical ids.
    * Returns the new schema generation. */
  def evolveRenameColumn(spark: SparkSession, outDir: String,
      oldName: String, newName: String): Long = {
    val m = readManifest(outDir)
    requireTable(m, outDir)
    val cur = tableSchema(spark, outDir, m)
    require(cur.fieldNames.contains(oldName),
      s"no column $oldName in lake at $outDir " +
        s"(has ${cur.fieldNames.mkString(", ")})")
    require(!cur.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column $newName already exists in lake at $outDir")
    val cm0 = activatedColmap(m, cur)
    val cm = (cm0 - oldName) + (newName -> cm0(oldName))
    val renamed = org.apache.spark.sql.types.StructType(
      cur.fields.map(f =>
        if (f.name == oldName) f.copy(name = newName) else f))
    requireExpectsAnalyze(spark, m, renamed, s"RENAME COLUMN $oldName")
    require(commitNext(outDir, m, m.copy(version = m.version + 1,
      schemaV = m.schemaV + 1, schemaJson = Some(renamed.json),
      colmap = cm, cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)),
      s"rename column at $outDir lost a manifest race")
    m.schemaV + 1
  }

  /** SCHEMA EVOLUTION: DROP COLUMN — METADATA-ONLY, the column-mapping
    * twin of [[evolveRenameColumn]]: the logical entry disappears from
    * the mapping and the schema; the physical bytes linger UNSELECTED
    * in old segment files (the applied-schema read never names them)
    * until a rewrite — the next [[compact]] — physically sheds them.
    * Time travel before the drop still sees the column; a later ADD
    * COLUMN of the same name mints a fresh physical id and can never
    * resurrect the dropped data. Returns the new schema generation. */
  def evolveDropColumn(spark: SparkSession, outDir: String,
      name: String): Long = {
    val m = readManifest(outDir)
    requireTable(m, outDir)
    val cur = tableSchema(spark, outDir, m)
    require(cur.fieldNames.contains(name),
      s"no column $name in lake at $outDir " +
        s"(has ${cur.fieldNames.mkString(", ")})")
    require(cur.fields.length > 1,
      s"cannot drop the only column of lake at $outDir")
    val cm = activatedColmap(m, cur) - name
    val narrowed = org.apache.spark.sql.types.StructType(
      cur.fields.filterNot(_.name == name))
    requireExpectsAnalyze(spark, m, narrowed, s"DROP COLUMN $name")
    require(commitNext(outDir, m, m.copy(version = m.version + 1,
      schemaV = m.schemaV + 1, schemaJson = Some(narrowed.json),
      colmap = cm, cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true)),
      s"drop column at $outDir lost a manifest race")
    m.schemaV + 1
  }

  /** Append `df` as one new segment through the manifest protocol,
    * preserving the table's schema generation. The segment must match
    * the CURRENT schema's column names in order — post-evolution
    * appends carry the wider schema; old readers via time travel never
    * see them. Returns the committed version. */
  def appendSegment(spark: SparkSession, outDir: String, df: DataFrame,
      seg: String, txn: Option[(String, Long)] = None): Long = {
    val m = readManifest(outDir)
    requireTable(m, outDir)
    // Transactional idempotence (Delta's `txn` action): a writer that
    // identifies as (appId, batchId) is applied AT MOST ONCE — a
    // replayed batch whose id is already recorded is a no-op. This is
    // what upgrades a foreachBatch append/fold sink from
    // at-least-once to exactly-once: the guard travels IN the same
    // manifest CAS as the data, so there is no window where the data
    // committed but the guard did not.
    txn.foreach { case (app, id) =>
      if (m.txns.getOrElse(app, Long.MinValue) >= id) return m.version
    }
    require(!m.segs.contains(seg), s"segment $seg already committed")
    val expected = tableSchema(spark, outDir, m).fieldNames.toSeq
    require(df.columns.toSeq == expected,
      s"appendSegment schema mismatch: got ${df.columns.mkString(",")}, " +
        s"table is ${expected.mkString(",")}")
    // FUSED VALIDATE + WRITE + STATS (r18): the expectation gate, the
    // per-segment stats collection, and the commit gate's row count
    // all ride the ONE write job as `observe` metrics (CollectMetrics
    // inside the write's plan — measured at ~7 ms delivery after the
    // action). Before r18 an append with expectations and tracked
    // stats paid three scan actions (gate aggregate, write, stats
    // re-read) plus a footer read at the commit gate — per-action
    // Catalyst plan floors on every batch of every streaming sink.
    // CHECK semantics are unchanged: a violating batch is refused
    // LOUD with per-check counts and commits NOTHING — the written
    // files are deleted before the error and were never manifest-
    // visible (the same invisibility any staged write relies on).
    val (segStats, rows) = writeSegmentObserved(spark, outDir, m, df, seg,
      s"appendSegment to $outDir violates expectation(s)")
    writeSegmentBlooms(spark, outDir, seg, m.bloomCols, Some(rows))
    // An append commutes with ANY concurrent commit that leaves the
    // schema, expectation set, and our txn state alone (it reads no
    // segments), so a lost CAS retries in place via the optimistic
    // protocol; a true conflict (schema/expectations moved — the
    // validation above ran against stale contracts — or our txn
    // landed) re-plans from the top, re-validating under the new state.
    tryCommitEdit(outDir, m, Set.empty, Seq(seg), segStats, txn,
      addedRows = Map(seg -> rows)) match {
      case Some(v) => v
      case None => appendSegment(spark, outDir,
        df, seg, txn) // tail re-plan; txn guard stops infinite recursion
    }
  }

  /** The fused single-action segment write (r18): writes `df`
    * (logical names) as segment `seg`, carrying the expectation gate,
    * the tracked-column stats, and the row count as `observe` metrics
    * INSIDE the write job — one Catalyst action where the pre-r18
    * path paid three (gate aggregate, write, stats re-read) plus a
    * footer read at the commit gate. Expectation violations delete
    * the just-written (never manifest-visible) directory and refuse
    * loud with the caller's message head (`errHead`, the text before
    * the per-check counts) — identical wording to the pre-fusion
    * gates. Returns the stats map
    * (keyed by segment, physical column names — empty when the lake
    * tracks nothing) and the row count for `addedRows`. */
  private def writeSegmentObserved(spark: SparkSession, outDir: String,
      m: Manifest, df: DataFrame, seg: String, errHead: String)
      : (Map[String, Map[String, ColStat]], Long) = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, when}
    import org.apache.spark.sql.types.{LongType, StringType}
    val checks = m.expects.toSeq.sortBy(_._1)
    // manifest stats live under PHYSICAL names; `df` speaks logical —
    // aggregate on the logical side, re-key the results
    val trackedTyped: Seq[(String, String, Boolean)] =
      m.trackedCols.flatMap { p =>
        val lOpt = if (m.colmap.isEmpty) Some(p) else m.logicalOf(p)
        lOpt.flatMap(l => df.schema.fields.collectFirst {
          case f if f.name == l &&
            (f.dataType == LongType || f.dataType == StringType) =>
            (p, l, f.dataType == LongType)
        })
      }
    val obs = new org.apache.spark.sql.Observation(
      "graft_seg_" + java.lang.Long.toHexString(
        java.util.concurrent.ThreadLocalRandom.current().nextLong()))
    val aggs: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).as("__rows") +:
      (checks.zipWithIndex.map { case ((_, sql), i) =>
        count(when(!expr(sql) || expr(sql).isNull, lit(1)))
          .as(s"__ck$i") } ++
       trackedTyped.zipWithIndex.flatMap { case ((_, l, _), i) =>
         Seq(min(col(l)).as(s"__mn$i"), max(col(l)).as(s"__mx$i"),
           count(when(col(l).isNull, lit(1))).as(s"__nl$i")) })
    physicalize(df.observe(obs, aggs.head, aggs.tail: _*), m)
      .write.mode("overwrite").parquet(s"$outDir/$seg")
    val got = obs.get
    val bad = checks.zipWithIndex
      .map { case ((n, _), i) => n -> got(s"__ck$i").asInstanceOf[Long] }
      .filter(_._2 > 0L)
    if (bad.nonEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$outDir/$seg"))
    require(bad.isEmpty,
      s"$errHead: " +
        bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
    val st = trackedTyped.zipWithIndex.flatMap {
      case ((p, _, isLong), i) =>
        (Option(got(s"__mn$i")), Option(got(s"__mx$i"))) match {
          case (Some(mn), Some(mx)) =>
            val nulls = got(s"__nl$i").asInstanceOf[Long]
            Some(p -> (if (isLong)
              LongStat(mn.asInstanceOf[Long], mx.asInstanceOf[Long], nulls)
            else
              StrStat(mn.asInstanceOf[String], mx.asInstanceOf[String],
                nulls)))
          case _ => None // all-NULL column records no bounds
        }
    }.toMap
    (if (m.trackedCols.isEmpty) Map.empty[String, Map[String, ColStat]]
     else Map(seg -> st),
      got("__rows").asInstanceOf[Long])
  }

  /** Hive-style path-name unescape for a staged partition directory
    * value (`%xx` sequences; Spark writes them for chars illegal in
    * path names). */
  private def unescapePathValue(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Append one batch SPLIT BY the table's declared partition column
    * ([[createTable]]'s `partitionBy` / [[evolvePartitionSpec]]) — one
    * segment per distinct partition value, each recorded in the
    * manifest with its exact value and row count ([[PartVal]]). This
    * is what buys the partition dividend downstream:
    *
    *  - retention DML (`DELETE WHERE day < cutoff`) drops covered
    *    segments with ZERO data jobs ([[deleteWhere]]'s partition fast
    *    path decides per segment on the manifest alone);
    *  - selective reads prune for free — the partition value doubles
    *    as an EXACT stats entry (lo == hi, nulls == 0), so the
    *    existing stats-skipping path needs nothing new;
    *
    * and costs almost nothing upfront: ONE Spark write job for all
    * partitions (`partitionBy` on a shadow of the partition column —
    * the shadow becomes the directory key and is stripped, the real
    * column stays IN the files so reads/DML are layout-agnostic), plus
    * one small aggregation for the per-partition row counts. Staged
    * directories are MOVED into place (same filesystem, metadata-only)
    * and nothing is visible until the one manifest CAS. Other tracked
    * columns' stats are deliberately NOT computed here (that would
    * re-read what was just written); absent stats mean "always scan" —
    * advisory-bounds semantics, correct on mixed lakes.
    *
    * The NULL partition is a real partition (`PartVal.value = None`):
    * its segment is never partition-dropped by a delete predicate
    * (SQL keeps NULL-predicate rows) and never stats-pruned wrongly
    * (it records no min/max entry for the partition column).
    *
    * Returns (committed version, segments written). */
  def appendPartitioned(spark: SparkSession, outDir: String,
      df: DataFrame): (Long, Int) = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val m = readManifest(outDir)
    requireTable(m, outDir)
    val partPhys = m.partSpec.getOrElse(sys.error(
      s"lake at $outDir declares no partition column — createTable " +
        "with partitionBy or evolvePartitionSpec first")).split(",").toSeq
    val partCol = partPhys.map(p => m.logicalOf(p).getOrElse(sys.error(
      s"lake at $outDir: partition column (physical $p) was " +
        "dropped — evolvePartitionSpec to a live column first")))
    val expected = tableSchema(spark, outDir, m).fieldNames.toSeq
    require(df.columns.toSeq == expected,
      s"appendPartitioned schema mismatch: got ${df.columns.mkString(",")}" +
        s", table is ${expected.mkString(",")}")
    // Same CHECK-constraint gate as appendSegment — the contract does
    // not care how a batch is laid out. FUSED (r18) into the staging
    // counts aggregate: one action gates and counts, and a violating
    // batch still refuses BEFORE any file is written.
    val staged = stagePartitionedSegments(spark, outDir, m, df,
      partPhys, partCol, m.expects.toSeq.sortBy(_._1),
      s"appendPartitioned to $outDir violates expectation(s)")
    if (staged.isEmpty) return (m.version, 0)
    val (segs, addParts, addStats) = staged.get
    tryCommitEdit(outDir, m, Set.empty, segs, addStats,
      None, addedParts = addParts) match {
      case Some(v) => (v, segs.size)
      case None => appendPartitioned(spark, outDir, df) // re-plan
    }
  }

  /** The partition-split staging shared by [[appendPartitioned]] and
    * [[insertOverwrite]]: ONE write job splits `df` by the partition
    * column(s) into per-value segment dirs moved into place (invisible
    * until a manifest commit lists them), with per-segment
    * [[PartVal]] facts (one per dimension under a composite spec,
    * r15) and the exact-stats dividend. None = empty batch. The
    * caller owns the commit (and, on a lost CAS, deleting the staged
    * dirs). */
  private def stagePartitionedSegments(spark: SparkSession,
      outDir: String, m: Manifest, df: DataFrame, partPhys: Seq[String],
      partCol: Seq[String],
      checks: Seq[(String, String)] = Nil, errHead: String = "")
      : Option[(Seq[String], Map[String, PartVal],
        Map[String, Map[String, ColStat]])] = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, when}
    require(partPhys.nonEmpty && partPhys.size == partCol.size,
      "partition staging needs matching physical/logical column lists")
    val schema0 = tableSchema(spark, outDir, m)
    val isStr = partCol.map(c => schema0
      .fields.find(_.name == c).get.dataType ==
      org.apache.spark.sql.types.StringType)
    // per-partition row counts: one aggregation, #distinct-tuples rows
    // (bounded — a partition key IS a low-cardinality-per-batch key).
    // The caller's expectation gate rides the SAME aggregate (r18):
    // per-check violation counts are grouped partials summed driver-
    // side, so a violating batch refuses before any file is written
    // without paying a second scan action.
    val aggs = count(lit(1)) +: checks.map { case (_, sql) =>
      count(when(!expr(sql) || expr(sql).isNull, lit(1))) }
    val grouped = df.groupBy(partCol.map(col): _*)
      .agg(aggs.head, aggs.tail: _*).collect()
    val bad = checks.zipWithIndex.map { case ((n, _), i) =>
      n -> grouped.map(_.getLong(partCol.size + 1 + i)).sum }
      .filter(_._2 > 0L)
    require(bad.isEmpty,
      s"$errHead: " +
        bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
    val counts: Map[Seq[Option[String]], Long] =
      grouped.map { r =>
        partCol.indices.map(i =>
          if (r.isNullAt(i)) None else Some(r.get(i).toString)) ->
          r.getLong(partCol.size)
      }.toMap
    if (counts.isEmpty) return None
    // Hive path encoding writes the EMPTY STRING into the same
    // __HIVE_DEFAULT_PARTITION__ directory as NULL — the one value the
    // staged layout cannot round-trip. Fail loud, not ambiguous.
    require(!counts.keysIterator.exists(_.contains(Some(""))),
      s"partitioned write to $outDir: empty-string partition values " +
        "are indistinguishable from NULL in the staged layout — " +
        "normalize them (e.g. to a sentinel) before the write")
    val nonce = java.lang.Long.toHexString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong())
    // ONE write job for every partition tuple: shadow columns become
    // the (nested) staging directory keys (and are stripped from the
    // files); the real partition columns remain normal file columns.
    val stage = s"_stage_$nonce"
    val shadows = partPhys.indices.map(i => s"__gp$i")
    // the shadows reference the PHYSICAL names — physicalize just
    // renamed the frame's columns
    partPhys.zip(shadows).foldLeft(physicalize(df, m)) {
      case (acc, (p, sh)) => acc.withColumn(sh, col(p))
    }.write.partitionBy(shadows: _*).parquet(s"$outDir/$stage")
    val hiveNull = "__HIVE_DEFAULT_PARTITION__"
    def dirValue(p: java.nio.file.Path, sh: String): Option[String] = {
      val raw = p.getFileName.toString.stripPrefix(s"$sh=")
      if (raw == hiveNull) None else Some(unescapePathValue(raw))
    }
    // walk the nested __gp0=…/__gp1=…/… layout to the leaf dirs, one
    // (path, value-tuple) per partition tuple
    var leaves: Seq[(java.nio.file.Path, Seq[Option[String]])] =
      Seq((Paths.get(outDir, stage), Nil))
    shadows.foreach { sh =>
      leaves = leaves.flatMap { case (p, vs) =>
        listDir(p)
          .filter(q => Files.isDirectory(q) &&
            q.getFileName.toString.startsWith(s"$sh="))
          .sortBy(_.getFileName.toString)
          .map(q => (q, vs :+ dirValue(q, sh)))
      }
    }
    val segs = Seq.newBuilder[String]
    val addParts = Map.newBuilder[String, PartVal]
    val addStats = Map.newBuilder[String, Map[String, ColStat]]
    leaves.zipWithIndex.foreach { case ((p, values), i) =>
      val seg = f"seg_p${m.version + 1}%010d_${i}_$nonce"
      Files.move(p, Paths.get(outDir, seg))
      val rows = counts.getOrElse(values, sys.error(
        s"staged partition ${values.mkString(",")} has no counted " +
          "value — partition columns must be deterministic"))
      segs += seg
      addParts += seg -> PartVal(partPhys.head, values.head, rows,
        partPhys.tail.zip(values.tail))
      // the partition facts double as exact stats entries — free
      // file-skipping for reads and non-covering DML
      val st = partPhys.indices.flatMap { j =>
        values(j).map(v => partPhys(j) ->
          (if (isStr(j)) StrStat(v, v, 0L)
           else LongStat(v.toLong, v.toLong, 0L): ColStat))
      }.toMap
      if (st.nonEmpty) addStats += seg -> st
      writeSegmentBlooms(spark, outDir, seg, m.bloomCols)
    }
    org.apache.commons.io.FileUtils
      .deleteQuietly(Paths.get(outDir, stage).toFile)
    Some((segs.result(), addParts.result(), addStats.result()))
  }

  /** ATOMIC REPLACE (r12) — Delta's `replaceWhere` / SQL `INSERT
    * OVERWRITE`: delete every row matching `cond` AND insert `df`, as
    * ONE manifest commit — the backfill verb. A reader sees the old
    * partition or the new one, never neither, never both; a crash at
    * any point leaves the old version live and the staged files as
    * vacuum orphans.
    *
    * `cond = None` replaces the WHOLE table (plain INSERT OVERWRITE):
    * the delete side is pure metadata — every segment drops with row
    * counts from parquet footers, zero data jobs. With a predicate,
    * the delete side is [[deleteWhere]]'s full decision ladder:
    * partition-fact-covered and stats-proven segments drop by
    * metadata (the backfill of one day of a day-partitioned lake
    * moves ONLY the new day's bytes), partially-covered segments
    * rewrite copy-on-write. Incoming rows must ALL satisfy `cond`
    * (checked, one aggregate — Delta's replaceWhere constraint: the
    * statement must not smuggle rows into ranges it did not claim).
    *
    * The insert side honors the table's layout: a partition spec
    * routes through the same staged per-value split as
    * [[appendPartitioned]] (facts + exact stats recorded — retention
    * stays metadata-only on the replaced range), otherwise one
    * segment with tracked stats. Expectations gate the batch exactly
    * as appends. With cdc, the feed carries delete images for the
    * replaced rows (metadata drops ride `cdcdrop=`) and insert images
    * for the new ones — a signed-fold consumer rides through the
    * backfill.
    *
    * `dvMaxFraction > 0` applies the merge-on-read rule to the delete
    * side (r14): a PARTIALLY-covered segment keeps its files behind a
    * deletion vector instead of a minus-the-range rewrite — a backfill
    * straddling segment boundaries writes O(replaced rows), while
    * fully-covered segments still drop by metadata and the incoming
    * batch appends as before. Routed from SQL INSERT OVERWRITE by the
    * `dv.maxFraction` table property.
    *
    * Returns (version, segments rewritten, segments dropped, rows
    * deleted, rows inserted). */
  def replaceWhere(spark: SparkSession, outDir: String, df: DataFrame,
      cond: Option[org.apache.spark.sql.Column],
      cdc: Boolean = false,
      dvMaxFraction: Double = 0.0): (Long, Int, Int, Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, count, expr, lit, when}
    require(dvMaxFraction >= 0.0 && dvMaxFraction <= 1.0,
      s"dvMaxFraction must be in [0,1], got $dvMaxFraction")
    var attempt = 0
    val src = df.cache()
    try {
      while (attempt < dmlMaxAttempts) {
        attempt += 1
        val m = readManifest(outDir)
        requireTable(m, outDir)
        val expected = tableSchema(spark, outDir, m).fieldNames.toSeq
        require(src.columns.toSeq == expected,
          s"replaceWhere schema mismatch: got ${src.columns.mkString(",")}" +
            s", table is ${expected.mkString(",")}")
        // FUSED incoming-batch gate (r18): the expectation counts and
        // the outside-the-replace-predicate count are one aggregate
        // action over the cached batch, not two — failure order
        // unchanged (expectations first).
        val checks = m.expects.toSeq.sortBy(_._1)
        if (checks.nonEmpty || cond.isDefined) {
          val aggs = checks.map { case (_, sql) =>
            count(when(!expr(sql) || expr(sql).isNull, lit(1))) } ++
            cond.map(c =>
              count(when(!coalesce(c, lit(false)), lit(1)))).toSeq
          val row = src.agg(aggs.head, aggs.tail: _*).head()
          val bad = checks.zipWithIndex
            .map { case ((n, _), i) => n -> row.getLong(i) }
            .filter(_._2 > 0L)
          require(bad.isEmpty,
            s"replaceWhere to $outDir violates expectation(s): " +
              bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
          cond.foreach { _ =>
            val out = row.getLong(checks.size)
            require(out == 0L, s"replaceWhere to $outDir: $out incoming " +
              "row(s) fall outside the replace predicate — the statement " +
              "may only write rows into the range it replaces")
          }
        }
        val nonce = java.lang.Long.toHexString(
          java.util.concurrent.ThreadLocalRandom.current().nextLong())
        val e =
          if (m.segs.isEmpty)
            DeleteEdit(Set.empty, Nil, Map.empty, Map.empty, Map.empty,
              s"seg_cdc_d$nonce", cdcRows = false, Nil, 0, 0, 0L, 0)
          else planDeleteEdits(spark, outDir, m, cond, None, cdc,
            dvMaxFraction, nonce)
        var insSegs: Seq[String] = Nil
        var insStats: Map[String, Map[String, ColStat]] = Map.empty
        var insParts: Map[String, PartVal] = Map.empty
        var insRows: Map[String, Long] = Map.empty
        var inserted = 0L
        m.partSpec match {
          case Some(spec) =>
            val partPhys = spec.split(",").toSeq
            val partCol = partPhys.map(p =>
              m.logicalOf(p).getOrElse(sys.error(
                s"lake at $outDir: partition column (physical $p) " +
                  "was dropped — evolvePartitionSpec to a live column " +
                  "first")))
            stagePartitionedSegments(spark, outDir, m, src,
              partPhys, partCol).foreach { case (segs, parts, stats) =>
              insSegs = segs; insParts = parts; insStats = stats
              inserted = parts.values.map(_.rows).sum
            }
          case None =>
            // FUSED count + write + stats (r18): one observed write
            // replaces three actions over the cached batch; the
            // expectation re-check inside the fused write is inert
            // (the batch already passed the gate above)
            val seg = f"seg_r${m.version + 1}%010d_ins_$nonce"
            val (stats, n) = writeSegmentObserved(spark, outDir, m, src,
              seg, s"replaceWhere to $outDir violates expectation(s)")
            inserted = n
            if (inserted == 0L)
              org.apache.commons.io.FileUtils.deleteQuietly(
                new java.io.File(s"$outDir/$seg"))
            else {
              insSegs = Seq(seg)
              insRows = Map(seg -> n)
              if (m.trackedCols.nonEmpty) insStats = stats
              writeSegmentBlooms(spark, outDir, seg, m.bloomCols, Some(n))
            }
        }
        var cdcRows = e.cdcRows
        if (cdc && inserted > 0L) {
          physicalize(src.withColumn("_change_type", lit("insert")), m)
            .write.mode("append").parquet(s"$outDir/${e.cdcSeg}")
          cdcRows = true
        }
        if (e.isNoop && inserted == 0L) return (m.version, 0, 0, 0L, 0L)
        tryCommitEdit(outDir, m, e.removed, e.added ++ insSegs,
          e.addedStats ++ insStats, None,
          cdcSegs = if (cdcRows) Seq(e.cdcSeg) else Nil,
          dvSets = e.dvSets,
          addedParts = e.addedParts ++ insParts,
          cdcDropSegs = e.cdcDrops,
          addedRows = e.addedRows ++ insRows) match {
          case Some(v) =>
            return (v, e.rewritten, e.dropped, e.deleted, inserted)
          case None => // true conflict — re-plan against the new tip
        }
      }
    } finally src.unpersist()
    sys.error(s"replaceWhere at $outDir: $dmlMaxAttempts consecutive " +
      "true conflicts (concurrent writers rewriting the same segments) " +
      "— coordinate the writers or retry later")
  }

  /** RTAS — `CREATE OR REPLACE TABLE … AS <query>`: swap the TABLE
    * ITSELF (schema, partition layout, data) in ONE commit, keeping
    * history — the verb that rebuilds a derived table in place
    * without the DROP+CTAS window where readers see no table at all.
    * A reader sees the old table or the new one, never neither; every
    * pre-replace version still time-travels under ITS schema (time
    * travel is schema travel). The replace RESETS the table-scoped
    * declarations along with the schema they were declared against:
    * expectations, column mapping (new files carry the new logical
    * names), bloom columns, and deletion vectors all start fresh —
    * re-declare via TBLPROPERTIES after (the SQL surface does this in
    * the same statement). Change-data feeds CANNOT span a replace
    * (the old and new schemas need not be union-compatible): the
    * commit records no change data, so a cdc window crossing it
    * refuses loudly — consumers restart from the replace version,
    * exactly Delta's guidance when CDF meets REPLACE TABLE.
    *
    * A `partitionBy` column lays the new data out through the same
    * staged per-value split as [[appendPartitioned]] (facts + exact
    * stats recorded), so retention on the REBUILT table is
    * metadata-only from its first day. Returns the committed
    * version. */
  def replaceTableAs(spark: SparkSession, outDir: String, df: DataFrame,
      partitionBy: Option[String] = None): Long = {
    val m = readManifest(outDir)
    requireTable(m, outDir)
    // gate BEFORE staging (r16): commitNext would refuse anyway, but
    // only after the replacement data was fully written — a writer
    // this table has fenced out must fail before burning that IO
    gateWriter(outDir, m)
    val spec = partitionBy.map(normalizePartSpec(df.schema, _))
    val newSchemaV = math.max(m.schemaV, 1L) + 1L
    // a SYNTHETIC manifest describing the post-replace table (new
    // schema, identity mapping, declared layout, no segments yet):
    // the staging helpers read schema/colmap/version from it, so the
    // new files are written exactly as a fresh table's would be
    val synth = Manifest(m.version, m.maxB, Nil,
      schemaV = newSchemaV, schemaJson = Some(df.schema.json),
      partSpec = spec)
    var segs: Seq[String] = Nil
    var parts: Map[String, PartVal] = Map.empty
    var stats: Map[String, Map[String, ColStat]] = Map.empty
    var segRowsKnown: Map[String, Long] = Map.empty
    spec match {
      case Some(s) =>
        val cols = s.split(",").toSeq
        stagePartitionedSegments(spark, outDir, synth, df, cols, cols)
          .foreach { case (s0, p0, st0) =>
            segs = s0; parts = p0; stats = st0 }
      case None =>
        val nonce = java.lang.Long.toHexString(
          java.util.concurrent.ThreadLocalRandom.current().nextLong())
        val seg = f"seg_r${m.version + 1}%010d_rtas_$nonce"
        df.write.mode("overwrite").parquet(s"$outDir/$seg")
        // the count is in hand — carry it (r18, advisor: the commit
        // gate's fallback re-read this same footer a second time)
        val rtasRows = segmentFooterRows(outDir, seg)
        if (rtasRows > 0L) { segs = Seq(seg); segRowsKnown = Map(seg -> rtasRows) }
        else org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$outDir/$seg"))
    }
    require(commitNext(outDir, m, Manifest(m.version + 1, m.maxB, segs,
      newSchemaV, Some(df.schema.json), stats, m.txns,
      expects = Map.empty, cdcSegs = Nil, dataChange = true,
      dv = Map.empty, colmap = Map.empty, partSpec = spec,
      parts = parts, cdcDropSegs = Nil, bloomCols = Nil,
      segRows = segRowsKnown,
      // idempotence ledgers (txns above, the COPY INTO load history
      // here) SURVIVE redefinition: a replayed batch or a re-run
      // loader must stay a no-op on the replaced table too
      copied = m.copied)),
      s"REPLACE TABLE at $outDir lost a manifest race — staged files " +
        "are vacuum orphans; retry")
    m.version + 1
  }

  /** MERGE INTO (upsert), copy-on-write — the third DML verb, same
    * protocol as [[deleteWhere]]/[[updateWhere]]. Semantics are the
    * standard `WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
    * INSERT *` merge every lake format ships: a target row whose
    * `keys` match a source row is REPLACED by that source row; source
    * rows matching no target row are APPENDED as one new segment.
    *
    * Plan shape per segment: a broadcast-able semi-join counts the
    * matches (segments with none survive BY REFERENCE — a merge
    * touching one day of a year-partitioned lake rewrites one day);
    * a matching segment is rewritten via LEFT OUTER join to the
    * source, matched rows taking every source column (marker column,
    * not coalesce — a legitimately-NULL source value must still win).
    * Inserts are the source ANTI-joined against the WHOLE live table.
    * At 100 TB the source is the small side throughout, so every join
    * here broadcasts and the only large IO is rewriting touched
    * segments. Nothing is visible until the single manifest CAS; the
    * crash window and time-travel/vacuum semantics are exactly
    * deleteWhere's.
    *
    * The source must be key-unique (checked — one extra small-side
    * job): SQL MERGE raises on multiple source matches per target
    * row, and silently picking one would be nondeterministic. Source
    * columns must cover the target schema.
    *
    * `dvMaxFraction > 0` enables MERGE-ON-READ matched clauses (r14,
    * the [[updateWhere]] rule applied to the upsert): a segment whose
    * match fraction is within the threshold (and strictly partial)
    * keeps its files — the matched positions join its deletion vector
    * (superseding union) and the winning SOURCE rows append as one
    * new segment — so a sparse-match upsert feed writes O(matched
    * rows) per batch instead of rewriting every touched segment.
    * Inserts are unchanged (they were always an O(inserted rows)
    * append). CDC images are identical to the copy-on-write path's.
    *
    * Returns (committed version, segments rewritten, rows updated,
    * rows inserted); a no-op merge (no matches, empty insert set)
    * commits nothing. */
  def mergeInto(spark: SparkSession, outDir: String, source: DataFrame,
      keys: Seq[String],
      txn: Option[(String, Long)] = None,
      cdc: Boolean = false,
      dvMaxFraction: Double = 0.0): (Long, Int, Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, when}
    require(keys.nonEmpty, "MERGE with no key columns")
    require(dvMaxFraction >= 0.0 && dvMaxFraction <= 1.0,
      s"dvMaxFraction must be in [0,1], got $dvMaxFraction")
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m = readManifest(outDir)
      require(m.segs.nonEmpty, s"lake at $outDir has no committed segments")
      // Transactional idempotence (see [[appendSegment]]): a replayed
      // (appId, batchId) merge is a no-op — the guard rides the same
      // manifest CAS as the data, making foreachBatch read-modify-MERGE
      // folds EXACTLY-once under crash replay. Re-checked on every
      // re-plan: if our txn landed between attempts, stop as a replay.
      txn.foreach { case (app, id) =>
        if (m.txns.getOrElse(app, Long.MinValue) >= id)
          return (m.version, 0, 0L, 0L)
      }
      val targetCols = tableSchema(spark, outDir, m).fieldNames
      val missing = targetCols.toSet -- source.columns
      require(missing.isEmpty,
        s"MERGE source lacks target column(s): ${missing.toSeq.sorted.mkString(", ")}")
      val src = source.select(targetCols.map(col).toSeq: _*).cache()
      try {
        // FUSED SOURCE GATE (r18): the key-uniqueness check, the
        // star-merge expectation gate, and the key-range bound for
        // stats pruning were three separate aggregate actions over the
        // cached source — three Catalyst plan floors per MERGE call in
        // a foreachBatch loop. One two-level aggregate (per-key
        // partials, then a one-row rollup) answers all three:
        // max(per-key count) > 1 is the duplicate verdict (groupBy
        // treats NULL keys as equal, exactly as before), per-check
        // violation counts sum the per-key partials, and min/max over
        // the group keys ARE the row-level key bounds.
        val checks = m.expects.toSeq.sortBy(_._1)
        val keyPhys = m.physicalOf(keys.head)
        val wantRange = keys.size == 1 &&
          m.stats.values.exists(_.contains(keyPhys)) &&
          src.schema.fields.exists(f => f.name == keys.head &&
            f.dataType == org.apache.spark.sql.types.LongType)
        val gateAggs: Seq[org.apache.spark.sql.Column] =
          org.apache.spark.sql.functions.max(col("__n")).as("__dup") +:
          (checks.zipWithIndex.map { case ((_, sql), i) =>
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.sum(col(s"__ck$i")),
              lit(0L)).as(s"__ck$i") } ++
           (if (wantRange)
              Seq(org.apache.spark.sql.functions.min(col(keys.head))
                .as("__klo"),
                org.apache.spark.sql.functions.max(col(keys.head))
                  .as("__khi"))
            else Nil))
        val perKeyAggs: Seq[org.apache.spark.sql.Column] =
          count(lit(1)).as("__n") +:
          checks.zipWithIndex.map { case ((_, sql), i) =>
            import org.apache.spark.sql.functions.expr
            count(when(!expr(sql) || expr(sql).isNull, lit(1)))
              .as(s"__ck$i") }
        val gate = src.groupBy(keys.map(col): _*)
          .agg(perKeyAggs.head, perKeyAggs.tail: _*)
          .agg(gateAggs.head, gateAggs.tail: _*).head()
        require(gate.isNullAt(0) || gate.getLong(0) <= 1L,
          "MERGE source has multiple rows per key — ambiguous match")
        // Star merge writes SOURCE values and nothing else (matched
        // rows rewrite to the source row, unmatched sources insert) —
        // CHECK-constraint semantics on the merge path.
        val bad = checks.zipWithIndex
          .map { case ((n, _), i) => n -> gate.getLong(i + 1) }
          .filter(_._2 > 0L)
        require(bad.isEmpty,
          s"MERGE into $outDir would write rows violating " +
            "expectation(s): " +
            bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", "))
        val marked = src.withColumn("__matched", lit(1))
        // AUTOMATIC stats pruning (no caller hint needed — unlike
        // delete/update, MERGE's match predicate IS the key equi-join,
        // so the source's key range is a complete bound): with a single
        // BIGINT key and manifest stats on it, a segment whose recorded
        // [min,max] is disjoint from the source's key range cannot match
        // and survives by reference with zero Spark jobs. The bound
        // rode the fused gate aggregate above.
        // (stats key physical names; the source's key column is logical)
        val rangeBase = 1 + checks.size
        val srcKeyRange: Option[(String, Long, Long)] =
          if (wantRange && !gate.isNullAt(rangeBase) &&
              !gate.isNullAt(rangeBase + 1))
            Some((keyPhys, gate.getLong(rangeBase),
              gate.getLong(rangeBase + 1)))
          else None
        val tracked = m.trackedCols
        val nonce = java.lang.Long.toHexString(
          java.util.concurrent.ThreadLocalRandom.current().nextLong())
        var rewritten = 0
        var updated = 0L
        val removed = Set.newBuilder[String]
        val added = Seq.newBuilder[String]
        val addedStats = Map.newBuilder[String, Map[String, ColStat]]
        val addedRows = Map.newBuilder[String, Long]
        // Change data feed: replaced target rows as update_preimage,
        // the winning source rows as update_postimage, unmatched
        // source rows as insert — one cdc segment per MERGE.
        val cdcSeg = s"seg_cdc_m$nonce"
        var cdcRows = false
        val dvSets = Map.newBuilder[String, DvRef]
        var dvWrites = 0
        // BATCHED PLANNING (r15): metadata pruning stays per segment
        // and DRIVER-side (zero jobs); the surviving scan set counts
        // in ONE grouped-by-segment job over one DV-reconciling
        // positional read (a merge must never match or rewrite a row
        // an earlier point delete hid, and the matched positions are
        // what a merge-on-read DV write records). Before r15 this was
        // one sequential count + write job per segment — the r14
        // verdict's driver-side O(segments) ceiling. The source is
        // broadcast throughout, so every pass is one scan-stage job.
        val scanSegs = m.segs.zipWithIndex.filter { case (seg, _) =>
          !srcKeyRange.exists { case (c, lo, hi) =>
            !mayOverlap(m, seg, c, lo, hi) } }
        if (scanSegs.nonEmpty) {
          val pos = readSegmentsWithPos(spark, outDir, m,
            scanSegs.map(_._1))
          // ONE job for all counts: total live rows and matched rows
          // per segment (left outer against the key-unique source
          // preserves target cardinality)
          val perSeg = pos.join(broadcast(marked), keys, "left_outer")
            .groupBy(col("__dv_s"))
            .agg(count(lit(1)),
              count(when(col("__matched").isNotNull, lit(1))))
            .collect()
            .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
            .toMap
          def countsOf(seg: String): (Long, Long) =
            perSeg.getOrElse(seg, (0L, 0L))
          val touched = scanSegs.filter { case (seg, _) =>
            countsOf(seg)._2 > 0L }
          if (touched.nonEmpty) {
            updated = touched.map(t => countsOf(t._1)._2).sum
            // Write passes re-scope the path list to exactly the
            // segments they touch (`__dv_s` is a COMPUTED column —
            // filtering on it would not prune files).
            def posOf(segs: Seq[(String, Int)]) =
              readSegmentsWithPos(spark, outDir, m, segs.map(_._1))
            val posT = posOf(touched)
            // Matched target rows with their positions (semi-join —
            // rows in untouched segments simply don't match).
            def matchedPosOf(p: DataFrame) =
              p.join(broadcast(src), keys, "left_semi")
            // The winning source rows, one per matched TARGET row: a
            // target holding k same-key rows must yield k src-valued
            // rows — a semi-join of src against target keys would
            // emit 1, and a signed-fold consumer (the Medallion IVM
            // pattern) would drift by k-1 rows. Inner join
            // target-keys × src (src is key-unique, checked above)
            // yields exactly one src-valued row per matched target
            // row, tagged with its segment for the staged fan-out.
            // Shared by the CDC post-images and the merge-on-read
            // append, so a feed consumer cannot tell which storage
            // strategy served the merge.
            def srcWinsOf(p: DataFrame) = p
              .select((keys :+ "__dv_s").map(col).toSeq: _*)
              .join(broadcast(src), keys, "inner")
              .select((targetCols.toSeq :+ "__dv_s").map(col): _*)
            if (cdc) {
              physicalize(matchedPosOf(posT)
                .drop("__dv_f", "__dv_i", "__dv_s")
                .withColumn("_change_type", lit("update_preimage")), m)
                .write.mode("append").parquet(s"$outDir/$cdcSeg")
              physicalize(srcWinsOf(posT).drop("__dv_s")
                .withColumn("_change_type", lit("update_postimage")), m)
                .write.mode("append").parquet(s"$outDir/$cdcSeg")
              cdcRows = true
            }
            // Storage-strategy split (unchanged rules): merge-on-read
            // within the threshold and strictly partial, else rewrite.
            val (morSegs, cowSegs) = touched.partition { case (seg, _) =>
              val (total, matches) = countsOf(seg)
              dvMaxFraction > 0.0 && matches < total &&
                matches <= (total * dvMaxFraction).toLong
            }
            if (morSegs.nonEmpty) {
              // MERGE-ON-READ matched clause, batched: all matched
              // positions join their segments' DVs (superseding
              // union, the delete-DV rule) via ONE staged per-segment
              // write; the winning source rows append as one new
              // segment per source segment via a second — O(matched
              // rows) written, O(1) jobs, files untouched.
              val posM = posOf(morSegs)
              val newDel = matchedPosOf(posM)
                .select(col("__dv_s"), col("__dv_f").as("file_name"),
                  col("__dv_i").as("row_index"))
              val withOld = morSegs.map(_._1).filter(m.dv.contains)
                .foldLeft(newDel) { (acc, s) =>
                  acc.unionByName(readDv(spark,
                      Seq(s"$outDir/_dv/${m.dv(s).file}"))
                    .withColumn("__dv_s", lit(s))
                    .select(col("__dv_s"), col("file_name"),
                      col("row_index")))
                }
              val dvStage = s"$outDir/_stage_dvm_$nonce"
              val dvDirs = writeStagedBySegment(withOld, dvStage,
                onePerSeg = true)
              java.nio.file.Files.createDirectories(
                java.nio.file.Paths.get(outDir, "_dv"))
              val postStage = s"$outDir/_stage_postm_$nonce"
              val postPhys = physicalize(srcWinsOf(posM), m)
              val postDirs = writeStagedBySegment(postPhys, postStage)
              val postStats =
                if (tracked.isEmpty)
                  Map.empty[String, Map[String, ColStat]]
                else segmentStatsGrouped(
                  readStaged(spark, postStage, postPhys.schema), tracked)
              morSegs.foreach { case (seg, i) =>
                val dvName = s"dv_${nonce}_$i"
                java.nio.file.Files.move(dvDirs(seg).toPath,
                  java.nio.file.Paths.get(outDir, "_dv", dvName))
                dvSets += seg -> DvRef(dvName,
                  m.dv.get(seg).map(_.rows).getOrElse(0L) +
                    countsOf(seg)._2)
                dvWrites += 1
                val postSeg = f"seg_m${m.version + 1}%010d_${i}p_$nonce"
                java.nio.file.Files.move(postDirs(seg).toPath,
                  java.nio.file.Paths.get(outDir, postSeg))
                added += postSeg
                addedRows += postSeg -> countsOf(seg)._2
                postStats.get(seg).foreach(st =>
                  addedStats += postSeg -> st)
                writeSegmentBlooms(spark, outDir, postSeg, m.bloomCols)
              }
              org.apache.commons.io.FileUtils.deleteQuietly(
                new java.io.File(dvStage))
              org.apache.commons.io.FileUtils.deleteQuietly(
                new java.io.File(postStage))
            }
            if (cowSegs.nonEmpty) {
              // Copy-on-write rewrites, batched through ONE staged
              // per-segment write plus ONE grouped stats job, path-
              // scoped to exactly the CoW segments.
              val joined = posOf(cowSegs).as("t").join(
                broadcast(marked).as("s"), keys, "left_outer")
              // Projection preserves the target schema's column ORDER
              // so every segment in the lake stays
              // byte-layout-compatible.
              val out = joined.select(targetCols.map { c =>
                // using-join merges the key columns (left value
                // survives); non-keys exist on both sides and need
                // qualification.
                if (keys.contains(c)) col(c)
                else when(col("s.__matched").isNotNull, col(s"s.$c"))
                  .otherwise(col(s"t.$c")).as(c)
              }.toSeq :+ col("t.__dv_s").as("__dv_s"): _*)
              val cowStage = s"$outDir/_stage_cowm_$nonce"
              val outPhys = physicalize(out, m)
              val cowDirs = writeStagedBySegment(outPhys, cowStage)
              val cowStats =
                if (tracked.isEmpty)
                  Map.empty[String, Map[String, ColStat]]
                else segmentStatsGrouped(
                  readStaged(spark, cowStage, outPhys.schema), tracked)
              cowSegs.foreach { case (seg, i) =>
                val newSeg = f"seg_m${m.version + 1}%010d_${i}_$nonce"
                java.nio.file.Files.move(cowDirs(seg).toPath,
                  java.nio.file.Paths.get(outDir, newSeg))
                rewritten += 1
                removed += seg
                added += newSeg
                // a star upsert keeps every live row (updates in place)
                addedRows += newSeg -> countsOf(seg)._1
                cowStats.get(seg).foreach(st =>
                  addedStats += newSeg -> st)
                writeSegmentBlooms(spark, outDir, newSeg, m.bloomCols)
              }
              org.apache.commons.io.FileUtils.deleteQuietly(
                new java.io.File(cowStage))
            }
          }
        }
        // INSERT pass (r18, two cuts): (a) the anti-join probes only
        // the stats-SURVIVING segments — a segment whose recorded key
        // range is disjoint from the source's cannot hold any source
        // key, so it contributes nothing to the match set; a 3-row
        // upsert against a million-segment lake anti-joins 3 segments,
        // not a million. (b) count + write + stats were three actions
        // over the anti-join plan (each one re-running it); the
        // observed write is ONE, and the CDC insert images re-read the
        // just-written small segment instead of re-running the
        // anti-join against the table.
        val inserts = src.join(
          readSegments(spark, outDir, m, scanSegs.map(_._1))
            .select(keys.map(col).toSeq: _*),
          keys, "left_anti")
        val insSeg = f"seg_m${m.version + 1}%010d_ins_$nonce"
        val (insStats, inserted) = writeSegmentObserved(spark, outDir, m,
          inserts, insSeg,
          s"MERGE into $outDir would write rows violating expectation(s)")
        if (inserted == 0L)
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(s"$outDir/$insSeg"))
        else {
          added += insSeg
          addedRows += insSeg -> inserted
          if (cdc) {
            reader(spark, outDir, m).parquet(s"$outDir/$insSeg")
              .withColumn("_change_type", lit("insert"))
              .write.mode("append").parquet(s"$outDir/$cdcSeg")
            cdcRows = true
          }
          if (tracked.nonEmpty) addedStats ++= insStats.map {
            case (_, st) => insSeg -> st }
          writeSegmentBlooms(spark, outDir, insSeg, m.bloomCols,
            Some(inserted))
        }
        if (rewritten == 0 && dvWrites == 0 && inserted == 0L)
          return (m.version, 0, 0L, 0L)
        tryCommitEdit(outDir, m, removed.result(), added.result(),
          addedStats.result(), txn,
          cdcSegs = if (cdcRows) Seq(cdcSeg) else Nil,
          dvSets = dvSets.result(),
          addedRows = addedRows.result()) match {
          case Some(v) => return (v, rewritten, updated, inserted)
          case None => // true conflict — re-plan against the new tip
        }
      } finally src.unpersist()
    }
    sys.error(s"merge at $outDir: $dmlMaxAttempts consecutive true " +
      "conflicts (concurrent writers rewriting the same segments) — " +
      "coordinate the writers or retry later")
  }

  /** GENERAL MERGE (r12) — the full SQL MERGE clause set the
    * star-shape [[mergeInto]] refuses: conditional `WHEN MATCHED [AND
    * cond] THEN UPDATE SET col = expr … / DELETE` (several, first
    * match wins), `WHEN NOT MATCHED [AND cond] THEN INSERT …`
    * (explicit column lists, unassigned columns NULL), and `WHEN NOT
    * MATCHED BY SOURCE [AND cond] THEN UPDATE / DELETE`. Same
    * copy-on-write protocol as every DML verb: nothing is visible
    * until one manifest CAS, optimistic retry on conflict, txn
    * idempotence, CDC images when asked.
    *
    * Plan shape per segment: LEFT OUTER join target×broadcast(source)
    * on the equi-keys, one `when`-chain computes WHICH clause fires
    * per row (a codegen'd scalar — no per-clause passes), one
    * aggregate decides if the segment changes at all. A segment where
    * NO clause fires survives BY REFERENCE — so a merge whose clauses
    * touch one day of a year-partitioned lake rewrites one day, and
    * single-key manifest stats prune segments disjoint from the
    * source's key range with ZERO data jobs (matched-side clauses
    * only). `WHEN NOT MATCHED BY SOURCE` is the exception by nature:
    * any segment may hold source-less rows, so every segment must be
    * examined (one aggregate each) — the same inherent O(table) cost
    * Delta documents for the clause; segments where the NMBS
    * condition fires nowhere still survive by reference.
    *
    * At 100 TB the source is the small side throughout: every join
    * broadcasts, the only large IO is rewriting segments where a
    * clause actually fired. The source must be key-unique when any
    * matched-side clause exists (multiple source matches per target
    * row is the SQL MERGE cardinality error).
    *
    * `dvMaxFraction > 0` enables MERGE-ON-READ fired clauses (r14,
    * the [[updateWhere]]/[[mergeInto]] rule): a segment whose FIRED
    * fraction (update- plus delete-firing rows) is within the
    * threshold and strictly partial keeps its files — fired positions
    * join its deletion vector, and the update-firing rows' POST-IMAGE
    * values append as one new segment (delete-firing rows need only
    * the DV). Write cost O(fired rows); CDC identical to
    * copy-on-write's.
    *
    * Returns (version, segments rewritten, rows updated, rows
    * deleted, rows inserted); fires-nothing merges commit nothing. */
  def mergeClauses(spark: SparkSession, outDir: String,
      source: DataFrame, keys: Seq[String],
      matched: Seq[MergeClause] = Nil,
      notMatched: Seq[MergeClause.Insert] = Nil,
      notMatchedBySource: Seq[MergeClause] = Nil,
      txn: Option[(String, Long)] = None,
      cdc: Boolean = false,
      dvMaxFraction: Double = 0.0,
      schemaEvolution: Boolean = false): (Long, Int, Long, Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, coalesce, col, collect_set, count, expr, lit, struct, sum, when}
    require(keys.nonEmpty, "MERGE with no key columns")
    require(dvMaxFraction >= 0.0 && dvMaxFraction <= 1.0,
      s"dvMaxFraction must be in [0,1], got $dvMaxFraction")
    require(matched.nonEmpty || notMatched.nonEmpty ||
      notMatchedBySource.nonEmpty, "MERGE with no WHEN clauses")
    require(!matched.exists(_.isInstanceOf[MergeClause.Insert]),
      "WHEN MATCHED takes UPDATE or DELETE, not INSERT")
    require(!notMatchedBySource.exists(_.isInstanceOf[MergeClause.Insert]),
      "WHEN NOT MATCHED BY SOURCE takes UPDATE or DELETE, not INSERT")
    require(!notMatchedBySource.exists {
      case MergeClause.Update(_, None) => true; case _ => false },
      "WHEN NOT MATCHED BY SOURCE UPDATE needs an explicit SET " +
        "(there is no source row to star-copy from)")
    val needsStar =
      matched.exists { case MergeClause.Update(_, None) => true
        case _ => false } ||
      notMatched.exists(_.values.isEmpty)
    var attempt = 0
    while (attempt < dmlMaxAttempts) {
      attempt += 1
      val m0 = readManifest(outDir)
      txn.foreach { case (app, id) =>
        if (m0.txns.getOrElse(app, Long.MinValue) >= id)
          return (m0.version, 0, 0L, 0L, 0L)
      }
      val schema0 = tableSchema(spark, outDir, m0)
      // MERGE WITH SCHEMA EVOLUTION (r15): source-only columns are
      // auto-added (nullable) to the target schema — the widened
      // schema rides the SAME manifest CAS as the merged rows (no
      // committed-data/stale-schema window), old segments surface the
      // added columns as NULL through the applied-schema read, and
      // under an ACTIVE column mapping each added column mints a
      // FRESH physical name (the evolveAddColumn rule: a re-added
      // name must never resurrect dropped bytes). The whole merge
      // body plans against the widened view `m`; the CAS is taken
      // against the pre-evolution base `m0` so a racing schema change
      // stays a true conflict.
      val evolveCols =
        if (!schemaEvolution) Nil
        else source.schema.fields.toSeq
          .filterNot(f => schema0.fieldNames
            .exists(_.equalsIgnoreCase(f.name)))
          .map(f => f.copy(nullable = true))
      val schema = evolveCols.foldLeft(schema0)(_ add _)
      val m =
        if (evolveCols.isEmpty) m0
        else m0.copy(
          schemaV = m0.schemaV + 1,
          schemaJson = Some(schema.json),
          colmap =
            if (m0.colmap.isEmpty) m0.colmap
            else m0.colmap ++ evolveCols.map(f =>
              f.name -> mintPhysical(spark, outDir, m0, f.name)))
      val newSchema =
        if (evolveCols.isEmpty) None
        else Some((m.schemaV, schema.json, m.colmap))
      val targetCols = schema.fieldNames.toSeq
      val checks = m.expects.toSeq.sortBy(_._1)
      require(keys.forall(targetCols.contains),
        s"MERGE key(s) not in target schema: " +
          keys.filterNot(targetCols.contains).mkString(", "))
      if (needsStar) {
        val missing = targetCols.toSet -- source.columns
        require(missing.isEmpty, "MERGE star clause needs source " +
          s"column(s): ${missing.toSeq.sorted.mkString(", ")}")
      }
      val src = source.cache()
      try {
        // FUSED dup-check + key-range bound (r18): previously two
        // separate aggregate actions over the cached source — one
        // two-level aggregate (per-key counts, then a one-row rollup
        // of max(count) and min/max over the group keys) answers
        // both. groupBy treats NULL keys as equal, exactly as the
        // pre-fusion duplicate check did. Single-key stats pruning
        // stays matched-side-only (see [[mergeInto]] — NMBS clauses
        // can fire on any segment, so pruning is off the moment one
        // exists).
        val keyPhys = m.physicalOf(keys.head)
        // matched.nonEmpty gates the range too (r18): only the census
        // consumes it, and an insert-only merge runs no census — the
        // pre-r18 shape paid a whole segmentStats action for a bound
        // nothing read
        val wantRange = matched.nonEmpty &&
          notMatchedBySource.isEmpty && keys.size == 1 &&
          m.stats.values.exists(_.contains(keyPhys)) &&
          src.schema.fields.exists(f => f.name == keys.head &&
            f.dataType == org.apache.spark.sql.types.LongType)
        val srcKeyRange: Option[(String, Long, Long)] =
          if (matched.nonEmpty || wantRange) {
            import org.apache.spark.sql.functions.{max, min}
            val rollup = max(col("__n")).as("__dup") +:
              (if (wantRange)
                 Seq(min(col(keys.head)).as("__klo"),
                   max(col(keys.head)).as("__khi"))
               else Nil)
            val gate = src.groupBy(keys.map(col): _*)
              .agg(count(lit(1)).as("__n"))
              .agg(rollup.head, rollup.tail: _*).head()
            require(!matched.nonEmpty || gate.isNullAt(0) ||
              gate.getLong(0) <= 1L,
              "MERGE source has multiple rows per key — ambiguous match")
            if (wantRange && !gate.isNullAt(1) && !gate.isNullAt(2))
              Some((keyPhys, gate.getLong(1), gate.getLong(2)))
            else None
          } else None
        val tracked = m.trackedCols
        val nonce = java.lang.Long.toHexString(
          java.util.concurrent.ThreadLocalRandom.current().nextLong())
        val cdcSeg = s"seg_cdc_g$nonce"
        var cdcRows = false
        // Clause indices: matched-side clauses 0..n-1, NMBS 100+i —
        // one when-chain in list order IS first-match-wins
        val srcM = src.withColumn("__m", lit(1))
        val isM = col("s.__m").isNotNull
        def condOf(c: Option[String]) = c.map(expr).getOrElse(lit(true))
        val whens: Seq[(org.apache.spark.sql.Column, Int)] =
          matched.zipWithIndex.map { case (cl, i) =>
            (isM && condOf(cl.cond), i) } ++
          notMatchedBySource.zipWithIndex.map { case (cl, i) =>
            (!isM && condOf(cl.cond), 100 + i) }
        val clauseIdx = whens.headOption.map { case (c0, i0) =>
          whens.tail.foldLeft(when(c0, lit(i0))) {
            case (acc, (c, i)) => acc.when(c, lit(i))
          }.otherwise(lit(-1))
        }.getOrElse(lit(-1))
        val allRw: Seq[(MergeClause, Int)] =
          matched.zipWithIndex ++
          notMatchedBySource.zipWithIndex.map { case (c, i) => (c, 100 + i) }
        val updIdx = allRw.collect {
          case (MergeClause.Update(_, _), i) => i }
        val delIdx = allRw.collect {
          case (MergeClause.Delete(_), i) => i }
        def inIdx(c: org.apache.spark.sql.Column, idx: Seq[Int]) =
          if (idx.isEmpty) lit(false) else c.isin(idx.map(Integer.valueOf): _*)
        // Rewritten value of target column c under the firing clause
        // (one nested when per column — stays in codegen)
        def newVal(c: String): org.apache.spark.sql.Column = {
          val f = schema(c)
          allRw.foldRight(col(s"t.$c")) {
            case ((MergeClause.Update(_, set), i), els) =>
              val sql = set.map(_.toMap.getOrElse(c, s"t.$c"))
                .getOrElse(s"s.$c")
              when(col("__mc") === i, expr(sql)).otherwise(els)
            case (_, els) => els
          }.cast(f.dataType).as(c)
        }
        var rewritten = 0
        var updated = 0L
        var deleted = 0L
        val removed = Set.newBuilder[String]
        val added = Seq.newBuilder[String]
        val addedStats = Map.newBuilder[String, Map[String, ColStat]]
        val addedRows = Map.newBuilder[String, Long]
        val dvSets = Map.newBuilder[String, DvRef]
        var dvWrites = 0
        // Some(⋯) once a census pass has OBSERVED every possible match
        // (scanned segments + stats-disproved ones): the insert side
        // then needs no second corpus scan. None = no census ran
        // (insert-only merge) → the insert side scans as before.
        var matchedKeys: Option[Seq[Row]] = None
        if (matched.nonEmpty || notMatchedBySource.nonEmpty) {
          // BATCHED PLANNING (r15): stats pruning stays DRIVER-side;
          // the surviving scan set joins the broadcast source ONCE and
          // ONE grouped aggregate decides every segment — total live
          // rows, update/delete fire counts PLUS per-expectation
          // violation counts over the UPDATE post-image
          // (CHECK-constraint semantics on the merge path, folded into
          // the pass the count pays anyway — delete-firing and no-fire
          // rows are exempt: deletes write no values, pass-through
          // rows are not re-judged under NOT VALID registration).
          // Hidden rows neither match nor resurrect (DV-reconciling
          // positional read), and the fired positions are what a
          // merge-on-read DV records. Before r15 this was one
          // sequential join + aggregate + write job per segment.
          val scanSegs = m.segs.zipWithIndex.filter { case (seg, _) =>
            !srcKeyRange.exists { case (c, lo, hi) =>
              !mayOverlap(m, seg, c, lo, hi) } }
          if (scanSegs.isEmpty)
            // every segment stats-disproved the source key range ⇒
            // provably zero matches — the insert side knows it too
            matchedKeys = Some(Nil)
          if (scanSegs.nonEmpty) {
            val pos = readSegmentsWithPos(spark, outDir, m,
              scanSegs.map(_._1))
            val joinCond = keys.map(k =>
              col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
            // Write passes re-scope the path list to exactly the
            // segments they touch (`__dv_s` is a COMPUTED column —
            // filtering on it would not prune files).
            def stagedOf(p: DataFrame) = p.as("t")
              .join(broadcast(srcM).as("s"), joinCond, "left_outer")
              .withColumn("__mc", clauseIdx)
            def posOf(segs: Seq[(String, Int)]) =
              readSegmentsWithPos(spark, outDir, m, segs.map(_._1))
            def post = stagedOf(pos).select(col("__dv_s") +:
              col("__mc") +: isM.as("__isM") +:
              struct(keys.map(k => col(s"t.$k")): _*).as("__k") +:
              targetCols.map(c => newVal(c)): _*)
            // the census ALSO collects the MATCHED source keys (r17):
            // the insert side then anti-joins source×keys instead of
            // re-scanning every segment's key column — one full-corpus
            // pass per MERGE saved, and the insert census plans over
            // two broadcast-small relations instead of the whole
            // table. Bounded by construction: distinct matched keys ≤
            // source keys, and the source is the broadcast-small side
            // of every MERGE. Collected via the target-side values
            // (== the source keys wherever a match fired).
            //
            // The keys are deduplicated GLOBALLY before they reach the
            // driver (r18, advisor: the r17 shape shipped one
            // collect_set PER __dv_s group, so a key matching in many
            // segments reached the driver once per segment — up to
            // |source| × |segments| rows). The per-segment aggregate
            // is persisted (it is segments-sized), the counts collect
            // WITHOUT the key sets, and one distributed
            // explode+distinct over the cached rows ships each key
            // exactly once.
            val cntAggs = Seq(
              count(lit(1)),
              coalesce(sum(when(inIdx(col("__mc"), updIdx), 1L)
                .otherwise(0L)), lit(0L)),
              coalesce(sum(when(inIdx(col("__mc"), delIdx), 1L)
                .otherwise(0L)), lit(0L))) ++
              checks.map { case (_, sql) =>
                coalesce(sum(when(inIdx(col("__mc"), updIdx) &&
                  !coalesce(expr(sql), lit(false)), 1L)
                  .otherwise(0L)), lit(0L)) } :+
              collect_set(when(col("__isM"), col("__k"))).as("__mk")
            val perSegAgg = post.groupBy(col("__dv_s"))
              .agg(cntAggs.head, cntAggs.tail: _*).persist()
            val perSeg = try {
              val counts = perSegAgg.drop("__mk")
                .collect().map(r => r.getString(0) -> r).toMap
              matchedKeys = Some(perSegAgg
                .select(org.apache.spark.sql.functions
                  .explode(col("__mk")).as("__k"))
                .distinct().collect().map(_.getStruct(0)).toSeq)
              counts
            } finally perSegAgg.unpersist()
            def firesOf(seg: String): (Long, Long, Long) =
              perSeg.get(seg).map(r =>
                (r.getLong(1), r.getLong(2), r.getLong(3)))
                .getOrElse((0L, 0L, 0L))
            val touched = scanSegs.filter { case (seg, _) =>
              val (_, nUpd, nDel) = firesOf(seg); nUpd > 0L || nDel > 0L }
            if (touched.nonEmpty) {
              // CHECK gate over the WHOLE statement, before any write
              val bad = checks.zipWithIndex.map { case ((n, _), j) =>
                n -> perSeg.valuesIterator.map(_.getLong(j + 4)).sum }
                .filter(_._2 > 0L)
              require(bad.isEmpty,
                s"MERGE into $outDir would write rows violating " +
                  "expectation(s): " +
                  bad.map { case (n, c) => s"$n ($c rows)" }
                    .mkString(", "))
              val sumUpd = touched.map(t => firesOf(t._1)._2).sum
              val sumDel = touched.map(t => firesOf(t._1)._3).sum
              updated += sumUpd
              deleted += sumDel
              val tCols = targetCols.map(c => col(s"t.$c").as(c))
              def stagedT = stagedOf(posOf(touched))
              if (cdc) {
                if (sumUpd > 0L) {
                  physicalize(stagedT.filter(inIdx(col("__mc"), updIdx))
                    .select(tCols: _*)
                    .withColumn("_change_type", lit("update_preimage")), m)
                    .write.mode("append").parquet(s"$outDir/$cdcSeg")
                  physicalize(stagedT.filter(inIdx(col("__mc"), updIdx))
                    .select(targetCols.map(newVal): _*)
                    .withColumn("_change_type", lit("update_postimage")), m)
                    .write.mode("append").parquet(s"$outDir/$cdcSeg")
                }
                if (sumDel > 0L)
                  physicalize(stagedT.filter(inIdx(col("__mc"), delIdx))
                    .select(tCols: _*)
                    .withColumn("_change_type", lit("delete")), m)
                    .write.mode("append").parquet(s"$outDir/$cdcSeg")
                cdcRows = true
              }
              // Storage-strategy split on the FIRED fraction
              // (update- plus delete-firing rows; unchanged rules).
              val (morSegs, cowSegs) = touched.partition { case (seg, _) =>
                val (total, nUpd, nDel) = firesOf(seg)
                val fired = nUpd + nDel
                dvMaxFraction > 0.0 && fired < total &&
                  fired <= (total * dvMaxFraction).toLong
              }
              if (morSegs.nonEmpty) {
                // MERGE-ON-READ fired clauses, batched: every fired
                // position joins its segment's DV (superseding union)
                // via ONE staged per-segment write; only the
                // update-firing rows carry values forward, as one
                // appended post-image segment per source segment via a
                // second. O(fired rows) written, O(1) jobs, files
                // untouched.
                val newDel = stagedOf(posOf(morSegs))
                  .filter(inIdx(col("__mc"), updIdx) ||
                    inIdx(col("__mc"), delIdx))
                  .select(col("__dv_s"), col("__dv_f").as("file_name"),
                    col("__dv_i").as("row_index"))
                val withOld = morSegs.map(_._1).filter(m.dv.contains)
                  .foldLeft(newDel) { (acc, s) =>
                    acc.unionByName(readDv(spark,
                      Seq(s"$outDir/_dv/${m.dv(s).file}"))
                      .withColumn("__dv_s", lit(s))
                      .select(col("__dv_s"), col("file_name"),
                        col("row_index")))
                  }
                val dvStage = s"$outDir/_stage_dvg_$nonce"
                val dvDirs = writeStagedBySegment(withOld, dvStage,
                  onePerSeg = true)
                java.nio.file.Files.createDirectories(
                  java.nio.file.Paths.get(outDir, "_dv"))
                morSegs.foreach { case (seg, si) =>
                  val (_, nUpd, nDel) = firesOf(seg)
                  val dvName = s"dv_${nonce}_$si"
                  java.nio.file.Files.move(dvDirs(seg).toPath,
                    java.nio.file.Paths.get(outDir, "_dv", dvName))
                  dvSets += seg -> DvRef(dvName,
                    m.dv.get(seg).map(_.rows).getOrElse(0L) +
                      nUpd + nDel)
                  dvWrites += 1
                }
                org.apache.commons.io.FileUtils.deleteQuietly(
                  new java.io.File(dvStage))
                val morUpd = morSegs.filter(t => firesOf(t._1)._2 > 0L)
                if (morUpd.nonEmpty) {
                  val postStage = s"$outDir/_stage_postg_$nonce"
                  val postPhys = physicalize(stagedOf(posOf(morUpd))
                    .filter(inIdx(col("__mc"), updIdx))
                    .select(col("__dv_s") +:
                      targetCols.map(newVal): _*), m)
                  val postDirs = writeStagedBySegment(postPhys, postStage)
                  val postStats =
                    if (tracked.isEmpty)
                      Map.empty[String, Map[String, ColStat]]
                    else segmentStatsGrouped(
                      readStaged(spark, postStage, postPhys.schema),
                      tracked)
                  morUpd.foreach { case (seg, si) =>
                    val postSeg =
                      f"seg_g${m.version + 1}%010d_${si}p_$nonce"
                    java.nio.file.Files.move(postDirs(seg).toPath,
                      java.nio.file.Paths.get(outDir, postSeg))
                    added += postSeg
                    addedRows += postSeg -> firesOf(seg)._2
                    postStats.get(seg).foreach(st =>
                      addedStats += postSeg -> st)
                    writeSegmentBlooms(spark, outDir, postSeg,
                      m.bloomCols)
                  }
                  org.apache.commons.io.FileUtils.deleteQuietly(
                    new java.io.File(postStage))
                }
              }
              if (cowSegs.nonEmpty) {
                // Copy-on-write rewrites, batched through ONE staged
                // per-segment write plus ONE grouped stats job, path-
                // scoped to exactly the CoW segments.
                val out = stagedOf(posOf(cowSegs))
                  .filter(!inIdx(col("__mc"), delIdx))
                  .select(col("__dv_s") +: targetCols.map(newVal): _*)
                val cowStage = s"$outDir/_stage_cowg_$nonce"
                val outPhys = physicalize(out, m)
                val cowDirs = writeStagedBySegment(outPhys, cowStage)
                val cowStats =
                  if (tracked.isEmpty)
                    Map.empty[String, Map[String, ColStat]]
                  else segmentStatsGrouped(
                    readStaged(spark, cowStage, outPhys.schema), tracked)
                cowSegs.foreach { case (seg, si) =>
                  cowDirs.get(seg) match {
                    case Some(d) =>
                      val newSeg =
                        f"seg_g${m.version + 1}%010d_${si}_$nonce"
                      java.nio.file.Files.move(d.toPath,
                        java.nio.file.Paths.get(outDir, newSeg))
                      rewritten += 1
                      removed += seg
                      added += newSeg
                      // the rewrite keeps the non-delete-firing rows
                      addedRows += newSeg ->
                        (firesOf(seg)._1 - firesOf(seg)._3)
                      cowStats.get(seg).foreach(st =>
                        addedStats += newSeg -> st)
                      writeSegmentBlooms(spark, outDir, newSeg,
                        m.bloomCols)
                    case None =>
                      // every row fired DELETE: the rewrite is empty —
                      // the staged write produced no directory, so the
                      // segment simply drops by metadata (counted as a
                      // rewrite: its content WAS rewritten, to zero)
                      rewritten += 1
                      removed += seg
                  }
                }
                org.apache.commons.io.FileUtils.deleteQuietly(
                  new java.io.File(cowStage))
              }
            }
          }
        }
        var inserted = 0L
        if (notMatched.nonEmpty) {
          // insert candidates = source rows with no target match. When
          // a census pass ran it already observed every matched key
          // (r17), so anti-join the source against THAT driver-bounded
          // set — broadcast-small × broadcast-small — instead of
          // re-scanning every segment's key column: one full-corpus
          // pass per MERGE gone, and the insert census's Catalyst plan
          // collapses to two local relations (the per-action plan
          // floor this query's QueryProbe profile is made of).
          // NULL-keyed source rows behave identically on both routes:
          // NULL never equals, so they stay insert candidates.
          val anti = matchedKeys match {
            case Some(Nil) => src.as("s")
            case Some(mk) =>
              val keySchema = org.apache.spark.sql.types.StructType(
                keys.map(k => schema(schema.fieldIndex(k))))
              val mkDf = spark.createDataFrame(
                new java.util.ArrayList[Row](mk.asJava), keySchema)
              src.join(broadcast(mkDf), keys, "left_anti").as("s")
            case None => src.join(
              readSegments(spark, outDir, m, m.segs)
                .select(keys.map(col).toSeq: _*),
              keys, "left_anti").as("s")
          }
          val insWhens = notMatched.zipWithIndex.map { case (cl, i) =>
            (condOf(cl.cond), i) }
          val insIdx = insWhens.tail.foldLeft(
            when(insWhens.head._1, lit(insWhens.head._2))) {
            case (acc, (c, i)) => acc.when(c, lit(i))
          }.otherwise(lit(-1))
          def insVal(c: String): org.apache.spark.sql.Column = {
            val f = schema(c)
            notMatched.zipWithIndex.foldRight(
              lit(null).cast(f.dataType): org.apache.spark.sql.Column) {
              case ((MergeClause.Insert(_, values), i), els) =>
                val v = values.map(_.toMap.get(c)
                  .map(expr).getOrElse(lit(null).cast(f.dataType)))
                  .getOrElse(col(s"s.$c"))
                when(col("__mc") === i, v).otherwise(els)
            }.cast(f.dataType).as(c)
          }
          def fired = anti.withColumn("__mc", insIdx)
            .filter(col("__mc") =!= -1)
          // FUSED count + CHECK gate + write + stats (r18): the
          // insert post-image previously paid one aggregate action
          // (count + per-check counts), one write, and one stats
          // re-read — three plans over the same anti-join. The
          // observed write is ONE action; a violating statement
          // deletes the never-manifest-visible directory and refuses
          // with the same per-check counts, and the CDC insert images
          // re-read the just-written small segment instead of
          // re-running the anti-join.
          val insPost = fired.select(col("__mc") +:
            targetCols.map(c => insVal(c)): _*)
          val insSeg = f"seg_g${m.version + 1}%010d_ins_$nonce"
          val (insStats, insN) = writeSegmentObserved(spark, outDir, m,
            insPost.drop("__mc"), insSeg,
            s"MERGE into $outDir would insert rows violating " +
              "expectation(s)")
          inserted = insN
          if (inserted == 0L)
            org.apache.commons.io.FileUtils.deleteQuietly(
              new java.io.File(s"$outDir/$insSeg"))
          else {
            added += insSeg
            addedRows += insSeg -> inserted
            if (cdc) {
              reader(spark, outDir, m).parquet(s"$outDir/$insSeg")
                .withColumn("_change_type", lit("insert"))
                .write.mode("append").parquet(s"$outDir/$cdcSeg")
              cdcRows = true
            }
            if (tracked.nonEmpty) addedStats ++= insStats
            writeSegmentBlooms(spark, outDir, insSeg, m.bloomCols,
              Some(inserted))
          }
        }
        // a fires-nothing merge commits nothing — including the
        // schema evolution (no rows would carry the new columns)
        if (rewritten == 0 && dvWrites == 0 && inserted == 0L)
          return (m0.version, 0, 0L, 0L, 0L)
        tryCommitEdit(outDir, m0, removed.result(), added.result(),
          addedStats.result(), txn,
          cdcSegs = if (cdcRows) Seq(cdcSeg) else Nil,
          dvSets = dvSets.result(),
          newSchema = newSchema,
          addedRows = addedRows.result()) match {
          case Some(v) => return (v, rewritten, updated, deleted, inserted)
          case None => // true conflict — re-plan against the new tip
        }
      } finally src.unpersist()
    }
    sys.error(s"merge at $outDir: $dmlMaxAttempts consecutive true " +
      "conflicts (concurrent writers rewriting the same segments) — " +
      "coordinate the writers or retry later")
  }

  /** Start the ingest-with-maintenance stream. Every `compactEvery`
    * batches, live b-segments are compacted into `targetFiles` files.
    * `beforeMaintenanceCommit` is the crash-injection seam: it runs
    * AFTER the compacted segment is fully written and BEFORE the
    * manifest commit that makes it live — the exact window the
    * manifest protocol must survive. */
  def startCompactingIngest(
      df: DataFrame, outDir: String, checkpointDir: String,
      compactEvery: Int = 4, targetFiles: Int = 2,
      beforeMaintenanceCommit: Long => Unit = _ => (),
      statsCols: Seq[String] = Nil): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val seg = s"seg_b$batchId"
        // mW only keys the write's column names (the mapping changes
        // via rare DDL, never mid-batch); the commit loop below reads
        // its own fresh tips
        val mW = readManifest(outDir)
        val batchPhys = physicalize(batch, mW)
        batchPhys.write.mode("overwrite").parquet(s"$outDir/$seg")
        // Per-batch stats from the just-written segment (statsCols
        // names the BIGINT columns to track, e.g. the event-time
        // epoch — time-ordered micro-batches each cover a narrow
        // range, exactly the layout that makes pruning effective).
        // Stats key PHYSICAL names (they follow the bytes).
        val bstats =
          if (statsCols.isEmpty) Map.empty[String, ColStat]
          else segmentStats(
            spark.read.schema(batchPhys.schema)
              .parquet(s"$outDir/$seg"),
            statsCols.map(mW.physicalOf))
        writeSegmentBlooms(spark, outDir, seg, mW.bloomCols)
        // ingest commit loop: retry on version race (replay in practice)
        var done = false
        while (!done) {
          val m = readManifest(outDir)
          done =
            if (m.segs.contains(seg)) true // replayed, already live
            else if (batchId <= m.maxB) {
              // replayed AND already compacted away: re-adding would
              // duplicate rows the c-segment holds — drop the orphan
              org.apache.commons.io.FileUtils.deleteQuietly(
                new java.io.File(s"$outDir/$seg"))
              true
            } else commitEditRecord(outDir, m,
              // copy, not positional construction: cumulative state
              // (dv, schema, txns) rides through; per-version
              // annotations reset (see addExpectation's note)
              m.copy(version = m.version + 1, maxB = batchId,
                segs = m.segs :+ seg,
                stats =
                  if (bstats.isEmpty) m.stats else m.stats + (seg -> bstats),
                cdcSegs = Nil, cdcDropSegs = Nil, dataChange = true),
              Set.empty, Seq(seg),
              if (bstats.isEmpty) Map.empty else Map(seg -> bstats))
        }
        if (batchId % compactEvery == (compactEvery - 1)) {
          val m = readManifest(outDir)
          val bsegs = m.segs.filter(_.startsWith("seg_b"))
          if (bsegs.size > 1) {
            val cseg = s"seg_c$batchId"
            // DV-reconciling read: a b-segment that took a point delete
            // between ingest and compaction must not resurrect its rows
            val csegPhys = physicalize(
              readSegments(spark, outDir, m, bsegs)
                .repartition(targetFiles), m)
            csegPhys.write.mode("overwrite").parquet(s"$outDir/$cseg")
            val cstats =
              if (statsCols.isEmpty) Map.empty[String, ColStat]
              else segmentStats(
                spark.read.schema(csegPhys.schema)
                  .parquet(s"$outDir/$cseg"),
                statsCols.map(m.physicalOf))
            writeSegmentBlooms(spark, outDir, cseg, m.bloomCols)
            beforeMaintenanceCommit(batchId)
            if (commitEditRecord(outDir, m,
                m.copy(version = m.version + 1,
                  segs = m.segs.filterNot(bsegs.contains) :+ cseg,
                  stats = (if (cstats.isEmpty) m.stats
                    else m.stats + (cseg -> cstats)) -- bsegs,
                  cdcSegs = Nil, cdcDropSegs = Nil, dataChange = false,
                  dv = m.dv -- bsegs),
                bsegs.toSet, Seq(cseg),
                if (cstats.isEmpty) Map.empty else Map(cseg -> cstats))) {
              // now-orphaned inputs: invisible to every reader; removal
              // is best-effort hygiene, crash-safe to skip
              bsegs.foreach { s =>
                org.apache.commons.io.FileUtils.deleteQuietly(
                  new java.io.File(s"$outDir/$s"))
              }
            }
            // commit=false ⇒ someone already advanced v (replay race):
            // the segment stays orphaned and harmless
          }
        }
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
