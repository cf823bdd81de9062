package graft.plans

import graft.streaming.{LakeCatalog, LakeSink}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** MAINTENANCE DDL for lake tables — the three statements Spark's
  * grammar does not have (`VACUUM`, `OPTIMIZE`, `DESCRIBE HISTORY`,
  * the Delta surface), added via `injectParser`: a THIN delegating
  * parser that claims exactly these statement shapes when the target
  * is a [[LakeCatalog]]-registered lake and hands EVERYTHING else —
  * including these verbs over unregistered names — to the delegate
  * untouched. This is deliberately not an ANTLR grammar: three
  * anchored regexes over whole statements cannot interfere with any
  * SQL the delegate accepts, which is the safety property a parser
  * extension must prove.
  *
  *   VACUUM t [RETAIN <n> VERSIONS]         → [[LakeSink.vacuum]]
  *   OPTIMIZE t                              → [[LakeSink.compact]]
  *   OPTIMIZE t CLUSTER BY (a[, b …])        → clustered compaction
  *   OPTIMIZE t ZORDER BY (a, b)             → Z-order compaction
  *   DESCRIBE HISTORY t                      → [[LakeSink.history]]
  *   DESCRIBE DETAIL t                       → [[LakeSink.tableDetail]]
  *   RESTORE TABLE t TO VERSION AS OF n      → [[LakeSink.restoreTable]]
  *   CREATE TABLE c SHALLOW CLONE t …        → [[LakeSink.cloneTable]]
  *   CREATE TABLE t USING graft_lake … AS q  → CTAS ([[LakeCtasCommand]])
  *   CREATE OR REPLACE TABLE t … AS q        → RTAS ([[LakeSink.replaceTableAs]])
  *   ANALYZE TABLE t COMPUTE STATISTICS
  *     FOR COLUMNS a, b                      → [[LakeSink.analyzeTable]]
  *   COPY INTO t FROM '<dir>'                → [[LakeSink.copyInto]]
  *   EXPORT TABLE t [VERSION AS OF n]
  *     TO '<dir>' [PARTITIONED BY (a[, b …])]
  *     [SINCE VERSION a]                      → [[LakeSink.exportTable]]
  *   SELECT … FROM l a ASOF [LEFT] JOIN r b
  *     ON a.k = b.k AND a.t {>=|>} b.t
  *     [TOLERANCE n [unit]] …                 → [[graft.operators.AsofJoin]]
  */
object LakeMaintenanceSql {

  private val Vacuum =
    """(?is)^\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$""".r
  private val VacuumHours =
    """(?is)^\s*VACUUM\s+([\w.]+)\s+RETAIN\s+(\d+)\s+HOURS\s*;?\s*$""".r
  private val Optimize =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s*;?\s*$""".r
  private val OptimizeCluster =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s+CLUSTER\s+BY\s*\(([^)]+)\)\s*;?\s*$""".r
  private val OptimizeZorder =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s+ZORDER\s+BY\s*\(\s*([\w]+)\s*,\s*([\w]+)\s*\)\s*;?\s*$""".r
  private val History =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+([\w.]+)\s*;?\s*$""".r
  private val Detail =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+([\w.]+)\s*;?\s*$""".r
  private val OptimizePerPartition =
    """(?is)^\s*OPTIMIZE\s+([\w.]+)\s+PER\s+PARTITION\s*;?\s*$""".r
  // REORG … APPLY (PURGE) (r14): incremental deletion-vector purge —
  // rewrite ONLY DV'd segments, Delta's REORG TABLE verb.
  private val ReorgPurge =
    """(?is)^\s*REORG\s+TABLE\s+([\w.]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$""".r
  // COPY INTO (r15): Delta's idempotent landing-zone load —
  // re-running skips files the manifest ledger already carries.
  private val CopyInto =
    ("""(?is)^\s*COPY\s+INTO\s+([\w.]+)\s+FROM\s+'([^']+)'""" +
      """(?:\s+FILEFORMAT\s*=\s*PARQUET)?\s*;?\s*$""").r
  private val ShowPartitions =
    """(?is)^\s*SHOW\s+PARTITIONS\s+([\w.]+)\s*;?\s*$""".r
  // EXPORT TABLE (r16): materialize the tip — or any retained version
  // — as plain parquet for foreign readers, the lake's interop escape
  // hatch. r17 adds PARTITIONED BY (Hive k=v layout so foreign
  // engines prune) and SINCE VERSION (append-only delta export —
  // refresh a foreign copy at O(changed segments)).
  private val ExportTable =
    ("""(?is)^\s*EXPORT\s+TABLE\s+([\w.]+)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s+TO\s+'([^']+)'""" +
      """(?:\s+PARTITIONED\s+BY\s*\(\s*([\w\s,]+?)\s*\))?""" +
      """(?:\s+SINCE\s+VERSION\s+(\d+))?\s*;?\s*$""").r
  // ASOF JOIN (r16): DuckDB's as-of SQL spelling, carried through the
  // same claimed-statement seam as the maintenance verbs (Spark's
  // grammar would reject the text anyway, so claiming cannot shadow
  // any delegate-valid SQL). Constrained, honest shape: two named
  // relations with aliases, one key equality, one `left >= right`
  // time bound, then an arbitrary tail (WHERE/GROUP/ORDER/LIMIT)
  // that the DELEGATE parses over the joined result. r17 adds the
  // LEFT-outer spelling (`ASOF LEFT JOIN`, DuckDB's keyword order):
  // unmatched left rows survive NULL-extended instead of dropping.
  // The alias words must not be SQL keywords: otherwise delegate-VALID
  // text like `FROM t AS asof JOIN u …` (a relation aliased `asof`!)
  // or `FROM a JOIN asof JOIN u …` would be hijacked — the lookahead
  // preserves the seam's no-interference property.
  private val NotKw = """(?!(?:AS|JOIN|ON|WHERE|GROUP|ORDER|LIMIT|""" +
    """HAVING|CROSS|INNER|LEFT|RIGHT|FULL|NATURAL|UNION|ASOF)\b)"""
  // r18 adds the STRICT bound (`a.t > b.t` — no same-instant match)
  // and bounded staleness (`TOLERANCE <n> [unit]` after the ON terms:
  // a match older than the tolerance is discarded — dropped inner,
  // NULL-extended left). A bare number is in the time columns' own
  // units (the epoch-µs convention of this suite); a unit makes it an
  // INTERVAL for timestamp columns. The unit alternation is CLOSED so
  // a tail keyword (WHERE/ORDER/…) can never be swallowed as a unit.
  private val AsofSelect =
    (s"""(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+([\\w.]+)\\s+($NotKw\\w+)""" +
      s"""\\s+ASOF\\s+(LEFT\\s+)?JOIN\\s+([\\w.]+)\\s+($NotKw\\w+)""" +
      """\s+ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)""" +
      """\s+AND\s+(\w+)\.(\w+)\s*(>=|>)\s*(\w+)\.(\w+)""" +
      """(?:\s+TOLERANCE\s+(\d+)(?:\s+(MICROSECONDS?|MILLISECONDS?|""" +
      """SECONDS?|MINUTES?|HOURS?|DAYS?))?)?""" +
      """(.*?)\s*;?\s*$""").r
  private val Analyze =
    ("""(?is)^\s*ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+STATISTICS""" +
      """\s+FOR\s+COLUMNS\s+([\w\s,]+?)\s*;?\s*$""").r
  // Schema-evolution DDL (r12): valid Spark grammar too, but claimed
  // ONLY for LakeCatalog-registered names (which are deliberately not
  // catalog tables — the delegate would fail them with TABLE_NOT_FOUND
  // anyway), so catalog-table ALTERs are untouched.
  private val AlterRenameCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val AlterDropCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$""".r
  private val AlterAddCol =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w<>(),. ]+?)\s*;?\s*$""".r
  // Table LIFECYCLE DDL (r12): CREATE is claimed by the provider
  // marker (`USING graft_lake` — no other parser owns that provider);
  // ALTER SET TBLPROPERTIES and DROP TABLE only for registered lakes.
  private val CreateTable =
    ("""(?is)^\s*CREATE\s+TABLE\s+([\w.]+)\s*\((.+?)\)\s+USING\s+graft_lake""" +
      """(?:\s+PARTITIONED\s+BY\s*\(\s*(\w+)\s*\))?""" +
      """\s+LOCATION\s+'([^']+)'""" +
      """(?:\s+TBLPROPERTIES\s*\((.+)\))?\s*;?\s*$""").r
  private val AlterSetProps =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*$""".r
  private val DropTable =
    """(?is)^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*$""".r
  private val PropPair = """'([^']*)'\s*=\s*'([^']*)'""".r
  // RESTORE (r12): Delta's RESTORE TABLE verbs — version- and
  // timestamp-addressed, claimed only for registered lakes.
  private val RestoreVersion =
    """(?is)^\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val RestoreTimestamp =
    """(?is)^\s*RESTORE\s+TABLE\s+([\w.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  // SHALLOW CLONE (r12): zero-copy branch of a registered lake.
  private val ShallowClone =
    ("""(?is)^\s*CREATE\s+TABLE\s+([\w.]+)\s+SHALLOW\s+CLONE\s+([\w.]+)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s+LOCATION\s+'([^']+)'\s*;?\s*$""").r
  // CTAS (r12): CREATE TABLE … USING graft_lake … AS <query> — the
  // schema comes from the query, so no column list. The query text is
  // carried verbatim and parsed by the SESSION at run time (it may
  // reference other lake tables, temp views, TVFs — everything the
  // full parser/analyzer stack resolves).
  private val CreateTableAs =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([\w.]+)\s+USING\s+graft_lake""" +
      """(?:\s+PARTITIONED\s+BY\s*\(\s*(\w+)\s*\))?""" +
      """\s+LOCATION\s+'([^']+)'""" +
      """(?:\s+TBLPROPERTIES\s*\((.+?)\))?""" +
      """\s+AS\s+(SELECT\b.+?)\s*;?\s*$""").r

  /** Parse a TBLPROPERTIES body (`'k'='v', …`). */
  private def parseProps(body: String): Map[String, String] =
    PropPair.findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toMap

  /** Apply lifecycle table properties — the shared CREATE/ALTER seam.
    * Supported: `cdc` (table-level change-data-feed flag, Delta's
    * enableChangeDataFeed), `partition_by` (partition evolution),
    * `expect.<name>` (manifest expectation). Unknown keys fail loud —
    * silently-ignored properties are how contracts rot. */
  private[plans] def applyLakeProperties(session: SparkSession,
      name: String, dir: String, props: Map[String, String]): Unit = {
    val cdc = props.get("cdc").map(_.trim.toBoolean)
      .getOrElse(LakeCatalog.cdcEnabled(Seq(name)))
    // dv.maxFraction routes SQL UPDATE/DELETE/MERGE to the
    // merge-on-read deletion-vector path (0 = copy-on-write, the
    // default) — Delta's enableDeletionVectors with an explicit
    // threshold; the register() below range-checks it.
    val dvf = props.get("dv.maxFraction").map(_.trim.toDouble)
      .getOrElse(LakeCatalog.dvMaxFraction(Seq(name)))
    LakeCatalog.register(name, dir, cdc = cdc, dvMaxFraction = dvf)
    props.foreach {
      case ("cdc", _) =>
      case ("dv.maxFraction", _) =>
      case ("partition_by", c) =>
        LakeSink.evolvePartitionSpec(session, dir, c.trim)
      case ("bloom_cols", cs) =>
        LakeSink.setBloomColumns(session, dir,
          cs.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      case (k, sql) if k.startsWith("expect.") =>
        LakeSink.addExpectation(session, dir, k.stripPrefix("expect."), sql)
      case (k, _) => sys.error(s"unsupported graft_lake table property " +
        s"'$k' (supported: cdc, dv.maxFraction, partition_by, " +
        "bloom_cols, expect.<name>)")
    }
  }

  private def dirOf(ident: String): Option[String] =
    LakeCatalog.lookup(ident.split('.').toSeq)

  /** Spans `[start, end)` of single-quoted string literals in `text`,
    * honoring BOTH escape conventions a claimed statement can carry:
    * `''` doubling (ANSI, DuckDB) and backslash escapes (`\'` —
    * Spark's default, `escapedStringLiterals=false`). The r16 gate
    * counted raw quote chars, so a backslash-escaped quote flipped
    * the parity (advisor catch). An unterminated literal extends to
    * end-of-text — claiming inside it stays off, and the delegate
    * produces the parse error such text deserves.
    *
    * The unconditional backslash branch is deliberately NOT gated on
    * `spark.sql.parser.escapedStringLiterals` (r18 — the advisor
    * asked whether a literal ending in `\` under that conf, e.g.
    * 'C:\', mis-tokenizes what follows): verified against Spark
    * 4.1.2, the conf only changes the AstBuilder's UNESCAPING of a
    * lexed token, never the lexer's tokenization — SqlBaseLexer
    * consumes `\'` as escaped-quote-inside-literal in BOTH modes, so
    * `SELECT 'C:\' …` is a delegate parse error under either setting
    * (LakeMaintenanceSqlSpec pins this). This tokenizer therefore
    * matches the delegate's lexer exactly as written; gating it on
    * the conf would make the two DISAGREE. */
  private[plans] def literalSpans(text: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == '\'') {
        val start = i
        i += 1
        var open = true
        while (i < text.length && open) {
          text.charAt(i) match {
            case '\\' => i += 2
            case '\'' if i + 1 < text.length && text.charAt(i + 1) == '\'' =>
              i += 2 // doubled quote: escaped quote INSIDE the literal
            case '\'' => open = false; i += 1
            case _ => i += 1
          }
        }
        spans += ((start, math.min(i, text.length)))
      } else i += 1
    }
    spans.result()
  }

  /** True iff position `pos` of `text` is outside every single-quoted
    * string literal. */
  private[plans] def outsideLiteral(text: String, pos: Int): Boolean =
    !literalSpans(text).exists { case (s, e) => pos >= s && pos < e }

  /** `re.replaceAllIn` applied ONLY to the stretches of `text` outside
    * string literals — literal content passes through verbatim, so an
    * alias-qualified name INSIDE a quoted value is never rewritten
    * (advisor catch: with left alias t, `WHERE note = 't.x'` must keep
    * its literal, not become `'x'`). */
  private[plans] def replaceOutsideLiterals(text: String,
      re: scala.util.matching.Regex, replacement: String): String = {
    val sb = new StringBuilder
    var pos = 0
    literalSpans(text).foreach { case (s, e) =>
      sb.append(re.replaceAllIn(text.substring(pos, s), replacement))
      sb.append(text.substring(s, e))
      pos = e
    }
    sb.append(re.replaceAllIn(text.substring(pos), replacement))
    sb.toString
  }

  /** Build the plan for a claimed `… ASOF JOIN …` statement: resolve
    * both relations through the session catalog (tables, temp views,
    * registered lakes via their reader views — whatever
    * `spark.table` resolves), run [[graft.operators.AsofJoin.asof]],
    * then let the DELEGATE parse the select list and tail over the
    * joined result (alias qualifiers stripped — AsofJoin refuses
    * overlapping column names, so bare names are unambiguous). The
    * bridge temp view is dropped as soon as the plan is analyzed. */
  private def asofPlan(sel: String, lt: String, la: String,
      rt: String, ra: String,
      eqA: (String, String), eqB: (String, String),
      tiA: (String, String), tiB: (String, String),
      tail: String, inner: Boolean, strict: Boolean,
      tolN: Option[String], tolUnit: Option[String]): LogicalPlan = {
    val s = SparkSession.active
    import org.apache.spark.sql.functions.{expr, lit}
    // TOLERANCE: a bare number stays in the time columns' own units;
    // a unit builds an interval (timestamp time columns)
    val tolerance = tolN.map { n =>
      tolUnit.fold(lit(n.toLong): org.apache.spark.sql.Column)(u =>
        expr(s"INTERVAL $n $u"))
    }
    require(la.toLowerCase != ra.toLowerCase,
      s"ASOF JOIN needs two distinct aliases, got '$la' twice — with " +
        "one alias the ON terms cannot be assigned to a side")
    def pick(p: (String, String), q: (String, String),
        what: String): (String, String) = {
      require(Set(p._1, q._1) == Set(la, ra),
        s"ASOF JOIN $what must reference both aliases $la and $ra, " +
          s"got ${p._1} and ${q._1}")
      if (p._1 == la) (p._2, q._2) else (q._2, p._2)
    }
    val (lk, rk) = pick(eqA, eqB, "equality")
    // the time bound is directional: left >= right (or left > right,
    // strict), so the first term must belong to the LEFT alias
    require(tiA._1 == la && tiB._1 == ra,
      s"ASOF JOIN time bound must be $la.<t> >= $ra.<t>, " +
        s"got ${tiA._1}.${tiA._2} >= ${tiB._1}.${tiB._2}")
    val df = graft.operators.AsofJoin.asof(
      s.table(lt), s.table(rt), lk, tiA._2, rk, tiB._2, inner = inner,
      strict = strict, tolerance = tolerance)
    val view = "graft_asof_" + java.lang.Long.toUnsignedString(
      java.util.concurrent.ThreadLocalRandom.current().nextLong(), 16)
    df.createOrReplaceTempView(view)
    try {
      // quote-AWARE strip (r17, advisor): qualifiers are rewritten
      // only outside string literals, so quoted values that happen to
      // carry an alias-dot prefix survive verbatim
      val qual = ("\\b(" + java.util.regex.Pattern.quote(la) + "|" +
        java.util.regex.Pattern.quote(ra) + ")\\.").r
      val strip = (t: String) => replaceOutsideLiterals(t, qual, "")
      s.sql(s"SELECT ${strip(sel)} FROM $view ${strip(tail)}")
        .queryExecution.analyzed
    } finally s.catalog.dropTempView(view)
  }

  /** Claim a `… ASOF [LEFT] JOIN …` statement, or None → delegate.
    * The gate is POSITION-ACCURATE (r17, advisor): the ASOF keyword
    * the regex actually consumed — the token right after the left
    * alias (group 3) — must sit outside every string literal, with
    * literals tokenized by [[literalSpans]] (both `''` doubling and
    * backslash escapes). The r16 gate counted raw quotes before the
    * FIRST textual ASOF: an escaped quote flipped the parity, and a
    * literal 'ASOF JOIN' ahead of the real one delegated a valid
    * claimed statement (loud delegate failure, but still wrong
    * routing). One residual — if the regex's own first structural
    * match lies inside a literal while a real ASOF follows, the
    * statement delegates and fails LOUD at the delegate; never a
    * silent wrong answer. The anchored regex runs ONCE per statement
    * (r18, advisor: the old asofMatches guard + asofClaim pair
    * evaluated it twice on every claimed hit). */
  private def asofClaim(sqlText: String): Option[LogicalPlan] =
    AsofSelect.findFirstMatchIn(sqlText) match {
      case Some(m) if outsideLiteral(sqlText, m.end(3)) =>
        Some(asofPlan(m.group(1), m.group(2), m.group(3), m.group(5),
          m.group(6), (m.group(7), m.group(8)), (m.group(9), m.group(10)),
          (m.group(11), m.group(12)), (m.group(14), m.group(15)),
          m.group(18), inner = m.group(4) == null,
          strict = m.group(13) == ">",
          tolN = Option(m.group(16)), tolUnit = Option(m.group(17))))
      case _ => None
    }

  /** The claimed plan, or None → delegate. */
  def parse(sqlText: String): Option[LogicalPlan] = {
    // the ASOF claim is checked first and built in the SAME regex
    // evaluation (r18, advisor): no other claimed verb starts with
    // SELECT, so hoisting it out of the match shadows nothing
    val asof = asofClaim(sqlText)
    if (asof.isDefined) return asof
    parseVerbs(sqlText)
  }

  private def parseVerbs(sqlText: String): Option[LogicalPlan] = sqlText match {
    case VacuumHours(t, h) => dirOf(t).map(d =>
      LakeVacuumHoursCommand(d, h.toLong))
    case Vacuum(t, retain) => dirOf(t).map(d =>
      LakeVacuumCommand(d, Option(retain).map(_.toInt).getOrElse(2)))
    case Optimize(t) => dirOf(t).map(d =>
      LakeOptimizeCommand(d, Nil, None))
    case OptimizeCluster(t, cols) => dirOf(t).map(d =>
      LakeOptimizeCommand(d, cols.split(',').map(_.trim).toSeq, None))
    case OptimizeZorder(t, x, y) => dirOf(t).map(d =>
      LakeOptimizeCommand(d, Nil, Some((x, y))))
    case History(t) => dirOf(t).map(d =>
      LakeSink.history(SparkSession.active, d).queryExecution.analyzed)
    case Detail(t) => dirOf(t).map(d =>
      LakeSink.tableDetail(SparkSession.active, d)
        .queryExecution.analyzed)
    case OptimizePerPartition(t) => dirOf(t).map(d =>
      LakeOptimizePartitionsCommand(d))
    case ReorgPurge(t) => dirOf(t).map(d =>
      LakeReorgPurgeCommand(d))
    case CopyInto(t, src) => dirOf(t).map(d =>
      LakeCopyIntoCommand(d, src))
    case ExportTable(t, v, dst, part, since) => dirOf(t).map(d =>
      LakeExportCommand(d, dst, Option(v).map(_.toLong),
        Option(part), Option(since).map(_.toLong)))
    case ShowPartitions(t) => dirOf(t).map(d =>
      LakeSink.showPartitions(SparkSession.active, d)
        .queryExecution.analyzed)
    case Analyze(t, cols) => dirOf(t).map(d =>
      LakeAnalyzeCommand(d, cols.split(',').map(_.trim)
        .filter(_.nonEmpty).toSeq))
    case AlterRenameCol(t, a, b) => dirOf(t).map(d =>
      LakeAlterColumnCommand(d, "rename", a, Some(b), None))
    case AlterDropCol(t, a) => dirOf(t).map(d =>
      LakeAlterColumnCommand(d, "drop", a, None, None))
    case AlterAddCol(t, a, tpe) => dirOf(t).map(d =>
      LakeAlterColumnCommand(d, "add", a, None, Some(tpe)))
    case CreateTable(t, cols, part, loc, props) =>
      Some(LakeCreateTableCommand(t.split('.').last, cols,
        loc, Option(part), Option(props).map(parseProps).getOrElse(Map.empty)))
    case AlterSetProps(t, props) => dirOf(t).map(d =>
      LakeSetPropertiesCommand(t.split('.').last, d, parseProps(props)))
    case DropTable(t) => dirOf(t).map(_ =>
      LakeDropTableCommand(t.split('.').last))
    case RestoreVersion(t, v) => dirOf(t).map(d =>
      LakeRestoreCommand(d, Left(v.toLong),
        cdc = LakeCatalog.cdcEnabled(t.split('.').toSeq)))
    case RestoreTimestamp(t, ts) => dirOf(t).map(d =>
      LakeRestoreCommand(d, Right(ts),
        cdc = LakeCatalog.cdcEnabled(t.split('.').toSeq)))
    case ShallowClone(c, src, v, loc) => dirOf(src).map(d =>
      LakeCloneCommand(c.split('.').last, d, loc,
        Option(v).map(_.toLong),
        cdc = LakeCatalog.cdcEnabled(src.split('.').toSeq)))
    case CreateTableAs(orReplace, t, part, loc, props, query) =>
      Some(LakeCtasCommand(t.split('.').last, loc, Option(part),
        Option(props).map(parseProps).getOrElse(Map.empty), query,
        orReplace = orReplace != null))
    case _ => None
  }
}

/** `CREATE TABLE … USING graft_lake LOCATION …` — creates the lake
  * (schema + optional partition spec as one metadata commit) and
  * registers the name; over a location that ALREADY holds a lake it
  * ATTACHES instead (the Delta CREATE-over-existing-LOCATION move):
  * declared columns must match the recorded schema name-for-name, so
  * a mistyped path fails loud instead of shadowing real data with an
  * empty table. TBLPROPERTIES go through the same seam as ALTER. */
case class LakeCreateTableCommand(name: String, colsDdl: String,
    dir: String, partitionBy: Option[String],
    props: Map[String, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    require(LakeCatalog.lookup(Seq(name)).isEmpty,
      s"lake table $name is already registered (DROP TABLE it first)")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(colsDdl)
    val m = LakeSink.readManifest(dir)
    val v =
      if (m.version == 0L) LakeSink.createTable(dir, schema, partitionBy)
      else {
        val cur = LakeSink.tableSchema(session, dir, m)
        require(schema.fieldNames.toSeq == cur.fieldNames.toSeq,
          s"CREATE TABLE $name attaches to an existing lake at $dir " +
            s"but declares columns ${schema.fieldNames.mkString(", ")} " +
            s"vs recorded ${cur.fieldNames.mkString(", ")}")
        partitionBy.foreach(c =>
          LakeSink.evolvePartitionSpec(session, dir, c))
        LakeSink.readManifest(dir).version
      }
    LakeMaintenanceSql.applyLakeProperties(session, name, dir, props)
    Seq(Row(v))
  }
}

/** `CREATE TABLE t USING graft_lake [PARTITIONED BY (c)] LOCATION '…'
  * AS <query>` — CTAS: the lake is created with the QUERY's schema
  * and seeded with its result (partition layout honored, facts +
  * exact stats recorded). Two manifest commits (create, then seed) —
  * a crash between them leaves a valid EMPTY table, never a partial
  * data state (the seed append is itself atomic). The name must be
  * unregistered and the location must not already hold a lake —
  * CTAS is a creation verb, not an attach; use CREATE TABLE …
  * LOCATION to attach, INSERT OVERWRITE to replace. */
case class LakeCtasCommand(name: String, dir: String,
    partitionBy: Option[String], props: Map[String, String],
    query: String, orReplace: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("rows_inserted", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val registered = LakeCatalog.lookup(Seq(name))
    val occupied = LakeSink.readManifest(dir).version > 0L
    // the name must not be claimed by a DIFFERENT location — CREATE OR
    // REPLACE rebuilds a table in place, it does not re-point a name
    if (orReplace)
      require(registered.forall(_ == dir),
        s"lake table $name is registered at ${registered.get}, not $dir " +
          "— CREATE OR REPLACE rebuilds a table in place, it does not " +
          "re-point a name")
    if (orReplace && occupied) {
      val df = session.sql(query)
      val v = LakeSink.replaceTableAs(session, dir, df, partitionBy)
      val rows = LakeSink.readTable(session, dir).count()
      LakeCatalog.unregister(name) // properties re-apply fresh
      LakeMaintenanceSql.applyLakeProperties(session, name, dir, props)
      return Seq(Row(v, rows))
    }
    require(registered.isEmpty,
      s"lake table $name is already registered (DROP TABLE it first)")
    require(!occupied,
      s"CTAS target location $dir already holds a lake — " +
        "CREATE TABLE … LOCATION attaches, INSERT OVERWRITE replaces, " +
        "CREATE OR REPLACE … AS rebuilds")
    val df = session.sql(query)
    LakeSink.createTable(dir, df.schema, partitionBy)
    val (v, rows) =
      if (partitionBy.isDefined) {
        val (v0, _) = LakeSink.appendPartitioned(session, dir, df)
        val m = LakeSink.readManifest(dir)
        (v0, m.parts.values.map(_.rows).sum)
      } else {
        val m = LakeSink.readManifest(dir)
        val seg = f"seg_i${m.version + 1}%010d"
        val v0 = LakeSink.appendSegment(session, dir, df, seg)
        (v0, session.read.parquet(s"$dir/$seg").count())
      }
    LakeMaintenanceSql.applyLakeProperties(session, name, dir, props)
    Seq(Row(v, rows))
  }
}

/** `ALTER TABLE … SET TBLPROPERTIES ('cdc'='true', 'expect.x'='…',
  * 'partition_by'='col')` over a registered lake — the lifecycle
  * knobs that were Scala-only before r12. */
case class LakeSetPropertiesCommand(name: String, dir: String,
    props: Map[String, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("properties_set", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    LakeMaintenanceSql.applyLakeProperties(session, name, dir, props)
    Seq(Row(props.size))
  }
}

/** `DROP TABLE t` over a registered lake: unregisters the NAME; the
  * data and manifest stay on disk (external-table semantics — the
  * registration is a pointer, and dropping a pointer must never be a
  * data-destruction verb). Re-attach any time with CREATE TABLE …
  * LOCATION. */
case class LakeDropTableCommand(name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("dropped", org.apache.spark.sql.types.StringType)())
  override def run(session: SparkSession): Seq[Row] = {
    LakeCatalog.unregister(name)
    Seq(Row(name))
  }
}

/** ALTER TABLE … RENAME/DROP/ADD COLUMN over a lake table — rename and
  * drop are metadata-only via the manifest's COLUMN MAPPING
  * ([[LakeSink.evolveRenameColumn]]/[[LakeSink.evolveDropColumn]]);
  * add is the additive evolution that predates them. Returns the new
  * schema generation. */
case class LakeAlterColumnCommand(dir: String, op: String, col: String,
    to: Option[String], dataType: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("schema_v", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val sv = op match {
      case "rename" => LakeSink.evolveRenameColumn(session, dir, col, to.get)
      case "drop" => LakeSink.evolveDropColumn(session, dir, col)
      case "add" => LakeSink.evolveAddColumn(session, dir, col,
        org.apache.spark.sql.types.DataType.fromDDL(dataType.get))
    }
    Seq(Row(sv))
  }
}

/** `RESTORE TABLE t TO VERSION AS OF n` / `TO TIMESTAMP AS OF 'ts'`
  * → [[LakeSink.restoreTable]] — the undo verb; timestamp addressing
  * resolves through the same commit-clock rule as time-travel reads
  * (latest version at or before the instant). `cdc` follows the
  * table's registered change-data-feed flag, so a CDC table's
  * consumers ride through the restore on explicit change images. */
case class LakeRestoreCommand(dir: String,
    target: Either[Long, String], cdc: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_restored", IntegerType)(),
    AttributeReference("segments_removed", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, a, r) = target match {
      case Left(ver) => LakeSink.restoreTable(session, dir, ver, cdc)
      case Right(ts) =>
        val us = LakeDml.tsMicrosOfOrFail(session,
          org.apache.spark.sql.catalyst.expressions.Literal(ts))
        LakeSink.restoreTableToTimestamp(session, dir, us, cdc)
    }
    Seq(Row(v, a, r))
  }
}

/** `CREATE TABLE c SHALLOW CLONE t [VERSION AS OF n] LOCATION '…'` →
  * [[LakeSink.cloneTable]] — the zero-copy branch; registers the new
  * name at the clone location, carrying the source's cdc table flag
  * (a clone of a CDC table serves a feed from its own v1). */
case class LakeCloneCommand(name: String, srcDir: String, dstDir: String,
    version: Option[Long], cdc: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("segments", IntegerType)(),
    AttributeReference("files_linked", IntegerType)(),
    AttributeReference("bytes_shared", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    require(LakeCatalog.lookup(Seq(name)).isEmpty,
      s"lake table $name is already registered (DROP TABLE it first)")
    val (segs, files, bytes) =
      LakeSink.cloneTable(session, srcDir, dstDir, version)
    LakeCatalog.register(name, dstDir, cdc = cdc)
    Seq(Row(segs, files, bytes))
  }
}

/** `VACUUM t RETAIN n HOURS` → [[LakeSink.vacuumRetainHours]]: the
  * time-based retention spelling, resolved on the log's commit
  * clock. */
case class LakeVacuumHoursCommand(dir: String, hours: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("segments_deleted", IntegerType)(),
    AttributeReference("manifests_deleted", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (segs, mans) = LakeSink.vacuumRetainHours(dir, hours)
    Seq(Row(segs, mans))
  }
}

/** `ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS a, b` →
  * [[LakeSink.analyzeTable]]: backfill per-segment min/max/null stats
  * for the named columns AND bloom sidecars for the table's declared
  * bloom columns, for segments written before the declarations — one
  * scan per backfilled segment, one metadata commit, no data moved.
  * The declare-then-ANALYZE pair is how a live table adopts pruning
  * without waiting for OPTIMIZE. */
case class LakeAnalyzeCommand(dir: String, cols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_analyzed", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = LakeSink.analyzeTable(session, dir, cols)
    Seq(Row(v, n))
  }
}

case class LakeVacuumCommand(dir: String, retainVersions: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("segments_deleted", IntegerType)(),
    AttributeReference("manifests_deleted", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (segs, mans) = LakeSink.vacuum(dir, retainVersions)
    Seq(Row(segs, mans))
  }
}

/** `OPTIMIZE t PER PARTITION` → [[LakeSink.compactPartitions]]: the
  * partition-preserving compaction (facts survive the rewrite, so
  * retention stays metadata-only afterwards). */
case class LakeOptimizePartitionsCommand(dir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("partitions_compacted", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = LakeSink.compactPartitions(session, dir)
    Seq(Row(v, n))
  }
}

case class LakeOptimizeCommand(dir: String, clusterBy: Seq[String],
    zorderBy: Option[(String, String)]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_compacted", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = LakeSink.compact(session, dir,
      clusterBy = clusterBy, zorderBy = zorderBy)
    Seq(Row(v, n))
  }
}

/** `REORG TABLE … APPLY (PURGE)` → [[LakeSink.purgeDv]]: rewrite
  * only the deletion-vectored segments (O(DV debt) maintenance, not
  * O(table)); clean segments survive by reference. */
case class LakeReorgPurgeCommand(dir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("segments_purged", IntegerType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, n) = LakeSink.purgeDv(session, dir)
    Seq(Row(v, n))
  }
}

/** `COPY INTO t FROM '<dir>'` → [[LakeSink.copyInto]]: idempotent
  * incremental file ingestion against the manifest's load-history
  * ledger. The receipt mirrors Delta's (files loaded/skipped, rows). */
case class LakeCopyIntoCommand(dir: String, srcDir: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("files_loaded", IntegerType)(),
    AttributeReference("files_skipped", IntegerType)(),
    AttributeReference("rows_loaded", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, loaded, skipped, rows) = LakeSink.copyInto(session, srcDir, dir)
    Seq(Row(v, loaded, skipped, rows))
  }
}

/** `EXPORT TABLE t TO '<dir>'` → [[LakeSink.exportTable]]: the tip as
  * a plain-parquet snapshot for foreign readers (no manifest, no DVs,
  * logical names). Receipt = what it cost: linked files are free,
  * copied files are the cross-filesystem degradation (r18 — a target
  * off the lake's volume cannot hard-link), rewritten segments are
  * the protocol debt paid down. */
case class LakeExportCommand(dir: String, dstDir: String,
    version: Option[Long] = None,
    partitionBy: Option[String] = None,
    sinceVersion: Option[Long] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("files_linked", IntegerType)(),
    AttributeReference("files_copied", IntegerType)(),
    AttributeReference("segments_rewritten", IntegerType)(),
    AttributeReference("rows_exported", LongType)())
  override def run(session: SparkSession): Seq[Row] = {
    val (v, linked, copied, rewritten, rows) = LakeSink.exportTable(
      session, dir, dstDir, version, partitionBy, sinceVersion)
    Seq(Row(v, linked, copied, rewritten, rows))
  }
}

/** The delegating parser: [[LakeMaintenanceSql.parse]] first, delegate
  * for everything else (and for every non-plan parse entry point). */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    LakeMaintenanceSql.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
      ctx: ParameterContext): LogicalPlan =
    LakeMaintenanceSql.parse(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
