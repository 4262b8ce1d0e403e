package graft.sqlfront

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Dml

/** H2-dialect SQL front door (SURVEY §4.3 "thin SQL front-door translator"
  * + §7 modules catalog/ and sqlfront/).
  *
  * The reference parses its dialect with a 5k-line recursive-descent parser
  * (lealone-sql Parser.java); Spark already has a full SQL parser, so this
  * layer only (a) keeps a mutable catalog of named DataFrames (the
  * Database→Schema→Table registry, Schema.java), (b) executes DDL/DML as
  * copy-on-write snapshot rewrites via [[graft.operators.Dml]], and
  * (c) rewrites the H2-only surface into Spark SQL before delegating to
  * `spark.sql`:
  *   - `FROM t SELECT …` FROM-first form (Parser.java:1397)
  *   - `SYSTEM_RANGE(a,b[,step])` (RangeTable.java)
  *   - `CSVREAD('file')` in FROM position (Function.java:352, Csv.java:46)
  *   - `ORDER BY =n` ordinal form (Parser.java:1493)
  *   - `SAMPLE_SIZE n` head-sample (Select.java:877 — head semantics, not
  *     random, matching the reference)
  *   - `MERGE INTO t [KEY(cols)] VALUES/SELECT` (Merge.java:35,146)
  *   - `UPDATE … LIMIT n` / `DELETE … LIMIT n` (Update.java:140-150)
  *   - sequences: CREATE SEQUENCE / NEXTVAL / CURRVAL (SequenceValue.java)
  *     — driver-side counters, documented as non-parallel id generation;
  *     INSERT…SELECT NEXTVAL assigns per row; at scale use
  *     monotonically_increasing_id instead
  *   - `TABLE(c T=ARRAY[…])` / TABLE_DISTINCT in FROM (TableFunction.java)
  *   - `CALL CSVWRITE('dir','sql')` (Csv.java:123)
  *   - ALTER TABLE add/drop/rename column, type change, rename table
  *     (ddl/AlterTable*.java); CREATE/DROP INDEX (recorded; unique
  *     validates); ADD CONSTRAINT FK/CHECK/UNIQUE/PK (validated on add and
  *     per insert batch); CREATE ALIAS by reflection
  *     (ddl/CreateFunctionAlias.java); CREATE CONSTANT/DOMAIN/TRIGGER/
  *     SCHEMA, GRANT/REVOKE (recorded), DROP ALL OBJECTS
  *   - all 30 INFORMATION_SCHEMA meta tables (MetaTable.java:77-107)
  *   - every textual rewrite is a token-pattern pass (Rw.rewrite) —
  *     string-literal safety is structural, not simulated
  *
  * Tables live as temp views so translated SQL sees them; every mutation
  * re-registers the view (snapshot semantics — readers of the old DataFrame
  * keep their snapshot, exactly like the reference's MVCC read view).
  */
final class Engine(val spark: SparkSession) {

  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]
  private val primaryKeys = mutable.HashMap.empty[String, Seq[String]]
  private val identityCols = mutable.HashMap.empty[String, String]
  private val identityNext = mutable.HashMap.empty[String, Long]
  private val sequences = mutable.HashMap.empty[String, Sequence]
  private var rangeViewId = 0
  // _ROWID_ pseudo-column (StandardPrimaryIndex.java storage key;
  // PseudoColumnTest): tables with a single integral PRIMARY KEY map
  // _rowid_ onto that key (rowidPk); tables without one carry a REAL
  // hidden _rowid_ column (rowidTables) — engine-assigned max+1 values,
  // explicitly insertable, dropped from the registered view so star
  // expansion and positional INSERT never see it.
  private val rowidPk = mutable.HashMap.empty[String, String]
  private val rowidTables = mutable.HashSet.empty[String]
  private val rowidNext = mutable.HashMap.empty[String, Long]

  // DDL surface recorded for INFORMATION_SCHEMA + validation
  // (ddl/CreateIndex.java, db/constraint/ConstraintReferential.java,
  // ConstraintCheck.java, ddl/CreateFunctionAlias.java, TableView.java)
  private case class IndexDef(name: String, table: String, cols: Seq[String],
      unique: Boolean)
  private case class FkDef(name: String, table: String, cols: Seq[String],
      refTable: String, refCols: Seq[String])
  private case class CheckDef(name: String, table: String, expr: String)
  private val indexes = mutable.LinkedHashMap.empty[String, IndexDef]
  private val foreignKeys = mutable.ArrayBuffer.empty[FkDef]
  private val checks = mutable.ArrayBuffer.empty[CheckDef]
  private val viewDefs = mutable.LinkedHashMap.empty[String, String]
  private val aliases = mutable.LinkedHashMap.empty[String, String]
  // CREATE CONSTANT (schema/Constant.java), CREATE DOMAIN
  // (ddl/CreateUserDataType.java), CREATE TRIGGER (recorded; row-hook
  // execution is out of engine scope per BASELINE — the streaming
  // foreachBatch hook is the batch twin)
  private val constants = mutable.LinkedHashMap.empty[String, String]
  private val domains = mutable.LinkedHashMap.empty[String, String]
  private val triggers = mutable.LinkedHashMap.empty[String, (String, String)]
  // Registered row-hook implementations — the batch twin of the reference's
  // api/Trigger.java fire(conn, oldRow, newRow), invoked at the statement
  // sites where the reference fires per row (Insert.java:130,157-161,
  // Update.java, Delete.java). The reference binds a Java class by
  // reflection (CREATE TRIGGER … CALL "cls"); in zero-reflection Spark the
  // implementation registers programmatically and the recorded DDL binds it
  // by trigger name. Signature: (event, oldRows, newRows) — row DELTAS as
  // DataFrames (empty for the missing side), so a hook observes exactly
  // what the reference's per-row calls would, batched.
  private val triggerImpls =
    mutable.HashMap.empty[String, (String, DataFrame, DataFrame) => Unit]

  /** Bind an implementation to a recorded `CREATE TRIGGER` by name. */
  def registerTriggerImpl(name: String,
      impl: (String, DataFrame, DataFrame) => Unit): Unit =
    triggerImpls(name.toLowerCase) = impl

  /** Fire the table's registered triggers for `event` at `phase`
    * (BEFORE | AFTER). Returns true if an INSTEAD OF trigger fired —
    * the caller then suppresses the operation, the batch analogue of
    * fireBeforeRow returning done=true (Insert.java:157-161). */
  private def fireTriggers(tn: String, event: String, phase: String,
      oldRows: DataFrame, newRows: DataFrame): Boolean = {
    var insteadOf = false
    triggers.foreach { case (n, (tbl, timing)) =>
      val up = timing.toUpperCase
      val ph = if (up.startsWith("INSTEAD OF")) "INSTEAD OF"
        else if (up.startsWith("BEFORE")) "BEFORE" else "AFTER"
      val phaseHit = ph == phase || (ph == "INSTEAD OF" && phase == "BEFORE")
      if (tbl == tn && up.contains(event) && phaseHit)
        triggerImpls.get(n).foreach { impl =>
          impl(event, oldRows, newRows)
          if (ph == "INSTEAD OF") insteadOf = true
        }
    }
    insteadOf
  }

  // session last-identity / last-sequence values (IDENTITY()/SCOPE_IDENTITY()
  // and LASTVAL() — Function.java session functions)
  private var lastIdentity: Option[Long] = None
  private var lastSeqVal: Option[Long] = None

  private final class Sequence(var next: Long, val inc: Long) {
    var curr: Long = next - inc
    def nextVal(): Long = { curr = next; next += inc; lastSeqVal = Some(curr); curr }
    /** Bulk advance after a per-row multi-occurrence fill (SequenceValue
      * semantics: every evaluation increments). */
    def advance(n: Long): Unit =
      if (n > 0) { next += n * inc; curr = next - inc }
  }

  graft.functions.H2Functions.registerAll(spark)
  graft.functions.Aggregators.registerAll(spark)

  def register(name: String, df: DataFrame): Unit = {
    val n = name.toLowerCase
    tables(n) = df
    // hidden _rowid_ never reaches the public view: star expansion and
    // positional INSERT see the declared columns only (runSelect swaps the
    // full frame in for statements that reference _rowid_ explicitly)
    val v = if (rowidTables.contains(n) && df.columns.contains("_rowid_"))
      df.drop("_rowid_") else df
    v.createOrReplaceTempView(n)
  }

  def table(name: String): DataFrame = tables(name.toLowerCase)

  /** Programmatic insert for the ORM DAO executors (Model.insert) — same
    * path as SQL INSERT: align, identity/sequence fill, constraints. */
  def insertFrom(tableName: String, cols: Option[Seq[String]],
      src: DataFrame): Unit =
    doInsert(tableName, cols.map(_.mkString(",")), src)
  def tableNames: Seq[String] = tables.keys.toSeq
  def mode: String = compatibilityMode

  /** Execute one or more ';'-separated statements; returns the DataFrame of
    * the last query (or an empty status frame for DDL/DML). */
  def sql(text: String): DataFrame =
    splitStatements(Lex.stripComments(text)).map(execTimed).lastOption
      .getOrElse(spark.emptyDataFrame)

  // ---- SET QUERY_STATISTICS (dml/Set.java; QueryStatisticsTest):
  // per-statement wall-time accounting into the QUERY_STATISTICS meta
  // view while enabled. Entry count is bounded by
  // QUERY_STATISTICS_MAX_ENTRIES (new statements beyond the cap are not
  // tracked); disabling clears collected data, as the reference does.
  // (count, min ms, max ms, cumulative ms)
  private val queryStats =
    mutable.LinkedHashMap.empty[String, (Long, Double, Double, Double)]
  private def statsEnabled = sessionSettings.get("QUERY_STATISTICS")
    .exists(v => v == "1" || v.equalsIgnoreCase("TRUE"))
  private def execTimed(stmt: String): DataFrame = {
    if (!statsEnabled) return execOne(stmt)
    val t0 = System.nanoTime()
    try execOne(stmt)
    finally if (statsEnabled) { // the disabling SET must not re-record itself
      val ms = (System.nanoTime() - t0) / 1e6
      val key = stmt.trim
      val cap = sessionSettings.get("QUERY_STATISTICS_MAX_ENTRIES")
        .flatMap(_.toIntOption).getOrElse(100)
      queryStats.get(key) match {
        case Some((n, mn, mx, cum)) =>
          queryStats(key) = (n + 1, math.min(mn, ms), math.max(mx, ms), cum + ms)
        case None if queryStats.size < cap =>
          queryStats(key) = (1L, ms, ms, ms)
        case None =>
      }
    }
  }

  // ------------------------------------------------------------------
  /** Statement split on `;` — tokenizer-first (Lex): a semicolon inside a
    * 'string literal' (with '' escapes), a "quoted identifier", or a
    * comment (line or block — Lex skips both) never splits; the char-loop
    * predecessor was literal-aware but identifier- and comment-blind.
    * Segments re-slice the raw text, preserving every byte. */
  private def splitStatements(text: String): Seq[String] = {
    val cuts = Lex.tokens(text).iterator
      .filter(t => t.kind == Lex.Sym && text.charAt(t.start) == ';')
      .map(_.start).toSeq
    val out = mutable.ArrayBuffer.empty[String]
    var last = 0
    cuts.foreach { c => out += text.substring(last, c); last = c + 1 }
    out += text.substring(last)
    out.filter(_.trim.nonEmpty).toSeq
  }

  // Stmt (the literal-masked statement view) lives in Pat.scala with the
  // token-pattern extractors; `Pat.P` patterns replaced the `M(regex)`
  // extractors of the historical regex front door — STATEMENT dispatch is
  // now regex-free, as are the fragment-level DEFAULT/SEQUENCE clause
  // scans (defaultClause/seqClause) and every textual rewrite (Rw).
  import Pat.{P, Kw, Opt, OptCap, AltKw, AltCap, OptG, Ident, Quoted, IntCap,
    SkipWord, SkipNum, SkipLit, Paren, SkipParen, Rest, RestNonEmpty,
    RestTyped, CapUntil, Peek, SkipRest, Eos, SpecBeforeAfter, DomainTail,
    LitCap, LitCapNonEmpty, DottedIdent, NullOrLit}

  /** Token twin of the old masked `defOptRe` column-def fragment regex
    * (`^(\w+)\s+.*?\s+(?:DEFAULT|AS)\s+(.+?)(?:\s+NOT\s+NULL|\s+NULL|
    * \s+AUTO_INCREMENT|\s+UNIQUE)?\s*$`): Some((head, expr)) at the
    * EARLIEST DEFAULT|AS keyword with whitespace before it and at least
    * one token after it; `expr` runs to the end of the fragment with ONE
    * trailing column option stripped — NOT NULL first, then NULL /
    * AUTO_INCREMENT / UNIQUE — and only while at least one expr token
    * remains (the reluctant `(.+?)` floor). Literal safety is structural:
    * `DEFAULT 'x NOT NULL'` is one token, so nothing strips inside it.
    * `leadIdent` selects the column-def form (head = the leading bare
    * word; the keyword needs another token — or a ≥2-char gap — before
    * it, mirroring `(\w+)\s+.*?\s+`); otherwise the `^(.*?)\s+` type-
    * spec form (head = everything before the keyword). */
  private def defaultClause(frag: String, leadIdent: Boolean)
      : Option[(String, String)] = {
    val ts = Lex.tokens(frag)
    if (ts.isEmpty) return None
    if (leadIdent &&
        !(ts(0).kind == Lex.Word && frag.charAt(ts(0).start) != '"'))
      return None
    var k = 1
    var hit = -1
    while (k < ts.length - 1 && hit < 0) {
      if ((ts(k).is(frag, "DEFAULT") || ts(k).is(frag, "AS")) &&
          ts(k).start > ts(k - 1).end &&
          (!leadIdent || k >= 2 || ts(k).start - ts(0).end >= 2))
        hit = k
      k += 1
    }
    if (hit < 0) return None
    var endTok = ts.length - 1
    def w(i: Int, s0: String) = ts(i).is(frag, s0)
    if (endTok >= hit + 3 && w(endTok - 1, "NOT") && w(endTok, "NULL"))
      endTok -= 2
    else if (endTok >= hit + 2 && (w(endTok, "NULL") ||
        w(endTok, "AUTO_INCREMENT") || w(endTok, "UNIQUE")))
      endTok -= 1
    val head =
      if (leadIdent) ts(0).text(frag)
      else frag.substring(0, ts(hit).start).trim
    Some((head, frag.substring(ts(hit + 1).start, ts(endTok).end)))
  }

  /** Token twin of the old masked `seqOptRe`
    * (`^(.*?)\s+SEQUENCE\s+(\w+)\s*$`): the fragment must END with
    * `SEQUENCE <bareword>`; Some((prefix, seqName)). */
  private def seqClause(frag: String): Option[(String, String)] = {
    val ts = Lex.tokens(frag)
    if (ts.length < 3) return None
    val last = ts.length - 1
    if (ts(last - 1).is(frag, "SEQUENCE") && ts(last).kind == Lex.Word &&
        frag.charAt(ts(last).start) != '"' &&
        ts(last - 1).start > ts(last - 2).end)
      Some((frag.substring(0, ts(last - 1).start).trim, ts(last).text(frag)))
    else None
  }

  /** Literal-masked upper-cased view of a fragment, for keyword
    * `contains`/`startsWith` scans. */
  private def maskedUpper(frag: String): String = Stmt(frag).masked.toUpperCase

  private val createTableRe =
    P(Kw("CREATE", "TABLE"), Opt("IF", "NOT", "EXISTS"), Ident, Paren, Eos)
  private val createTableAsRe =
    P(Kw("CREATE", "TABLE"), Opt("IF", "NOT", "EXISTS"), Ident, Kw("AS"), Rest)
  private val dropTableRe =
    P(Kw("DROP", "TABLE"), Opt("IF", "EXISTS"), Ident, Eos)
  private val truncateRe = P(Kw("TRUNCATE", "TABLE"), Ident, Eos)
  private val createSeqRe =
    P(Kw("CREATE", "SEQUENCE"), Opt("IF", "NOT", "EXISTS"), Ident,
      OptG(Kw("START", "WITH"), IntCap), OptG(Kw("INCREMENT", "BY"), IntCap),
      OptG(Kw("CACHE"), SkipNum), Eos)
  private val dropSeqRe =
    P(Kw("DROP", "SEQUENCE"), Opt("IF", "EXISTS"), Ident, Eos)
  // CREATE PRIMARY KEY [HASH] name ON t(cols) (ddl/CreateIndex.java primary
  // form, used by the reference's index tests)
  private val createPkRe =
    P(Kw("CREATE", "PRIMARY", "KEY"), Opt("HASH"), Opt("IF", "NOT", "EXISTS"),
      Ident, Kw("ON"), Ident, Paren, Eos)
  // CREATE DATABASE (ddl/CreateDatabase.java — RUN MODE/PARAMETERS are
  // distributed-deployment attributes, recorded only)
  private val createDatabaseRe =
    P(Kw("CREATE", "DATABASE"), Opt("IF", "NOT", "EXISTS"), Ident,
      OptG(Kw("RUN", "MODE"), SkipWord), OptG(Kw("PARAMETERS"), SkipParen), Eos)
  private val dropDatabaseRe =
    P(Kw("DROP", "DATABASE"), Opt("IF", "EXISTS"), Ident, Eos)
  private val databases = mutable.LinkedHashSet("graft")
  // ── tokenizer-first INSERT family (Parser.java:1014 parseInsert) ──
  // One token scan classifies every INSERT body form — SET assignments
  // (Parser.java:1052), [DIRECT] VALUES with an optional depth-0
  // ON DUPLICATE KEY UPDATE tail (Mode.java onDuplicateKeyUpdate),
  // SELECT/FROM query, DEFAULT VALUES (Parser.java:1033), and the
  // paren-wrapped query `INSERT INTO t (SELECT …)` (Parser.java:1022) —
  // replacing three ordered regexes plus a masked keyword search.
  // Literal safety is structural (literals and quoted identifiers are
  // single tokens), and the ON DUPLICATE split is depth-0, so the phrase
  // inside a nested subquery can no longer split the statement.
  private sealed trait InsBody
  private final case class InsSet(assigns: String) extends InsBody
  private final case class InsValues(tuples: String, onDup: Option[String])
    extends InsBody
  private final case class InsSelect(query: String) extends InsBody
  private case object InsDefaults extends InsBody

  private def isSym(s: String, t: Lex.Token, c: Char): Boolean =
    t.kind == Lex.Sym && s.charAt(t.start) == c

  private object InsertStmt {
    /** (table, colsOrNull, body) — colsOrNull mirrors the regex capture
      * contract this replaces (null = no column list given). */
    def unapply(st: Stmt): Option[(String, String, InsBody)] = {
      val s = st.raw
      val ts = Lex.tokens(s)
      if (ts.length < 4 || !ts(0).is(s, "INSERT") || !ts(1).is(s, "INTO"))
        return None
      // bare identifiers only, as the regexes required (\w+)
      val nameTok = ts(2)
      if (nameTok.kind != Lex.Word || s.charAt(nameTok.start) == '"')
        return None
      val name = nameTok.text(s)
      var i = 3
      var cols: String = null
      if (i < ts.length && isSym(s, ts(i), '(')) {
        // matching close = first ')' back at the open's depth
        var close = i + 1
        while (close < ts.length &&
          !(isSym(s, ts(close), ')') && ts(close).depth == ts(i).depth))
          close += 1
        if (close >= ts.length) return None // unbalanced → not ours
        if (close == ts.length - 1 && i + 1 < close &&
            (ts(i + 1).is(s, "SELECT") || ts(i + 1).is(s, "FROM")))
          // INSERT INTO t (SELECT …) — whole tail is one wrapped query
          return Some((name, null,
            InsSelect(s.substring(ts(i).end, ts(close).start))))
        // column list: flat, as `\(([^)]*)\)` required — nested parens
        // fall through to the old no-match path
        var j = i + 1
        while (j < close) {
          if (isSym(s, ts(j), '(')) return None
          j += 1
        }
        cols = s.substring(ts(i).end, ts(close).start)
        i = close + 1
      }
      if (cols == null && i + 1 < ts.length && ts(i).is(s, "DEFAULT") &&
          ts(i + 1).is(s, "VALUES") && i + 2 == ts.length)
        return Some((name, null, InsDefaults))
      if (i + 1 < ts.length && ts(i).is(s, "DIRECT") && ts(i + 1).is(s, "VALUES"))
        i += 1
      if (i < ts.length && ts(i).is(s, "VALUES")) {
        val bodyStart = ts(i).end
        var k = i + 1
        var cut = -1
        while (k + 3 < ts.length && cut < 0) {
          if (ts(k).depth == 0 && ts(k).is(s, "ON") &&
              ts(k + 1).is(s, "DUPLICATE") && ts(k + 2).is(s, "KEY") &&
              ts(k + 3).is(s, "UPDATE")) cut = k
          k += 1
        }
        val body =
          if (cut < 0) InsValues(s.substring(bodyStart).stripLeading(), None)
          else InsValues(s.substring(bodyStart, ts(cut).start).trim,
            Some(s.substring(ts(cut + 3).end).trim))
        return Some((name, cols, body))
      }
      if (cols == null && i < ts.length && ts(i).is(s, "SET"))
        // MySQL INSERT INTO t SET c1=v1, … (Parser.java:1052; cols and SET
        // are mutually exclusive there too)
        return Some((name, null, InsSet(s.substring(ts(i).end))))
      if (i + 1 < ts.length && (ts(i).is(s, "SELECT") || ts(i).is(s, "FROM")))
        return Some((name, cols, InsSelect(s.substring(ts(i).start))))
      None
    }
  }

  /** Depth-0 tail split shared by UPDATE and DELETE (Parser.java:1106
    * parseUpdate / Parser.java:1163 parseDelete): optional top-level WHERE,
    * optional trailing top-level LIMIT <n>. Token scan, so a WHERE inside
    * a parenthesized subquery — `SET v = (SELECT … WHERE …)` — can no
    * longer split the statement (the lazy regexes this replaces bound to
    * the FIRST occurrence at any depth). Returns (head, whereOrNull,
    * limitOrNull) with head = the text before WHERE/LIMIT. */
  private def whereLimitTail(s: String, ts: IndexedSeq[Lex.Token],
      from: Int): (String, String, String) = {
    val n = ts.length
    // trailing LIMIT <digits> at depth 0, as `LIMIT\s+(\d+)\s*$` required
    val limIdx =
      if (n - from >= 2 && ts(n - 2).depth == 0 && ts(n - 2).is(s, "LIMIT") &&
          ts(n - 1).kind == Lex.Num && ts(n - 1).depth == 0 &&
          !ts(n - 1).text(s).exists(c => !c.isDigit)) n - 2 else n
    var w = from
    while (w < limIdx && !(ts(w).depth == 0 && ts(w).is(s, "WHERE"))) w += 1
    val headEnd = if (w < limIdx) ts(w).start
      else if (limIdx < n) ts(limIdx).start else s.length
    val head = s.substring(if (from < n) ts(from).start else s.length,
      headEnd)
    val where =
      if (w < limIdx)
        s.substring(ts(w).end,
          if (limIdx < n) ts(limIdx).start else s.length).trim
      else null
    val limit = if (limIdx < n) ts(n - 1).text(s) else null
    (head, where, limit)
  }

  /** Tokenizer-first UPDATE (Parser.java:1106): UPDATE t SET assigns
    * [WHERE cond] [LIMIT n], with the WHERE/LIMIT binding depth-0 only. */
  private object UpdateStmt {
    def unapply(st: Stmt): Option[(String, String, String, String)] = {
      val s = st.raw
      val ts = Lex.tokens(s)
      if (ts.length < 4 || !ts(0).is(s, "UPDATE")) return None
      val nameTok = ts(1)
      if (nameTok.kind != Lex.Word || s.charAt(nameTok.start) == '"') return None
      if (!ts(2).is(s, "SET")) return None
      val (sets, where, limit) = whereLimitTail(s, ts, 3)
      if (sets.trim.isEmpty) return None
      Some((nameTok.text(s), sets, where, limit))
    }
  }

  /** Tokenizer-first MERGE (Parser.java:1073 parseMerge): MERGE INTO t
    * [(cols)] [KEY(keys)] VALUES …|SELECT …|FROM …|(SELECT …). The source
    * capture keeps its leading keyword, as the regex this replaces did —
    * the dispatch arm switches on that prefix. */
  private object MergeStmt {
    def unapply(st: Stmt): Option[(String, String, String, String)] = {
      val s = st.raw
      val ts = Lex.tokens(s)
      if (ts.length < 4 || !ts(0).is(s, "MERGE") || !ts(1).is(s, "INTO"))
        return None
      val nameTok = ts(2)
      if (nameTok.kind != Lex.Word || s.charAt(nameTok.start) == '"') return None
      var i = 3
      // flat paren group (old `\(([^)]*)\)` contract): None on nesting
      def flatGroup(): Option[String] = {
        var close = i + 1
        while (close < ts.length &&
          !(isSym(s, ts(close), ')') && ts(close).depth == ts(i).depth)) {
          if (isSym(s, ts(close), '(')) return None
          close += 1
        }
        if (close >= ts.length) return None
        val g = s.substring(ts(i).end, ts(close).start)
        i = close + 1
        Some(g)
      }
      var cols: String = null
      if (i < ts.length && isSym(s, ts(i), '(') &&
          !(i + 1 < ts.length && ts(i + 1).is(s, "SELECT"))) {
        cols = flatGroup().getOrElse(return None)
      }
      var keys: String = null
      if (i + 1 < ts.length && ts(i).is(s, "KEY") && isSym(s, ts(i + 1), '(')) {
        i += 1
        keys = flatGroup().getOrElse(return None)
      }
      if (i >= ts.length) return None
      val t = ts(i)
      val srcOk = t.is(s, "VALUES") || t.is(s, "SELECT") || t.is(s, "FROM") ||
        (isSym(s, t, '(') && i + 1 < ts.length && ts(i + 1).is(s, "SELECT"))
      if (!srcOk) return None
      Some((nameTok.text(s), cols, keys, s.substring(t.start)))
    }
  }

  /** Tokenizer-first DELETE (Parser.java:1163): DELETE FROM t
    * [WHERE cond] [LIMIT n], depth-0 clause binding. */
  private object DeleteStmt {
    def unapply(st: Stmt): Option[(String, String, String)] = {
      val s = st.raw
      val ts = Lex.tokens(s)
      if (ts.length < 3 || !ts(0).is(s, "DELETE") || !ts(1).is(s, "FROM"))
        return None
      val nameTok = ts(2)
      if (nameTok.kind != Lex.Word || s.charAt(nameTok.start) == '"') return None
      val (head, where, limit) = whereLimitTail(s, ts, 3)
      if (head.trim.nonEmpty) return None // junk between table and clauses
      Some((nameTok.text(s), where, limit))
    }
  }
  // ANALYZE [TABLE t] [SAMPLE_SIZE n] (ddl/Analyze.java): selectivity
  // statistics — Catalyst keeps its own stats; accepted no-op
  private val analyzeRe =
    P(Kw("ANALYZE"), OptG(Kw("TABLE"), SkipWord),
      OptG(Kw("SAMPLE_SIZE"), SkipNum), Eos)
  private val explainAnalyzeRe = P(Kw("EXPLAIN", "ANALYZE"), Rest)
  private val createViewRe =
    P(Kw("CREATE"), Opt("OR", "REPLACE"), Opt("FORCE"), Kw("VIEW"), Ident,
      OptG(Paren), Kw("AS"), Rest)
  private val dropViewRe =
    P(Kw("DROP", "VIEW"), Opt("IF", "EXISTS"), Ident, Eos)
  // ALTER TABLE family (ddl/AlterTableAddColumn.java,
  // AlterTableAlterColumn.java, AlterTableRename.java,
  // AlterTableRenameColumn.java, AlterTableAddConstraint.java)
  private val alterRenameTableRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("RENAME", "TO"), Ident, Opt("HIDDEN"), Eos)
  private val alterAddConstraintRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("ADD", "CONSTRAINT"),
      Opt("IF", "NOT", "EXISTS"), Ident, RestNonEmpty)
  // multi-column ADD: `ADD (f3 int, f4 int)` / `ADD COLUMN(f5 int, f6 int)`
  // (AlterTableAddColumn.java list form)
  private val alterAddMultiRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("ADD"), Opt("COLUMN"), Paren, Eos)
  private val alterAddColRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("ADD"), Opt("COLUMN"),
      Opt("IF", "NOT", "EXISTS"), Ident, SpecBeforeAfter)
  private val alterDropPkRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("DROP", "PRIMARY", "KEY"), Eos)
  private val alterDropConstraintRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("DROP", "CONSTRAINT"),
      Opt("IF", "EXISTS"), Ident, Eos)
  private val alterDropColRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("DROP"), Opt("COLUMN"),
      Opt("IF", "EXISTS"), Ident, Eos)
  // ALTER/MODIFY [COLUMN] variants (AlterTableAlterColumnTest shapes:
  // `ALTER f1 TYPE long`, `MODIFY f1 long`, `MODIFY COLUMN f1 int NOT NULL`)
  private val alterRenameColRe =
    P(Kw("ALTER", "TABLE"), Ident, AltKw(Seq("ALTER"), Seq("MODIFY")),
      Opt("COLUMN"), Ident, Kw("RENAME", "TO"), Ident, Eos)
  private val alterColSetDefaultRe =
    P(Kw("ALTER", "TABLE"), Ident, AltKw(Seq("ALTER"), Seq("MODIFY")),
      Opt("COLUMN"), Ident, Kw("SET", "DEFAULT"), RestNonEmpty)
  private val alterColDropDefaultRe =
    P(Kw("ALTER", "TABLE"), Ident, AltKw(Seq("ALTER"), Seq("MODIFY")),
      Opt("COLUMN"), Ident, Kw("DROP", "DEFAULT"), Eos)
  private val alterColNullRe =
    P(Kw("ALTER", "TABLE"), Ident, AltKw(Seq("ALTER"), Seq("MODIFY")),
      Opt("COLUMN"), Ident,
      AltKw(Seq("SET", "NOT", "NULL"), Seq("SET", "NULL"),
        Seq("DROP", "NOT", "NULL")), Eos)
  private val alterColTypeRe =
    P(Kw("ALTER", "TABLE"), Ident, AltKw(Seq("ALTER"), Seq("MODIFY")),
      Opt("COLUMN"), Ident,
      OptG(AltKw(Seq("SET", "DATA", "TYPE"), Seq("TYPE"))), RestTyped)
  private val alterSetRefIntRe =
    P(Kw("ALTER", "TABLE"), Ident, Kw("SET", "REFERENTIAL_INTEGRITY"),
      AltCap("TRUE", "FALSE"), OptG(AltKw(Seq("CHECK"), Seq("NOCHECK"))), Eos)
  // CREATE/DROP INDEX (ddl/CreateIndex.java, ddl/DropIndex.java) — recorded
  // and surfaced via INFORMATION_SCHEMA.INDEXES; execution is a no-op
  // because Spark's scan planning subsumes secondary indexes.
  private val createIndexRe =
    P(Kw("CREATE"), OptCap("UNIQUE"), Opt("HASH"), Kw("INDEX"),
      Opt("IF", "NOT", "EXISTS"), Ident, Kw("ON"), Ident, Paren, Eos)
  private val dropIndexRe =
    P(Kw("DROP", "INDEX"), Opt("IF", "EXISTS"), Ident, Eos)
  // CSVWRITE('dir','sql') statement form (Function.java:353, Csv.java:123)
  private val csvWriteRe =
    P(Opt("CALL"), Kw("CSVWRITE"), Pat.Sym('('), LitCapNonEmpty,
      Pat.Sym(','), LitCap, Pat.Sym(')'), Eos)
  // CREATE ALIAS name FOR "class.method" (ddl/CreateFunctionAlias.java —
  // the reference resolves the target by reflection; so do we)
  private val createAliasRe =
    P(Kw("CREATE", "ALIAS"), Opt("IF", "NOT", "EXISTS"), Ident, Kw("FOR"),
      Quoted, Eos)
  private val dropAliasRe =
    P(Kw("DROP", "ALIAS"), Opt("IF", "EXISTS"), Ident, Eos)
  private val createConstantRe =
    P(Kw("CREATE", "CONSTANT"), Opt("IF", "NOT", "EXISTS"), Ident,
      Kw("VALUE"), Rest)
  private val dropConstantRe =
    P(Kw("DROP", "CONSTANT"), Opt("IF", "EXISTS"), Ident, Eos)
  // DOMAIN/TYPE/DATATYPE are one statement family (UserDataTypeTest:
  // "CREATE DOMAIN/TYPE/DATATYPE都是一样的"); the optional CHECK constrains
  // every column of the domain, with VALUE as the placeholder column.
  private val createDomainRe =
    P(Kw("CREATE"), AltKw(Seq("DOMAIN"), Seq("TYPE"), Seq("DATATYPE")),
      Opt("IF", "NOT", "EXISTS"), Ident, Opt("AS"), DomainTail)
  private val dropDomainRe =
    P(Kw("DROP"), AltKw(Seq("DOMAIN"), Seq("TYPE"), Seq("DATATYPE")),
      Opt("IF", "EXISTS"), Ident, Eos)
  private val domainChecks = mutable.HashMap.empty[String, String]
  private val createTriggerRe =
    P(Kw("CREATE", "TRIGGER"), Opt("IF", "NOT", "EXISTS"), Ident,
      Peek("BEFORE", "AFTER", "INSTEAD"), CapUntil("ON"), Kw("ON"), Ident,
      SkipRest)
  private val dropTriggerRe =
    P(Kw("DROP", "TRIGGER"), Opt("IF", "EXISTS"), Ident, Eos)
  // DROP ALL OBJECTS (ddl/DropDatabase.java), CREATE SCHEMA
  // (ddl/CreateSchema.java), GRANT/REVOKE (ddl/GrantRevoke.java — recorded
  // only; single-user batch engine enforces nothing)
  private val dropAllRe =
    P(Kw("DROP", "ALL", "OBJECTS"), Eos)
  private val createSchemaRe =
    P(Kw("CREATE", "SCHEMA"), Opt("IF", "NOT", "EXISTS"), Ident,
      OptG(Kw("AUTHORIZATION"), SkipWord), Eos)
  private val dropSchemaRe =
    P(Kw("DROP", "SCHEMA"), Opt("IF", "EXISTS"), Ident, Eos)
  // ALTER SCHEMA … RENAME TO (SchemaTest): system schemas are immutable
  private val alterSchemaRenameRe =
    P(Kw("ALTER", "SCHEMA"), Ident, Kw("RENAME", "TO"), Ident, Eos)
  // CREATE/ALTER/DROP USER (ddl/CreateUser.java, AlterUser.java,
  // DropUser.java — AlterUserTest shapes): recorded; a single-user batch
  // engine authenticates nothing, so passwords are noted as set, not kept
  private val createUserRe =
    P(Kw("CREATE", "USER"), Opt("IF", "NOT", "EXISTS"), Ident,
      OptG(Kw("PASSWORD"), SkipLit), OptCap("ADMIN"), Eos)
  private val alterUserRenameRe =
    P(Kw("ALTER", "USER"), Ident, Kw("RENAME", "TO"), Ident, Eos)
  private val alterUserPasswordRe =
    P(Kw("ALTER", "USER"), Ident, Kw("SET", "PASSWORD"), SkipLit, Eos)
  private val alterUserAdminRe =
    P(Kw("ALTER", "USER"), Ident, Kw("ADMIN"), AltCap("TRUE", "FALSE"), Eos)
  private val dropUserRe =
    P(Kw("DROP", "USER"), Opt("IF", "EXISTS"), Ident, Eos)
  private val users = mutable.LinkedHashMap("sa" -> true) // name → admin
  private val grantRe =
    P(Kw("GRANT"), CapUntil("ON"), Kw("ON"), Ident, Kw("TO"), Ident, Eos)
  private val revokeRe =
    P(Kw("REVOKE"), CapUntil("ON"), Kw("ON"), Ident, Kw("FROM"), Ident, Eos)
  private val schemas = mutable.LinkedHashSet("public")
  private val rights = mutable.ArrayBuffer.empty[(String, String, String)]
  // Roles + role grants (db/auth/Role.java, ddl/GrantRevoke.java; RoleTest/
  // RightTest): PUBLIC is the built-in role every user implicitly holds.
  // roleGrants edges are (role, grantee) — "grantee HAS role".
  private val roles = mutable.LinkedHashSet("public")
  private val roleGrants = mutable.ArrayBuffer.empty[(String, String)]
  private val createRoleRe =
    P(Kw("CREATE", "ROLE"), OptCap("IF", "NOT", "EXISTS"), Ident, Eos)
  private val dropRoleRe =
    P(Kw("DROP", "ROLE"), OptCap("IF", "EXISTS"), Ident, Eos)
  // GRANT/REVOKE without ON: role grants, or object-less system rights
  // (GRANT ALTER ANY SCHEMA TO u — Right.java ALTER_ANY_SCHEMA)
  private val grantRoleRe =
    P(Kw("GRANT"), CapUntil("TO"), Kw("TO"), Ident, Eos)
  private val revokeRoleRe =
    P(Kw("REVOKE"), CapUntil("FROM"), Kw("FROM"), Ident, Eos)
  // COMMENT ON <type> <name> IS 'text'|NULL (ddl/SetComment.java,
  // CommentTest). Keyed by (TYPE, unqualified tail) — COLUMN keeps
  // table.column, everything else the bare object name.
  private val commentRe =
    P(Kw("COMMENT", "ON"),
      AltCap("TABLE", "COLUMN", "ROLE", "USER", "VIEW", "INDEX", "SEQUENCE",
        "CONSTANT", "DOMAIN", "TRIGGER", "ALIAS", "SCHEMA"),
      DottedIdent, Kw("IS"), NullOrLit, Eos)
  private val comments = mutable.LinkedHashMap.empty[(String, String), String]
  /** Transitive closure of roles `grantee` possesses (Role.isRoleGranted
    * recursion) — tiny in-memory BFS over the grant edges. */
  private def hasRole(grantee: String): Set[String] = {
    var acc = Set.empty[String]
    var frontier = Set(grantee)
    while (frontier.nonEmpty) {
      val next = roleGrants.collect {
        case (r, g) if frontier.contains(g) && !acc.contains(r) => r
      }.toSet
      acc ++= next; frontier = next
    }
    acc
  }

  /** Recorded COMMENT ON text for (type, name) — CommentTest's
    * findComment surface. Type is e.g. "ROLE"/"TABLE"; COLUMN names are
    * "table.column". */
  def commentText(typ: String, name: String): Option[String] =
    comments.get((typ.toUpperCase, name.toLowerCase))

  private val explainRe = P(Kw("EXPLAIN"), Opt("PLAN", "FOR"), Rest)
  private val setVarRe =
    P(Kw("SET"), Pat.Sym('@'), Ident, Pat.Sym('='), Rest)
  private val scriptRe = P(Kw("SCRIPT"), Eos)
  // BACKUP TO 'file' (dml/Backup.java, BackupCommandTest): the engine
  // snapshots to a parquet directory instead of a zip — same contract
  // (full restorable copy), cluster-writable format
  private val backupRe = P(Kw("BACKUP", "TO"), LitCapNonEmpty, Eos)
  // SHUTDOWN [IMMEDIATELY|COMPACT|DEFRAG] (admin ShutdownServerTest):
  // a library engine has no server process — accepted no-op
  private val shutdownRe =
    P(Kw("SHUTDOWN"), OptG(AltKw(Seq("IMMEDIATELY"), Seq("COMPACT"),
      Seq("DEFRAG"), Seq("SCRIPT"))), Eos)
  private val runScriptRe = P(Kw("RUNSCRIPT", "FROM"), LitCapNonEmpty, Eos)
  private val prepareRe = P(Kw("PREPARE"), Ident, Kw("AS"), Rest)
  private val executeRe = P(Kw("EXECUTE"), Ident, OptG(Paren), Eos)
  private val deallocateRe =
    P(Kw("DEALLOCATE"), Opt("PREPARE"), Ident, Eos)
  private val setModeRe = P(Kw("SET", "MODE"), Ident, Eos)
  // transaction statements (Parser.java:560-650)
  private val beginRe =
    P(AltKw(Seq("BEGIN", "WORK"), Seq("BEGIN", "TRANSACTION"),
      Seq("START", "TRANSACTION"), Seq("BEGIN")), Eos)
  private val commitRe =
    P(AltKw(Seq("COMMIT", "WORK"), Seq("COMMIT")), Eos)
  private val rollbackToRe =
    P(Kw("ROLLBACK", "TO", "SAVEPOINT"), Ident, Eos)
  private val rollbackRe =
    P(AltKw(Seq("ROLLBACK", "WORK"), Seq("ROLLBACK")), Eos)
  private val savepointStmtRe = P(Kw("SAVEPOINT"), Ident, Eos)
  private val releaseSavepointRe =
    P(Kw("RELEASE"), Opt("SAVEPOINT"), Ident, Eos)
  private val setAutocommitRe =
    P(Kw("SET", "AUTOCOMMIT"),
      AltCap("ON", "OFF", "TRUE", "FALSE", "0", "1"), Eos)
  // database-level SET REFERENTIAL_INTEGRITY (dml/Set.java) — the standard
  // bulk-load toggle; the ALTER TABLE form additionally revalidates
  private val setRefIntRe =
    P(Kw("SET", "REFERENTIAL_INTEGRITY"), AltCap("TRUE", "FALSE"), Eos)
  // generic SET option (dml/Set.java SetTypes): recorded + surfaced in the
  // SETTINGS meta view; execution semantics live in Spark session confs
  private val setGenericRe = P(Kw("SET"), Ident, RestNonEmpty)
  // SHOW … (Parser.java:884 parseShow — MySQL/PostgreSQL compatibility
  // statements rewritten into INFORMATION_SCHEMA selects)
  private val showRe = P(Kw("SHOW"), Rest)
  // HELP [word...] → SELECT over INFORMATION_SCHEMA.HELP with one
  // UPPER(TOPIC) LIKE filter per word (Parser.parseHelp:865-882)
  private val helpRe = P(Kw("HELP"), Rest)
  // USE [=] schema → SET SCHEMA (Parser.parseUse:5063)
  private val useRe = P(Kw("USE"), OptG(Pat.Sym('=')), Ident, Eos)
  // CHECKPOINT [SYNC] (TransactionStatement CHECKPOINT/CHECKPOINT_SYNC):
  // flushing a WAL has no Spark analogue — accepted no-op, same contract
  // as SHUTDOWN; durability here is Checkpoint.cut + the parquet sinks
  private val checkpointStmtRe = P(Kw("CHECKPOINT"), Opt("SYNC"), Eos)
  // CALL expr (dml/Call.java): evaluate an expression/function as a
  // one-row result; the JDBC `?= CALL f(…)` out-parameter form strips to
  // the same statement
  private val callRe =
    P(OptG(Pat.Sym('?'), Pat.Sym('=')), Kw("CALL"), Rest)
  private val variables = mutable.HashMap.empty[String, String]
  private val procedures = mutable.HashMap.empty[String, String]
  private var compatibilityMode: String = "REGULAR"

  /** Compatibility-mode feature flags (db/Mode.java:34-141). The reference
    * ships exactly three modes — REGULAR, MySQL, PostgreSQL — each enabling
    * a fixed flag set (Mode.java:143-166); unknown names keep REGULAR
    * semantics (plus the MSSQL bracket-identifier extension handled in
    * translate). aliasColumnName holds natively (Spark returns the alias as
    * the column name); lowerCaseIdentifiers folds result column names in
    * runSelect (catalog names are lowercased in every mode). */
  private case class ModeFlags(
      convertInsertNullToZero: Boolean = false,
      indexDefinitionInCreateTable: Boolean = false,
      onDuplicateKeyUpdate: Boolean = false,
      logIsLogBase10: Boolean = false,
      serialColumnIsNotPK: Boolean = false,
      nullConcatIsNull: Boolean = true,
      lowerCaseIdentifiers: Boolean = false,
      systemColumns: Boolean = false,
      zeroDateToNull: Boolean = false)
  private def modeFlags: ModeFlags = compatibilityMode match {
    case "MYSQL" => ModeFlags(convertInsertNullToZero = true,
      indexDefinitionInCreateTable = true, onDuplicateKeyUpdate = true,
      nullConcatIsNull = false, lowerCaseIdentifiers = true,
      zeroDateToNull = true)
    case "POSTGRESQL" => ModeFlags(logIsLogBase10 = true,
      serialColumnIsNotPK = true, systemColumns = true)
    case _ => ModeFlags(indexDefinitionInCreateTable = true)
  }
  // NOT NULL columns per table (Column.java nullable) — drives MySQL-mode
  // convertInsertNullToZero and SHOW COLUMNS
  private val notNullCols = mutable.HashMap.empty[String, Set[String]]
  // column DEFAULT / computed-AS expressions (Column.java defaultExpression):
  // applied when an insert omits the column or writes the DEFAULT keyword
  private val colDefaults =
    mutable.HashMap.empty[String, mutable.LinkedHashMap[String, String]]
  // SET REFERENTIAL_INTEGRITY toggle (AlterTableSet.java): FALSE suspends
  // FK validation (bulk-load pattern), TRUE [CHECK] revalidates
  private var refIntegrity = true

  // ---- transactions (TransactionStatement, Parser.java:560-650) ----
  // A transaction is a snapshot of the catalog: every table is an immutable
  // DataFrame and every mutation re-registers a new one (copy-on-write), so
  // BEGIN captures the maps and ROLLBACK restores them — real single-session
  // snapshot semantics, the 1-session degenerate case of the reference's
  // MVCC read view. Sequences and IDENTITY counters are deliberately NOT
  // rolled back (H2/reference semantics: Sequence values survive rollback).
  // DDL is covered by the snapshot too — an extension; the reference
  // auto-commits around DDL.
  private case class CatalogSnapshot(
      tables: Seq[(String, DataFrame)],
      primaryKeys: Map[String, Seq[String]],
      identityCols: Map[String, String],
      indexes: Seq[(String, IndexDef)],
      foreignKeys: Seq[FkDef],
      checks: Seq[CheckDef],
      viewDefs: Seq[(String, String)],
      constants: Seq[(String, String)],
      domains: Seq[(String, String)],
      triggers: Seq[(String, (String, String))],
      schemas: Seq[String],
      rights: Seq[(String, String, String)],
      notNullCols: Map[String, Set[String]],
      colDefaults: Seq[(String, Seq[(String, String)])])
  private var txn: Option[CatalogSnapshot] = None
  private val savepointMap = mutable.LinkedHashMap.empty[String, CatalogSnapshot]
  private var autocommit = true
  // recorded session options (dml/Set.java SetTypes) → SETTINGS meta view
  private val sessionSettings = mutable.LinkedHashMap.empty[String, String]

  private def snapshot(): CatalogSnapshot = CatalogSnapshot(
    tables.toSeq, primaryKeys.toMap, identityCols.toMap, indexes.toSeq,
    foreignKeys.toSeq, checks.toSeq, viewDefs.toSeq, constants.toSeq,
    domains.toSeq, triggers.toSeq, schemas.toSeq, rights.toSeq,
    notNullCols.toMap, colDefaults.toSeq.map { case (t, m) => (t, m.toSeq) })

  private def restore(s: CatalogSnapshot): Unit = {
    val restored = s.tables.map(_._1).toSet
    tables.keys.filterNot(restored).toSeq.foreach(spark.catalog.dropTempView)
    tables.clear(); tables ++= s.tables
    s.tables.foreach { case (n, df) => register(n, df) } // keeps _rowid_ hidden
    primaryKeys.clear(); primaryKeys ++= s.primaryKeys
    identityCols.clear(); identityCols ++= s.identityCols
    indexes.clear(); indexes ++= s.indexes
    foreignKeys.clear(); foreignKeys ++= s.foreignKeys
    checks.clear(); checks ++= s.checks
    viewDefs.clear(); viewDefs ++= s.viewDefs
    constants.clear(); constants ++= s.constants
    domains.clear(); domains ++= s.domains
    triggers.clear(); triggers ++= s.triggers
    schemas.clear(); schemas ++= s.schemas
    rights.clear(); rights ++= s.rights
    notNullCols.clear(); notNullCols ++= s.notNullCols
    colDefaults.clear()
    s.colDefaults.foreach { case (t, ds) =>
      colDefaults(t) = mutable.LinkedHashMap(ds: _*)
    }
  }

  private def execOne(stmt0: String): DataFrame = {
    val stmt = stmt0.trim
    Stmt(stmt) match {
      case explainAnalyzeRe(q) =>
        // EXPLAIN ANALYZE (Explain.java setExecuteCommand): execute, then
        // return the executed physical plan (AQE-final, with codegen ids)
        import spark.implicits._
        val df = runSelect(q)
        df.count()
        Seq(df.queryExecution.executedPlan.toString).toDF("plan")
      case explainRe(q) =>
        // EXPLAIN [PLAN FOR] … (dml/Explain.java:30, Select.getPlanSQL)
        import spark.implicits._
        val df = runSelect(q)
        Seq(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode)).toDF("plan")
      case analyzeRe() => status()
      case setVarRe(name, value) =>
        // SET @v = expr (Variable.java:20); substituted at plan time
        variables(name.toLowerCase) =
          spark.sql(s"SELECT ${substSequences(substConstants(value))}").head().get(0) match {
            case s: String => s"'${s.replace("'", "''")}'"
            case v => String.valueOf(v)
          }
        status()
      case scriptRe() =>
        // SCRIPT (dml/Script.java): DDL re-emission as a result set
        import spark.implicits._
        script().toDF("script")
      case backupRe(path) =>
        backup(path.stripSuffix(".zip")); status()
      case shutdownRe() => status()
      case runScriptRe(path) =>
        // RUNSCRIPT FROM 'file' (dml/RunScript.java)
        sql(new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
      case setModeRe(mode) =>
        // compatibility modes MySQL/PostgreSQL/… (db/Mode.java:17): recorded;
        // coercion differences are handled by ANSI-off session conf
        compatibilityMode = mode.toUpperCase; status()
      case beginRe() =>
        txn = Some(snapshot()); savepointMap.clear(); status()
      case commitRe() =>
        txn = if (autocommit) None else Some(snapshot())
        savepointMap.clear(); status()
      case rollbackToRe(name) =>
        val sp = savepointMap.getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"savepoint $name not found"))
        restore(sp)
        // later savepoints die with the rollback (standard semantics)
        val keys = savepointMap.keys.toSeq
        keys.drop(keys.indexOf(name.toLowerCase) + 1).foreach(savepointMap.remove)
        status()
      case rollbackRe() =>
        txn.foreach(restore)
        txn = if (autocommit) None else Some(snapshot())
        savepointMap.clear(); status()
      case savepointStmtRe(name) =>
        savepointMap(name.toLowerCase) = snapshot(); status()
      case releaseSavepointRe(name) =>
        savepointMap.remove(name.toLowerCase); status()
      case setAutocommitRe(v) =>
        val on = Set("ON", "TRUE", "1")(v.toUpperCase)
        if (!on && autocommit) { autocommit = false; txn = Some(snapshot()) }
        else if (on && !autocommit) {
          autocommit = true; txn = None; savepointMap.clear()
        }
        status()
      case setRefIntRe(v) =>
        refIntegrity = v.equalsIgnoreCase("TRUE"); status()
      case prepareRe(name, body) =>
        // PREPARE/EXECUTE/DEALLOCATE procedures (ddl/PrepareProcedure.java,
        // dml/ExecuteProcedure.java): named parameterized saved queries;
        // `?` placeholders substitute positionally at EXECUTE.
        procedures(name.toLowerCase) = body; status()
      case executeRe(name, args) =>
        val body0 = procedures.getOrElse(name.toLowerCase,
          throw new IllegalArgumentException(s"no prepared statement $name"))
        var body = body0
        // positional `?` substitution, skipping any ? inside string literals
        Option(args).toSeq.flatMap(splitTop(_)).map(_.trim).foreach { a =>
          val spans = literalSpans(body)
          val idx = Iterator.iterate(body.indexOf('?'))(i => body.indexOf('?', i + 1))
            .takeWhile(_ >= 0)
            .find(i => !spans.exists(sp => i >= sp._1 && i < sp._2))
          idx.foreach(i => body = body.substring(0, i) + a + body.substring(i + 1))
        }
        execOne(body)
      case deallocateRe(name) =>
        procedures.remove(name.toLowerCase); status()
      case createViewRe(name, colList, query) =>
        viewDefs(name.toLowerCase) = query.trim
        val df0 = runSelect(query)
        // optional view column list renames positionally (TableView.java)
        val df = Option(colList).map(cl =>
          df0.toDF(cl.split(",").map(_.trim.toLowerCase).toSeq: _*)).getOrElse(df0)
        register(name, df); status()
      case dropViewRe(name) =>
        viewDefs.remove(name.toLowerCase)
        tables.remove(name.toLowerCase)
        spark.catalog.dropTempView(name.toLowerCase); status()
      case alterRenameTableRe(a, b) =>
        renameTable(a.toLowerCase, b.toLowerCase); status()
      case alterAddConstraintRe(tn, cn, body) =>
        addConstraint(tn.toLowerCase, cn.toLowerCase, body.trim); status()
      case alterSetRefIntRe(tn, v) =>
        // SET REFERENTIAL_INTEGRITY (AlterTableSet.java): FALSE suspends FK
        // checks (bulk-load pattern); TRUE revalidates the table's FKs
        refIntegrity = v.equalsIgnoreCase("TRUE")
        if (refIntegrity)
          foreignKeys.filter(_.table == tn.toLowerCase).foreach { fk =>
            require(Dml.fkViolations(table(fk.table), fk.cols,
              table(fk.refTable), fk.refCols).isEmpty,
              s"FK ${fk.name} violated on revalidation")
          }
        status()
      case alterDropPkRe(tn) =>
        primaryKeys.remove(tn.toLowerCase); status()
      case alterDropConstraintRe(_, cn) =>
        val n = cn.toLowerCase
        foreignKeys.filterInPlace(_.name != n)
        checks.filterInPlace(_.name != n)
        indexes.remove(n); status()
      case alterDropColRe(tn, c) =>
        if (table(tn).columns.contains(c.toLowerCase))
          register(tn, table(tn).drop(c.toLowerCase))
        colDefaults.get(tn.toLowerCase).foreach(_.remove(c.toLowerCase))
        status()
      case alterRenameColRe(tn, from, to) =>
        register(tn, table(tn).withColumnRenamed(from.toLowerCase, to.toLowerCase))
        primaryKeys.get(tn.toLowerCase).foreach { ks =>
          primaryKeys(tn.toLowerCase) =
            ks.map(k => if (k == from.toLowerCase) to.toLowerCase else k)
        }
        if (identityCols.get(tn.toLowerCase).contains(from.toLowerCase))
          identityCols(tn.toLowerCase) = to.toLowerCase
        colDefaults.get(tn.toLowerCase).foreach { ds =>
          ds.remove(from.toLowerCase).foreach(d => ds(to.toLowerCase) = d)
        }
        notNullCols.get(tn.toLowerCase).foreach { nn =>
          if (nn(from.toLowerCase))
            notNullCols(tn.toLowerCase) = nn - from.toLowerCase + to.toLowerCase
        }
        status()
      case alterColSetDefaultRe(tn, c, d) =>
        colDefaults.getOrElseUpdate(tn.toLowerCase,
          mutable.LinkedHashMap.empty)(c.toLowerCase) = d.trim
        status()
      case alterColDropDefaultRe(tn, c) =>
        colDefaults.get(tn.toLowerCase).foreach(_.remove(c.toLowerCase)); status()
      case alterColNullRe(_, _) =>
        // nullability is advisory in a snapshot engine; accepted for parity
        status()
      case alterAddMultiRe(tn, defs) =>
        splitTop(defs).map(_.trim).filter(_.nonEmpty).foreach { d =>
          val parts = d.split("\\s+", 2)
          addColumn(tn, parts(0), if (parts.length > 1) parts(1) else "STRING",
            None, None)
        }
        status()
      case alterAddColRe(tn, cName, typeSpec, before, after)
          if !cName.equalsIgnoreCase("CONSTRAINT") =>
        addColumn(tn, cName, typeSpec, Option(before), Option(after)); status()
      case alterColTypeRe(tn, cName, typeSpec)
          // SET/SELECTIVITY/RESTART/DROP forms are attribute tweaks, not
          // type changes — never mis-parse their keywords as a type
          if !Set("SET", "SELECTIVITY", "RESTART", "DROP", "RENAME")
            .contains(typeSpec.trim.split("\\s+")(0).toUpperCase) =>
        val t = table(tn)
        val c = cName.toLowerCase
        register(tn, t.withColumn(c, col(c).cast(parseType(typeSpec))))
        status()
      case alterColTypeRe(_, _, _) =>
        status() // attribute-only ALTER COLUMN form: advisory in a snapshot engine
      case createPkRe(name, tn, cols) =>
        // CREATE PRIMARY KEY [HASH] name ON t(cols) (index-test shapes)
        val ks = cols.split(",").map(_.trim.toLowerCase).toSeq
        require(Dml.duplicateKeys(table(tn), ks).isEmpty,
          s"PRIMARY KEY $name violated by existing rows")
        primaryKeys(tn.toLowerCase) = ks
        indexes(name.toLowerCase) =
          IndexDef(name.toLowerCase, tn.toLowerCase, ks, unique = true)
        status()
      case dropSeqRe(name) =>
        sequences.remove(name.toLowerCase); status()
      case createDatabaseRe(name) =>
        databases += name.toLowerCase; status()
      case dropDatabaseRe(name) =>
        require(name.toLowerCase != "graft", "cannot drop the current database")
        databases -= name.toLowerCase; status()
      case createIndexRe(unique, name, tn, cols) =>
        val ks = cols.split(",").map(_.trim.toLowerCase).toSeq
        if (unique != null)
          require(Dml.duplicateKeys(nonNullKeyed(table(tn), ks), ks).isEmpty,
            s"unique index $name violated by existing rows")
        indexes(name.toLowerCase) =
          IndexDef(name.toLowerCase, tn.toLowerCase, ks, unique != null)
        status()
      case dropIndexRe(name) =>
        indexes.remove(name.toLowerCase); status()
      case csvWriteRe(path, querySql) =>
        // H2's CSVWRITE returns the written row count; the path is a
        // directory (Spark writes partitioned files — coalesced to one for
        // the reference's single-file contract)
        import spark.implicits._
        val df = runSelect(querySql.replace("''", "'"))
        val n = df.count()
        df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
        Seq(n).toDF("rows_written")
      case createAliasRe(name, target) =>
        ReflectAlias.register(spark, name.toLowerCase, target)
        aliases(name.toLowerCase) = target; status()
      case dropAliasRe(name) =>
        aliases.remove(name.toLowerCase)
        spark.sql(s"DROP TEMPORARY FUNCTION IF EXISTS ${name.toLowerCase}")
        status()
      case createConstantRe(name, value) =>
        constants(name.toLowerCase) = value.trim; status()
      case dropConstantRe(name) =>
        constants.remove(name.toLowerCase); status()
      case createDomainRe(name, baseType, check) =>
        // resolves through parseType, so the domain is usable in CREATE
        // TABLE column definitions (CreateUserDataType.java)
        domains(name.toLowerCase) = baseType.trim
        Option(check).foreach(c => domainChecks(name.toLowerCase) = c.trim)
        status()
      case dropDomainRe(name) =>
        domains.remove(name.toLowerCase)
        domainChecks.remove(name.toLowerCase); status()
      case createTriggerRe(name, timing, tableName) =>
        triggers(name.toLowerCase) =
          (tableName.toLowerCase, timing.trim.toUpperCase.replaceAll("\\s+", " "))
        status()
      case dropTriggerRe(name) =>
        triggers.remove(name.toLowerCase); status()
      case dropAllRe() =>
        tables.keys.toSeq.foreach(spark.catalog.dropTempView)
        tables.clear(); primaryKeys.clear(); identityCols.clear()
        identityNext.clear(); sequences.clear(); indexes.clear()
        foreignKeys.clear(); checks.clear(); viewDefs.clear()
        constants.clear(); domains.clear(); triggers.clear(); rights.clear()
        notNullCols.clear(); colDefaults.clear()
        roles.clear(); roles += "public"; roleGrants.clear()
        comments.clear(); rowidPk.clear(); rowidTables.clear()
        rowidNext.clear()
        status()
      case createSchemaRe(name) =>
        schemas += name.toLowerCase; status()
      case dropSchemaRe(name) =>
        require(name.toLowerCase != "public", "cannot drop PUBLIC")
        schemas -= name.toLowerCase; status()
      case alterSchemaRenameRe(from, to) =>
        val f = from.toLowerCase
        require(f != "information_schema" && f != "public",
          s"schema $from can not be renamed") // SCHEMA_CAN_NOT_BE_DROPPED
        require(schemas.remove(f), s"schema $from not found")
        schemas += to.toLowerCase; status()
      case createUserRe(name, admin) =>
        users(name.toLowerCase) = admin != null; status()
      case alterUserRenameRe(from, to) =>
        users.remove(from.toLowerCase).foreach(a => users(to.toLowerCase) = a)
        status()
      case alterUserPasswordRe(name) =>
        require(users.contains(name.toLowerCase), s"user $name not found")
        status()
      case alterUserAdminRe(name, admin) =>
        require(users.contains(name.toLowerCase), s"user $name not found")
        users(name.toLowerCase) = admin.equalsIgnoreCase("TRUE"); status()
      case dropUserRe(name) =>
        users.remove(name.toLowerCase); status()
      case grantRe(privs, obj, grantee) =>
        // a role name inside an ON-form right list is the reference's
        // ROLES_AND_RIGHT_CANNOT_BE_MIXED error (GrantRevoke.java)
        if (privs.split(",").map(_.trim.toLowerCase).exists(roles.contains))
          throw new IllegalArgumentException(
            "roles and rights cannot be mixed")
        privs.split(",").map(_.trim.toUpperCase).foreach(p =>
          rights += ((grantee.toLowerCase, p, obj.toLowerCase)))
        status()
      case revokeRe(privs, obj, grantee) =>
        val revoked = privs.split(",").map(_.trim.toUpperCase).toSet
        rights.filterInPlace { case (g, p, o) =>
          !(g == grantee.toLowerCase && o == obj.toLowerCase && revoked(p))
        }
        status()
      case createRoleRe(ifNot, name) =>
        val n = name.toLowerCase
        if (users.contains(n)) // USER_ALREADY_EXISTS_1, even under IF NOT EXISTS
          throw new IllegalArgumentException(s"user $name already exists")
        if (roles.contains(n)) {
          if (ifNot == null)
            throw new IllegalArgumentException(s"role $name already exists")
        } else roles += n
        status()
      case dropRoleRe(ifEx, name) =>
        val n = name.toLowerCase
        if (n == "public") // DbObjectTestBase: the system role is undroppable
          throw new IllegalArgumentException("role PUBLIC cannot be dropped")
        if (!roles.remove(n) && ifEx == null)
          throw new IllegalArgumentException(s"role $name not found")
        roleGrants.filterInPlace { case (r, g) => r != n && g != n }
        comments.remove(("ROLE", n))
        status()
      case grantRoleRe(items0, grantee) =>
        val items = items0.split(",").map(_.trim)
        val (rs, nonRoles) = items.partition(i => roles.contains(i.toLowerCase))
        if (rs.nonEmpty && nonRoles.nonEmpty)
          throw new IllegalArgumentException("roles and rights cannot be mixed")
        val g = grantee.toLowerCase
        if (rs.isEmpty)
          // object-less system right (GRANT ALTER ANY SCHEMA TO u)
          items.map(_.toUpperCase).foreach(p => rights += ((g, p, "*")))
        else rs.foreach { r =>
          val rn = r.toLowerCase
          // duplicate (incl. transitive) or cycle → ROLE_ALREADY_GRANTED_1
          if (rn == g || hasRole(g).contains(rn) || hasRole(rn).contains(g))
            throw new IllegalArgumentException(s"role $r already granted")
          roleGrants += ((rn, g))
        }
        status()
      case revokeRoleRe(items0, grantee) =>
        val g = grantee.toLowerCase
        val items = items0.split(",").map(_.trim.toLowerCase).toSet
        roleGrants.filterInPlace { case (r, gr) =>
          !(gr == g && items.contains(r)) }
        rights.filterInPlace { case (gr, p, o) =>
          !(gr == g && o == "*" && items.contains(p.toLowerCase)) }
        status()
      case commentRe(typ, qname, text) =>
        val t = typ.toUpperCase
        val tail = qname.toLowerCase.split("\\.")
          .takeRight(if (t == "COLUMN") 2 else 1).mkString(".")
        t match {
          case "TABLE" => require(tables.contains(tail),
            s"table $qname not found")
          case "COLUMN" =>
            tail.split("\\.") match {
              case Array(tn, cn) =>
                require(tables.get(tn).exists(
                  _.columns.map(_.toLowerCase).contains(cn)),
                  s"column $qname not found")
              case _ => throw new IllegalArgumentException(
                s"COMMENT ON COLUMN needs table.column, got $qname")
            }
          case "ROLE" => require(roles.contains(tail), s"role $qname not found")
          case "USER" => require(users.contains(tail), s"user $qname not found")
          case _ =>
        }
        if (text.equalsIgnoreCase("NULL")) comments.remove((t, tail))
        else comments((t, tail)) =
          text.stripPrefix("'").stripSuffix("'").replace("''", "'")
        status()
      case createTableAsRe(name, query) =>
        register(name, runSelect(query)); status()
      case createTableRe(name, colDefs) =>
        val tn = name.toLowerCase
        val (schema, pks0, inlineIdx) = parseColumnDefs(colDefs)
        var pks = pks0
        val notNull = mutable.Set.empty[String]
        // IDENTITY / AUTO_INCREMENT / SERIAL column (Column.java
        // auto-increment + backing Sequence, Sequence.java:25):
        // engine-assigned ids. SERIAL/BIGSERIAL is auto-increment PK except
        // under PostgreSQL mode (Mode.java serialColumnIsNotPK).
        splitTop(colDefs).map(_.trim).foreach { d =>
          val up = maskedUpper(d) // literal-blind: DEFAULT 'NOT NULL' is data
          val cn = d.split("\\s+")(0).toLowerCase
          val typeTok = up.split("\\s+").drop(1).headOption.getOrElse("")
          val serial = typeTok.startsWith("SERIAL") || typeTok.startsWith("BIGSERIAL")
          if (up.contains("IDENTITY") || up.contains("AUTO_INCREMENT") || serial) {
            identityCols(tn) = cn
            identityNext(tn) = 1L
            if (serial && !modeFlags.serialColumnIsNotPK && !pks.contains(cn))
              pks = pks :+ cn
          }
          if (up.contains("NOT NULL") || up.contains("PRIMARY KEY")) notNull += cn
        }
        if (pks.nonEmpty) { primaryKeys(tn) = pks; notNull ++= pks }
        notNullCols(tn) = notNull.toSet
        // domain CHECKs attach to every column declared with the domain
        // type (UserDataType column constraint): VALUE → the column name,
        // enforced by the same per-batch validator as table CHECKs
        splitTop(colDefs).map(_.trim).foreach { d =>
          val toks = d.split("\\s+")
          if (toks.length >= 2) {
            val cn = toks(0).toLowerCase
            val base = toks(1).takeWhile(c => c.isLetter || c == '_').toLowerCase
            domainChecks.get(base).foreach { chk =>
              checks += CheckDef(s"${tn}_${cn}_domain", tn,
                chk.replaceAll("(?i)\\bVALUE\\b", cn))
            }
          }
        }
        // DEFAULT expr / computed `AS expr` column options (Column.java
        // defaultExpression) — applied on omitted columns and the DEFAULT
        // keyword in VALUES
        // trailing column options (NOT NULL / AUTO_INCREMENT / UNIQUE) are
        // not part of the default expression
        // token scan: DEFAULT keyword + trailing-option stripping can
        // never bind inside a default literal (DEFAULT 'x NOT NULL' is
        // one token)
        splitTop(colDefs).map(_.trim).foreach { d0 =>
          defaultClause(d0, leadIdent = true) match {
            case Some((cn, dflt)) if !cn.equalsIgnoreCase("PRIMARY") =>
              colDefaults.getOrElseUpdate(tn,
                mutable.LinkedHashMap.empty)(cn.toLowerCase) = dflt.trim
            case _ =>
          }
        }
        inlineIdx.foreach { case (ixName, cols, unique) =>
          indexes(ixName) = IndexDef(ixName, tn, cols, unique)
        }
        // _ROWID_ pseudo-column wiring (PseudoColumnTest): a single
        // integral PRIMARY KEY IS the row id (StandardPrimaryIndex
        // clustered key); otherwise a hidden engine-assigned column —
        // unless the user declared _rowid_ as an ordinary column.
        import org.apache.spark.sql.types._
        val intPk = pks match {
          case Seq(pk) => schema.fields
            .find(_.name.equalsIgnoreCase(pk))
            .filter(f => Seq(ByteType, ShortType, IntegerType, LongType)
              .contains(f.dataType))
            .map(_ => pk.toLowerCase)
          case _ => None
        }
        val declaredRowid =
          schema.fieldNames.exists(_.equalsIgnoreCase("_rowid_"))
        val finalSchema = intPk match {
          case Some(pk) => rowidPk(tn) = pk; schema
          case None if !declaredRowid =>
            rowidTables += tn; rowidNext(tn) = 1L
            schema.add("_rowid_", LongType)
          case None => schema
        }
        register(name, spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], finalSchema))
        status()
      case dropTableRe(name) =>
        tables.remove(name.toLowerCase)
        rowidPk.remove(name.toLowerCase); rowidTables.remove(name.toLowerCase)
        rowidNext.remove(name.toLowerCase)
        // comments die with the object (as DROP ROLE already does and the
        // reference does for every schema object) — otherwise a re-created
        // table of the same name inherits the stale remark via script()
        comments.remove(("TABLE", name.toLowerCase))
        comments.filterInPlace { case ((t, n), _) =>
          !(t == "COLUMN" && n.startsWith(name.toLowerCase + ".")) }
        spark.catalog.dropTempView(name.toLowerCase); status()
      case truncateRe(name) =>
        register(name, Dml.truncate(table(name))); status()
      case createSeqRe(name, start, inc) =>
        sequences(name.toLowerCase) = new Sequence(
          Option(start).map(_.toLong).getOrElse(1L),
          Option(inc).map(_.toLong).getOrElse(1L))
        status()
      case InsertStmt(name, cols, body) =>
        body match {
          case InsValues(tuples, Some(sets)) if modeFlags.onDuplicateKeyUpdate =>
            doUpsert(name, Option(cols),
              parseValueRows(name, tuples,
                Option(cols).map(c => splitTop(c).map(_.trim.toLowerCase))), sets)
          case InsValues(_, Some(_)) =>
            throw new IllegalArgumentException(
              "INSERT … ON DUPLICATE KEY UPDATE requires SET MODE MySQL " +
                "(Mode.java onDuplicateKeyUpdate)")
          case InsSet(sets) =>
            // MySQL INSERT INTO t SET c=v, … (Parser.java:1052)
            val pairs = splitTop(sets).map { s0 =>
              val Array(c, v) = s0.split("=", 2); (c.trim.toLowerCase, v.trim)
            }
            doInsert(name, Some(pairs.map(_._1).mkString(",")),
              parseValueRows(name, "(" + pairs.map(_._2).mkString(", ") + ")",
                Some(pairs.map(_._1))))
          case InsValues(tuples, None) =>
            doInsert(name, Option(cols),
              parseValueRows(name, tuples,
                Option(cols).map(c => splitTop(c).map(_.trim.toLowerCase))))
          case InsDefaults =>
            // INSERT INTO t DEFAULT VALUES (Parser.java:1033): one row,
            // every declared column at its DEFAULT (hidden _rowid_ and
            // IDENTITY columns fill themselves downstream)
            val tn = name.toLowerCase
            val n = table(name).columns
              .count(c => !(rowidTables.contains(tn) && c == "_rowid_"))
            doInsert(name, None,
              parseValueRows(name, "(" + Seq.fill(n)("DEFAULT").mkString(", ") + ")"))
          case InsSelect(query) =>
            doInsert(name, Option(cols), selectForInsert(query))
        }
        status()
      case MergeStmt(name, cols, keys, source) =>
        val src = source.trim match {
          case v if v.toUpperCase.startsWith("VALUES") =>
            parseValueRows(name, v.substring(6),
              Option(cols).map(c => splitTop(c).map(_.trim.toLowerCase)))
          case p if p.startsWith("(") && p.endsWith(")") =>
            runSelect(p.substring(1, p.length - 1)) // MERGE … KEY(k) (SELECT …)
          case q => runSelect(q)
        }
        val t = table(name)
        val aligned0m = alignForWrite(name.toLowerCase,
          Option(cols).map(splitTop(_).map(_.trim)), src)
        // hidden-rowid tables: merged rows take fresh ids (storage keys are
        // not stable across H2 updates either)
        val aligned = if (rowidTables.contains(name.toLowerCase))
          fillRowid(name.toLowerCase, aligned0m, Option(cols).exists(
            splitTop(_).exists(_.trim.equalsIgnoreCase("_rowid_"))))
        else aligned0m
        val key = Option(keys).map(_.split(",").map(_.trim.toLowerCase).toSeq)
          .orElse(primaryKeys.get(name.toLowerCase))
          .getOrElse(Seq(t.columns.head))
        // row hooks per arm (H2 MERGE fires update-else-insert row
        // triggers, Merge.java:146): replaced = source rows whose key
        // exists, inserted = the rest; deltas are lazy
        val tn = name.toLowerCase
        val srcAligned = aligned.toDF(t.columns.toSeq: _*)
        val keyCols = key.map(col)
        val oldMatched = t.join(
          srcAligned.select(keyCols: _*).distinct(), key, "left_semi")
        val replaced = srcAligned.join(
          t.select(keyCols: _*).distinct(), key, "left_semi")
        val insertedArm = srcAligned.join(
          t.select(keyCols: _*).distinct(), key, "left_anti")
        if (!(fireTriggers(tn, "UPDATE", "BEFORE", oldMatched, replaced) |
            fireTriggers(tn, "INSERT", "BEFORE", t.limit(0), insertedArm))) {
          register(name, Dml.mergeInto(t, aligned, key))
          fireTriggers(tn, "UPDATE", "AFTER", oldMatched, replaced)
          fireTriggers(tn, "INSERT", "AFTER", t.limit(0), insertedArm)
        }
        status()
      case UpdateStmt(name, sets, where, limit) =>
        val t = table(name)
        val cond0 = Option(where).map(w =>
          expr(substSequences(substConstants(w, Seq(name.toLowerCase)))))
          .getOrElse(lit(true))
        val setMap = splitTop(sets).map { s =>
          val Array(c, v) = s.split("=", 2)
          c.trim -> expr(substSequences(substConstants(v.trim, Seq(name.toLowerCase))))
        }.toMap
        // (out, oldRows): the rewritten table plus the exact victim set —
        // LIMIT restricts the row-hook delta to the rows actually updated
        val (out, oldRows) = Option(limit) match {
          case None =>
            (Dml.update(t, cond0, setMap), t.filter(coalesce(cond0, lit(false))))
          case Some(n) => // H2 UPDATE..LIMIT: first n matching rows.
            // orderBy+limit plans as TakeOrderedAndProject (no full sort
            // shuffle), and the ≤n victim ids broadcast back to the scan.
            val rid = t.withColumn("__rid", monotonically_increasing_id())
            val victims = rid.filter(cond0).orderBy(col("__rid")).limit(n.toInt)
              .select(col("__rid").as("__vic"))
            (Dml.update(
                rid.join(broadcast(victims), col("__rid") === col("__vic"), "left"),
                col("__vic").isNotNull, setMap)
              .drop("__rid", "__vic"),
              rid.join(broadcast(victims), col("__rid") === col("__vic"), "left_semi")
                .drop("__rid"))
        }
        // row-hook deltas: old = updated rows, new = those rows with the
        // SET list applied (Update.java fire sites, batched)
        val tn = name.toLowerCase
        val newRows = Dml.update(oldRows, lit(true), setMap)
        if (!fireTriggers(tn, "UPDATE", "BEFORE", oldRows, newRows)) {
          register(name, out)
          fireTriggers(tn, "UPDATE", "AFTER", oldRows, newRows)
        }
        status()
      case DeleteStmt(name, where, limit) =>
        val t = table(name)
        val cond0 = Option(where).map(w =>
          expr(substSequences(substConstants(w, Seq(name.toLowerCase)))))
          .getOrElse(lit(true))
        // (out, oldRows): LIMIT restricts the row-hook delta to the rows
        // actually deleted (Delete.java fire sites)
        val (out, oldRows) = Option(limit) match {
          case None =>
            (Dml.delete(t, cond0), t.filter(coalesce(cond0, lit(false))))
          case Some(n) =>
            val rid = t.withColumn("__rid", monotonically_increasing_id())
            val victims = rid.filter(cond0).orderBy(col("__rid")).limit(n.toInt)
              .select(col("__rid").as("__vic"))
            (rid.join(broadcast(victims), col("__rid") === col("__vic"), "left_anti")
              .drop("__rid"),
              rid.join(broadcast(victims), col("__rid") === col("__vic"), "left_semi")
                .drop("__rid"))
        }
        val tn = name.toLowerCase
        if (!fireTriggers(tn, "DELETE", "BEFORE", oldRows, t.limit(0))) {
          register(name, out)
          fireTriggers(tn, "DELETE", "AFTER", oldRows, t.limit(0))
        }
        status()
      case helpRe(topic) =>
        val words = topic.trim.split("\\s+").filter(_.nonEmpty)
        val where = if (words.isEmpty) ""
          else words.map(w => s"UPPER(topic) LIKE '%${
            w.toUpperCase.replace("'", "''")}%'").mkString(" WHERE ", " AND ", "")
        runSelect(s"SELECT * FROM INFORMATION_SCHEMA.HELP$where")
      case useRe(schema) =>
        require(schemas.contains(schema.toLowerCase) ||
          schema.equalsIgnoreCase("information_schema"),
          s"schema $schema not found")
        sessionSettings("SCHEMA") = schema.toLowerCase; status()
      case checkpointStmtRe() => status()
      case showRe(what) => execShow(what.trim)
      case callRe(e) => runSelect(s"SELECT $e")
      case setGenericRe(opt, value) =>
        sessionSettings(opt.toUpperCase) = value.trim
        // turning statistics off discards collected data (reference
        // QueryStatisticsData lifecycle)
        if (opt.equalsIgnoreCase("QUERY_STATISTICS") &&
            (value.trim == "0" || value.trim.equalsIgnoreCase("FALSE")))
          queryStats.clear()
        status()
      case _ => runSelect(stmt)
    }
  }

  /** SHOW … (Parser.java:884 parseShow): each form rewrites to a select —
    * the same strategy as the reference, which builds SELECT text over
    * INFORMATION_SCHEMA (or DUAL constants for the PostgreSQL-protocol
    * session settings). */
  private def execShow(what: String): DataFrame = {
    import spark.implicits._
    def one(name: String, value: String) = Seq(value).toDF(name)
    val up = what.toUpperCase.replaceAll("\\s+", " ")
    val showTablesRe = """(?i)^TABLES(?:\s+FROM\s+(\w+))?$""".r
    val showColumnsRe = """(?i)^COLUMNS\s+FROM\s+(\w+)(?:\s+FROM\s+(\w+))?$""".r
    what.trim match {
      case _ if up == "DATABASES" =>
        runSelect("SELECT database_name FROM INFORMATION_SCHEMA.DATABASES")
      case _ if up == "SCHEMAS" =>
        runSelect("SELECT schema_name FROM INFORMATION_SCHEMA.SCHEMATA")
      // PostgreSQL-protocol session settings (Parser.java:892-910)
      case _ if up == "CLIENT_ENCODING" => one("client_encoding", "UNICODE")
      case _ if up == "DEFAULT_TRANSACTION_ISOLATION" =>
        one("default_transaction_isolation", "read committed")
      case _ if up == "TRANSACTION ISOLATION LEVEL" =>
        one("transaction_isolation", "read committed")
      case _ if up == "DATESTYLE" => one("datestyle", "ISO")
      case _ if up == "SERVER_VERSION" => one("server_version", "8.1.4")
      case _ if up == "SERVER_ENCODING" => one("server_encoding", "UTF8")
      case showTablesRe(schema) =>
        val s = Option(schema).map(_.toLowerCase).getOrElse("public")
        runSelect("SELECT table_name, table_schema FROM INFORMATION_SCHEMA.TABLES " +
          s"WHERE table_schema='$s' ORDER BY table_name")
      case showColumnsRe(tn, _) =>
        // FIELD/TYPE/NULL/KEY/DEFAULT shape (Parser.java:922-933); KEY is
        // PRI for a primary-key column, UNI for a unique-indexed one
        val t = tn.toLowerCase
        val pk = primaryKeys.getOrElse(t, Seq.empty).toSet
        val uni = indexes.values.filter(ix => ix.unique && ix.table == t)
          .flatMap(_.cols).toSet
        val nn = notNullCols.getOrElse(t, Set.empty)
        val defs = colDefaults.getOrElse(t,
          mutable.LinkedHashMap.empty[String, String])
        table(t).schema.fields.toSeq.map { f =>
          (f.name, f.dataType.catalogString.toUpperCase,
            // PRIMARY KEY implies NOT NULL (Column.java PK nullability)
            if (f.nullable && !pk(f.name) && !nn(f.name)) "YES" else "NO",
            if (pk(f.name)) "PRI" else if (uni(f.name)) "UNI" else "",
            defs.getOrElse(f.name, "NULL"))
        }.toDF("field", "type", "null", "key", "default")
      case other => throw new IllegalArgumentException(s"SHOW $other not supported")
    }
  }

  private def status(): DataFrame = {
    import spark.implicits._
    Seq("OK").toDF("status")
  }

  // ---- SELECT translation ----

  private[sqlfront] def translate(q0: String): String = {
    var q = q0.trim
    // FROM-first: FROM <from...> SELECT <rest>  (Parser.java:1397) —
    // tokenizer-dispatched: the leading keyword is a TOKEN test (a table
    // named `fromage` can never steer here the way startsWith("FROM") could)
    val qToks = Lex.tokens(q)
    if (qToks.nonEmpty && qToks.head.is(q, "FROM")) {
      val selIdx = topLevelIndexOf(q, "SELECT")
      if (selIdx > 0) {
        var fromPart = q.substring(qToks.head.end, selIdx).trim
        // scalar-function source (`FROM USER() SELECT *`, misc tests):
        // a one-row derived table named after the function. TABLE functions
        // (SYSTEM_RANGE/CSVREAD/TABLE…) must NOT be wrapped — their view
        // rewrites run later and expect FROM position; nor multi-source
        // lists (top-level comma).
        val tableFns = Set("system_range", "csvread", "table", "table_distinct")
        // token shape of a bare call: WORD '(' … ')' with the final paren
        // closing the first (depth back to 0 only at the end)
        val fToks = Lex.tokens(fromPart)
        val isCall = fToks.length >= 3 &&
          fToks.head.kind == Lex.Word && !fromPart.startsWith("\"") &&
          fToks(1).kind == Lex.Sym && fromPart.charAt(fToks(1).start) == '(' &&
          fToks.last.kind == Lex.Sym &&
          fromPart.charAt(fToks.last.start) == ')' && fToks.last.depth == 0
        if (isCall) {
          val fn = fToks.head.text(fromPart)
          if (!tables.contains(fn.toLowerCase) &&
              !tableFns.contains(fn.toLowerCase) &&
              splitTop(fromPart).size == 1)
            fromPart = s"(SELECT $fromPart AS ${fn.toLowerCase})"
        }
        val rest = q.substring(selIdx + 6).trim
        // WHERE/GROUP/ORDER/... belong after the re-inserted FROM
        val tailIdx = earliestTopLevel(rest,
          Seq("WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT", "OFFSET"))
        q = if (tailIdx < 0) s"SELECT $rest FROM $fromPart"
        else s"SELECT ${rest.substring(0, tailIdx)} FROM $fromPart ${rest.substring(tailIdx)}"
      }
    }
    // All rewrites below are token-pattern passes (Rw.rewrite): literal
    // safety is structural — a quoted 'user@example.com' or 'LIMIT 3,4'
    // inside a string is ONE token no bare-keyword pattern can match
    // (translate used to be string-blind — round-1 advice; the regex
    // successor's span-exclusion is retired with the regexes themselves).
    import Rw.{W => RwW, Kw => RwKw, Sy, AdjSy, AnyW, AdjAnyW, Digits,
      SignedDigits, OptE, Not, Peek, End => REnd}
    import Rw.{Lit => RLit}
    // Mode-gated syntax (db/Mode.java): MSSQL bracket identifiers.
    if (compatibilityMode == "MSSQLSERVER" || compatibilityMode == "MSSQL")
      q = Rw.rewrite(q, Sy('['), AnyW, Sy(']'))(c => s"`${c(0)}`")
    // SYSTEM_RANGE(a,b[,s]) → registered range view
    q = Rw.rewrite(q, RwKw("SYSTEM_RANGE"), Sy('('), SignedDigits, Sy(','),
        SignedDigits, OptE(Sy(','), SignedDigits), Sy(')')) { c =>
      val (a, b) = (c(0).toLong, c(1).toLong)
      val step = Option(c(2)).map(_.toLong).getOrElse(1L)
      rangeViewId += 1
      val v = s"graft_system_range_$rangeViewId"
      spark.range(a, b + (if (step > 0) 1 else -1), step).toDF("x")
        .createOrReplaceTempView(v)
      v
    }
    // CSVREAD('path') → registered csv view
    q = Rw.rewrite(q, RwKw("CSVREAD"), Sy('('),
        RLit(inner => inner.nonEmpty && !inner.contains("'")), Sy(')')) { c =>
      rangeViewId += 1
      val v = s"graft_csvread_$rangeViewId"
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(c(0)).createOrReplaceTempView(v)
      v
    }
    // TABLE(c T=ARRAY[…] …) / TABLE_DISTINCT in FROM position
    // (expression/function/TableFunction.java:32-160) → registered view
    q = rewriteTableFunctions(q)
    // ORDER BY =n → ORDER BY n (Parser.java:1493)
    q = Rw.rewrite(q, RwKw("ORDER"), RwKw("BY"), Sy('='), Digits)(c =>
      s"ORDER BY ${c(0)}")
    // H2/MSSQL `SELECT TOP n …` → LIMIT n appended (token-dispatched:
    // SELECT TOP <num> as the first three tokens)
    locally {
      val ts = Lex.tokens(q)
      if (ts.length >= 4 && ts(0).is(q, "SELECT") && ts(1).is(q, "TOP") &&
          ts(2).kind == Lex.Num)
        q = s"SELECT ${q.substring(ts(3).start)} LIMIT ${ts(2).text(q)}"
    }
    // MySQL `LIMIT offset, count` → LIMIT count OFFSET offset
    q = Rw.rewrite(q, RwKw("LIMIT"), Digits, Sy(','), Digits)(c =>
      s"LIMIT ${c(1)} OFFSET ${c(0)}")
    // standard OFFSET … ROWS / FETCH FIRST … ROWS ONLY (Mode.java
    // supportOffsetFetch — on by default in every reference mode); Spark
    // wants LIMIT before OFFSET, so the combined form swaps
    q = Rw.rewrite(q, RwKw("OFFSET"), Digits, RwKw("ROWS", "ROW"),
        RwKw("FETCH"), RwKw("FIRST", "NEXT"), Digits, RwKw("ROWS", "ROW"),
        RwKw("ONLY"))(c => s"LIMIT ${c(1)} OFFSET ${c(0)}")
    q = Rw.rewrite(q, RwKw("FETCH"), RwKw("FIRST", "NEXT"), Digits,
        RwKw("ROWS", "ROW"), RwKw("ONLY"))(c => s"LIMIT ${c(0)}")
    q = Rw.rewrite(q, RwKw("FETCH"), RwKw("FIRST", "NEXT"),
        RwKw("ROWS", "ROW"), RwKw("ONLY"))(_ => "LIMIT 1")
    q = Rw.rewrite(q, RwKw("OFFSET"), Digits, RwKw("ROWS", "ROW"))(c =>
      s"OFFSET ${c(0)}")
    // Quantified comparison subqueries x op ALL|ANY|SOME (SELECT …)
    // (ConditionInSelect.java:26-95) — Spark SQL has no quantified
    // comparison syntax; lowered to scalar MIN/MAX subqueries / IN forms
    q = rewriteQuantified(q)
    // PostgreSQL-mode LOG(x) is base 10 (Mode.java logIsLogBase10);
    // two-argument LOG keeps Spark's log(base, expr) meaning
    if (modeFlags.logIsLogBase10) q = rewriteSingleArgLog(q)
    // MySQL-mode || treats NULL as the other operand (nullConcatIsNull=false)
    if (!modeFlags.nullConcatIsNull) q = rewriteMySqlConcat(q)
    // MySQL-mode zero dates: MySQL stores '0000-00-00' where the JVM date
    // types have no representable value; the standard connector coercion
    // (zeroDateTimeBehavior=convertToNull) maps them to NULL. Typed
    // literals rewrite here; BARE '0000-00-00' strings already cast to
    // NULL on the non-ANSI insert-alignment cast, and a NOT NULL target
    // column then takes the current-date/timestamp coercion via
    // convertInsertNullToZero — Mode.java:42's documented rule.
    if (modeFlags.zeroDateToNull) q = rewriteZeroDates(q)
    // PostgreSQL-mode system columns CTID/OID (Mode.java:158 systemColumns):
    // the reference maps them to the row's storage key (_ROWID_). The Spark
    // twin is a DETERMINISTIC hash of the row's columns — identical in every
    // occurrence within the statement (filter and projection agree, unlike a
    // nondeterministic counter), with qualified t.ctid mapping to the
    // qualified star. Documented divergence: exact duplicate rows share an
    // id (content hash, not storage position).
    if (modeFlags.systemColumns) {
      q = Rw.rewrite(q, OptE(AnyW, Sy('.')), RwKw("CTID", "OID"),
          Not(Sy('(')))(c =>
        Option(c(0)) match {
          case Some(alias) => s"xxhash64($alias.*)"
          case None => "xxhash64(*)"
        })
    }
    // INFORMATION_SCHEMA.X → synthesized meta view (MetaTable.java:68)
    q = Rw.rewrite(q, RwKw("INFORMATION_SCHEMA"), Sy('.'), AnyW)(c =>
      metaView(c(0).toLowerCase))
    // LINK_SCHEMA: the reference REGISTERS the function (Function.java:360)
    // but its evaluation throws unsupported (Function.java:1262-1270) — the
    // exact-parity behavior is the same loud error, not a JDBC emulation
    if (Rw.contains(q, RwKw("LINK_SCHEMA"), Sy('(')))
      throw new UnsupportedOperationException(
        "LINK_SCHEMA is unsupported (reference parity: Function.java:1270 " +
          "throws the same; use spark.read.jdbc for external links at deploy)")
    // SET(@v, expr) inline assignment (Function.java:364 SET): evaluate the
    // value driver-side, assign the variable, and substitute the value in
    // place — must run before the @var substitution below so later @v
    // references in the same statement read the new value
    q = rewriteSetFunction(q)
    // @var substitution (Variable.java:20; unset vars read as NULL, same
    // as the reference's ValueNull for an unset session variable)
    q = Rw.rewrite(q, Sy('@'), AdjAnyW)(c =>
      variables.getOrElse(c(0).toLowerCase, "NULL"))
    // SAMPLE_SIZE n → LIMIT n (head-sample semantics, Select.java:877)
    q = Rw.rewrite(q, RwKw("SAMPLE_SIZE"), Digits)(c => s"LIMIT ${c(0)}")
    // H2 function-name surface → the registered UDF names / Spark natives
    // (Function.java registry): H2's DATEADD/DATEDIFF take a unit STRING
    // (vs Spark's keyword/2-arg forms), so the quoted-unit call shape maps
    // to the _h2 UDFs; INSERT/HASH collide with keywords/natives and carry
    // suffixed registrations; session-identity functions resolve to the
    // engine's counters.
    q = Rw.rewrite(q, RwKw("DATEADD", "TIMESTAMPADD"), Sy('('),
      Peek(RLit()))(_ => "dateadd_h2(")
    q = Rw.rewrite(q, RwKw("DATEDIFF", "TIMESTAMPDIFF"), Sy('('),
      Peek(RLit()))(_ => "datediff_h2(")
    q = Rw.rewrite(q, RwKw("HASH"), Sy('('))(_ => "h2_hash(")
    q = Rw.rewrite(q, RwKw("INSERT"), Sy('('))(_ => "insert_str(")
    q = Rw.rewrite(q, RwKw("CHARINDEX"), Sy('('))(_ => "locate(")
    q = Rw.rewrite(q, RwKw("GETDATE"), Sy('('), Sy(')'))(_ => "now()")
    q = Rw.rewrite(q, RwKw("RANDOM"), Sy('('))(_ => "rand(")
    q = Rw.rewrite(q, RwKw("SYS_GUID"), Sy('('), Sy(')'))(_ => "random_uuid()")
    q = Rw.rewrite(q, RwKw("LEALONE_VERSION"), Sy('('), Sy(')'))(_ =>
      "graft_version()")
    // USER()/CURRENT_USER() = the session user (RightOwner — the implicit
    // SA admin), not the JVM/OS user Spark's current_user() reports
    q = Rw.rewrite(q, RwKw("USER", "CURRENT_USER"), Sy('('), Sy(')'))(_ =>
      "'SA'")
    q = Rw.rewrite(q, RwKw("IDENTITY", "SCOPE_IDENTITY", "LAST_INSERT_ID",
        "IDENTITY_VAL_LOCAL"), Sy('('), Sy(')'))(
      _ => lastIdentity.map(_.toString).getOrElse("NULL"))
    q = Rw.rewrite(q, RwKw("LASTVAL"), Sy('('), Sy(')'))(
      _ => lastSeqVal.map(_.toString).getOrElse("NULL"))
    // date-part aliases (Function.java DAY_OF_MONTH…WEEK groups)
    q = Rw.rewrite(q, RwKw("DAY_OF_MONTH"), Sy('('))(_ => "dayofmonth(")
    q = Rw.rewrite(q, RwKw("DAY_OF_WEEK"), Sy('('))(_ => "dayofweek(")
    q = Rw.rewrite(q, RwKw("DAY_OF_YEAR"), Sy('('))(_ => "dayofyear(")
    q = Rw.rewrite(q, RwKw("WEEK"), Sy('('))(_ => "weekofyear(")
    // NOW(precision) → now() (fractional-second precision not kept);
    // CURTIME/CURRENT_TIME → HH:mm:ss string (Spark has no TIME type —
    // README divergences); bare paren-less forms are valid H2
    q = Rw.rewrite(q, RwKw("NOW"), Sy('('), Digits, Sy(')'))(_ => "now()")
    val timeStr = "date_format(now(), 'HH:mm:ss')"
    q = Rw.rewrite(q, RwKw("CURTIME"), Sy('('), Sy(')'))(_ => timeStr)
    q = Rw.rewrite(q, RwKw("CURTIME"))(_ => timeStr)
    q = Rw.rewrite(q, RwKw("CURRENT_TIME"), Sy('('), Sy(')'))(_ => timeStr)
    q = Rw.rewrite(q, RwKw("CURRENT_TIME"))(_ => timeStr)
    q = Rw.rewrite(q, RwKw("CURDATE"), Not(Sy('(')))(_ => "current_date()")
    q = Rw.rewrite(q, RwKw("NOW"), Not(Sy('(')))(_ => "now()")
    // H2 `WHERE ROWNUM <= n` tail form: Spark forbids window functions in
    // WHERE — the scan-order row cap is a LIMIT (same semantics when no
    // ORDER BY follows, which is the canonical H2 usage)
    // two passes: '<=' (the '=' adjacent, as the regex alternation
    // required) keeps n; strict '<' caps at n-1
    q = Rw.rewrite(q, RwKw("WHERE"), RwKw("ROWNUM"), Sy('<'), AdjSy('='),
      Digits, REnd)(c => s"LIMIT ${c(0)}")
    q = Rw.rewrite(q, RwKw("WHERE"), RwKw("ROWNUM"), Sy('<'), Digits,
      REnd)(c => s"LIMIT ${c(0).toInt - 1}")
    // ROWNUM / ROW_NUMBER without a window (Parser.java ROWNUM,
    // Select.java:877): number rows in scan order
    val rowNum = "row_number() OVER (ORDER BY monotonically_increasing_id())"
    q = Rw.rewrite(q, RwKw("ROW_NUMBER"), Sy('('), Sy(')'), RwKw("OVER"),
      Sy('('), Sy(')'))(_ => rowNum)
    q = Rw.rewrite(q, RwKw("ROW_NUMBER"), Sy('('), Sy(')'),
      Not(RwKw("OVER")))(_ => rowNum)
    q = Rw.rewrite(q, RwKw("ROWNUM"), Sy('('), Sy(')'))(_ => rowNum)
    q = Rw.rewrite(q, RwKw("ROWNUM"), Not(Sy('(')))(_ => rowNum)
    // FORMATDATETIME/PARSEDATETIME: rename by arity to the fixed-arity UDFs
    q = renameByArity(q, "FORMATDATETIME")(n => s"formatdatetime_$n")
    q = renameByArity(q, "PARSEDATETIME")(n => s"parsedatetime_$n")
    // ARRAY_GET/ARRAY_LENGTH/ARRAY_CONTAINS with H2 row-value arrays:
    // `('a','b')` in first-argument position becomes array('a','b');
    // ARRAY_GET is 1-based with NULL out of range → try_element_at
    q = rewriteArrayFn(q, "ARRAY_GET", "try_element_at")
    q = rewriteArrayFn(q, "ARRAY_LENGTH", "cardinality")
    q = rewriteArrayFn(q, "ARRAY_CONTAINS", "array_contains")
    // CASE(w1, r1, w2, r2, …[, else]) function form (Function.java:890)
    q = rewriteCaseFunction(q)
    // NEXTVAL/CURRVAL + CREATE CONSTANT names
    substSequences(substConstants(q))
  }

  /** CREATE CONSTANT names → literal value (schema/Constant.java). Column
    * names shadow constants (the reference resolves columns first) — but
    * only columns of tables the statement actually references (word scan),
    * so an unrelated table sharing the name doesn't block substitution
    * elsewhere. Over-shadowing fails loudly (unresolved column), never
    * silently mis-binds. Applied to SELECTs and to UPDATE/DELETE/VALUES
    * scalar expressions alike. */
  private def substConstants(q0: String, context: Seq[String] = Nil): String = {
    if (constants.isEmpty) return q0
    var q = q0
    val qToks = Lex.tokens(q)
    val colNames = tables.keys
      .filter(t => context.contains(t) || qToks.exists(_.is(q, t)))
      .flatMap(t => tables(t).columns.map(_.toLowerCase)).toSet
    constants.foreach { case (n, v) =>
      if (!colNames.contains(n))
        q = Rw.rewrite(q, Rw.Kw(n))(_ => v)
    }
    q
  }

  /** Spans [start,end) of single-quoted literals ('' is the escape). */
  private def literalSpans(s: String): IndexedSeq[(Int, Int)] =
    Stmt.literalSpans(s)

  /** MySQL-mode `||` (Mode.java:148-153 nullConcatIsNull=false; evaluated at
    * Operation.java:125-142): a NULL operand yields the OTHER side, so a
    * chain is NULL only when every operand is NULL. Spark's `||` is
    * null-propagating, so chains are rewritten to
    * `CASE WHEN <all null> THEN NULL ELSE CONCAT(COALESCE(CAST(x AS STRING),'')…) END`.
    * Operands are extracted with balanced-paren, literal-aware scanning
    * (string literal / parenthesized group / identifier / function call);
    * a shape the scanner cannot bound (e.g. a bare CASE…END arm) leaves the
    * chain untouched — a loud parse/semantics divergence, never a silent
    * mis-split. */
  private def rewriteMySqlConcat(q0: String): String = {
    // shapes the scanner must never treat as an operand — hitting one means
    // the chain cannot be bounded (e.g. an unparenthesized CASE…END arm)
    val stopWords = Set("end", "then", "else", "when", "case", "select",
      "where", "and", "or", "not", "in", "like", "between", "is", "from")
    def bail(op: String): Nothing = throw new IllegalArgumentException(
      s"MySQL-mode || rewrite cannot bound operand near '$op' — " +
        "parenthesize the operand (e.g. (CASE … END) || x)")
    var q = q0
    var guard = 0
    var changed = true
    while (changed && guard < 64) {
      changed = false; guard += 1
      val spans = literalSpans(q)
      def inLit(i: Int) = spans.exists(sp => i >= sp._1 && i < sp._2)
      def identChar(c: Char) =
        c.isLetterOrDigit || c == '_' || c == '.' || c == '`' || c == '@'
      def fwdParen(open: Int): Int = {
        var depth = 0; var k = open; var end = -1
        while (k < q.length && end < 0) {
          if (!inLit(k)) {
            if (q.charAt(k) == '(') depth += 1
            else if (q.charAt(k) == ')') { depth -= 1; if (depth == 0) end = k + 1 }
          }
          k += 1
        }
        end
      }
      // start of the PRIMARY (literal / paren group / identifier / call)
      // ending at j (inclusive), or -1
      def primaryStart(j: Int): Int = q.charAt(j) match {
        case '\'' => spans.find(_._2 == j + 1).map(_._1).getOrElse(-1)
        case ')' =>
          var depth = 0; var k = j; var open = -1
          while (k >= 0 && open < 0) {
            if (!inLit(k)) {
              if (q.charAt(k) == ')') depth += 1
              else if (q.charAt(k) == '(') { depth -= 1; if (depth == 0) open = k }
            }
            if (open < 0) k -= 1
          }
          if (open < 0) -1
          else { // include a function name directly before the '('
            var s = open - 1
            while (s >= 0 &&
              (q.charAt(s).isLetterOrDigit || q.charAt(s) == '_')) s -= 1
            s + 1
          }
        case c if identChar(c) =>
          var s = j
          while (s >= 0 && identChar(q.charAt(s))) s -= 1
          s + 1
        case _ => -1
      }
      def lastNonWs(before: Int): Int = {
        var j = before - 1
        while (j >= 0 && q.charAt(j).isWhitespace) j -= 1
        j
      }
      def isStop(s: Int, e: Int): Boolean =
        stopWords.contains(q.substring(s, e).trim.toLowerCase)
      // start of the full LEFT operand before opIdx: a primary, extended
      // left across binary + - * / % (same-or-tighter precedence than ||
      // in H2's summand grammar) and unary signs, so `a + 1 || b` binds as
      // (a + 1) || b and `-1 || x` keeps its sign inside the operand
      def leftStart(opIdx: Int): Int = {
        val j0 = lastNonWs(opIdx)
        if (j0 < 0) return -1
        var s = primaryStart(j0)
        if (s < 0) return -1
        if (isStop(s, j0 + 1)) bail(q.substring(s, j0 + 1))
        var continue = true
        while (continue) {
          val j = lastNonWs(s)
          if (j >= 0 && "+-*/%".indexOf(q.charAt(j)) >= 0 && !inLit(j)) {
            val k = lastNonWs(j)
            val prevEndsExpr = k >= 0 &&
              (identChar(q.charAt(k)) || q.charAt(k) == ')' || q.charAt(k) == '\'')
            val isSign = q.charAt(j) == '-' || q.charAt(j) == '+'
            if (prevEndsExpr) {
              val ps = primaryStart(k)
              if (ps >= 0 && !isStop(ps, k + 1)) s = ps // binary: absorb it
              else if (isSign) s = j // keyword before the sign → unary
              else bail(q.substring((ps max 0), k + 1))
            } else if (isSign) {
              s = j // unary sign belongs to the operand
            } else continue = false
          } else continue = false
        }
        s
      }
      // end (exclusive) of a primary starting at j, or -1
      def primaryEnd(j: Int): Int = q.charAt(j) match {
        case '\'' => spans.find(_._1 == j).map(_._2).getOrElse(-1)
        case '(' => fwdParen(j)
        case c if identChar(c) =>
          var e = j
          while (e < q.length && identChar(q.charAt(e))) e += 1
          var k = e
          while (k < q.length && q.charAt(k).isWhitespace) k += 1
          if (k < q.length && q.charAt(k) == '(') fwdParen(k) else e
        case _ => -1
      }
      // end of the full RIGHT operand from `from`: optional unary signs,
      // a primary, extended across * / % (tighter than ||; + - stay outside
      // because || chains left-associatively at the same level)
      def rightEnd(from: Int): Int = {
        var j = from
        while (j < q.length && q.charAt(j).isWhitespace) j += 1
        while (j < q.length && (q.charAt(j) == '-' || q.charAt(j) == '+')) {
          j += 1
          while (j < q.length && q.charAt(j).isWhitespace) j += 1
        }
        if (j >= q.length) return -1
        var e = primaryEnd(j)
        if (e < 0) return -1
        if (isStop(j, e)) bail(q.substring(j, e))
        var continue = true
        while (continue) {
          var k = e
          while (k < q.length && q.charAt(k).isWhitespace) k += 1
          if (k < q.length && "*/%".indexOf(q.charAt(k)) >= 0 && !inLit(k)) {
            var m = k + 1
            while (m < q.length && q.charAt(m).isWhitespace) m += 1
            while (m < q.length && (q.charAt(m) == '-' || q.charAt(m) == '+')) {
              m += 1
              while (m < q.length && q.charAt(m).isWhitespace) m += 1
            }
            val e2 = if (m < q.length) primaryEnd(m) else -1
            if (e2 < 0) bail(q.substring(k, (k + 8) min q.length))
            e = e2
          } else continue = false
        }
        e
      }

      var search = 0
      while (!changed && { search = q.indexOf("||", search); search >= 0 }) {
        if (inLit(search)) { search += 2 }
        else {
          val ls = leftStart(search)
          val lj = lastNonWs(search)
          val firstRight = rightEnd(search + 2)
          if (ls < 0 || firstRight < 0)
            bail(q.substring((search - 8) max 0, (search + 10) min q.length))
          val operands = mutable.ArrayBuffer(q.substring(ls, lj + 1))
          var rs = search + 2
          while (rs < q.length && q.charAt(rs).isWhitespace) rs += 1
          operands += q.substring(rs, firstRight)
          var chainEnd = firstRight
          var more = true
          while (more) { // extend through `|| operand` repetitions
            var k = chainEnd
            while (k < q.length && q.charAt(k).isWhitespace) k += 1
            if (k + 1 < q.length && q.charAt(k) == '|' && q.charAt(k + 1) == '|') {
              val e = rightEnd(k + 2)
              var s2 = k + 2
              while (s2 < q.length && q.charAt(s2).isWhitespace) s2 += 1
              if (e > 0) { operands += q.substring(s2, e); chainEnd = e }
              else more = false
            } else more = false
          }
          val allNull = operands.map(o => s"($o) IS NULL").mkString(" AND ")
          val cc = operands.map(o => s"COALESCE(CAST(($o) AS STRING), '')")
            .mkString("CONCAT(", ", ", ")")
          q = q.substring(0, ls) +
            s"(CASE WHEN $allNull THEN NULL ELSE $cc END)" +
            q.substring(chainEnd)
          changed = true
        }
      }
    }
    q
  }

  /** PostgreSQL-mode LOG rewrite (Mode.java logIsLogBase10): single-
    * argument LOG(x) becomes LOG10(x); LOG(b, x) is left alone (already
    * base-b in Spark). Needs balanced-paren scanning to count top-level
    * commas, so not a plain regex rewrite. */
  private def rewriteSingleArgLog(q: String): String = {
    val sb = new StringBuilder
    var last = 0
    var from = 0
    var go = true
    while (go) {
      val (ws, open) = Rw.findCall(q, "LOG", from)
      if (ws < 0) go = false
      else {
        val (close, commas) = matchParen(q, open)
        if (close >= 0 && commas == 0 && ws >= last) {
          sb.append(q.substring(last, ws)).append("LOG10(")
          last = open + 1
        }
        from = open + 1
      }
    }
    sb.append(q.substring(last))
    sb.toString
  }

  /** Find the index just past the matching ')' for a call whose open paren
    * is at `open` (exclusive end), honoring string literals. Returns -1 if
    * unbalanced. Also counts top-level commas. */
  /** Lower `lhs op ALL|ANY|SOME (subquery)` (ConditionInSelect.java:26-95;
    * parsed at Parser.java readCondition) onto Spark-supported forms:
    * ordering ops become scalar MIN/MAX subqueries, `= ANY` → IN,
    * `<> ALL` → NOT IN (exactly the standard equivalence, NULLs included),
    * `= ALL` → min=x AND max=x, `<> ANY` → x≠min OR x≠max.
    *
    * MIN/MAX silently ignore NULL elements, which would collapse SQL
    * three-valued logic (`x = ALL(S)` with S={x, NULL} must be UNKNOWN,
    * not TRUE; negated ordering forms would flip UNKNOWN to TRUE), so the
    * MIN/MAX lowerings carry a 3VL repair: for ALL, FALSE is definite but
    * TRUE additionally requires a NULL-free subquery; for ANY, TRUE is
    * definite but FALSE requires one. The NULL probe is one UNCORRELATED
    * scalar COUNT subquery — Catalyst evaluates it once, not per row.
    * Remaining divergence: an empty subquery yields UNKNOWN where the
    * reference returns its vacuous value (TRUE for ALL) — equivalent
    * under WHERE for ANY (both drop), divergent for empty-set ALL
    * (documented; the reference's own tests never exercise it).
    *
    * The LHS must be a SINGLE column/qualified-name or literal token;
    * a compound left operand (`a + b > ALL (…)`) would bind only its
    * trailing token — a silent partial rewrite — so it is rejected with
    * an explicit error. Matches inside string literals are skipped. */
  private def rewriteQuantified(q0: String): String = {
    var q = q0
    // token find of `lhs op ALL|ANY|SOME (`: the lhs is the maximal chain
    // of ADJACENT word/number/literal/'.' tokens before the operator (the
    // old regex char class `[\w.'"]+`), the operator one or two adjacent
    // comparison symbols
    def findQuant(src: String): Option[(Int, String, String, String, Int)] = {
      val ts = Lex.tokens(src)
      def sym(j: Int, c: Char) = j < ts.length && ts(j).kind == Lex.Sym &&
        src.charAt(ts(j).start) == c
      def adj(j: Int) = j > 0 && ts(j).start == ts(j - 1).end
      var i = 1
      while (i < ts.length) {
        val (opTxt, opLen) =
          if (sym(i, '<') && sym(i + 1, '>') && adj(i + 1)) ("<>", 2)
          else if (sym(i, '!') && sym(i + 1, '=') && adj(i + 1)) ("<>", 2)
          else if (sym(i, '<') && sym(i + 1, '=') && adj(i + 1)) ("<=", 2)
          else if (sym(i, '>') && sym(i + 1, '=') && adj(i + 1)) (">=", 2)
          else if (sym(i, '<')) ("<", 1)
          else if (sym(i, '>')) (">", 1)
          else if (sym(i, '=')) ("=", 1)
          else (null, 0)
        if (opTxt != null) {
          val qi = i + opLen
          def lhsTok(j: Int) = j >= 0 && (ts(j).kind == Lex.Word ||
            ts(j).kind == Lex.Num || ts(j).kind == Lex.Lit || sym(j, '.'))
          if (qi < ts.length &&
              (ts(qi).is(src, "ALL") || ts(qi).is(src, "ANY") ||
                ts(qi).is(src, "SOME")) && sym(qi + 1, '(') && lhsTok(i - 1)) {
            var b = i - 1
            while (lhsTok(b - 1) && adj(b)) b -= 1
            return Some((ts(b).start,
              src.substring(ts(b).start, ts(i - 1).end), opTxt,
              ts(qi).text(src).toUpperCase, ts(qi + 1).start))
          }
        }
        i += 1
      }
      None
    }
    var guard = 0
    var continue = true
    while (continue && guard < 64) {
      guard += 1
      findQuant(q) match {
        case None => continue = false
        case Some((mStart, lhs, op, quant, open)) =>
          val (close, _) = matchParen(q, open)
          if (close < 0) continue = false
          else {
            // compound LHS (`a + b > ALL …`): the token chain binds only
            // `b`, so rewriting would silently produce `a + (b > (SELECT…))`
            val prevCh = q.substring(0, mStart)
              .reverse.dropWhile(_.isWhitespace).headOption
            if (prevCh.exists(c => "+-*/%^&|".contains(c)))
              throw new IllegalArgumentException(
                "unsupported LHS for quantified comparison near '" +
                  q.substring(math.max(0, mStart - 16), open) +
                  "(': only a single column or literal is supported " +
                  "(wrap the expression in a derived column first)")
            val sub = q.substring(open + 1, close - 1)
            def scalar(agg: String) =
              s"(SELECT $agg(__qv) FROM ($sub) __qt(__qv))"
            // 3VL repair (see scaladoc): one uncorrelated NULL probe
            def hasNull =
              s"((SELECT COUNT(1) FROM ($sub) __qn(__qv) WHERE __qv IS NULL) > 0)"
            def allG(l: String) =
              s"(CASE WHEN NOT $l THEN FALSE WHEN $hasNull THEN " +
                s"CAST(NULL AS BOOLEAN) ELSE $l END)"
            def anyG(l: String) =
              s"(CASE WHEN $l THEN TRUE WHEN $hasNull THEN " +
                s"CAST(NULL AS BOOLEAN) ELSE $l END)"
            val lowered = (quant, op) match {
              case ("ALL", "<")  => allG(s"($lhs < ${scalar("MIN")})")
              case ("ALL", "<=") => allG(s"($lhs <= ${scalar("MIN")})")
              case ("ALL", ">")  => allG(s"($lhs > ${scalar("MAX")})")
              case ("ALL", ">=") => allG(s"($lhs >= ${scalar("MAX")})")
              case ("ALL", "=")  =>
                allG(s"($lhs = ${scalar("MIN")} AND $lhs = ${scalar("MAX")})")
              case ("ALL", _)    => s"($lhs NOT IN ($sub))"
              case (_, "<")      => anyG(s"($lhs < ${scalar("MAX")})")
              case (_, "<=")     => anyG(s"($lhs <= ${scalar("MAX")})")
              case (_, ">")      => anyG(s"($lhs > ${scalar("MIN")})")
              case (_, ">=")     => anyG(s"($lhs >= ${scalar("MIN")})")
              case (_, "=")      => s"($lhs IN ($sub))"
              case (_, _)        =>
                anyG(s"($lhs <> ${scalar("MIN")} OR $lhs <> ${scalar("MAX")})")
            }
            q = q.substring(0, mStart) + lowered + q.substring(close)
          }
      }
    }
    q
  }

  private def matchParen(q: String, open: Int): (Int, Int) = {
    var depth = 1; var i = open + 1; var commas = 0; var inStr = false
    while (i < q.length && depth > 0) {
      q.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 1 => commas += 1
        case _ =>
      }
      i += 1
    }
    (if (depth == 0) i else -1, commas)
  }

  /** Rename calls of `name` to an arity-specific target — how variable-
    * arity H2 functions (FORMATDATETIME 2-4 args) map onto Spark's
    * fixed-arity UDF registration. */
  private def renameByArity(q0: String, name: String)(
      target: Int => String): String = {
    var q = q0
    var from = 0
    var continue = true
    while (continue) {
      val (ws, open) = Rw.findCall(q, name, from)
      if (ws < 0) continue = false
      else {
        val (close, commas) = matchParen(q, open)
        if (close < 0) continue = false
        else {
          val newName = target(commas + 1)
          q = q.substring(0, ws) + newName + "(" + q.substring(open + 1)
          from = ws + newName.length + 1
        }
      }
    }
    q
  }

  /** H2 array functions over row values: `ARRAY_GET(('a','b'), i)` — a
    * parenthesized list in first-argument position is H2's inline array
    * (Function.java:905 ARRAY_GET on ValueArray); Spark spells it
    * array(...). Renames the function and converts that first argument. */
  private def rewriteArrayFn(q0: String, h2Name: String,
      sparkName: String): String = {
    var q = q0
    var from = 0
    var continue = true
    while (continue) {
      val (ws, open) = Rw.findCall(q, h2Name, from)
      if (ws < 0) continue = false
      else {
        var i = open + 1
        while (i < q.length && q.charAt(i).isWhitespace) i += 1
        val head = q.substring(0, ws) + sparkName + "("
        q = if (i < q.length && q.charAt(i) == '(') {
          val (close, _) = matchParen(q, i)
          if (close < 0) return q
          head + q.substring(open + 1, i) + "array" + q.substring(i, close) +
            q.substring(close)
        } else head + q.substring(open + 1)
        from = ws + sparkName.length + 1
      }
    }
    q
  }

  /** H2 CASE *function* form `CASE(w1, r1, w2, r2[, else])`
    * (Function.java:890: leading boolean of each pair selects its result;
    * odd trailing argument is the ELSE) → standard searched CASE. The
    * expression form `CASE x WHEN …` / `CASE WHEN …` is left alone. */
  private def rewriteCaseFunction(q0: String): String = {
    var q = q0
    var from = 0
    var continue = true
    while (continue) {
      val (ws, open) = Rw.findCall(q, "CASE", from)
      if (ws < 0) continue = false
      else {
        val (close, _) = matchParen(q, open)
        if (close < 0) return q
        // `CASE (expr) WHEN …` is the expression form — skip it
        val tail = q.substring(close).trim
        if (tail.toUpperCase.startsWith("WHEN")) { from = close }
        else {
          val args = splitTop(q.substring(open + 1, close - 1)).map(_.trim)
          val pairs = args.grouped(2).toSeq
          val sb = new StringBuilder("CASE")
          pairs.foreach {
            case Seq(w, r) => sb.append(s" WHEN $w THEN $r")
            case Seq(e) => sb.append(s" ELSE $e")
            case _ =>
          }
          sb.append(" END")
          q = q.substring(0, ws) + sb + q.substring(close)
          from = ws + sb.length
        }
      }
    }
    q
  }

  /** Inline `SET(@v, expr)` (Function.java:364): evaluate driver-side,
    * store the variable, substitute the value. Runs before the statement-
    * level @var substitution, so later @v reads in the same statement see
    * the assigned value (left-to-right, as the reference evaluates). */
  private def rewriteSetFunction(q0: String): String = {
    var q = q0
    var continue = true
    while (continue) {
      Rw.find(q, 0, Rw.Kw("SET"), Rw.Sy('('), Rw.Sy('@'), Rw.AdjAnyW,
          Rw.Sy(',')) match {
        case None => continue = false
        case Some((mStart, mEnd, caps)) =>
          val open = q.indexOf('(', mStart)
          val (close, _) = matchParen(q, open)
          if (close < 0) return q
          val inner0 = q.substring(mEnd, close - 1)
          // earlier-assigned vars are visible in the value expression;
          // literal-aware so '@' inside a string (an email address, say)
          // is never substituted
          val inner = Rw.rewrite(inner0, Rw.Sy('@'), Rw.AdjAnyW)(c =>
            variables.getOrElse(c(0).toLowerCase, "NULL"))
          val value = spark.sql(
            s"SELECT ${substSequences(substConstants(inner))}").head().get(0) match {
            case s: String => s"'${s.replace("'", "''")}'"
            case v => String.valueOf(v)
          }
          variables(caps(0).toLowerCase) = value
          q = q.substring(0, mStart) + value + q.substring(close)
      }
    }
    q
  }

  /** `TABLE(id INT=ARRAY[1,2], name VARCHAR=('a','b'))` in FROM position →
    * a registered view built from the literal arrays, null-padded to the
    * longest column exactly like the reference (TableFunction.java:139
    * pads short columns); TABLE_DISTINCT de-duplicates. Needs balanced-
    * paren extraction (ARRAY[…] nests), so not a plain regex rewrite. */
  private def rewriteTableFunctions(q0: String): String = {
    var q = q0
    var search = 0
    var guard = 0
    while (guard < 64) {
      guard += 1
      val m0 = Rw.find(q, search, Rw.W("TABLE_DISTINCT", "TABLE"), Rw.Sy('('))
      m0 match {
        case None => return q
        case Some((mStart, mEnd, caps)) =>
          // find the matching close paren, respecting quotes/nesting
          val open = mEnd - 1
          var depth = 0; var i = open; var inStr = false; var close = -1
          while (i < q.length && close < 0) {
            q.charAt(i) match {
              case '\'' => inStr = !inStr
              case '(' | '[' if !inStr => depth += 1
              case ')' | ']' if !inStr =>
                depth -= 1; if (depth == 0) close = i
              case _ =>
            }
            i += 1
          }
          require(close > 0, "unbalanced TABLE(…)")
          val inner = q.substring(open + 1, close)
          val itemRe =
            """(?is)^\s*(\w+)\s+([A-Za-z]\w*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*=\s*(?:ARRAY\s*\[(.*)\]|\((.*)\))\s*$""".r
          val cols = splitTopBrackets(inner).map {
            case itemRe(name, tpe, arr, tup) =>
              val vals = splitTop(Option(arr).getOrElse(tup)).map(_.trim)
              (name.toLowerCase, parseType(tpe), vals)
            case bad => throw new IllegalArgumentException(
              s"bad TABLE() column: $bad")
          }
          val n = cols.map(_._3.length).max
          val tuples = (0 until n).map { r =>
            cols.map(_._3.lift(r).getOrElse("NULL")).mkString("(", ", ", ")")
          }.mkString(", ")
          val sel = cols.zipWithIndex.map { case ((name, tpe, _), i) =>
            s"CAST(c$i AS ${tpe.sql}) AS $name"
          }.mkString(", ")
          val anon = cols.indices.map(i => s"c$i").mkString(", ")
          rangeViewId += 1
          val v = s"graft_table_fn_$rangeViewId"
          val df0 = spark.sql(s"SELECT $sel FROM VALUES $tuples AS __t($anon)")
          val df = if (caps(0).equalsIgnoreCase("TABLE_DISTINCT"))
            df0.distinct() else df0
          df.createOrReplaceTempView(v)
          q = q.substring(0, mStart) + v + q.substring(close + 1)
          search = mStart + v.length
      }
    }
    q
  }

  private def runSelect(q0: String): DataFrame = {
    var q = q0
    // _ROWID_ pseudo-column (PseudoColumnTest): integral-PK tables get the
    // token substituted with the key column; hidden-rowid tables get the
    // FULL frame swapped in as the view for this statement only.
    // Known divergence: `SELECT *` in such a statement shows _rowid_.
    val restoreHidden = mutable.Buffer.empty[String]
    if (referencedOutsideLiterals(q, "_ROWID_")) {
      def refed(tn: String) = referencedOutsideLiterals(q, tn)
      val hid = rowidTables.toSeq.filter(refed)
      val pkT = rowidPk.toSeq.filter { case (tn, _) => refed(tn) }
      if (hid.isEmpty && pkT.size == 1)
        q = Rw.rewrite(q, Rw.Kw("_ROWID_"))(_ => pkT.head._2)
      hid.foreach { tn =>
        tables(tn).createOrReplaceTempView(tn); restoreHidden += tn }
    }
    try runSelectTranslated(q)
    finally restoreHidden.foreach(tn =>
      tables(tn).drop("_rowid_").createOrReplaceTempView(tn))
  }

  /** Word-boundary occurrence of `word` outside string literals. */
  private def referencedOutsideLiterals(q: String, word: String): Boolean =
    Lex.tokens(q).exists(_.is(q, word))

  private def runSelectTranslated(q: String): DataFrame = {
    val t = translate(q)
    val df =
      try spark.sql(t)
      catch {
        // H2 resolves select-list aliases in WHERE (`SELECT pk AS A … WHERE
        // A='01'`, SelectTest.java); Spark doesn't — on an unresolved-column
        // failure, retry once with WHERE-clause aliases substituted
        case e: org.apache.spark.sql.AnalysisException
            if String.valueOf(e.getMessage).contains("UNRESOLVED_COLUMN") =>
          substWhereAliases(t).map(spark.sql).getOrElse(throw e)
      }
    // MySQL-mode lowerCaseIdentifiers (Mode.java:151): result column names
    // fold to lower case (Spark otherwise preserves as-written case)
    if (modeFlags.lowerCaseIdentifiers && df.columns.exists(c => c != c.toLowerCase))
      df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)
    else df
  }

  /** Substitute top-level select-list aliases into the top-level WHERE
    * clause (Select.java alias resolution). Returns None if nothing to do. */
  private def substWhereAliases(q: String): Option[String] = {
    val up = q.toUpperCase
    if (!up.trim.startsWith("SELECT")) return None
    val fromIdx = topLevelIndexOf(q, "FROM")
    val whereIdx = topLevelIndexOf(q, "WHERE")
    if (fromIdx < 0 || whereIdx < fromIdx) return None
    val selStart = up.indexOf("SELECT") + 6
    var selectList = q.substring(selStart, fromIdx)
    selectList = """(?is)^\s*DISTINCT\s+""".r.replaceFirstIn(selectList, "")
    val aliasRe = """(?is)^(.*\S)\s+AS\s+(\w+)\s*$""".r
    // H2 resolves real columns BEFORE aliases (Select.java) — an alias that
    // shadows a column of a referenced table must not be substituted, or the
    // retry silently rewrites a valid column reference (round-2 advice).
    // masked: a table-name-shaped word inside a string literal in a join
    // condition must not pull that table's columns into the shadow set
    val fromSeg = Stmt(q.substring(fromIdx + 4, whereIdx)).masked
    val realCols: Set[String] = """\b\w+\b""".r.findAllIn(fromSeg)
      .map(_.toLowerCase).toSet
      .flatMap((t: String) => tables.get(t).toSeq.flatMap(_.columns.map(_.toLowerCase)))
    val aliases = splitTop(selectList).map(_.trim).collect {
      case aliasRe(e, a) if !realCols(a.toLowerCase) => a.toLowerCase -> e
    }.toMap
    if (aliases.isEmpty) return None
    val whereEnd0 = earliestTopLevel(q.substring(whereIdx + 5),
      Seq("GROUP BY", "HAVING", "ORDER BY", "LIMIT", "OFFSET"))
    val whereEnd = if (whereEnd0 < 0) q.length else whereIdx + 5 + whereEnd0
    var whereSeg = q.substring(whereIdx + 5, whereEnd)
    var changed = false
    aliases.foreach { case (a, e) =>
      val next = Rw.rewrite(whereSeg, Rw.Kw(a))(_ => s"($e)")
      if (next != whereSeg) { changed = true; whereSeg = next }
    }
    if (!changed) None
    else Some(q.substring(0, whereIdx + 5) + whereSeg + q.substring(whereEnd))
  }

  private val seqNameLit = Rw.Lit(inner =>
    inner.nonEmpty && inner.forall(c => c.isLetterOrDigit || c == '_'))

  private def substSequences(q0: String): String = {
    // per-occurrence evaluation (each NEXTVAL increments), literal-safe
    // structurally (the 'name' literal is matched as ONE token)
    val q = Rw.rewrite(q0, Rw.Kw("NEXTVAL"), Rw.Sy('('), seqNameLit,
      Rw.Sy(')'))(c => sequences(c(0).toLowerCase).nextVal().toString)
    Rw.rewrite(q, Rw.Kw("CURRVAL"), Rw.Sy('('), seqNameLit,
      Rw.Sy(')'))(c => sequences(c(0).toLowerCase).curr.toString)
  }

  /** SELECT source for INSERT INTO … SELECT. A plain textual NEXTVAL
    * substitution would hand every row the same value; the reference's
    * SequenceValue evaluates per row (round-1 advice). Occurrence j of a
    * sequence with k occurrences in the statement becomes
    * `base + ((rownum-1)*k + j) * inc` — exactly the reference's
    * left-to-right per-row evaluation order — and the counter advances by
    * rowCount*k afterwards. The global row_number keeps the same
    * non-parallel contract as the reference's Sequence (documented). */
  private def selectForInsert(q: String): DataFrame = {
    // pass 1 only counts occurrences per sequence (the rewritten text is
    // discarded); pass 2 substitutes with the per-occurrence (j, k) terms
    val names = mutable.ArrayBuffer.empty[String]
    Rw.rewrite(q, Rw.Kw("NEXTVAL"), Rw.Sy('('), seqNameLit, Rw.Sy(')')) { c =>
      names += c(0).toLowerCase; ""
    }
    if (names.isEmpty) return runSelect(q)
    val bySeq: Map[String, Int] =
      names.groupBy(identity).map { case (k, v) => k -> v.size }
    val occIdx = mutable.HashMap.empty[String, Int]
    val rn = "(ROW_NUMBER() OVER (ORDER BY monotonically_increasing_id()) - 1)"
    val out = Rw.rewrite(q, Rw.Kw("NEXTVAL"), Rw.Sy('('), seqNameLit,
        Rw.Sy(')')) { c =>
      val s = c(0).toLowerCase
      val seq = sequences(s)
      val k = bySeq(s)
      val j = occIdx.getOrElse(s, 0); occIdx(s) = j + 1
      s"(${seq.next} + ($rn * ${k * seq.inc} + ${j * seq.inc}))"
    }
    val df = runSelect(out)
    val n = df.count()
    bySeq.foreach { case (s, k) => sequences(s).advance(n * k) }
    df
  }

  /** INFORMATION_SCHEMA synthesis (MetaTable.java:68 — ids :77-107): the
    * meta tables meaningful for a batch engine, generated from the live
    * catalog. Registered lazily per reference. */
  private def metaView(name: String): String = {
    import spark.implicits._
    val view = s"graft_info_$name"
    val df = name match {
      case "tables" =>
        tables.keys.toSeq.map(t => ("graft", "public", t, "TABLE", "PARQUET"))
          .toDF("table_catalog", "table_schema", "table_name", "table_type",
            "storage_type")
      case "columns" =>
        tables.toSeq.flatMap { case (t, df0) =>
          df0.schema.fields
            .filterNot(f => rowidTables.contains(t) && f.name == "_rowid_")
            .zipWithIndex.map { case (f, i) =>
              (t, f.name, i + 1, f.dataType.catalogString.toUpperCase,
                if (f.nullable) "YES" else "NO")
            }
        }.toDF("table_name", "column_name", "ordinal_position", "data_type",
          "is_nullable")
      case "sequences" =>
        sequences.toSeq.map { case (n, s) => (n, s.curr, s.inc) }
          .toDF("sequence_name", "current_value", "increment")
      case "settings" =>
        (spark.conf.getAll.toSeq.sortBy(_._1) ++
          sessionSettings.toSeq.map { case (k, v) => (k, v) })
          .toDF("setting_name", "setting_value")
      case "constraints" =>
        (primaryKeys.toSeq.map { case (t, ks) =>
          (t, "PRIMARY_KEY", "PRIMARY KEY", ks.mkString(",")) } ++
         foreignKeys.toSeq.map(fk => (fk.table, fk.name, "REFERENTIAL",
           fk.cols.mkString(",") + "->" + fk.refTable + "(" +
             fk.refCols.mkString(",") + ")")) ++
         checks.toSeq.map(ck => (ck.table, ck.name, "CHECK", ck.expr)) ++
         indexes.values.filter(_.unique).toSeq.map(ix =>
           (ix.table, ix.name, "UNIQUE", ix.cols.mkString(","))))
          .toDF("table_name", "constraint_name", "constraint_type",
            "column_list")
      case "indexes" =>
        // MetaTable.java INDEXES (id 3): one row per indexed column
        indexes.values.toSeq.flatMap { ix =>
          ix.cols.zipWithIndex.map { case (c, i) =>
            (ix.table, ix.name, !ix.unique, i + 1, c, "BTREE")
          }
        }.toDF("table_name", "index_name", "non_unique", "ordinal_position",
          "column_name", "index_type")
      case "views" =>
        // MetaTable.java VIEWS (id 14)
        viewDefs.toSeq.map { case (n, sql) => ("graft", "public", n, sql) }
          .toDF("table_catalog", "table_schema", "table_name",
            "view_definition")
      case "function_aliases" =>
        // MetaTable.java FUNCTION_ALIASES (id 12)
        aliases.toSeq.map { case (n, target) =>
          val dot = target.lastIndexOf('.')
          ("graft", "public", n, target.substring(0, dot max 0),
            target.substring(dot + 1))
        }.toDF("alias_catalog", "alias_schema", "alias_name", "java_class",
          "java_method")
      case "sessions" =>
        // MetaTable.java SESSIONS (id 25): single local session by contract
        Seq((0L, "SA", spark.sparkContext.applicationId))
          .toDF("id", "user_name", "session_start")
      case "users" =>
        // MetaTable.java USERS (id 9): the implicit admin + recorded DDL
        users.toSeq.map { case (n, a) => (n.toUpperCase, a) }
          .toDF("name", "admin")
      case "table_types" => // id 3
        Seq("SYSTEM TABLE", "TABLE", "VIEW").toDF("type")
      case "type_info" => // id 4: the types parseType accepts
        Seq(
          ("INT", java.sql.Types.INTEGER, 10), ("BIGINT", java.sql.Types.BIGINT, 19),
          ("SMALLINT", java.sql.Types.SMALLINT, 5), ("TINYINT", java.sql.Types.TINYINT, 3),
          ("DOUBLE", java.sql.Types.DOUBLE, 17), ("REAL", java.sql.Types.REAL, 7),
          ("DECIMAL", java.sql.Types.DECIMAL, 38), ("BOOLEAN", java.sql.Types.BOOLEAN, 1),
          ("DATE", java.sql.Types.DATE, 10), ("TIMESTAMP", java.sql.Types.TIMESTAMP, 29),
          ("VARBINARY", java.sql.Types.VARBINARY, Int.MaxValue),
          ("VARCHAR", java.sql.Types.VARCHAR, Int.MaxValue))
          .toDF("type_name", "data_type", "precision")
      case "catalogs" => // id 5
        Seq("graft").toDF("catalog_name")
      case "help" => // id 7: reference ships help.csv; no embedded docs here
        Seq.empty[(Int, String, String, String)]
          .toDF("id", "section", "topic", "syntax")
      case "roles" => // id 10: created roles + COMMENT ON remarks
        roles.toSeq.map(r => (r.toUpperCase,
            comments.get(("ROLE", r))
              .getOrElse(if (r == "public") "system role" else null)))
          .toDF("name", "remarks")
      case "rights" => // id 11: recorded grants (enforcement out of scope)
        (rights.toSeq.map { case (g, p, o) =>
            (g, if (roles.contains(g)) "ROLE" else "USER", p, o) } ++
          roleGrants.toSeq.map { case (r, g) =>
            (g, if (roles.contains(g)) "ROLE" else "USER",
              s"ROLE ${r.toUpperCase}", "") })
          .toDF("grantee", "granteetype", "rights", "table_name")
      case "schemata" => // id 13
        schemas.toSeq.map(s => ("graft", s, "SA", "OFF")).toDF(
          "catalog_name", "schema_name", "schema_owner", "default_collation_name")
      case "table_privileges" => // id 14
        Seq.empty[(String, String, String, String)]
          .toDF("grantor", "grantee", "table_name", "privilege_type")
      case "column_privileges" => // id 15
        Seq.empty[(String, String, String, String)]
          .toDF("grantor", "grantee", "table_name", "column_name")
      case "collations" => // id 16: Spark 4 collation surface (q50 uses it)
        Seq(("OFF", "binary"), ("UTF8_BINARY", "binary"), ("UTF8_LCASE", "ci"))
          .toDF("name", "key")
      case "in_doubt" => // id 18: no 2PC transactions exist
        Seq.empty[(String, Int)].toDF("transaction_name", "transaction_state")
      case "cross_references" => // id 19: FK edges, one row per column pair
        foreignKeys.toSeq.flatMap { fk =>
          fk.refCols.zip(fk.cols).zipWithIndex.map { case ((pc, fc), i) =>
            (fk.refTable, pc, fk.table, fc, i + 1, fk.name)
          }
        }.toDF("pktable_name", "pkcolumn_name", "fktable_name",
          "fkcolumn_name", "ordinal_position", "fk_name")
      case "function_columns" => // id 21: alias parameters via reflection
        aliases.toSeq.flatMap { case (n, target) =>
          scala.util.Try {
            val dot = target.lastIndexOf('.')
            Class.forName(target.substring(0, dot)).getMethods
              .filter(m => m.getName == target.substring(dot + 1) &&
                java.lang.reflect.Modifier.isStatic(m.getModifiers))
              .sortBy(_.getParameterCount).headOption.toSeq
              .flatMap(m => m.getParameterTypes.zipWithIndex.map { case (p, i) =>
                (n, i + 1, p.getSimpleName.toUpperCase)
              })
          }.getOrElse(Seq.empty)
        }.toDF("alias_name", "pos", "type_name")
      case "constants" => // id 22
        constants.toSeq.map { case (n, v) => ("graft", "public", n, v) }
          .toDF("constant_catalog", "constant_schema", "constant_name", "sql")
      case "domains" => // id 23
        domains.toSeq.map { case (n, t) => (n, t.toUpperCase) }
          .toDF("domain_name", "type_name")
      case "triggers" => // id 24
        triggers.toSeq.map { case (n, (tbl, timing)) => (n, tbl, timing) }
          .toDF("trigger_name", "table_name", "timing")
      case "locks" => // id 26: a snapshot engine never holds row locks
        Seq.empty[(String, String, String)]
          .toDF("table_name", "session_id", "lock_type")
      case "session_state" => // id 27: statements that recreate this session
        (variables.toSeq.map { case (k, v) => (s"@$k", s"SET @$k = $v") } ++
         procedures.toSeq.map { case (k, v) => (k, s"PREPARE $k AS $v") })
          .toDF("key", "sql")
      case "query_statistics" => // id 28: live under SET QUERY_STATISTICS 1
        queryStats.toSeq.map { case (s, (n, mn, mx, cum)) =>
          (s, n, mn, mx, cum, cum / n) }
          .toDF("sql_statement", "execution_count", "min_execution_time",
            "max_execution_time", "cumulative_execution_time",
            "average_execution_time")
      case "databases" => // id 29
        databases.toSeq.toDF("database_name")
      case other => throw new IllegalArgumentException(
        s"INFORMATION_SCHEMA.$other not supported")
    }
    df.createOrReplaceTempView(view)
    view
  }

  /** SCRIPT-style DDL dump (dml/Script.java): re-emittable CREATE TABLE +
    * sequence statements for the current catalog. Data itself snapshots to
    * parquet via `backup`. */
  def script(): Seq[String] = {
    val ddl = tables.toSeq.map { case (name, df) =>
      val cols = df.schema.fields
        .filterNot(f => rowidTables.contains(name) && f.name == "_rowid_")
        .map { f =>
          val pk = primaryKeys.get(name).exists(_.contains(f.name.toLowerCase))
          s"${f.name} ${f.dataType.sql}${if (pk) " PRIMARY KEY" else ""}"
        }
      s"CREATE TABLE $name (${cols.mkString(", ")});"
    }
    val seqs = sequences.toSeq.map { case (n, s) =>
      s"CREATE SEQUENCE $n START WITH ${s.next} INCREMENT BY ${s.inc};"
    }
    val ixs = indexes.values.toSeq.map { ix =>
      s"CREATE ${if (ix.unique) "UNIQUE " else ""}INDEX ${ix.name} " +
        s"ON ${ix.table} (${ix.cols.mkString(", ")});"
    }
    val cons = foreignKeys.toSeq.map { fk =>
      s"ALTER TABLE ${fk.table} ADD CONSTRAINT ${fk.name} FOREIGN KEY " +
        s"(${fk.cols.mkString(", ")}) REFERENCES ${fk.refTable} " +
        s"(${fk.refCols.mkString(", ")});"
    } ++ checks.toSeq.map { ck =>
      s"ALTER TABLE ${ck.table} ADD CONSTRAINT ${ck.name} CHECK (${ck.expr});"
    }
    val vws = viewDefs.toSeq.map { case (n, sql) =>
      s"CREATE VIEW $n AS $sql;"
    }
    val als = aliases.toSeq.map { case (n, t) =>
      s"""CREATE ALIAS $n FOR "$t";"""
    }
    val consts = constants.toSeq.map { case (n, v) =>
      s"CREATE CONSTANT $n VALUE $v;"
    }
    val doms = domains.toSeq.map { case (n, t) =>
      s"CREATE DOMAIN $n AS ${t.toUpperCase};"
    }
    val defs = colDefaults.toSeq.flatMap { case (t, ds) =>
      ds.toSeq.map { case (c, d) =>
        s"ALTER TABLE $t ALTER COLUMN $c SET DEFAULT $d;"
      }
    }
    val usrs = users.toSeq.filter(_._1 != "sa").map { case (n, a) =>
      s"CREATE USER $n PASSWORD ''${if (a) " ADMIN" else ""};"
    }
    val rls = roles.toSeq.filter(_ != "public").map(r => s"CREATE ROLE $r;")
    val rgs = roleGrants.toSeq.map { case (r, g) => s"GRANT $r TO $g;" }
    val cmts = comments.toSeq.map { case ((t, n), c) =>
      s"COMMENT ON $t $n IS '${c.replace("'", "''")}';" }
    val dbs = databases.toSeq.filter(_ != "graft").map(d =>
      s"CREATE DATABASE $d;")
    ddl ++ seqs ++ ixs ++ cons ++ defs ++ vws ++ als ++ consts ++ doms ++
      usrs ++ rls ++ rgs ++ cmts ++ dbs
  }

  // ---- DDL helpers ----

  private def renameTable(from: String, to: String): Unit = {
    val df = tables.remove(from).getOrElse(
      throw new IllegalArgumentException(s"no table $from"))
    spark.catalog.dropTempView(from)
    primaryKeys.remove(from).foreach(primaryKeys(to) = _)
    identityCols.remove(from).foreach(identityCols(to) = _)
    identityNext.remove(from).foreach(identityNext(to) = _)
    indexes.mapValuesInPlace((_, ix) =>
      if (ix.table == from) ix.copy(table = to) else ix)
    foreignKeys.indices.foreach { i =>
      val fk0 = foreignKeys(i)
      var fk = fk0
      if (fk.table == from) fk = fk.copy(table = to)
      if (fk.refTable == from) fk = fk.copy(refTable = to)
      if (fk ne fk0) foreignKeys(i) = fk
    }
    checks.indices.foreach { i =>
      if (checks(i).table == from) checks(i) = checks(i).copy(table = to)
    }
    notNullCols.remove(from).foreach(notNullCols(to) = _)
    colDefaults.remove(from).foreach(colDefaults(to) = _)
    register(to, df)
  }

  /** ALTER TABLE … ADD CONSTRAINT (ddl/AlterTableAddConstraint.java):
    * existing rows are validated before the constraint is recorded, the
    * same all-rows check the reference runs — here one distributed
    * anti-join/filter/groupBy rather than a per-row index probe. */
  /** ADD CONSTRAINT bodies (AlterTableAddConstraint.java +
    * AlterTableAlterColumnTest shapes): `COMMENT IS '…'` prefixes are
    * attributes and strip; `HASH` on PRIMARY KEY, `KEY INDEX name` on
    * UNIQUE, a trailing `INDEX name` on PRIMARY KEY, trailing
    * `CHECK`/`NOCHECK` (NOCHECK skips the existing-row validation), CHECK
    * without parentheses, INDEX[ name](cols) constraints, and FOREIGN KEY
    * REFERENCES without a table (self-reference) are all accepted. */
  private def addConstraint(tn: String, cn: String, body0: String): Unit = {
    var body = body0.trim
    // strip COMMENT IS '…' (constraint attribute, recorded nowhere)
    body = """(?is)^COMMENT\s+IS\s+'[^']*'\s+""".r.replaceFirstIn(body, "")
    // trailing CHECK/NOCHECK validation toggle
    var validate = true
    val nocheck = """(?is)^(.*?)\s+(CHECK|NOCHECK)\s*$""".r
    body match {
      case nocheck(b, tog)
          // only when it's genuinely a trailing keyword, not CHECK(...)
          if !b.trim.toUpperCase.endsWith("CHECK") || tog.toUpperCase == "NOCHECK" =>
        if (tog.equalsIgnoreCase("NOCHECK")) validate = false
        body = b.trim
      case _ =>
    }
    val fkRe = """(?is)^FOREIGN\s+KEY\s*\(([^)]*)\)\s+REFERENCES\s*(\w+)?\s*(?:\(([^)]*)\))?\s*$""".r
    val ckParenRe = """(?is)^CHECK\s*(\(.*\))\s*$""".r
    val ckBareRe = """(?is)^CHECK\s+(.*)$""".r
    val uqRe = """(?is)^UNIQUE(?:\s+KEY)?(?:\s+INDEX\s+(\w+))?\s*\(([^)]*)\)\s*$""".r
    val pkRe = """(?is)^PRIMARY\s+KEY(?:\s+HASH)?\s*\(([^)]*)\)(?:\s+INDEX\s+(\w+))?\s*$""".r
    val ixRe = """(?is)^INDEX(?:\s+(\w+))?\s*\(([^)]*)\)\s*$""".r
    def keys(s: String) = s.split(",").map(_.trim.toLowerCase).toSeq
    body match {
      case fkRe(cols, ref0, refCols) =>
        val cCols = keys(cols)
        val ref = Option(ref0).getOrElse(tn) // REFERENCES(f2) = self-table
        val rCols = Option(refCols).map(keys)
          .orElse(primaryKeys.get(ref.toLowerCase))
          .getOrElse(throw new IllegalArgumentException(
            s"no primary key on $ref to reference"))
        if (validate)
          require(Dml.fkViolations(table(tn), cCols, table(ref), rCols).isEmpty,
            s"FK $cn violated by existing rows")
        foreignKeys += FkDef(cn, tn, cCols, ref.toLowerCase, rCols)
      case ckParenRe(e) =>
        if (validate)
          require(Dml.checkViolations(table(tn), expr(e)).isEmpty,
            s"CHECK $cn violated by existing rows")
        checks += CheckDef(cn, tn, e.trim)
      case ckBareRe(e) =>
        if (validate)
          require(Dml.checkViolations(table(tn), expr(e)).isEmpty,
            s"CHECK $cn violated by existing rows")
        checks += CheckDef(cn, tn, e.trim)
      case uqRe(ixName, cols) =>
        val ks = keys(cols)
        if (validate)
          require(Dml.duplicateKeys(nonNullKeyed(table(tn), ks), ks).isEmpty,
            s"UNIQUE $cn violated by existing rows")
        indexes(Option(ixName).map(_.toLowerCase).getOrElse(cn)) =
          IndexDef(Option(ixName).map(_.toLowerCase).getOrElse(cn), tn, ks,
            unique = true)
      case pkRe(cols, ixName) =>
        val ks = keys(cols)
        if (validate)
          require(Dml.duplicateKeys(table(tn), ks).isEmpty,
            s"PRIMARY KEY $cn violated by existing rows")
        primaryKeys(tn) = ks
        Option(ixName).foreach(ix => indexes(ix.toLowerCase) =
          IndexDef(ix.toLowerCase, tn, ks, unique = true))
      case ixRe(ixName, cols) =>
        // an INDEX "constraint" is just a secondary index (no-op execution)
        val n = Option(ixName).map(_.toLowerCase).getOrElse(cn)
        indexes(n) = IndexDef(n, tn, keys(cols), unique = false)
      case other => throw new IllegalArgumentException(
        s"unsupported constraint: $other")
    }
  }

  /** ADD COLUMN with the reference's option surface
    * (AlterTableAddColumn.java): DEFAULT expr fills existing rows (H2
    * semantics) and is recorded for inserts; `SEQUENCE s` makes the column
    * sequence-backed (existing rows stay NULL, inserts fill per-row);
    * IDENTITY/AUTO_INCREMENT registers the identity fill; BEFORE/AFTER
    * position the column. IF NOT EXISTS = no-op when present. */
  private def addColumn(tn0: String, cName0: String, typeSpec0: String,
      before: Option[String], after: Option[String]): Unit = {
    val tn = tn0.toLowerCase
    val cName = cName0.toLowerCase
    val t = table(tn)
    if (t.columns.contains(cName)) return // IF NOT EXISTS semantics
    var typeSpec = typeSpec0.trim
    var default: Option[String] = None
    // token scans: keywords inside a DEFAULT string literal are data
    seqClause(typeSpec) match {
      case Some((pre, seqName)) =>
        typeSpec = pre; default = Some(s"NEXTVAL('${seqName.toLowerCase}')")
      case None => defaultClause(typeSpec, leadIdent = false) match {
        case Some((pre, dflt)) => typeSpec = pre; default = Some(dflt.trim)
        case None =>
      }
    }
    val up = maskedUpper(typeSpec)
    if (up.contains("IDENTITY") || up.contains("AUTO_INCREMENT")) {
      identityCols(tn) = cName
      identityNext.getOrElseUpdate(tn, 1L)
    }
    default.foreach(d => colDefaults.getOrElseUpdate(tn,
      mutable.LinkedHashMap.empty)(cName) = d)
    val newCol = default.filter(!_.toUpperCase.startsWith("NEXTVAL"))
      .map(d => expr(substConstants(d, Seq(tn))))
      .getOrElse(lit(null))
      .cast(parseType(typeSpec)).as(cName)
    val cols = t.columns.map(col).toSeq
    val out = (before, after) match {
      case (Some(b), _) =>
        val i = t.columns.indexWhere(_.equalsIgnoreCase(b))
        require(i >= 0, s"BEFORE column $b not found")
        t.select((cols.take(i) :+ newCol) ++ cols.drop(i): _*)
      case (_, Some(a)) =>
        val i = t.columns.indexWhere(_.equalsIgnoreCase(a))
        require(i >= 0, s"AFTER column $a not found")
        t.select((cols.take(i + 1) :+ newCol) ++ cols.drop(i + 1): _*)
      case _ => t.select(cols :+ newCol: _*)
    }
    register(tn, out)
  }

  /** BACKUP-style snapshot (dml/Backup.java): every table to parquet. */
  def backup(dir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }

  // ---- helpers ----

  /** UNIQUE-index NULL semantics (Mode.java:88-99): with both unique-null
    * flags off — as in every reference mode — rows with NULL in any indexed
    * column never conflict, so uniqueness validation only considers fully
    * non-NULL key tuples. PRIMARY KEY validation keeps the strict form. */
  private def nonNullKeyed(df: DataFrame, ks: Seq[String]): DataFrame =
    df.filter(ks.map(k => col(k).isNotNull).reduce(_ && _))

  /** Column-definition list of CREATE TABLE. Also accepts inline
    * `[UNIQUE] KEY|INDEX name(cols)` entries when the compatibility mode
    * enables them (Mode.java indexDefinitionInCreateTable — REGULAR and
    * MySQL do, PostgreSQL doesn't), returned as (name, cols, unique). */
  private def parseColumnDefs(defs: String)
      : (StructType, Seq[String], Seq[(String, Seq[String], Boolean)]) = {
    val pks = mutable.ArrayBuffer.empty[String]
    val inlineIdx = mutable.ArrayBuffer.empty[(String, Seq[String], Boolean)]
    val inlineIdxRe =
      """(?is)^(UNIQUE\s+)?(?:KEY|INDEX)\s+(\w+)\s*\(([^)]*)\)$""".r
    val fields = splitTop(defs).flatMap { d0 =>
      val d = d0.trim
      val up = maskedUpper(d) // literal-blind keyword scan
      if (up.startsWith("PRIMARY KEY")) {
        pks ++= d.substring(d.indexOf('(') + 1, d.lastIndexOf(')'))
          .split(",").map(_.trim.toLowerCase)
        None
      } else d match {
        case inlineIdxRe(unique, ixName, cols)
            if modeFlags.indexDefinitionInCreateTable =>
          inlineIdx += ((ixName.toLowerCase,
            cols.split(",").map(_.trim.toLowerCase).toSeq, unique != null))
          None
        case _ =>
          val parts = d.split("\\s+", 2)
          val name = parts(0).toLowerCase
          val rest = if (parts.length > 1) parts(1) else "STRING"
          if (maskedUpper(rest).contains("PRIMARY KEY")) pks += name
          Some(StructField(name, parseType(rest), nullable = true))
      }
    }
    (StructType(fields), pks.toSeq, inlineIdx.toSeq)
  }

  private def parseType(t0: String): DataType = {
    val t = t0.trim.toUpperCase
    val base = t.takeWhile(c => c.isLetter || c == '_')
    // user-defined domain resolves to its base type (CreateUserDataType)
    domains.get(base.toLowerCase).foreach(d => return parseType(d))
    base match {
      case "INT" | "INTEGER" | "MEDIUMINT" | "SERIAL" => IntegerType
      case "BIGINT" | "LONG" | "IDENTITY" | "BIGSERIAL" => LongType
      case "SMALLINT" => ShortType
      case "TINYINT" => ByteType
      case "DOUBLE" | "FLOAT8" => DoubleType
      case "REAL" | "FLOAT" => FloatType
      case "DECIMAL" | "NUMERIC" | "NUMBER" =>
        val args = """\((\d+)\s*(?:,\s*(\d+))?\)""".r.findFirstMatchIn(t)
        args.map(m => DecimalType(m.group(1).toInt,
          Option(m.group(2)).map(_.toInt).getOrElse(0)))
          .getOrElse(DecimalType(38, 18))
      case "BOOLEAN" | "BOOL" | "BIT" => BooleanType
      case "DATE" => DateType
      case "TIMESTAMP" | "DATETIME" => TimestampType
      case "BINARY" | "VARBINARY" | "BLOB" | "BYTEA" => BinaryType
      case _ => StringType // VARCHAR/CHAR/CLOB/TEXT/UUID/…
    }
  }

  /** Like [[splitTop]] but also treats `[…]` as nesting (ARRAY literals). */
  private def splitTopBrackets(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case c @ ('(' | '[') if !inStr => depth += 1; sb += c
      case c @ (')' | ']') if !inStr => depth -= 1; sb += c
      case ',' if !inStr && depth == 0 =>
        out += sb.toString; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString
    out.toSeq
  }

  /** Split on top-level commas (ignoring parens and quoted strings) —
    * tokenizer-backed ([[Lex.splitTop]]), byte-compatible with the old
    * char loop. */
  private def splitTop(s: String): Seq[String] = Lex.splitTop(s)

  private def topLevelIndexOf(s: String, kw: String): Int =
    earliestTopLevel(s, Seq(kw))

  /** Tokenizer-backed ([[Lex.earliestTopLevel]]): depth-0 keyword search
    * that can neither bind inside string literals nor inside double-quoted
    * identifiers, and matches multi-word clauses across any whitespace. */
  private def earliestTopLevel(s: String, kws: Seq[String]): Int =
    Lex.earliestTopLevel(s, kws)

  /** MySQL-mode zero-date typed literals → typed NULL (see translate). */
  private def rewriteZeroDates(q0: String): String = {
    // '0000-00-00[ T]00:00:00[.0+]' — the zero-timestamp literal shapes
    def zeroTs(inner: String): Boolean = {
      if (!inner.startsWith("0000-00-00") || inner.length < 19) return false
      val sep = inner.charAt(10)
      if (sep != ' ' && sep != 'T') return false
      if (inner.substring(11, 19) != "00:00:00") return false
      val frac = inner.substring(19)
      frac.isEmpty ||
        (frac.length >= 2 && frac.charAt(0) == '.' && frac.drop(1).forall(_ == '0'))
    }
    var q = Rw.rewrite(q0, Rw.Kw("DATE"), Rw.Lit(_ == "0000-00-00"))(_ =>
      "CAST(NULL AS DATE)")
    q = Rw.rewrite(q, Rw.Kw("TIMESTAMP"), Rw.Lit(zeroTs))(_ =>
      "CAST(NULL AS TIMESTAMP)")
    q
  }

  /** VALUES tuples → DataFrame with the target table's schema. */
  private def parseValueRows(tableName: String, tuples0: String,
      insertCols: Option[Seq[String]] = None): DataFrame = {
    val t = table(tableName)
    val posCols: Seq[String] = insertCols.getOrElse(t.columns.toSeq)
    val defaults = colDefaults.getOrElse(tableName.toLowerCase,
      mutable.LinkedHashMap.empty[String, String])
    val rows = splitTop(tuples0.trim).map(_.trim).filter(_.nonEmpty).map { tup =>
      require(tup.startsWith("(") && tup.endsWith(")"), s"bad VALUES tuple: $tup")
      splitTop(tup.substring(1, tup.length - 1)).zipWithIndex.map { case (v0, i) =>
        val v = v0.trim
        // DEFAULT keyword → the column default (Column.java default
        // expression) or NULL; NEXTVAL defaults evaluate right here, once
        // per row (substSequences runs per value occurrence)
        val resolved =
          if (v.equalsIgnoreCase("DEFAULT"))
            defaults.getOrElse(posCols.lift(i).getOrElse(""), "NULL")
          else v
        val z = if (modeFlags.zeroDateToNull) rewriteZeroDates(resolved)
          else resolved
        substSequences(substConstants(z, Seq(tableName.toLowerCase)))
      }
    }
    val selects = rows.map(vs => s"SELECT ${vs.mkString(", ")}")
    spark.sql(selects.mkString(" UNION ALL "))
  }

  /** Positional align + cast to the target schema (SelectUnion.java:113
    * positional discipline); named-column inserts fill missing cols with
    * their recorded DEFAULT expression (Column.java) or NULL. Sequence
    * defaults stay NULL here and fill per-row afterwards. */
  private def alignTo(tn: String, target: DataFrame, cols: Option[Seq[String]],
      src: DataFrame): DataFrame = {
    val defaults = colDefaults.getOrElse(tn.toLowerCase,
      mutable.LinkedHashMap.empty[String, String])
    cols match {
      case None =>
        require(src.columns.length == target.columns.length,
          s"column count mismatch: ${src.columns.length} vs ${target.columns.length}")
        src.toDF(target.columns.toSeq: _*)
          .select(target.schema.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*)
      case Some(names) =>
        val lower = names.map(_.toLowerCase)
        require(src.columns.length == lower.length, "column count mismatch")
        val renamed = src.toDF(lower: _*)
        renamed.select(target.schema.fields.map { f =>
          if (lower.contains(f.name.toLowerCase))
            col(f.name.toLowerCase).cast(f.dataType).as(f.name)
          else defaults.get(f.name)
            .filter(!_.toUpperCase.startsWith("NEXTVAL"))
            .map(d => expr(substConstants(d, Seq(tn.toLowerCase)))
              .cast(f.dataType).as(f.name))
            .getOrElse(lit(null).cast(f.dataType).as(f.name))
        }.toSeq: _*)
    }
  }

  /** Fill the IDENTITY column where the insert left it NULL: contiguous
    * engine-assigned ids via per-partition offsets (Dml.assignContiguous)
    * — parallel, no single-partition window, and the same one-pass size
    * job doubles as the counter advance (no extra count() action). */
  /** Align a write batch to the table, transparently handling the hidden
    * _rowid_ column: positional sources align against the DECLARED columns
    * (then take a NULL _rowid_ to fill); named lists align against the full
    * frame and may set _rowid_ explicitly (PseudoColumnTest2). */
  private def alignForWrite(tn: String, colsSeq: Option[Seq[String]],
      src: DataFrame): DataFrame = {
    val t = table(tn)
    val hidden = rowidTables.contains(tn)
    val tAlign = if (hidden && colsSeq.isEmpty) t.drop("_rowid_") else t
    val a = alignTo(tn, tAlign, colsSeq, src)
    if (hidden && colsSeq.isEmpty) a.withColumn("_rowid_", lit(null).cast("long"))
    else a
  }

  /** Assign hidden _rowid_ values: explicit (named-list) values keep, NULL
    * rows take engine-contiguous ids from the per-table counter, and the
    * counter advances past any explicit maximum — PseudoColumnTest2's
    * "manual 2, next auto row gets 3" contract. */
  private def fillRowid(tn: String, df: DataFrame,
      mayHaveExplicit: Boolean): DataFrame = {
    val start = rowidNext(tn)
    if (!mayHaveExplicit) {
      val (filled, n) = Dml.assignContiguous(df, "_rowid_", start)
      rowidNext(tn) = start + n
      filled
    } else {
      val explicit = df.filter(col("_rowid_").isNotNull)
      val (filled, n) =
        Dml.assignContiguous(df.filter(col("_rowid_").isNull), "_rowid_", start)
      var next = start + n
      val mx = explicit.agg(max(col("_rowid_"))).head()
      if (!mx.isNullAt(0)) next = math.max(next, mx.getLong(0) + 1L)
      rowidNext(tn) = next
      explicit.union(filled)
    }
  }

  private def fillIdentity(tn: String, df: DataFrame): DataFrame =
    identityCols.get(tn) match {
      case Some(idCol) =>
        val start = identityNext(tn)
        val (filled, n) = Dml.assignContiguous(df, idCol, start)
        identityNext(tn) = start + n
        if (n > 0) lastIdentity = Some(start + n - 1)
        filled
      case None => df
    }

  /** Per-row fill for sequence-backed columns (`c int SEQUENCE s` —
    * Column.java sequence default): rows whose column is NULL take
    * consecutive values from the engine sequence via the same
    * per-partition-offset pattern as IDENTITY. Only runs for columns the
    * insert OMITTED (H2 evaluates defaults only for omitted columns — an
    * explicit NULL stays NULL and the sequence does not advance). Supports
    * the INCREMENT BY 1 contract the reference tests use. */
  private def fillSequenceDefaults(tn: String, df0: DataFrame,
      specified: Option[Set[String]]): DataFrame = {
    var df = df0
    val seqRef = """(?i)^NEXTVAL\s*\(\s*'(\w+)'\s*\)$""".r
    colDefaults.getOrElse(tn, mutable.LinkedHashMap.empty[String, String])
      .foreach { case (c, d) =>
        val omitted = specified.exists(s => !s.contains(c))
        if (omitted) seqRef.findFirstMatchIn(d.trim).foreach { m =>
          sequences.get(m.group(1).toLowerCase).foreach { sq =>
            val start = sq.next // peek; advance only by what the batch used
            val (filled, n) = Dml.assignContiguous(df, c, start)
            if (n > 0) { sq.advance(n); lastSeqVal = Some(start + (n - 1) * sq.inc) }
            df = filled
          }
        }
      }
    df
  }

  /** MySQL-mode convertInsertNullToZero (Mode.java:42): NULL inserted into
    * a NOT NULL column becomes 0 / '' / the current timestamp instead of
    * erroring. The engine-filled IDENTITY column is exempt. */
  private def convertNullToZero(tn: String, t: DataFrame, df: DataFrame): DataFrame = {
    val nn = notNullCols.getOrElse(tn, Set.empty)
    if (nn.isEmpty) df
    else df.select(t.schema.fields.toSeq.map { f =>
      if (!nn(f.name) || identityCols.get(tn).contains(f.name)) col(f.name)
      else {
        val zero: Column = f.dataType match {
          case StringType => lit("")
          case TimestampType => current_timestamp()
          case DateType => current_date()
          case BooleanType => lit(false)
          case _ => lit(0).cast(f.dataType)
        }
        coalesce(col(f.name), zero).as(f.name)
      }
    }: _*)
  }

  private def doInsert(name: String, cols: Option[String], src: DataFrame): Unit = {
    val t = table(name)
    val tn = name.toLowerCase
    val colsSeq = cols.map(c => splitTop(c).map(_.trim))
    val aligned0 = alignForWrite(tn, colsSeq, src)
    val specified = cols.map(c => splitTop(c).map(_.trim.toLowerCase).toSet)
    var aligned = fillSequenceDefaults(tn, fillIdentity(tn, aligned0), specified)
    if (rowidTables.contains(tn)) aligned = fillRowid(tn, aligned,
      colsSeq.exists(_.exists(_.equalsIgnoreCase("_rowid_"))))
    if (modeFlags.convertInsertNullToZero)
      aligned = convertNullToZero(tn, t, aligned)
    // row hooks fire around the statement (Insert.java:130,157-161,178);
    // an INSTEAD OF trigger replaces the insert (fireBeforeRow done=true)
    if (fireTriggers(tn, "INSERT", "BEFORE", t.limit(0), aligned)) return
    validateConstraints(tn, aligned)
    register(name, t.union(aligned))
    fireTriggers(tn, "INSERT", "AFTER", t.limit(0), aligned)
  }

  /** MySQL `INSERT … ON DUPLICATE KEY UPDATE` (Mode.java
    * onDuplicateKeyUpdate): rows whose key already exists apply the SET
    * list to the existing row; the rest insert. `VALUES(c)` in a SET
    * expression refers to the value the row would have inserted, exactly
    * MySQL's semantics. The key is the PRIMARY KEY, else the first unique
    * index. Executes as one left join (update side) plus one anti join
    * (insert side) on the key — both shuffle-bounded, no driver loop. */
  private def doUpsert(name: String, cols: Option[String], src0: DataFrame,
      sets: String): Unit = {
    val t = table(name)
    val tn = name.toLowerCase
    val key = primaryKeys.get(tn)
      .orElse(indexes.values.find(ix => ix.unique && ix.table == tn).map(_.cols))
      .getOrElse(throw new IllegalArgumentException(
        s"ON DUPLICATE KEY UPDATE needs a PRIMARY KEY or unique index on $name"))
    val src1a = fillIdentity(tn,
      alignForWrite(tn, cols.map(c => splitTop(c).map(_.trim)), src0))
    val src1 = if (rowidTables.contains(tn))
      fillRowid(tn, src1a, cols.exists(
        splitTop(_).exists(_.trim.equalsIgnoreCase("_rowid_"))))
    else src1a
    // MySQL applies duplicate source keys sequentially; a join applies them
    // simultaneously and would emit one target row per duplicate — keep the
    // LAST source row per key (the net effect for assignment-style SETs);
    // NULL keys never conflict. Shared idiom: Dml.lastPerKey.
    val src = Dml.lastPerKey(src1, key, exemptNullKeys = true)
    val setPairs = splitTop(sets).map { s =>
      val Array(c, v) = s.split("=", 2)
      // VALUES(col) → the source row's value (MySQL VALUES() function)
      val rewritten = Rw.rewrite(v.trim, Rw.Kw("VALUES"), Rw.Sy('('),
        Rw.AnyW, Rw.Sy(')'))(c => s"__src_${c(0).toLowerCase}")
      c.trim.toLowerCase -> rewritten
    }.toMap
    val srcR = src.select(src.columns.toSeq.map(c => col(c).as(s"__src_$c")) :+
      lit(true).as("__src_match"): _*)
    val keyCond = key.map(k => col(k) === col(s"__src_$k")).reduce(_ && _)
    val updatedFlagged = t.join(srcR, keyCond, "left")
      .select(t.schema.fields.toSeq.map { f =>
        setPairs.get(f.name) match {
          case Some(e) => when(col("__src_match"),
              expr(substSequences(substConstants(e, Seq(tn)))).cast(f.dataType))
            .otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      } :+ coalesce(col("__src_match"), lit(false)).as("__src_match"): _*)
    val updated = updatedFlagged.drop("__src_match")
    val insCond = key.map(k => col(s"__s.$k") === col(s"__t.$k")).reduce(_ && _)
    val inserted = src.alias("__s").join(t.alias("__t"), insCond, "left_anti")
      .select(t.columns.toSeq.map(col): _*)
    val batch = if (modeFlags.convertInsertNullToZero)
      convertNullToZero(tn, t, inserted) else inserted
    // FK/CHECK on both arms; uniqueness ONLY over the post-upsert table
    // (validateUniqueWithin). Probing the insert arm against the
    // PRE-update table would falsely reject the MySQL-legal case where the
    // UPDATE arm frees a unique value the insert arm reuses.
    validateRowConstraints(tn, batch)
    val modified = updatedFlagged.filter(col("__src_match")).drop("__src_match")
    validateRowConstraints(tn, modified)
    val finalTable = updated.union(batch)
    validateUniqueWithin(tn, finalTable)
    // row hooks (Insert.java/Update.java fire sites — the reference fires
    // them from MERGE/upsert too); deltas are lazy, so unbound triggers
    // cost nothing beyond the map lookup
    val oldMatched = t.alias("__t2").join(srcR, keyCond, "left_semi")
    if (fireTriggers(tn, "UPDATE", "BEFORE", oldMatched, modified) |
        fireTriggers(tn, "INSERT", "BEFORE", t.limit(0), batch)) return
    register(name, finalTable)
    fireTriggers(tn, "UPDATE", "AFTER", oldMatched, modified)
    fireTriggers(tn, "INSERT", "AFTER", t.limit(0), batch)
  }

  /** Batch twin of the reference's per-row constraint checks on INSERT
    * (ConstraintReferential.checkRow, ConstraintCheck.checkRow): validate
    * only the incoming batch — an anti join / filter per declared
    * constraint, not a full-table rescan. */
  private def validateConstraints(tn: String, batch: DataFrame): Unit = {
    validateRowConstraints(tn, batch)
    // Unique enforcement on insert (PK + unique indexes — the per-batch
    // twin of the reference's per-row unique-index probe,
    // GlobalUniqueIndex.java:33): a batch-internal duplicate check plus a
    // semi join against existing keys. NULL-keyed rows never conflict
    // (Mode.java:88-99 default).
    uniqueKeySets(tn).foreach { ks =>
      if (ks.forall(batch.columns.contains)) {
        val b = nonNullKeyed(batch, ks)
        require(Dml.duplicateKeys(b, ks).isEmpty,
          s"unique key (${ks.mkString(",")}) violated within insert batch on $tn")
        require(b.join(table(tn).select(ks.map(col).toSeq: _*), ks, "left_semi").isEmpty,
          s"unique key (${ks.mkString(",")}) violated: key already exists in $tn")
      }
    }
  }

  /** FK + CHECK validation over a row set (no uniqueness — see
    * validateConstraints / validateUniqueWithin for the two unique shapes). */
  private def validateRowConstraints(tn: String, rows: DataFrame): Unit = {
    if (refIntegrity) foreignKeys.filter(_.table == tn).foreach { fk =>
      require(Dml.fkViolations(rows, fk.cols, table(fk.refTable), fk.refCols).isEmpty,
        s"FK ${fk.name} violated: ${fk.table}(${fk.cols.mkString(",")}) → " +
          s"${fk.refTable}(${fk.refCols.mkString(",")})")
    }
    checks.filter(_.table == tn).foreach { ck =>
      require(Dml.checkViolations(rows, expr(ck.expr)).isEmpty,
        s"CHECK ${ck.name} violated: ${ck.expr}")
    }
  }

  /** Whole-table uniqueness (used by upsert, whose UPDATE arm can rewrite
    * unique columns of existing rows): one groupBy-count per unique key
    * set over the proposed final table. */
  private def validateUniqueWithin(tn: String, finalTable: DataFrame): Unit =
    uniqueKeySets(tn).foreach { ks =>
      if (ks.forall(finalTable.columns.contains))
        require(Dml.duplicateKeys(nonNullKeyed(finalTable, ks), ks).isEmpty,
          s"unique key (${ks.mkString(",")}) violated after upsert on $tn")
    }

  private def uniqueKeySets(tn: String): Seq[Seq[String]] =
    (primaryKeys.get(tn).toSeq ++
      indexes.values.filter(ix => ix.table == tn && ix.unique).map(_.cols)).distinct
}

/** CREATE ALIAS target resolution (ddl/CreateFunctionAlias.java +
  * db/schema/FunctionAlias.java — the reference also resolves
  * `"class.method"` by reflection and wraps it as a SQL function). The
  * method is looked up lazily inside the closure by name so the UDF stays
  * serializable for executors; only public static methods qualify, matching
  * FunctionAlias.java's `Modifier.isStatic` check. Source-code aliases
  * (`CREATE ALIAS … AS 'code'`) need a compiler and are rejected. */
private[sqlfront] object ReflectAlias {

  private def resolve(target: String): java.lang.reflect.Method = {
    val dot = target.lastIndexOf('.')
    require(dot > 0, s"""alias target must be "class.method": $target""")
    val (clsName, mName) = (target.substring(0, dot), target.substring(dot + 1))
    Class.forName(clsName).getMethods
      .filter(m => m.getName == mName &&
        java.lang.reflect.Modifier.isStatic(m.getModifiers))
      .sortBy(_.getParameterCount)
      .headOption
      .getOrElse(throw new IllegalArgumentException(
        s"no public static method $mName on $clsName"))
  }

  private def sparkType(c: Class[_]): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    c match {
      case java.lang.Integer.TYPE => IntegerType
      case c if c == classOf[java.lang.Integer] => IntegerType
      case java.lang.Long.TYPE => LongType
      case c if c == classOf[java.lang.Long] => LongType
      case java.lang.Double.TYPE => DoubleType
      case c if c == classOf[java.lang.Double] => DoubleType
      case java.lang.Float.TYPE => FloatType
      case c if c == classOf[java.lang.Float] => FloatType
      case java.lang.Boolean.TYPE => BooleanType
      case c if c == classOf[java.lang.Boolean] => BooleanType
      case java.lang.Short.TYPE => ShortType
      case c if c == classOf[java.lang.Short] => ShortType
      case c if c == classOf[String] => StringType
      case c if c == classOf[Array[Byte]] => BinaryType
      case c if c == classOf[java.math.BigDecimal] => DecimalType(38, 18)
      case other => throw new IllegalArgumentException(
        s"unsupported alias parameter/return type: $other")
    }
  }

  def register(spark: SparkSession, name: String, target: String): Unit = {
    val m = resolve(target) // fail fast on the driver
    val returnType = sparkType(m.getReturnType)
    // Serializable wrapper: captures only strings, resolves lazily per JVM.
    class Fn extends Serializable {
      @transient private lazy val method = resolve(target)
      // Convert each SQL value to the Java parameter type, as the
      // reference's FunctionAlias does via Value.convertTo before invoke
      private def coerce(a: AnyRef, t: Class[_]): AnyRef = a match {
        case null => null
        case n: java.lang.Number => t match {
          case java.lang.Integer.TYPE => Int.box(n.intValue())
          case c if c == classOf[java.lang.Integer] => Int.box(n.intValue())
          case java.lang.Long.TYPE => Long.box(n.longValue())
          case c if c == classOf[java.lang.Long] => Long.box(n.longValue())
          case java.lang.Double.TYPE => Double.box(n.doubleValue())
          case c if c == classOf[java.lang.Double] => Double.box(n.doubleValue())
          case java.lang.Float.TYPE => Float.box(n.floatValue())
          case c if c == classOf[java.lang.Float] => Float.box(n.floatValue())
          case java.lang.Short.TYPE => Short.box(n.shortValue())
          case c if c == classOf[java.lang.Short] => Short.box(n.shortValue())
          case c if c == classOf[java.math.BigDecimal] => n match {
            case d: java.math.BigDecimal => d
            case _ => new java.math.BigDecimal(n.toString)
          }
          case c if c == classOf[String] => n.toString
          case _ => n
        }
        case other if t == classOf[String] => other.toString
        case other => other
      }
      def call(args: Array[AnyRef]): AnyRef = {
        val pts = method.getParameterTypes
        method.invoke(null, args.zip(pts).map { case (a, t) => coerce(a, t) }: _*)
      }
    }
    val fn = new Fn
    import org.apache.spark.sql.api.java._
    m.getParameterCount match {
      case 0 => spark.udf.register(name,
        new UDF0[Any] { def call() = fn.call(Array.empty) }, returnType)
      case 1 => spark.udf.register(name,
        new UDF1[AnyRef, Any] { def call(a: AnyRef) = fn.call(Array(a)) },
        returnType)
      case 2 => spark.udf.register(name,
        new UDF2[AnyRef, AnyRef, Any] {
          def call(a: AnyRef, b: AnyRef) = fn.call(Array(a, b))
        }, returnType)
      case 3 => spark.udf.register(name,
        new UDF3[AnyRef, AnyRef, AnyRef, Any] {
          def call(a: AnyRef, b: AnyRef, c: AnyRef) = fn.call(Array(a, b, c))
        }, returnType)
      case n => throw new IllegalArgumentException(
        s"alias arity $n not supported (max 3)")
    }
  }
}
