package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}

/** Keyed-upsert JDBC sink for foreachBatch — the contract the
  * reference's "upsertToMySQL" claims but does not implement (it
  * APPENDS into a PRIMARY KEY (window_start, location) table,
  * spark_consumer_kafka.py:131-157; the first late-data re-emission
  * under update output mode violates the PK — SURVEY.md §4.4.2).
  *
  * Production shape: the batch bulk-loads into a staging table through
  * the EXECUTORS (Spark's JDBC writer — never a driver-side row loop),
  * then ONE server-side statement applies insert-or-update atomically
  * on the database; driver-side work is O(1) in batch size. The
  * statement is dialect-routed on the driver class: MySQL (the
  * reference's database and this sink's default) gets
  * `INSERT … SELECT … ON DUPLICATE KEY UPDATE`, everything else gets
  * ANSI `MERGE INTO` — JdbcStreamSinkSpec executes the MERGE branch
  * for real against the embedded Derby in /opt/spark/jars (the MySQL
  * branch is construct-only offline, like the Kafka surfaces).
  *
  * Concurrency contract: ONE writer per target table — foreachBatch
  * invocations of a single streaming query are already serialized;
  * two queries upserting the same target would race each other's
  * staging table (same as two appenders racing the reference's sink).
  * The staging table is dropped after each merge.
  *
  * Mirrors ParquetUpsertSink's other guards: empty-batch
  * short-circuit (reference A7), intra-batch PK dedup (deterministic
  * greatest non-key struct wins), batch persisted across its multiple
  * actions.
  *
  * EXACTLY-ONCE REPLAY (epoch ledger): foreachBatch's delivery
  * contract is at-least-once — a crash between the sink's commit and
  * the checkpoint's offset commit replays the same (batchId, data) on
  * restart (the window the reference's checkpointed append sink,
  * spark_consumer_kafka.py:155, turns into duplicate PK rows). This
  * sink records each applied epoch in `<table>_epochs (batch_id
  * PRIMARY KEY)` IN THE SAME TRANSACTION as the merge: a replayed
  * epoch hits the ledger's PK violation, rolls back, and is a provable
  * no-op — the transaction boundary means the merge and its ledger row
  * are indivisible, so no crash point double-applies or skips. A cheap
  * pre-staging ledger probe also skips the executor-side staging write
  * on known replays. DDL (target/ledger/stage create, stage drop)
  * stays OUTSIDE the transaction — MySQL DDL implicitly commits, so
  * interleaving it would break atomicity. The ledger is keyed
  * (scope, batch_id): batchIds are epochs of ONE logical streaming
  * query, and they restart at 0 when a checkpoint is reset or a new
  * query points at the same target — bind `ledgerScope` to the
  * checkpoint identity (e.g. a hash of checkpointLocation) so a
  * reset starts a fresh scope instead of silently skipping the first
  * N batches against the old ledger rows. The default scope keeps
  * the single-query-per-table contract below.
  *
  * `createTableColumnTypes` feeds Spark's option of the same name on
  * the staging write (e.g. "location VARCHAR(64)") — needed on Derby,
  * whose dialect maps StringType to CLOB, and CLOB columns cannot be
  * compared in a MERGE ON clause (on MySQL the same option picks
  * index-friendly key types); the target table inherits the corrected
  * types from the staging table at creation.
  */
final class JdbcUpsertSink(url: String, table: String,
    keyCols: Seq[String], user: String = "", password: String = "",
    driver: String = Connectors.MysqlDriver,
    createTableColumnTypes: Option[String] = None,
    ledgerScope: String = "") {

  require(!ledgerScope.contains("'") && ledgerScope.length <= 120,
    "ledgerScope must be a short quote-free identifier")

  private def q(id: String): String = "\"" + id + "\""

  private val isMysql = driver == Connectors.MysqlDriver

  def upsert(batch: DataFrame, batchId: Long): Unit = synchronized {
    batch.persist()
    try upsertPersisted(batch, batchId)
    finally batch.unpersist(): Unit
  }

  private def ledger = table + "_epochs"

  /** JDBC-metadata PK probe (exact-case then case-folded — engines
    * fold unquoted identifiers differently). Scoped to the
    * connection's current catalog/schema (ADVICE r10: a null scope
    * matches a same-named keyed table in ANY schema — a false positive
    * there skips the PK-recovery ALTER and re-opens exactly the
    * silent-append-forever window the recovery targets). Engines that
    * return null for getCatalog/getSchema fall back to the unscoped
    * probe they had before.
    */
  private def hasPrimaryKey(conn: java.sql.Connection,
      t: String): Boolean = {
    val cat = try conn.getCatalog catch {
      case _: java.sql.SQLException => null }
    val sch = try conn.getSchema catch {
      case _: java.sql.SQLException => null }
    def probe(name: String): Boolean = {
      val rs = conn.getMetaData.getPrimaryKeys(cat, sch, name)
      try rs.next() finally rs.close()
    }
    probe(t) || probe(t.toUpperCase) || probe(t.toLowerCase)
  }

  /** Dialect-free column-existence probe: a zero-row SELECT of the
    * column succeeds iff it exists (metadata getColumns needs the
    * engine-folded identifier, the same trap `exists` avoids).
    */
  private def hasColumn(st: java.sql.Statement, t: String,
      c: String): Boolean =
    try { st.executeQuery(s"SELECT $c FROM $t WHERE 1=0").close(); true }
    catch { case _: java.sql.SQLException => false }

  /** True iff `batchId` is already recorded — the cheap driver-side
    * replay probe (the authoritative guard is the transactional PK
    * insert in applyTxn). A missing ledger table reads as "not
    * applied".
    */
  private def epochApplied(st: java.sql.Statement,
      batchId: Long): Boolean =
    try {
      val rs = st.executeQuery(
        s"SELECT 1 FROM $ledger WHERE scope = '$ledgerScope' " +
          s"AND batch_id = $batchId")
      try rs.next() finally rs.close()
    } catch { case _: java.sql.SQLException => false }

  private def upsertPersisted(batch0: DataFrame, batchId: Long): Unit = {
    if (batch0.isEmpty) return
    val nonKey = batch0.columns.filterNot(keyCols.contains).toSeq
    val batch = graft.streaming.SinkOps.keyUniqueLatest(batch0, keyCols)
    val stage = table + "_stage"
    Class.forName(driver)
    val props = new Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        // Known replay: skip before the executor-side staging write.
        if (epochApplied(st, batchId)) return
        // Stage write goes through the SAME option map as every
        // Connectors surface (credentials included — hand-assembled
        // options are how user/password get dropped).
        var writer = Connectors.jdbcSinkWriter(batch, url, stage, user,
          password, driver).mode("overwrite")
        createTableColumnTypes.foreach(t =>
          writer = writer.option("createTableColumnTypes", t))
        writer.save()
        // Dialect-free existence probe: a zero-row SELECT succeeds iff
        // the target exists, regardless of how the engine folds
        // unquoted identifiers (getTables needs the folded name and
        // broke on case-folding differences).
        def exists(t: String): Boolean =
          try { st.executeQuery(s"SELECT 1 FROM $t WHERE 1=0")
            .close(); true }
          catch { case _: java.sql.SQLException => false }
        if (!exists(table)) {
          if (isMysql) {
            // The Spark-written staging table carries NO index, so a
            // bare CREATE TABLE LIKE would leave the target unkeyed and
            // ON DUPLICATE KEY UPDATE would never fire — the sink would
            // silently degrade to the reference's append bug. Install
            // the key the upsert contract requires at creation time.
            st.executeUpdate(s"CREATE TABLE $table LIKE $stage")
            st.executeUpdate(s"ALTER TABLE $table ADD PRIMARY KEY " +
              keyCols.map(k => s"`$k`").mkString("(", ", ", ")"))
          } else
            st.executeUpdate(
              s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
        } else if (isMysql && !hasPrimaryKey(conn, table)) {
          // Recover the one non-atomic DDL window: a crash BETWEEN the
          // CREATE and the ALTER above leaves an existing-but-unkeyed
          // target, and ON DUPLICATE KEY UPDATE would silently append
          // forever (the reference bug, made permanent). Idempotent:
          // runs once, only when the key is genuinely absent.
          st.executeUpdate(s"ALTER TABLE $table ADD PRIMARY KEY " +
            keyCols.map(k => s"`$k`").mkString("(", ", ", ")"))
        }
        if (!exists(ledger))
          st.executeUpdate(s"CREATE TABLE $ledger " +
            "(scope VARCHAR(120) NOT NULL, " +
            "batch_id BIGINT NOT NULL, " +
            "PRIMARY KEY (scope, batch_id))")
        else if (!hasColumn(st, ledger, "scope")) {
          // Migrate a ledger created by the pre-scope revision
          // (batch_id PRIMARY KEY only — ADVICE r10): without this,
          // the scoped INSERT below throws unknown-column on every
          // batch FOREVER (and epochApplied's broad catch masks the
          // probe, so the first symptom is a hard query failure on
          // upgrade). Idempotent: runs once, only when the column is
          // genuinely absent. Legacy rows get scope '' — the default
          // ledgerScope — so replay protection for already-applied
          // epochs survives the upgrade under the default scope.
          st.executeUpdate(s"ALTER TABLE $ledger ADD COLUMN " +
            "scope VARCHAR(120) DEFAULT '' NOT NULL")
          st.executeUpdate(s"ALTER TABLE $ledger DROP PRIMARY KEY")
          st.executeUpdate(
            s"ALTER TABLE $ledger ADD PRIMARY KEY (scope, batch_id)")
        }
        // All DDL is done (MySQL DDL implicitly commits, so none may
        // follow BEGIN). One transaction: ledger insert + merge — a
        // replayed epoch fails the ledger PK and rolls back untouched.
        conn.setAutoCommit(false)
        try {
          val fresh =
            try {
              st.executeUpdate(
                s"INSERT INTO $ledger (scope, batch_id) " +
                  s"VALUES ('$ledgerScope', $batchId)")
              true
            } catch {
              // SQLState class 23 = integrity-constraint violation
              // (the replay signature) — anything else propagates.
              case e: java.sql.SQLException
                  if Option(e.getSQLState).exists(_.startsWith("23"))
                => false
            }
          if (fresh) {
            val cols = batch0.columns.toSeq
            st.executeUpdate(
              if (isMysql) mysqlUpsert(stage, cols, nonKey)
              else ansiMerge(stage, cols, nonKey))
            conn.commit()
          } else conn.rollback()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.setAutoCommit(true)
        st.executeUpdate(s"DROP TABLE $stage")
      } finally st.close()
    } finally conn.close()
  }

  /** ANSI/Derby MERGE (executed by JdbcStreamSinkSpec). Column
    * identifiers are quoted because Spark's dialects write them
    * quoted; table names stay unquoted so both sides fold identically.
    */
  private[sources] def ansiMerge(stage: String, cols: Seq[String],
      nonKey: Seq[String]): String = {
    val on = keyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val insert = s"WHEN NOT MATCHED THEN INSERT " +
      s"(${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})"
    val update = if (nonKey.isEmpty) ""
    else "WHEN MATCHED THEN UPDATE SET " +
      nonKey.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + " "
    s"MERGE INTO $table t USING $stage s ON ($on) $update$insert"
  }

  /** MySQL upsert — requires the PRIMARY KEY/UNIQUE index on keyCols
    * that the reference's covid_aggregates DDL declares
    * (README.md:74-82); ON DUPLICATE KEY fires on exactly that index.
    * MySQL quotes identifiers with backticks.
    */
  private[sources] def mysqlUpsert(stage: String, cols: Seq[String],
      nonKey: Seq[String]): String = {
    def bq(id: String) = s"`$id`"
    val dup = if (nonKey.isEmpty) keyCols.take(1) else nonKey
    s"INSERT INTO $table (${cols.map(bq).mkString(", ")}) " +
      s"SELECT ${cols.map(bq).mkString(", ")} FROM $stage " +
      s"ON DUPLICATE KEY UPDATE " +
      dup.map(c => s"${bq(c)} = VALUES(${bq(c)})").mkString(", ")
  }
}
