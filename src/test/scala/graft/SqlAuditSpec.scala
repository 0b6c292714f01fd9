package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.transform.CleanColumns

/** The audit-SQL renderer, asserted regex-style like the reference's
  * `test_query_composition.py` — but derived from the same expressions
  * the engine executes. */
class SqlAuditSpec extends AnyFunSuite {

  test("audit SQL for the seven-scenario shape") {
    val sql = CleanColumns.toSql(
      Seq("Connect_ID", "d_123456789_2_2", "d_123456789_2_2_2_2",
        "state_d_987654321", "D_317093647"),
      "FlatConnect.module1_v2_JP", "src_table", "dest_table")
    assert(sql.contains("/* Combined transformation query for src_table -> dest_table */"))
    assert(sql.contains("Connect_ID (always preserved)"))
    assert(sql.contains("state_d_987654321 AS d_987654321"))
    assert(sql.matches("(?s).*coalesce\\(d_123456789_2_2, d_123456789_2_2_2_2\\) AS d_123456789_2.*"))
    assert(sql.contains("AS D_317093647_D_623218391")) // custom target keeps case
    assert(sql.contains("CASE WHEN"))
    assert(sql.contains("FROM src_table"))
  }

  test("one-off rename SQL (covid19 table)") {
    val sql = CleanColumns.toSql(
      Seq("Connect_ID", "d_71558179_v2_1_1"),
      "FlatConnect.covid19Survey_v1_JP", "s", "d")
    assert(sql.contains("d_71558179_v2_1_1 AS d_715581797_1_v2"))
  }
}
