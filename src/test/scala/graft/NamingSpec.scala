package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.naming.Naming
import graft.naming.Naming.LoopKey

/** Ports every ground-truth vector from the reference's
  * `test/test_utils.py` plus the edge cases documented in FIXTURES.md §S2. */
class NamingSpec extends AnyFunSuite {

  test("extractOrderedConceptIds: reference vectors (test_utils.py:7-17)") {
    val cases = Seq(
      "d_123456789_d_987654321" -> List("123456789", "987654321"),
      "D_123456789_987654321" -> List("123456789"),
      "D_123412349_1_1_D_987654321_1_1" -> List("123412349", "987654321"),
      "d_999999999" -> List("999999999"),
      "D_812370563_1_1_D_812370563_1_1_D_665036297" ->
        List("812370563", "812370563", "665036297"),
      "D_812370563_1_1_D_812370563_V3_1_1_D_665036297" ->
        List("812370563", "812370563", "665036297"),
      "random_text" -> List())
    for ((in, want) <- cases)
      assert(Naming.extractOrderedConceptIds(in) == want, s"input=$in")
  }

  test("extractLoopNumber: reference vectors (test_utils.py:21-35)") {
    val cases = Seq(
      "d_123456789_1_1_d_987654321_1_1" -> Some(1),
      "d_123456789_2_2_d_987654321_2_2" -> Some(2),
      "d_111111111_1_1_d_222222222_1_1" -> Some(1),
      "d_123456789_9_9_d_987654321_9_9" -> Some(9),
      "d_123456789_9_9_d_987654321_9_9_9_9_9_9" -> Some(9),
      "d_123456789_9_9_d_987654321_v1_9_9_9_9_9_9" -> Some(9),
      "d_123456789_v3_9_9_d_987654321_9_9_9_9_9_9" -> Some(9),
      "d_123456789_5_5" -> Some(5),
      "d_123456789" -> None,
      "d_111111111_12_12_d_222222222_12_12" -> Some(12))
    for ((in, want) <- cases)
      assert(Naming.extractLoopNumber(in) == want, s"input=$in")
  }

  test("groupVarsByCidAndLoopNum: reference vector (test_utils.py:39-62)") {
    val vars = Seq(
      "d_123456789_1_1_d_987654321_1_1",
      "d_123456789_2_2_d_987654321_2_2",
      "d_111111111_1_1_d_222222222_1_1_v1",
      "d_123456789_9_9_d_987654321_9_9",
      "d_123456789_9_9_d_987654321_9_9_9_9_9_9",
      "d_123456789_v3_5_5",
      "d_123456789")
    val got = Naming.groupVarsByCidAndLoopNum(vars).toMap
    val want = Map(
      LoopKey(Set("123456789", "987654321"), 1, "") -> List("d_123456789_1_1_d_987654321_1_1"),
      LoopKey(Set("123456789", "987654321"), 2, "") -> List("d_123456789_2_2_d_987654321_2_2"),
      LoopKey(Set("111111111", "222222222"), 1, "_v1") -> List("d_111111111_1_1_d_222222222_1_1_v1"),
      LoopKey(Set("123456789", "987654321"), 9, "") -> List(
        "d_123456789_9_9_d_987654321_9_9",
        "d_123456789_9_9_d_987654321_9_9_9_9_9_9"),
      LoopKey(Set("123456789"), 5, "_v3") -> List("d_123456789_v3_5_5"))
    assert(got == want)
  }

  test("extractVersionSuffix / exciseVersion") {
    assert(Naming.extractVersionSuffix("d_123456789_v2_1_1") == "_v2")
    assert(Naming.extractVersionSuffix("d_123456789_V3_1_1") == "_v3")
    assert(Naming.extractVersionSuffix("d_123456789_1_1") == "")
    assert(Naming.extractVersionSuffix("d_123456789_v2") == "_v2")
    // `_v...` must be its own token: the CID digits are untouched
    assert(Naming.extractVersionSuffix("d_715581797") == "")
    assert(Naming.exciseVersion("D_191057574_V2") == "D_191057574")
    assert(Naming.exciseVersion("D_715581797_V3_1_1") == "D_715581797_1_1")
    assert(Naming.exciseVersion("D_899251483_V2_D_452438775") == "D_899251483_D_452438775")
  }

  test("isPureVariable: docstring + constants cases (core/utils.py:138-182)") {
    assert(Naming.isPureVariable("D_869387390_11_11_D_478706011_11"))
    assert(!Naming.isPureVariable("D_907590067_4_4_SIBCANC3O_D_650332509_4"))
    assert(Naming.isPureVariable("D_299417266_v2"))
    assert(Naming.isPureVariable("Connect_ID"))
    assert(!Naming.isPureVariable("token"))
    assert(!Naming.isPureVariable("siteacronym"))
    assert(Naming.isPureVariable("state_d_123456789")) // 'state' is an allowed substring token
  }

  test("exciseSubstrings and standardizeCase") {
    val subs = graft.config.Constants.SubstringsToFix
    assert(Naming.exciseSubstrings("state_d_123456789", subs) == "d_123456789")
    assert(Naming.exciseSubstrings("d_123456789_num", subs) == "d_123456789")
    assert(Naming.standardizeCase("Connect_ID") == "Connect_ID")
    assert(Naming.standardizeCase("D_123456789_V2") == "d_123456789_v2")
  }

  test("findNonStandardConceptIds flags runs != 9 digits") {
    val got = Naming.findNonStandardConceptIds(Seq("d_71558179_v2_1_1", "d_715581797"))
    assert(got == Seq(("d_71558179_v2_1_1", "71558179", 8)))
  }

  test("listNonCidStrPatterns: intended per-column behavior (core/utils.py:280-290)") {
    val got = Naming.listNonCidStrPatterns(Seq(
      "D_907590067_4_4_SIBCANC3O_D_650332509_4", "hello",
      "d_123456789_1_1_d_987654321_1_1", "Connect_ID"))
    assert(got.map(_._2) == Seq("D_907590067_4_4_SIBCANC3O_D_650332509_4", "hello"))
    assert(got(1)._1 == "hello")
  }
}
