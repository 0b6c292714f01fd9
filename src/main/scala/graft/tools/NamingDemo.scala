package graft.tools

import graft.naming.Naming
import graft.config.Constants

/** Scratch driver: exercises the naming package through its public API. */
object NamingDemo {
  def main(args: Array[String]): Unit = {
    println("cids=" + Naming.extractOrderedConceptIds("D_812370563_1_1_D_812370563_V3_1_1_D_665036297"))
    println("loop=" + Naming.extractLoopNumber("d_111111111_12_12_d_222222222_12_12"))
    println("loopNone=" + Naming.extractLoopNumber("d_123456789"))
    println("groups=" + Naming.groupVarsByCidAndLoopNum(Seq(
      "d_123456789_9_9_d_987654321_9_9",
      "d_123456789_9_9_d_987654321_9_9_9_9_9_9",
      "d_123456789")))
    println("pureBad=" + Naming.isPureVariable("D_907590067_4_4_SIBCANC3O_D_650332509_4"))
    println("pureGood=" + Naming.isPureVariable("D_869387390_11_11_D_478706011_11"))
    println("ver=" + Naming.extractVersionSuffix("d_899251483_V2_d_812107266_6_6")
      + " excised=" + Naming.exciseVersion("d_899251483_V2_d_812107266_6_6"))
    println("badcid=" + Naming.findNonStandardConceptIds(Seq("d_71558179_v2_1_1")))
    println("renames=" + Constants.OneOffColumnRenameMappings("FlatConnect.covid19Survey_v1_JP").take(2))
    println("ageExpr=" + Constants.ageTransform("D_317093647", "t"))
    println("tableRef=" + graft.config.TableRef.parse("p.FlatConnect.module1_v2_JP").configKey)
    println("sidecarPairs=" + graft.profiling.Profiler.loadFalseArrayReference(
      "/root/reference/reference/false_array_columns.json").size)
    println("normalized=" + graft.naming.VariableNormalizer.fixAllVariables(
      Seq("SIBCANC3O_1"), Map("SIBCANC3O" -> "123456789")))
  }
}
