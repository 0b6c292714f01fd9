package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.naming.Naming

/** Property-based invariants of the naming grammar (SURVEY §5): the
  * algebraic facts the clean_columns planner relies on. Uses ScalaCheck
  * generators with a fixed-seed sampling driver (the scalatest-scalacheck
  * bridge artifact is not in the offline cache). */
class NamingPropertySpec extends AnyFunSuite {

  /** Deterministic property driver: 300 samples from the generator. */
  private def forAll[T](gen: Gen[T])(f: T => Unit): Unit = {
    var seed = Seed(42L)
    var n = 0
    while (n < 300) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => f(v); n += 1 }
      seed = seed.next
    }
  }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(for { a <- ga; b <- gb; c <- gc } yield (a, b, c)) { case (a, b, c) => f(a, b, c) }

  private val cidGen: Gen[String] = Gen.listOfN(9, Gen.numChar).map(_.mkString)
  private val loopGen: Gen[Int] = Gen.chooseNum(1, 12)
  private val versionGen: Gen[Option[Int]] = Gen.option(Gen.chooseNum(1, 9))

  private val pureLoopVarGen: Gen[String] = for {
    cids <- Gen.nonEmptyListOf(cidGen).map(_.take(3))
    loop <- loopGen
    ver <- versionGen
  } yield {
    val base = cids.map(c => s"d_${c}_${loop}_$loop").mkString("_")
    ver.map(v => s"${base}_v$v").getOrElse(base)
  }

  test("extractLoopNumber finds the constructed loop number") {
    forAll(pureLoopVarGen) { v =>
      assert(Naming.extractLoopNumber(v).isDefined)
    }
  }

  test("version excision then extraction yields no version") {
    forAll(pureLoopVarGen) { v =>
      assert(Naming.extractVersionSuffix(Naming.exciseVersion(v)) == "")
    }
  }

  test("standardizeCase is idempotent") {
    forAll(Gen.identifier) { s =>
      assert(Naming.standardizeCase(Naming.standardizeCase(s)) == Naming.standardizeCase(s))
    }
  }

  test("exciseSubstrings is idempotent for non-overlapping substrings") {
    val subs = graft.config.Constants.SubstringsToFix
    forAll(pureLoopVarGen) { v =>
      val once = Naming.exciseSubstrings(v, subs)
      assert(Naming.exciseSubstrings(once, subs) == once)
    }
  }

  test("loop number is stable under version insertion") {
    forAll(cidGen, loopGen, Gen.chooseNum(1, 9)) { (cid, loop, v) =>
      val plain = s"d_${cid}_${loop}_$loop"
      val versioned = s"d_${cid}_v${v}_${loop}_$loop"
      assert(Naming.extractLoopNumber(plain) == Naming.extractLoopNumber(versioned))
    }
  }

  test("extracted CIDs are 9-digit strings, order-preserved") {
    forAll(Gen.nonEmptyListOf(cidGen)) { cids =>
      val name = cids.map(c => s"d_$c").mkString("_")
      val got = Naming.extractOrderedConceptIds(name)
      assert(got == cids)
      assert(got.forall(c => c.length == 9 && c.forall(_.isDigit)))
    }
  }

  test("constructed pure loop variables are pure") {
    forAll(pureLoopVarGen) { v => assert(Naming.isPureVariable(v)) }
  }
}
