package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.SnapshotTable

/** Property-based transaction-layer invariants: random interleavings of
  * commit / append / compact / vacuum against a driver-side model of
  * what every retained snapshot must contain. The closed-form specs
  * pin each op in isolation and the race specs pin reader isolation;
  * this drives the COMPOSITIONS — append chains collapsed by compact,
  * vacuum reclaiming shared-dir chains mid-history, appends resuming
  * after a replace — across the whole small-sequence space. Same
  * fixed-seed sampling driver as ContainerPropertySpec (the
  * scalatest-scalacheck bridge is not in the offline cache). */
class SnapshotPropertySpec extends SparkSpec {

  private def forAll[T](gen: Gen[T], samples: Int)(f: T => Unit): Unit = {
    var seed = Seed(13L)
    var n = 0
    while (n < samples) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => f(v); n += 1 }
      seed = seed.next
    }
  }

  // 0 = commit (replace), 1 = append, 2 = compact, 3 = vacuum
  private val seqGen: Gen[List[Int]] =
    Gen.listOfN(9, Gen.chooseNum(0, 3))

  test("random op sequences: every retained snapshot reads exactly its model state") {
    val s = spark
    import s.implicits._
    forAll(seqGen, samples = 5) { ops =>
      val root = java.nio.file.Files
        .createTempDirectory("graft-snapprop").toString + "/t"
      // model: retained (snapshot id, expected rows), oldest first
      var model = Vector.empty[(Long, Set[(Long, Long)])]
      var ctr = 0
      def mkRows(): Set[(Long, Long)] =
        ((ctr * 1000 + 1) to (ctr * 1000 + 5 + ctr % 7))
          .map(i => (i.toLong, ctr.toLong)).toSet
      def df(rows: Set[(Long, Long)]) =
        rows.toSeq.sorted.toDF("id", "gen").repartition(3)
      // first op is always a commit so the table exists
      (0 :: ops).foreach { op =>
        op match {
          case 0 =>
            val rows = mkRows()
            val id = SnapshotTable.commit(df(rows), root)
            model :+= (id, rows)
          case 1 =>
            val rows = mkRows()
            val prev = model.lastOption.map(_._2).getOrElse(Set.empty)
            val id = SnapshotTable.append(df(rows), root)
            model :+= (id, prev ++ rows)
          case 2 if model.nonEmpty =>
            val id = SnapshotTable.compact(spark, root, rowsPerFile = 40)
            model :+= (id, model.last._2)
          case 3 if model.nonEmpty =>
            val keep = 1 + ctr % 2
            val removed = SnapshotTable.vacuum(spark, root, keepLast = keep)
            assert(removed == math.max(0, model.size - keep),
              s"vacuum removed $removed of ${model.size} keeping $keep (ops=$ops)")
            model = model.takeRight(keep)
          case _ => () // compact/vacuum before any commit: no-op
        }
        ctr += 1
        if (model.nonEmpty) {
          assert(SnapshotTable.snapshots(spark, root) == model.map(_._1),
            s"retained ids diverged from model (ops=$ops)")
          val got = SnapshotTable.read(spark, root)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          assert(got == model.last._2, s"current state diverged (ops=$ops)")
          // the OLDEST retained snapshot also still reads exactly —
          // time travel survives every later commit/compact/vacuum
          val (oid, orows) = model.head
          val oldGot = SnapshotTable.readAt(spark, root, oid)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          assert(oldGot == orows, s"time travel to $oid diverged (ops=$ops)")
        }
      }
      // closing retention pass: exactly the current version's dirs survive
      SnapshotTable.vacuum(spark, root, keepLast = 1)
      val liveDirs = SnapshotTable.dirsAt(spark, root,
        SnapshotTable.currentSnapshot(spark, root)).toSet
      val onDisk = new java.io.File(root).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
        .map(_.getName).toSet
      assert(onDisk == liveDirs,
        s"vacuum left orphans or reclaimed live dirs (ops=$ops)")
      assert(SnapshotTable.read(spark, root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == model.last._2)
    }
  }

  // 0 = commit (replace), 1 = append, 2 = branchCreate, 3 = branchAppend,
  // 4 = mergeBranch, 5 = vacuum
  private val branchSeqGen: Gen[List[Int]] =
    Gen.listOfN(10, Gen.chooseNum(0, 5))

  test("random op sequences with a branch: isolation, merge/refusal, retention") {
    val s = spark
    import s.implicits._
    forAll(branchSeqGen, samples = 5) { ops =>
      val root = java.nio.file.Files
        .createTempDirectory("graft-snapbr").toString + "/t"
      var main = Set.empty[(Long, Long)]
      var nSnaps = 0
      // branch model: (rows, branch-only rows, main rewritten since fork)
      var branch: Option[(Set[(Long, Long)], Set[(Long, Long)], Boolean)] = None
      var ctr = 0
      def mkRows(): Set[(Long, Long)] =
        ((ctr * 1000 + 1) to (ctr * 1000 + 4 + ctr % 5))
          .map(i => (i.toLong, ctr.toLong)).toSet
      def df(rows: Set[(Long, Long)]) =
        rows.toSeq.sorted.toDF("id", "gen").repartition(3)
      (0 :: ops).foreach { op =>
        op match {
          case 0 =>
            main = mkRows()
            SnapshotTable.commit(df(main), root); nSnaps += 1
            branch = branch.map { case (r, bo, _) => (r, bo, true) } // rewrite
          case 1 =>
            val rows = mkRows()
            SnapshotTable.append(df(rows), root); nSnaps += 1
            main ++= rows
          case 2 if branch.isEmpty && nSnaps > 0 =>
            SnapshotTable.branchCreate(spark, root, "dev")
            branch = Some((main, Set.empty, false))
          case 3 if branch.nonEmpty =>
            val rows = mkRows()
            SnapshotTable.branchAppend(df(rows), root, "dev")
            branch = branch.map { case (r, bo, rw) => (r ++ rows, bo ++ rows, rw) }
          case 4 if branch.nonEmpty =>
            val (bRows, bOnly, rewritten) = branch.get
            if (rewritten) {
              intercept[IllegalArgumentException] {
                SnapshotTable.mergeBranch(spark, root, "dev")
              }
              // refused merge leaves the branch intact and readable
              val got = SnapshotTable.branchRead(spark, root, "dev")
                .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
              assert(got == bRows, s"branch damaged by refused merge (ops=$ops)")
            } else {
              SnapshotTable.mergeBranch(spark, root, "dev"); nSnaps += 1
              main ++= bOnly
              branch = None
            }
          case 5 if nSnaps > 0 =>
            SnapshotTable.vacuum(spark, root, keepLast = 1)
          case _ => ()
        }
        ctr += 1
        if (nSnaps > 0) {
          val gotMain = SnapshotTable.read(spark, root)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          assert(gotMain == main, s"main diverged after op $op (ops=$ops)")
          branch.foreach { case (bRows, _, _) =>
            val gotBr = SnapshotTable.branchRead(spark, root, "dev")
              .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
            assert(gotBr == bRows, s"branch diverged after op $op (ops=$ops)")
          }
        }
      }
    }
  }
}
