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
}
