package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q110 split-leakage repair: the oracle pins exact values; this spec
  * pins the repair LAWS — no near-dup pair straddles splits afterwards,
  * only paired docs ever move, and every cluster adopts its canonical
  * (min-id) member's content-hash split.
  */
class SplitRepairSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("repair closes every leak; only paired docs move; clusters adopt the min-id split") {
    graft.CacheScope.run {
      val out = CorpusOps.q110SplitRepair(spark, sf).cache()
      val rows = out.collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getBoolean(3))))
        .toMap

      // the fixture really leaks (q102 finds pairs), and the repair moves
      // someone — this test must not pass vacuously
      val leaks = CorpusOps.q102SplitLeakage(spark, sf).count()
      assert(leaks > 0, "fixture lost its cross-split near-dups; rebuild the test")
      assert(rows.values.exists(_._3), "no doc moved despite existing leaks")

      // law 1: after repair, NO verified near-dup pair straddles splits
      val pairs = Dedup.minhashNearDupPairs(
        graft.Tables.load(spark, sf, "documents"))
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      pairs.foreach { case (a, b) =>
        assert(rows(a)._2 == rows(b)._2,
          s"pair ($a, $b) still straddles ${rows(a)._2}/${rows(b)._2} after repair")
      }

      // law 2: docs outside the pair subgraph never move
      val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      rows.foreach { case (id, (orig, rep, moved)) =>
        if (!paired.contains(id))
          assert(!moved && orig == rep, s"unpaired doc $id moved $orig -> $rep")
      }

      // law 3: every component's repaired split is its min-id member's
      // ORIGINAL (content-hash) split — reproducible from the data alone
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      paired.groupBy(find).foreach { case (_, members) =>
        val canon = members.min
        members.foreach { m =>
          assert(rows(m)._2 == rows(canon)._1,
            s"doc $m repaired to ${rows(m)._2}, canonical $canon holds ${rows(canon)._1}")
        }
      }
    }
  }
}
