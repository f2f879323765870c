package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q130 (hot-block list serving): store→serve parity with inline q127,
  * the zero-recount serve plan, and dial honesty in meta.
  */
class HotBlockIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("serving the stored hot list reproduces inline q127 exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("hotidx").toString
    val d = graft.Tables.load(spark, dir, "documents")
    CorpusOps.writeHotBlockIndex(d, tmp)
    val served = graft.CacheScope.run {
      CorpusOps.hotScrubAgainstIndex(d, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    }
    val inline = graft.CacheScope.run {
      CorpusOps.q127HotBlockScrub(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
    }
    assert(served == inline, "store → serve round-trip drifted")
    // meta records the dials
    val props = IndexMeta.read(spark, tmp, "writeHotBlockIndex")
    assert(props.getProperty("hot_min").toInt == CorpusOps.HOT_BLOCK_MIN)
    assert(props.getProperty("block").toInt == 64)
  }

  test("serve plan never recounts: no exchange keyed by the block hash") {
    val tmp = java.nio.file.Files.createTempDirectory("hotplan").toString
    val d = graft.Tables.load(spark, dir, "documents")
    CorpusOps.writeHotBlockIndex(d, tmp)
    val p = CorpusOps.hotScrubAgainstIndex(d, tmp)
      .queryExecution.executedPlan.toString
    // inline q127 must shuffle on h for the frequency count; the serve
    // half joins the stored list broadcast — h never keys an exchange
    assert(p.contains("BroadcastHashJoin"),
      "hot list must broadcast:\n" + p)
    assert(!p.contains("hashpartitioning(h"),
      "serving recounted block frequencies:\n" + p)
    val inline = CorpusOps.q127HotBlockScrub(spark, dir)
      .queryExecution.executedPlan.toString
    assert(inline.contains("hashpartitioning(h"),
      "control: the inline path DOES count by hash:\n" + inline)
  }
}
