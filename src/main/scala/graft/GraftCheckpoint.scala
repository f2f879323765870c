package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** THE stage-boundary materialization seam. Every multi-action composite
  * (q104's build stages, q155's rank-loop barriers, q71's shared
  * descriptor pass) cuts lineage here instead of calling
  * `localCheckpoint` directly, which buys two things:
  *
  * 1. **One config-flippable durability decision.** `localCheckpoint` is
  *    the right local/bench choice (no serialization to a reliable
  *    store), but its blocks die with their executor — on a real cluster
  *    a lost executor kills the whole composed job. Setting
  *    `spark.graft.checkpoint.mode=reliable` routes every stage boundary
  *    through `Dataset.checkpoint` into
  *    `spark.graft.checkpoint.dir` (HDFS/S3 on a cluster) with NO
  *    operator code change — the 100 TB durability story is a config
  *    flag, not a prose caveat. The trajectory is mode-independent by
  *    construction (both modes materialize the same frame);
  *    GraftCheckpointSpec re-verifies q104/q155 results under the flip.
  *
  * 2. **Stall attribution on every barrier.** Each eager materialization
  *    is a driver-synchronized job, which is exactly where co-tenant
  *    interference hides (r14's driver artifact carried a 312 s q104
  *    sample whose CPU-spin probes read QUIET — the steal was
  *    I/O/memory-shaped, invisible to a spin). Every stage() records
  *    `(wall, executor-run-sum, executor-cpu-sum)` from the engine's own
  *    task metrics: wall >> run/slots means the driver/scheduler or
  *    block store stalled; run >> cpu means tasks sat in I/O or memory
  *    wait; wall ≈ cpu/slots means honest compute. The next stalled
  *    artifact explains itself.
  */
object GraftCheckpoint {

  /** Runtime conf key: `local` (default — RDD blocks on the executors)
    * or `reliable` (`Dataset.checkpoint` into the configured dir).
    */
  val ModeKey = "spark.graft.checkpoint.mode"

  /** Reliable-mode target directory (set once per context); falls back
    * to a process-local temp dir so the flip is testable anywhere.
    */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Cumulative task metrics per SparkContext. TaskEnd events are
    * delivered asynchronously on the listener bus; [[stage]] polls the
    * counters to quiescence after the eager action returns (bounded —
    * attribution is best-effort telemetry, never a correctness gate).
    */
  private final class CpuCounter extends SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        runMs.addAndGet(m.executorRunTime)
        ()
      }
    }
  }

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, CpuCounter]()

  private def counter(sc: SparkContext): CpuCounter =
    counters.computeIfAbsent(s"${sc.applicationId}@${sc.startTime}", _ => {
      val c = new CpuCounter
      sc.addSparkListener(c)
      c
    })

  /** Wait (bounded) for the listener bus to drain the just-finished
    * job's TaskEnd events: poll until two consecutive 5 ms reads agree.
    */
  private def quiesce(c: CpuCounter): Unit = {
    var last = c.cpuNs.get + c.runMs.get
    var i = 0
    while (i < 20) {
      Thread.sleep(5)
      val now = c.cpuNs.get + c.runMs.get
      if (now == last) i = 20 else { last = now; i += 1 }
    }
  }

  /** Eagerly materialize `df` at a stage boundary and truncate its
    * lineage (downstream plans see a leaf — the planning-tax fix), in
    * the configured durability mode, recording one telemetry event:
    * `ckpt tag=<tag> mode=<m> wall=<s> run=<s> cpu=<s>`.
    */
  def stage(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val c = counter(sc)
    val mode = spark.conf.get(ModeKey, "local")
    val cpu0 = c.cpuNs.get
    val run0 = c.runMs.get
    val t0 = System.nanoTime()
    val out = mode match {
      case "reliable" =>
        if (sc.getCheckpointDir.isEmpty) {
          val dir = spark.conf.get(DirKey,
            java.nio.file.Files
              .createTempDirectory("graft_ckpt").toString)
          sc.setCheckpointDir(dir)
        }
        df.checkpoint(eager = true)
      case "local" => df.localCheckpoint(eager = true)
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be local or reliable, got '$other'")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    quiesce(c)
    Telemetry.record(
      f"ckpt tag=$tag mode=$mode wall=$wall%.3f " +
        f"run=${(c.runMs.get - run0) / 1e3}%.3f " +
        f"cpu=${(c.cpuNs.get - cpu0) / 1e9}%.3f")
    out
  }
}
