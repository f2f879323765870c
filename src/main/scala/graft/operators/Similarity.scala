package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exactness baseline, and a banded
  * random-hyperplane LSH variant as the 100 TB scale path.
  *
  * Scale notes: brute-force is probe-set × corpus — correct but O(P·N·d);
  * it exists as the verifier. The LSH variant hashes each vector with
  * `LSH_BANDS × LSH_BITS` hyperplanes into one signature per band
  * (multi-probe banding, same shape as MinHash-LSH): candidates are pairs
  * sharing at least one full band signature, so candidate generation is an
  * equi-join on (band, sig) — 2^LSH_BITS buckets PER BAND, and both the
  * bucket count and the band count are dials that grow with the corpus
  * (raise LSH_BITS for more, smaller buckets; raise LSH_BANDS to buy back
  * recall). This replaces the earlier single 8-bit signature whose 256
  * buckets made bucket occupancy — and pair count — grow linearly with N.
  * Hyperplanes are md5-derived, so both engines (and every executor)
  * regenerate identical planes with no driver-side state.
  */
object Similarity {

  /** Banding dials: 16 bands × 12 bits = 192 planes, 4096 buckets per
    * band. LSH_BITS is the SCALE dial (buckets per band grow 2^bits, so
    * bucket occupancy — and candidate count — stays bounded as the corpus
    * grows); LSH_BANDS is the RECALL dial (match probability
    * 1 − (1 − p^bits)^bands). 4 bands measured 3% recall@3 against brute
    * force at bucket-occupancy scale; 16 bands buys the recall back while
    * candidates stay an equi-join (AnnRecallSpec pins the floor).
    */
  val LSH_BANDS = 16
  val LSH_BITS: Int = graft.functions.expressions.SignatureExprs.LSH_BITS

  /** Dup-detection band count (q56/q67): these queries join CORPUS ×
    * CORPUS, so every band multiplies the signature join and the verify
    * set — and their targets are true near-dups (cosine ≥ 0.9, per-band
    * match 0.9^12 ≈ 0.28), where 8 bands already reach
    * 1 − (1 − 0.28)^8 ≈ 93% dup recall. The ANN path (probe × corpus)
    * affords 16 bands + multiprobe because its expansion lands on the
    * probe set only.
    */
  val DUP_BANDS = 8

  /** IVF list count — FIXED, corpus-independent: k is a deployment dial
    * (≈ √N at the target scale, e.g. 4096 lists for 10⁹ vectors), never
    * derived from the data at hand, so assignment cost is N·k map-side
    * dots and the centroid table (k × dim doubles) is always
    * closure-broadcastable. 16 suits the sf fixtures (hundreds to
    * thousands of vectors → lists of tens).
    */
  val IVF_K = 16

  /** IVF recall dial: lists probed per query (fraction of corpus scanned
    * ≈ NPROBE / IVF_K). 4 of 16 lists ≈ 25% of a near-uniform corpus
    * (AnnRecallSpec pins the floor).
    */
  val NPROBE = 4

  private[operators] def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Sequential-order dot product of two float embeddings in double
    * precision (oracle sums the same terms; both round to 6 decimals).
    * Backed by the native codegen'd [[graft.functions.expressions.DotProductExpr]]
    * (primitive float[] from Tungsten, no boxing) — registration is
    * idempotent per session.
    */
  private def dotC(spark: SparkSession, a: String, b: String) = {
    graft.functions.expressions.DotProductExpr.register(spark)
    expr(s"dot_product($a, $b)")
  }

  private[operators] def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nn", dotC(df.sparkSession, "embedding", "embedding"))

  /** Round half-AWAY-FROM-ZERO to 6 decimals via the scaled-double
    * formula — the semantics of DuckDB `round()` (the oracle side), so
    * kernel-side rounding can never diverge from the oracle on an exact
    * .5-ULP tie (`math.rint` rounds half-to-even and would). Note Spark's
    * own `round()` goes through `BigDecimal.valueOf` (shortest-decimal
    * HALF_UP) and can differ from this formula by 1 ULP near .5
    * boundaries — parity holds because BOTH engines run this same
    * formula, not because Spark `round()` is identical.
    */
  private def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  /** Column twin of [[round6]] — the same scaled-double formula, so the
    * DataFrame-side cosines can never diverge from the oracle's DuckDB
    * `round()` at a 1-ULP tie (Spark's `round()` rounds the
    * shortest-decimal form and could, per the note above).
    */
  private def round6c(c: Column): Column =
    signum(c) * floor(abs(c) * 1e6 + 0.5) / 1e6

  /** (vec_id, band, sig) — one row per band per vector. The per-band
    * signatures come from the native codegen'd
    * [[graft.functions.expressions.LshBandSigsExpr]]: one kernel pass
    * computes all nBands × LSH_BITS plane dots on the primitive float[]
    * (no per-plane explode, no per-row Seq conversion); the only exchange
    * downstream is the (band, sig) equi-join. No norm column: every caller
    * re-joins vectors for the cosine re-rank, so carrying `nn` here would
    * just bloat the cached bands table nBands-fold.
    */
  private[operators] def bandedSigs(e: DataFrame, nBands: Int = LSH_BANDS,
                         bits: Int = LSH_BITS): DataFrame = {
    graft.functions.expressions.SignatureExprs.register(e.sparkSession)
    e.select(col("vec_id"),
      posexplode(expr(s"lsh_band_sigs(embedding, $nBands, $bits)"))
        .as(Seq("band", "sig")))
  }

  /** Brute-force cosine top-5 for probe vectors (vec_id < 20) against the
    * whole corpus: compact probe×corpus pair join with an in-row array dot —
    * no 128× position explode, so the exchange is |probes|·|corpus| rows of
    * (id, id, double), and the probe side broadcasts.
    */
  def q48CosineKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(emb(spark, dir))
    val probes = e.select(col("vec_id").as("p_id"), col("embedding").as("pe"),
      col("nn").as("np")).filter(col("p_id") < 20)
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
      col("nn").as("nc"))
    val cos = broadcast(probes).join(cands, col("p_id") =!= col("c_id"))
      .withColumn("cosine",
        round6c(dotC(spark, "pe", "ce") / (sqrt(col("np")) * sqrt(col("nc")))))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** Hard-negative mining (contrastive-training prep, the ANCE/DPR
    * shape): for each probe, the top-5 most-similar vectors OUTSIDE the
    * probe's semantic cluster — high cosine but different cluster is
    * exactly the "hard" negative a contrastive objective needs; same-
    * cluster neighbors are excluded as likely false negatives. Clusters
    * are q72's shared seeded-argmin assignment, similarity is q48's
    * exact kernel — one definition each, so the miner cannot drift from
    * either gated query.
    *
    * Scale shape: cluster assignment is a pure map (k-bounded seed
    * closure); the probe set broadcasts against the corpus exactly like
    * q48 (at deployment scale the brute pass swaps for the q95 serving
    * stack with the same different-cluster filter); the per-probe top-5
    * window partitions by the bounded probe set.
    */
  def q112HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.CacheScope.cache(
      assignClusters(withNorm(emb(spark, dir)), 8)
        .select(col("vec_id"), col("embedding"), col("nn"), col("cluster")))
    val probes = e.select(col("vec_id").as("p_id"), col("embedding").as("pe"),
      col("nn").as("np"), col("cluster").as("pc")).filter(col("p_id") < 20)
    val cands = e.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
      col("nn").as("nc"), col("cluster").as("cc"))
    val cos = broadcast(probes).join(cands, col("pc") =!= col("cc"))
      .withColumn("cosine",
        round6c(dotC(spark, "pe", "ce") / (sqrt(col("np")) * sqrt(col("nc")))))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** Margin-mining dials (interpolated into the oracle so a change
    * cannot desync it): probe-id bound, neighborhood size, and the
    * acceptance threshold as the exact rational MM_NUM/MM_DEN — the
    * filter runs entirely in integer micro-units, so the threshold
    * comparison has ZERO float exposure cross-engine.
    */
  val MM_P = 40
  val MM_K = 4
  val MM_NUM = 102
  val MM_DEN = 100

  /** Margin-based neighbor mining (the CCMatrix/LASER bitext-mining
    * scoring rule, forward direction): corpus sides A/B are the label's
    * parity; for each side-A probe, score its side-B neighborhood and
    * accept a pair only when its cosine clears the neighborhood's mean
    * by the ratio margin — margin(x,y) = cos(x,y) / mean_k(cos(x, NN_k))
    * ≥ MM_NUM/MM_DEN. Absolute-threshold mining can't distinguish a
    * genuine translation pair from a dense hubness region; the margin
    * rule normalizes by the local neighborhood, which is the whole point
    * of the technique.
    *
    * Numeric discipline: cosines convert to 1e-6-unit longs BEFORE the
    * neighborhood mean, so the denominator is an exact integer sum (no
    * summation-order exposure) and the acceptance test cross-multiplies
    * entirely in integer space (`cos_u·k·DEN ≥ NUM·denom_u`); the
    * reported margin is one shared double division of those same
    * integers. Scale shape: the bounded probe set broadcasts against one
    * corpus scan (q48's kernel), the top-k window partitions by probe
    * id, the neighborhood mean is a k-row-bounded aggregate broadcast
    * back — at deployment scale the brute scan swaps for the q95
    * serving stack exactly as q112 documents.
    */
  def q148MarginMining(spark: SparkSession, dir: String): DataFrame =
    marginMine(withNorm(emb(spark, dir)))

  /** The q148 kernel over any (vec_id, embedding, nn, label) frame —
    * factored so the spec can drive synthetic hubness cases through the
    * exact production chain.
    */
  private[operators] def marginMine(en: DataFrame): DataFrame = {
    val spark = en.sparkSession
    val e = en.withColumn("side", pmod(col("label"), lit(2)))
    val probes = e.filter(col("side") === 0 && col("vec_id") < MM_P)
      .select(col("vec_id").as("p_id"), col("embedding").as("pe"),
        col("nn").as("np"))
    val cands = e.filter(col("side") === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
        col("nn").as("nc"))
    val cos = broadcast(probes).join(cands)
      .withColumn("cosine",
        round6c(dotC(spark, "pe", "ce") / (sqrt(col("np")) * sqrt(col("nc")))))
      .withColumn("cos_u",
        (signum(col("cosine")) * floor(abs(col("cosine")) * 1e6 + 0.5))
          .cast("long"))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cos_u").desc, col("c_id"))
    val nbhd = graft.CacheScope.cache(
      cos.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= MM_K)
        .select(col("p_id"), col("c_id"), col("cosine"), col("cos_u"),
          col("rn")))
    val denom = nbhd.groupBy(col("p_id"))
      .agg(sum(col("cos_u")).as("denom_u"), count(lit(1)).as("n_nb"))
      .filter(col("n_nb") === MM_K)
    nbhd.join(broadcast(denom), Seq("p_id"))
      .filter(col("cos_u") * MM_K * MM_DEN >= lit(MM_NUM) * col("denom_u"))
      .select(col("p_id"), col("c_id"), col("cosine"),
        round6c(col("cos_u") * lit(MM_K) / col("denom_u")).as("margin"),
        col("rn").cast("int").as("rn"))
  }

  /** All band signatures within hamming distance 2 of the exact signature
    * (1 + 12 + 66 = 79 masks for 12-bit bands) — the PROBE-side multiprobe
    * expansion: per-band match probability rises from p^12 to
    * P(hamming ≤ 2), which is what makes mid-similarity neighbors
    * (cosine ≈ 0.4, p ≈ 0.63) reachable at all, and the expansion cost
    * lands only on the (small) probe set — the corpus side stays one
    * signature per band regardless of corpus size.
    */
  private[operators] def probeMasksFor(bits: Int): Seq[Long] = {
    // combinatorial, not enumerate-and-filter: 2^bits wraps (Int shift is
    // mod 32) or explodes driver memory for the wide dials LshBandSigsExpr
    // permits (1..62 bits); 1 + bits + C(bits,2) masks is O(bits²) always
    require(bits >= 1 && bits <= 62, s"probe mask bits out of range: $bits")
    val singles = (0 until bits).map(i => 1L << i)
    val pairs = for {
      i <- 0 until bits
      j <- (i + 1) until bits
    } yield (1L << i) | (1L << j)
    0L +: (singles ++ pairs)
  }

  private val probeMasks: Seq[Long] = probeMasksFor(LSH_BITS)

  /** Banded hyperplane LSH ANN: candidates for probes (vec_id < 50) share a
    * band signature up to hamming distance 2 (probe-side multiprobe); exact
    * cosine re-rank keeps top-3.
    */
  def q49AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(emb(spark, dir)))
    val bands = graft.CacheScope.cache(bandedSigs(e)) // one signature pass feeds both join sides
    val cand = bands.filter(col("vec_id") < 50)
      .select(col("vec_id").as("p_id"), col("band"), col("sig"))
      .withColumn("m", explode(typedLit(probeMasks)))
      .select(col("p_id"), col("band"),
        col("sig").bitwiseXOR(col("m")).as("sig"))
      .join(bands.select(col("vec_id").as("c_id"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"))
      .distinct()
    val cos = cand
      .join(e.select(col("vec_id").as("p_id"), col("embedding").as("pe"),
        col("nn").as("np")), Seq("p_id"))
      .join(e.select(col("vec_id").as("c_id"), col("embedding").as("ce"),
        col("nn").as("nc")), Seq("c_id"))
      .withColumn("cosine",
        round6c(dotC(spark, "pe", "ce") / (sqrt(col("np")) * sqrt(col("nc")))))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** Materialize the embedding ANN index — [[q49AnnLsh]]'s corpus side as
    * a stored artifact: the per-band LSH signatures (candidate equi-join
    * side) and the vectors with their precomputed norms (exact re-rank
    * side). The embedding analogue of `Dedup.writeBandIndex`: an ANN
    * deployment signs its corpus once and every probe batch joins the
    * stored tables.
    */
  def writeAnnIndex(corpusEmb: DataFrame, path: String,
                    bands: Int = LSH_BANDS, bits: Int = LSH_BITS): Unit = {
    // the index RECORDS its banding dials (like Dedup.writeBandIndex):
    // serving signs probes at the STORED bands/bits, so index and probe
    // signatures can never be compared at mismatched widths — the silent
    // zero-candidate failure mode. Meta LAST: its presence marks the
    // build complete, and a reader racing a rebuild holds the OLD
    // fingerprint, so the new meta fails its next check loudly. Meta
    // invalidated FIRST: a rebuild that crashes mid-write leaves a
    // meta-less dir (refused), never new tables under the old meta.
    IndexMeta.invalidate(corpusEmb.sparkSession, path)
    graft.CacheScope.run {
      val e = graft.CacheScope.cache(withNorm(corpusEmb))
      e.select(col("vec_id"), col("embedding"), col("nn"))
        .write.mode("overwrite").parquet(s"$path/vectors")
      bandedSigs(e, bands, bits).select(col("vec_id"), col("band"), col("sig"))
        .write.mode("overwrite").parquet(s"$path/bands")
    }
    IndexMeta.write(corpusEmb.sparkSession, path, "graft ANN index dials",
      "bands" -> bands.toString, "bits" -> bits.toString)
  }

  /** [[q49AnnLsh]]'s semantics against a PREBUILT index
    * ([[writeAnnIndex]]): only the probe batch is signed (one
    * `lsh_band_sigs` kernel pass) and multiprobe-expanded; the corpus
    * participates through its STORED band signatures (candidate join) and
    * stored vectors+norms (re-rank) — corpus work per probe batch is
    * zero, the true serving shape.
    */
  /** A resolved ANN index — dials read from meta, corpus frames resolved
    * ONCE. The index is immutable for the life of a serving query, so
    * streaming callers hoist this outside `foreachBatch` instead of
    * re-reading meta.properties and parquet footers every micro-batch.
    */
  final case class LoadedAnnIndex private[operators] (
      bands: Int, bits: Int, corpusBands: DataFrame, corpusVecs: DataFrame)

  def loadAnnIndex(spark: SparkSession, indexPath: String): LoadedAnnIndex = {
    // sign probes at the dials the index RECORDS, never a caller guess
    val meta = IndexMeta.read(spark, indexPath, "writeAnnIndex")
    LoadedAnnIndex(
      meta.getProperty("bands").toInt, meta.getProperty("bits").toInt,
      spark.read.parquet(s"$indexPath/bands")
        .select(col("vec_id").as("c_id"), col("band"), col("sig")),
      spark.read.parquet(s"$indexPath/vectors")
        .select(col("vec_id").as("c_id"), col("embedding").as("ce"), col("nn").as("nc")))
  }

  def annAgainstIndex(probes: DataFrame, indexPath: String, k: Int = 3): DataFrame =
    annSearch(probes, loadAnnIndex(probes.sparkSession, indexPath), k)

  def annSearch(probes: DataFrame, idx: LoadedAnnIndex, k: Int = 3): DataFrame = {
    val spark = probes.sparkSession
    val (idxBands, idxBits) = (idx.bands, idx.bits)
    val corpusBands = idx.corpusBands
    val corpusVecs = idx.corpusVecs
    val p = graft.CacheScope.cache(withNorm(probes))
    val cand = bandedSigs(p, idxBands, idxBits)
      .select(col("vec_id").as("p_id"), col("band"), col("sig"))
      .withColumn("m", explode(typedLit(probeMasksFor(idxBits))))
      .select(col("p_id"), col("band"), col("sig").bitwiseXOR(col("m")).as("sig"))
      .join(corpusBands, Seq("band", "sig"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"))
      .distinct()
    val cos = cand
      .join(p.select(col("vec_id").as("p_id"), col("embedding").as("pe"),
        col("nn").as("np")), Seq("p_id"))
      .join(corpusVecs, Seq("c_id"))
      .withColumn("cosine",
        round6c(dotC(spark, "pe", "ce") / (sqrt(col("np")) * sqrt(col("nc")))))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** q49 through the materialized index (build-once per sf dir, like
    * q81): identical output contract, so it shares q49's oracle.
    */
  def q82AnnIndex(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // keyed by dir + source fingerprint like q81: a regenerated fixture
    // invalidates the stored index instead of silently serving stale sigs
    val indexPath = graft.Tables.derivedIndexPath("graft_ann_index", dir, "embeddings")
    // a pre-meta index dir (older layout) counts as incomplete → rebuild
    IndexMeta.ensureBuilt(indexPath)(
      new java.io.File(s"$indexPath/bands/_SUCCESS").exists() &&
        new java.io.File(s"$indexPath/meta.properties").exists()) {
      writeAnnIndex(e, indexPath)
    }
    annAgainstIndex(e.filter(col("vec_id") < 50), indexPath)
  }

  /** Embedding-cosine near-duplicate detection (the dedup modality over
    * vectors): banded-LSH candidate pairs with cosine ≥ 0.35 (the synthetic
    * corpus's near-dup band) — banding replicated in the oracle, so results
    * hash-match exactly.
    */
  def q56EmbeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(emb(spark, dir)))
    val bands = graft.CacheScope.cache(bandedSigs(e, DUP_BANDS)) // one signature pass, both sides
    val cand = bands.select(col("vec_id").as("a_id"), col("band"), col("sig"))
      .join(bands.select(col("vec_id").as("b_id"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
        col("nn").as("na")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("be"),
        col("nn").as("nb")), Seq("b_id"))
      .withColumn("cosine",
        round6c(dotC(spark, "ae", "be") / (sqrt(col("na")) * sqrt(col("nb")))))
      .filter(col("cosine") >= 0.35)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** IVF-Flat ANN — the second scale path next to LSH (q49): a coarse
    * quantizer partitions the corpus into inverted lists, probes search
    * only their top-`nprobe` lists. The quantizer is one deterministic
    * k-means step with k = IVF_K FIXED (corpus-independent): seeds are the
    * IVF_K lowest vec_ids, every vector assigns to its nearest seed by
    * q72's squared-L2 kernel (dist rounded to 6, ties → lower id), and
    * each centroid is the per-position mean of its members rounded to 6 —
    * both engines replay the identical arithmetic, so results hash-match.
    *
    * Scale shape: training is one map-side aggregation (k·dim partial sums
    * per partition → k rows to the driver); the trained centroids ride the
    * UDF closure (k × dim doubles), so list ASSIGNMENT is a pure map —
    * N·k dots, NO shuffle at all — and probe-list ranking is in-row top-k
    * over the same k cosines. List search joins probe lists to members on
    * the list id; candidates scale with list occupancy (N/k per list).
    * Cosines are rounded to 6 before ranking on both engines so argmax
    * ties break identically (by id).
    */
  /** One deterministic k-means step with the IVF_K lowest vec_ids as
    * seeds: squared-L2 assignment (rounded, ties to the lower id) then
    * per-list rounded means. Returns (cent_id, centroid, ‖centroid‖²) —
    * ≤ IVF_K rows of dim+2 values, bounded driver state.
    */
  /** The k rows with the LOWEST vec_ids — the documented seed contract for
    * any (vec_id, embedding, …) frame, not just id-contiguous fixtures
    * where `vec_id < k` happens to coincide (a re-keyed corpus whose ids
    * start above k would otherwise collect ZERO seeds and crash).
    */
  private def lowestIdSeeds(e: DataFrame, k: Int): Array[(Long, Array[Double])] =
    e.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  /** Squared-L2 argmin over a broadcast seed table: distance rounded to 6
    * BEFORE the argmin, ties to the lower id — the ONE kernel shared by
    * q72, IVF training and IVF serving, so their documented equivalence
    * cannot drift. Returns (best_id, best_dist2).
    */
  private def nearestSeedU(seeds: Array[(Long, Array[Double])]) =
    udf((v0: Seq[Float]) => {
      val v = v0.toArray // O(1) indexing for the k×dims distance loops
      var bestId = -1L
      var bestD = Double.MaxValue
      seeds.foreach { case (sid, s) =>
        var d = 0.0
        var i = 0
        while (i < s.length) { val df = v(i).toDouble - s(i); d += df * df; i += 1 }
        d = round6(d)
        if (d < bestD) { bestD = d; bestId = sid } // ties keep the lower id
      }
      (bestId, bestD)
    })

  private def trainCentroids(e: DataFrame, k: Int = IVF_K)
      : Array[(Long, Array[Double], Double)] =
    trainCentroidsFrom(lowestIdSeeds(e, k), e)

  private def trainCentroidsFrom(seeds: Array[(Long, Array[Double])],
                                 e: DataFrame)
      : Array[(Long, Array[Double], Double)] = {
    val dim = seeds.head._2.length
    val sumCols = count(lit(1)).as("n") +: (0 until dim).map(i =>
      sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
    e.groupBy(nearestSeedU(seeds)(col("embedding")).getField("_1").as("cent_id"))
      .agg(sumCols.head, sumCols.tail: _*)
      .collect() // ≤ IVF_K rows of dim+2 values — bounded driver state
      .map { r =>
        val n = r.getLong(1)
        val m = Array.tabulate(dim)(i => round6(r.getDouble(i + 2) / n))
        (r.getLong(0), m, m.map(x => x * x).sum)
      }
      .sortBy(_._1)
  }

  /** vector → cosine against every centroid (closure-broadcast cents). */
  private def centCosOf(cents: Array[(Long, Array[Double], Double)])(
      v0: Seq[Float]): Array[(Long, Double)] = {
    val v = v0.toArray
    var nn = 0.0
    var i = 0
    while (i < v.length) { nn += v(i).toDouble * v(i); i += 1 }
    cents.map { case (cid, c, nc) =>
      var dot = 0.0
      var j = 0
      while (j < c.length) { dot += v(j).toDouble * c(j); j += 1 }
      (cid, round6(dot / (math.sqrt(nn) * math.sqrt(nc))))
    }
  }

  private def listAssignUdf(cents: Array[(Long, Array[Double], Double)]) =
    udf((v0: Seq[Float]) =>
      centCosOf(cents)(v0).minBy { case (cid, cos) => (-cos, cid) }._1)

  private def topListsUdf(cents: Array[(Long, Array[Double], Double)],
                          nprobe: Int = NPROBE) =
    udf((v0: Seq[Float]) =>
      centCosOf(cents)(v0).sortBy { case (cid, cos) => (-cos, cid) }
        .take(nprobe).map(_._1).toSeq)

  def q57AnnIvf(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(emb(spark, dir), IVF_K, NPROBE)

  /** q57's train→assign→probe→rerank chain with the two deployment dials
    * exposed: `k` (list count) and `nprobe` (lists probed). q57 IS this
    * at the fixture dials (hash-gated), so [[AnnLadderBench]] prices the
    * production code path — fixed k=16 vs the ≈√N list count the
    * [[IVF_K]] scaladoc prescribes at corpus scale — not a fork of it.
    */
  private[graft] def ivfTopK(e0: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(e0))
    val cents = trainCentroids(e, k)
    // --- assign + probe: pure map over the closure-broadcast centroids ---
    val assign = e.select(col("vec_id").as("c_id"),
      corpusAssignUdf(e0.sparkSession, cents)(col("embedding")).as("list_id"))
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("p_id"),
        explode(probeListsUdf(e0.sparkSession, cents, nprobe)(col("embedding"))).as("list_id"))
    val cand = probes
      .join(assign, Seq("list_id"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"))
    ivfRerank(cand,
      e.select(col("vec_id").as("p_id"), col("embedding").as("pe"), col("nn").as("np")),
      e.select(col("vec_id").as("c_id"), col("embedding").as("ce2"), col("nn").as("nc2")))
  }

  /** Shared exact-cosine re-rank tail: candidates × probe/corpus vector
    * sides → top-3 per probe.
    */
  private def ivfRerank(cand: DataFrame, probeSide: DataFrame,
                        corpusSide: DataFrame): DataFrame = {
    val spark = cand.sparkSession
    val cos = cand
      .join(probeSide, Seq("p_id"))
      .join(corpusSide, Seq("c_id"))
      .withColumn("cosine",
        round6c(dotC(spark, "pe", "ce2") / (sqrt(col("np")) * sqrt(col("nc2")))))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** Centroid-training budget: at most this many vectors per centroid
    * are TRAINED on (the standard k-means training cap — FAISS ships
    * max_points_per_centroid = 256). The full corpus is still ASSIGNED
    * exactly once (the inverted-lists write — unavoidable and the part
    * that is the index), but the training pass's N·k·d distance work
    * shrinks to ~(256·k)·k·d: at the r15 ladder's 5M/√N rung that is a
    * ~9× cut of the measured 140.5 s build bottleneck. Sampling is
    * deterministic (xxhash64 of vec_id — content- and partitioning-
    * independent) and DISABLED below the cap, so every fixture corpus
    * (≤ 4096 = 256·IVF_K vectors) trains on all rows and the gated
    * hashes are untouched; IvfSampleSpec measures the recall delta at
    * sampled scale.
    */
  val IVF_TRAIN_PER_CENTROID = 256

  private def trainCentroidsSampled(e: DataFrame, k: Int, perCentroid: Int)
      : Array[(Long, Array[Double], Double)] = {
    val cap = perCentroid.toLong * k
    val n = e.count() // callers pass the cached corpus frame
    if (n <= cap) {
      graft.Telemetry.record(s"ivf train=full n=$n cap=$cap")
      trainCentroids(e, k)
    } else {
      val ratio = math.ceil(n.toDouble / cap).toLong
      graft.Telemetry.record(s"ivf train=sampled n=$n cap=$cap ratio=$ratio")
      // seeds from the FULL corpus (the same lowest-id rule the full
      // train uses): the sample then only perturbs the per-centroid MEAN
      // estimates (≈256 points each — the FAISS budget), not the seed
      // set, so sampled-vs-full quantizers differ by estimation noise
      // rather than by a different k-means starting point (measured: the
      // sample-seeded variant cost 0.07 recall at 5M/√N; this form holds
      // within the 0.02 contract IvfSampleSpec pins)
      val seeds = lowestIdSeeds(e, k)
      trainCentroidsFrom(seeds, graft.CacheScope.cache(
        e.filter(pmod(xxhash64(col("vec_id")), lit(ratio)) === 0)))
    }
  }

  /** Two-level (coarse-then-fine) assignment gate. Sampled training
    * ([[IVF_TRAIN_PER_CENTROID]]) cut the 5M/√N index build's TRAINING
    * pass ~9×, which left the full-corpus assignment pass — N·k·d
    * distances against every fine centroid — as the measured build
    * bottleneck (SCALE.md r16: 117.6 s of the sampled build at 5M; the
    * 100 TB index-build wall). The standard IMI/two-level fix: group the
    * k fine centroids into ~√k coarse cells (a driver-side spherical
    * k-means over the ≤ k-row centroid table — microseconds), rank the
    * cells per vector, and run the EXACT fine argmax (same round6 cosine,
    * same lower-id tie rule) only over the [[IVF_COARSE_W]] best cells'
    * members: per-vector cost drops from k·d to ~(√k + w·k/√k)·d — ~6×
    * at k≈2236 — and whenever the true argmax centroid lives in a probed
    * cell the assignment is IDENTICAL to exact. Below this list count
    * the exact single-level argmax runs (every fixture dial: k=16, and
    * the 2k-vector ladder fixture's √N=45 — gated hashes untouched).
    * Both dials are conf-overridable for specs and ladder A/B runs:
    * `spark.graft.ivf.twoLevelMinK`, `spark.graft.ivf.coarseProbes`
    * (w ≥ nCoarse degenerates to exact THROUGH the two-level path,
    * which is how IvfTwoLevelSpec pins path equivalence).
    */
  val IVF_TWOLEVEL_MIN_K = 128
  val TWOLEVEL_MIN_K_CONF = "spark.graft.ivf.twoLevelMinK"
  val IVF_COARSE_W = 4
  val COARSE_W_CONF = "spark.graft.ivf.coarseProbes"

  /** The coarse quantizer over the FINE centroid table: cell centroids,
    * their squared norms, and each cell's member indices into the fine
    * array. Empty cells are dropped, so every cell ranks with ≥ 1 member.
    */
  private[operators] final case class CoarseCells(
      cents: Array[Array[Double]], norms: Array[Double],
      members: Array[Array[Int]])

  /** Driver-side spherical k-means over the fine centroids (≤ k rows —
    * the table already rides the closure, so this costs iters·k·√k·d
    * flops on the driver, microseconds at any real k). Seeds = the
    * nCoarse lowest-cent_id fine centroids (the [[lowestIdSeeds]] rule);
    * assignment by cosine with ties to the lower cell ordinal; a cell
    * that empties keeps its previous centroid and is dropped at the end
    * if still empty.
    */
  private[operators] def buildCoarseCells(
      fine: Array[(Long, Array[Double], Double)], nCoarse0: Int,
      iters: Int = 5): CoarseCells = {
    val nCoarse = math.min(math.max(nCoarse0, 1), fine.length)
    val dim = fine.head._2.length
    val cents = Array.tabulate(nCoarse)(c => fine(c)._2.clone())
    val norms = cents.map(_.map(x => x * x).sum)
    def assignAll(): Array[Int] = fine.map { case (_, f, nf) =>
      var best = 0
      var bestCos = Double.NegativeInfinity
      var c = 0
      while (c < nCoarse) {
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += f(j) * cents(c)(j); j += 1 }
        val cos = dot / math.sqrt(math.max(nf * norms(c), 1e-300))
        if (cos > bestCos) { bestCos = cos; best = c }
        c += 1
      }
      best
    }
    var asg = assignAll()
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCoarse, dim)(0.0)
      val n = new Array[Int](nCoarse)
      var i = 0
      while (i < fine.length) {
        val c = asg(i)
        n(c) += 1
        val f = fine(i)._2
        var j = 0
        while (j < dim) { sums(c)(j) += f(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < nCoarse) {
        if (n(c) > 0) {
          var j = 0
          var nn = 0.0
          while (j < dim) {
            val v = sums(c)(j) / n(c)
            cents(c)(j) = v; nn += v * v; j += 1
          }
          norms(c) = nn
        }
        c += 1
      }
      asg = assignAll()
      it += 1
    }
    val byCell = asg.zipWithIndex.groupBy(_._1)
    val kept = (0 until nCoarse).filter(byCell.contains)
    CoarseCells(
      kept.map(cents).toArray, kept.map(norms).toArray,
      kept.map(c => byCell(c).map(_._2).sorted.toArray).toArray)
  }

  /** [[listAssignUdf]]'s semantics restricted to the w best coarse cells:
    * cells rank by unrounded cosine (the vector norm is common, so by
    * dot/‖cell‖, ties to the lower cell ordinal), then the fine argmax
    * runs the EXACT kernel — round6'd cosine, ties to the lower cent_id —
    * over the probed cells' members only.
    */
  private def listAssignTwoLevelUdf(fine: Array[(Long, Array[Double], Double)],
                                    cells: CoarseCells, w: Int) =
    udf((v0: Seq[Float]) => {
      val v = v0.toArray
      var nn = 0.0
      var i = 0
      while (i < v.length) { nn += v(i).toDouble * v(i); i += 1 }
      val nv = math.sqrt(nn)
      val nC = cells.cents.length
      val scores = new Array[Double](nC)
      var c = 0
      while (c < nC) {
        val cc = cells.cents(c)
        var dot = 0.0
        var j = 0
        while (j < cc.length) { dot += v(j).toDouble * cc(j); j += 1 }
        scores(c) = dot / math.sqrt(math.max(cells.norms(c), 1e-300))
        c += 1
      }
      val probed = (0 until nC).sortBy(c => (-scores(c), c)).take(w)
      var bestId = Long.MaxValue
      var bestCos = Double.NegativeInfinity
      probed.foreach { pc =>
        cells.members(pc).foreach { fi =>
          val (cid, fc, nc) = fine(fi)
          var dot = 0.0
          var j = 0
          while (j < fc.length) { dot += v(j).toDouble * fc(j); j += 1 }
          val cos = round6(dot / (nv * math.sqrt(nc)))
          if (cos > bestCos || (cos == bestCos && cid < bestId)) {
            bestCos = cos; bestId = cid
          }
        }
      }
      bestId
    })

  /** [[topListsUdf]]'s semantics restricted to the best coarse cells —
    * the SERVE-side analogue of [[listAssignTwoLevelUdf]] (the r17
    * verdict's "what's missing #3": `topListsUdf` ranked all k lists per
    * probe, k·d per probe — benign at ladder probe counts but a per-query
    * tax for a production QPS tier at √N ≈ 10⁴ lists). Cells rank by
    * unrounded cosine (vector norm common → by dot/‖cell‖, ties to the
    * lower ordinal) and are walked in that order until the probed
    * members cover ≥ nprobe lists AND ≥ w cells (the floor that keeps
    * the probe set multi-cell even when the first cell alone holds
    * nprobe members); the probed members then rank by the EXACT kernel —
    * round6'd cosine desc, ties to the lower cent_id — and the top
    * nprobe are the probed lists. w ≥ nCoarse probes every member and is
    * therefore IDENTICAL to exact (IvfTwoLevelSpec pins it).
    */
  private def topListsTwoLevelUdf(fine: Array[(Long, Array[Double], Double)],
                                  cells: CoarseCells, w: Int, nprobe: Int) =
    udf((v0: Seq[Float]) => {
      val v = v0.toArray
      var nn = 0.0
      var i = 0
      while (i < v.length) { nn += v(i).toDouble * v(i); i += 1 }
      val nv = math.sqrt(nn)
      val nC = cells.cents.length
      val scores = new Array[Double](nC)
      var c = 0
      while (c < nC) {
        val cc = cells.cents(c)
        var dot = 0.0
        var j = 0
        while (j < cc.length) { dot += v(j).toDouble * cc(j); j += 1 }
        scores(c) = dot / math.sqrt(math.max(cells.norms(c), 1e-300))
        c += 1
      }
      val order = (0 until nC).sortBy(c => (-scores(c), c))
      val probed = scala.collection.mutable.ArrayBuffer.empty[Int]
      var taken = 0
      var covered = 0
      while (taken < nC && (covered < nprobe || taken < w)) {
        val members = cells.members(order(taken))
        probed ++= members
        covered += members.length
        taken += 1
      }
      probed.toSeq.map { fi =>
        val (cid, fc, nc) = fine(fi)
        var dot = 0.0
        var j = 0
        while (j < fc.length) { dot += v(j).toDouble * fc(j); j += 1 }
        (cid, round6(dot / (nv * math.sqrt(nc))))
      }.sortBy { case (cid, cos) => (-cos, cid) }.take(nprobe).map(_._1)
    })

  /** The probe-side list ranking every IVF serve path shares
    * ([[ivfTopK]], [[ivfSearch]], [[ivfPqResidualServe]]): exact
    * [[topListsUdf]] below [[IVF_TWOLEVEL_MIN_K]] lists (every fixture
    * dial — gated hashes untouched), coarse-then-fine above, reusing the
    * same [[buildCoarseCells]] table and conf dials as the assignment
    * gate. Telemetried so artifacts record which path ranked.
    */
  private def probeListsUdf(spark: SparkSession,
                            cents: Array[(Long, Array[Double], Double)],
                            nprobe: Int) = {
    val minK = spark.conf.getOption(TWOLEVEL_MIN_K_CONF).map(_.toInt)
      .getOrElse(IVF_TWOLEVEL_MIN_K)
    if (cents.length < minK) {
      graft.Telemetry.record(s"ivf probe=exact k=${cents.length}")
      topListsUdf(cents, nprobe)
    } else {
      val w = spark.conf.getOption(COARSE_W_CONF).map(_.toInt)
        .getOrElse(IVF_COARSE_W)
      val cells = buildCoarseCells(cents,
        math.ceil(math.sqrt(cents.length.toDouble)).toInt)
      graft.Telemetry.record(s"ivf probe=twolevel k=${cents.length} " +
        s"coarse=${cells.cents.length} w=$w")
      topListsTwoLevelUdf(cents, cells, w, nprobe)
    }
  }

  /** The corpus-assignment udf every IVF build shares (inline q57/q95/
    * q181 shapes, [[writeIvfIndex]], [[writeIvfPqIndex]]): exact argmax
    * below [[IVF_TWOLEVEL_MIN_K]] lists, coarse-then-fine above — see
    * the gate scaladoc. Telemetried like the training gate so every
    * artifact records which path assigned.
    */
  private def corpusAssignUdf(spark: SparkSession,
                              cents: Array[(Long, Array[Double], Double)]) = {
    val minK = spark.conf.getOption(TWOLEVEL_MIN_K_CONF).map(_.toInt)
      .getOrElse(IVF_TWOLEVEL_MIN_K)
    if (cents.length < minK) {
      graft.Telemetry.record(s"ivf assign=exact k=${cents.length}")
      listAssignUdf(cents)
    } else {
      val w = spark.conf.getOption(COARSE_W_CONF).map(_.toInt)
        .getOrElse(IVF_COARSE_W)
      val cells = buildCoarseCells(cents,
        math.ceil(math.sqrt(cents.length.toDouble)).toInt)
      graft.Telemetry.record(s"ivf assign=twolevel k=${cents.length} " +
        s"coarse=${cells.cents.length} w=$w")
      listAssignTwoLevelUdf(cents, cells, w)
    }
  }

  /** Materialize the IVF index — [[q57AnnIvf]]'s corpus artifacts: the
    * trained quantizer (centroids + norms), the inverted lists (vec →
    * list assignment), and the vectors+norms for the exact re-rank. The
    * quantizer trains ONCE here — on the [[IVF_TRAIN_PER_CENTROID]]-
    * capped deterministic sample at corpus scale — and serving never
    * touches corpus embeddings except through the probed lists.
    * `trainPerCentroid` exists for specs to force full-corpus training
    * (`Int.MaxValue`) when measuring the sampling delta.
    */
  def writeIvfIndex(corpusEmb: DataFrame, path: String,
                    k: Int = IVF_K,
                    trainPerCentroid: Int = IVF_TRAIN_PER_CENTROID): Unit = {
    // list count recorded like every materialized index's dials — a reader
    // of a foreign/incomplete index fails loudly instead of serving it;
    // meta written last (completeness marker, rebuild-race-safe) and
    // invalidated first (a crashed rebuild leaves a refused meta-less dir)
    IndexMeta.invalidate(corpusEmb.sparkSession, path)
    graft.CacheScope.run {
      val spark = corpusEmb.sparkSession
      import spark.implicits._
      val e = graft.CacheScope.cache(withNorm(corpusEmb))
      val cents = trainCentroidsSampled(e, k, trainPerCentroid)
      cents.toSeq.map { case (cid, m, nc) => (cid, m.toSeq, nc) }
        .toDF("cent_id", "centroid", "norm")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      e.select(col("vec_id").as("c_id"),
        corpusAssignUdf(spark, cents)(col("embedding")).as("list_id"))
        .write.mode("overwrite").parquet(s"$path/lists")
      e.select(col("vec_id"), col("embedding"), col("nn"))
        .write.mode("overwrite").parquet(s"$path/vectors")
    }
    IndexMeta.write(corpusEmb.sparkSession, path, "graft IVF index dials",
      "ivf_k" -> k.toString)
  }

  /** [[q57AnnIvf]]'s semantics against a PREBUILT index
    * ([[writeIvfIndex]]): the stored quantizer rides the closure (≤ IVF_K
    * rows collected — bounded), probes pick their NPROBE lists with a
    * pure map, candidates come from the STORED inverted lists, and the
    * re-rank reads stored vectors — per-batch corpus work is zero.
    */
  /** A resolved IVF index — quantizer collected (bounded by the index's
    * recorded `ivf_k`: [[IVF_K]] rows for the fixture indexes, ≈√N for a
    * [[writeIvfIndex]] built at the corpus-scale dial) and the list/vector
    * frames resolved ONCE; streaming callers hoist this outside
    * `foreachBatch` like [[LoadedSq8Index]].
    */
  final case class LoadedIvfIndex private[operators] (
      cents: Array[(Long, Array[Double], Double)], lists: DataFrame, vecs: DataFrame)

  def loadIvfIndex(spark: SparkSession, indexPath: String): LoadedIvfIndex = {
    val meta = IndexMeta.read(spark, indexPath, "writeIvfIndex") // strict: no foreign indexes
    val ivfK = meta.getProperty("ivf_k").toInt
    val cents0 = spark.read.parquet(s"$indexPath/centroids").collect()
    require(cents0.length <= ivfK,
      s"IVF index at $indexPath holds ${cents0.length} centroids but records ivf_k=$ivfK — corrupt or mixed-write index")
    LoadedIvfIndex(
      cents0
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        .sortBy(_._1),
      spark.read.parquet(s"$indexPath/lists"),
      spark.read.parquet(s"$indexPath/vectors")
        .select(col("vec_id").as("c_id"), col("embedding").as("ce2"), col("nn").as("nc2")))
  }

  def ivfSearch(probes: DataFrame, idx: LoadedIvfIndex,
                nprobe: Int = NPROBE): DataFrame = {
    val p = graft.CacheScope.cache(withNorm(probes))
    val probeLists = p.select(col("vec_id").as("p_id"),
      explode(probeListsUdf(probes.sparkSession, idx.cents, nprobe)(col("embedding"))).as("list_id"))
    val cand = probeLists
      .join(idx.lists, Seq("list_id"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"))
    ivfRerank(cand,
      p.select(col("vec_id").as("p_id"), col("embedding").as("pe"), col("nn").as("np")),
      idx.vecs)
  }

  def ivfSearchAgainstIndex(probes: DataFrame, indexPath: String,
                            nprobe: Int = NPROBE): DataFrame =
    ivfSearch(probes, loadIvfIndex(probes.sparkSession, indexPath), nprobe)

  /** q57 through the materialized IVF index (build-once per sf dir, like
    * q81/q82): identical output contract, so it shares q57's oracle.
    */
  def q83IvfIndex(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val indexPath = graft.Tables.derivedIndexPath("graft_ivf_index", dir, "embeddings")
    // vectors written LAST → its _SUCCESS marks the whole index complete;
    // a pre-meta index dir (older layout) counts as incomplete → rebuild
    IndexMeta.ensureBuilt(indexPath)(
      new java.io.File(s"$indexPath/vectors/_SUCCESS").exists() &&
        new java.io.File(s"$indexPath/meta.properties").exists()) {
      writeIvfIndex(e, indexPath)
    }
    ivfSearchAgainstIndex(e.filter(col("vec_id") < 20), indexPath)
  }

  // ===== SQ8 scalar quantization (q90 inline, q91 index serving) =====

  /** Per-dimension linear quantizer (min, span) trained in ONE pass:
    * posexplode → groupBy(pos) min/max — partial (map-side) min/max
    * combine makes the shuffle `dim` groups regardless of corpus size,
    * and the collect is ≤ dim rows of two floats (bounded driver state,
    * same budget class as the IVF centroids). min/max over FloatType then
    * widened to Double equals the oracle's min/max over CAST(v AS DOUBLE)
    * because the cast is exact and monotone.
    */
  private def trainSq8(e: DataFrame): (Array[Double], Array[Double]) = {
    val rows = e.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect() // ≤ dim rows — bounded driver state
    require(rows.nonEmpty, "cannot train an SQ8 quantizer on an empty corpus")
    val dim = rows.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val spans = new Array[Double](dim)
    rows.foreach { r =>
      val p = r.getInt(0)
      mins(p) = r.getFloat(1).toDouble
      spans(p) = r.getFloat(2).toDouble - mins(p)
    }
    (mins, spans)
  }

  /** code_i = clamp_255(floor((v_i − mn_i) / span_i · 256)) — 8 bits per
    * dimension, stored as BinaryType (one contiguous byte per dim: 128 B
    * per vector vs 512 B float32 — the 4× corpus-residency win that makes
    * a 100 TB corpus's code table fit where its vectors don't). The
    * reconstruction norm Σ rv² is computed HERE, once per corpus vector at
    * quantize time, so serving never reconstructs for norms. The
    * arithmetic (operand order included) mirrors the oracle SQL verbatim —
    * IEEE doubles make the codes integer-exact cross-engine.
    */
  private def sq8QuantUdf(mins: Array[Double], spans: Array[Double]) =
    udf { (v: Array[Float]) =>
      val codes = new Array[Byte](v.length)
      var nq = 0.0
      var i = 0
      while (i < v.length) {
        val mn = mins(i); val sp = spans(i)
        val c =
          if (sp == 0.0) 0
          else math.min(255.0, math.floor((v(i).toDouble - mn) / sp * 256.0)).toInt
        codes(i) = (c - 128).toByte // bias to the signed byte range, exact
        val rv = mn + (c + 0.5) * sp / 256.0
        nq += rv * rv
        i += 1
      }
      (codes, nq)
    }

  /** Asymmetric distance: full-precision probe × midpoint-reconstructed
    * corpus code, one sequential kernel pass per pair — no 128× position
    * explode, and the only per-element state is the closure's (mins,
    * spans) arrays (dim-sized, ride the task closure like the IVF
    * quantizer).
    */
  private def sq8DotUdf(mins: Array[Double], spans: Array[Double]) =
    udf { (pe: Array[Float], codes: Array[Byte]) =>
      var d = 0.0
      var i = 0
      while (i < codes.length) {
        val c = codes(i).toInt + 128 // un-bias, exact
        val rv = mins(i) + (c + 0.5) * spans(i) / 256.0
        d += pe(i).toDouble * rv
        i += 1
      }
      d
    }

  /** Shared probe×codes tail of the quantized scans (SQ8 q90/q91, PQ
    * q92/q93): broadcast the (small) probe side against the quantized
    * corpus, asymmetric cosine from the caller's code-dot kernel with the
    * STORED reconstruction norm, top-3 per probe. Output contract matches
    * q48/q49/q57 so the recall probes compose.
    */
  private def codesRerank(probeSide: DataFrame, codes: DataFrame,
                          dot: (Column, Column) => Column, k: Int = 3): DataFrame = {
    val cos = broadcast(probeSide)
      .join(codes, col("p_id") =!= col("c_id"))
      .withColumn("cosine",
        round6c(dot(col("pe"), col("codes")) /
          (sqrt(col("np")) * sqrt(col("nq")))))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  private def sq8Rerank(probeSide: DataFrame, codes: DataFrame,
                        mins: Array[Double], spans: Array[Double]): DataFrame =
    codesRerank(probeSide, codes, (pe, cs) => sq8DotUdf(mins, spans)(pe, cs))

  /** SQ8 brute scan (the memory-compression counterpart of q48): the
    * corpus is visited in full but through 8-bit codes — at 100 TB the
    * code table is a quarter of the vector table and stays cache-resident
    * where float32 vectors spill. Probes keep full precision (asymmetric
    * distance, the standard SQ trick: quantization error enters once, not
    * twice). Exactness vs q48 is pinned by AnnRecallSpec's SQ8 floor.
    */
  def q90AnnSq8(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(emb(spark, dir)))
    val (mins, spans) = trainSq8(e)
    val q = sq8QuantUdf(mins, spans)(col("embedding"))
    val codes = e.select(col("vec_id").as("c_id"), q.getField("_1").as("codes"),
      q.getField("_2").as("nq"))
    sq8Rerank(
      e.filter(col("vec_id") < 20).select(col("vec_id").as("p_id"),
        col("embedding").as("pe"), col("nn").as("np")),
      codes, mins, spans)
  }

  /** Materialize the SQ8 index: the trained quantizer (per-dimension min
    * and span — dim rows) and the code table (c_id, 1-byte-per-dim codes,
    * stored reconstruction norm). Quantizer trains ONCE here; serving
    * reads codes and never touches float vectors. Meta written LAST
    * (completeness marker, rebuild-race-safe) with the dials recorded.
    */
  def writeSq8Index(corpusEmb: DataFrame, path: String): Unit = {
    val spark = corpusEmb.sparkSession
    import spark.implicits._
    // invalidate first / meta last — see writePqIndex's rebuild note
    IndexMeta.invalidate(spark, path)
    val dim = graft.CacheScope.run {
      val e = graft.CacheScope.cache(corpusEmb)
      val (mins, spans) = trainSq8(e)
      mins.indices.map(i => (i, mins(i), spans(i))).toDF("pos", "mn", "span")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/quantizer")
      val q = sq8QuantUdf(mins, spans)(col("embedding"))
      e.select(col("vec_id").as("c_id"), q.getField("_1").as("codes"),
        q.getField("_2").as("nq"))
        .write.mode("overwrite").parquet(s"$path/codes")
      mins.length
    }
    IndexMeta.write(spark, path, "graft SQ8 index dials",
      "dim" -> dim.toString, "levels" -> "256")
  }

  /** [[q90AnnSq8]]'s semantics against a PREBUILT index
    * ([[writeSq8Index]]): the stored quantizer rides the closure (≤ dim
    * rows collected — bounded), the corpus participates ONLY through its
    * stored 8-bit codes and pre-computed reconstruction norms — per-batch
    * corpus work is one asymmetric-dot pass over codes, zero float-vector
    * reads, zero retraining.
    */
  /** A resolved SQ8 index — quantizer arrays collected (≤ dim rows,
    * bounded) and the code frame resolved ONCE. Immutable for the life of
    * a serving query; streaming callers hoist this outside `foreachBatch`
    * exactly like [[LoadedAnnIndex]].
    */
  final case class LoadedSq8Index private[operators] (
      mins: Array[Double], spans: Array[Double], codes: DataFrame)

  def loadSq8Index(spark: SparkSession, indexPath: String): LoadedSq8Index = {
    val meta = IndexMeta.read(spark, indexPath, "writeSq8Index") // strict: no foreign indexes
    val dim = meta.getProperty("dim").toInt
    val qz = spark.read.parquet(s"$indexPath/quantizer").collect().sortBy(_.getInt(0))
    require(qz.length == dim,
      s"SQ8 quantizer at $indexPath has ${qz.length} dims, meta records $dim")
    LoadedSq8Index(qz.map(_.getDouble(1)), qz.map(_.getDouble(2)),
      spark.read.parquet(s"$indexPath/codes"))
  }

  def sq8Search(probes: DataFrame, idx: LoadedSq8Index): DataFrame = {
    val p = graft.CacheScope.cache(withNorm(probes))
    sq8Rerank(
      p.select(col("vec_id").as("p_id"), col("embedding").as("pe"), col("nn").as("np")),
      idx.codes, idx.mins, idx.spans)
  }

  def sq8SearchAgainstIndex(probes: DataFrame, indexPath: String): DataFrame =
    sq8Search(probes, loadSq8Index(probes.sparkSession, indexPath))

  /** q90 through the materialized SQ8 index (build-once per sf dir, like
    * q82/q83): identical output contract, so it shares q90's oracle.
    */
  def q91Sq8Index(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val indexPath = graft.Tables.derivedIndexPath("graft_sq8_index", dir, "embeddings")
    // codes written LAST of the data tables → its _SUCCESS plus meta mark
    // the build complete; a pre-meta dir counts as incomplete → rebuild
    IndexMeta.ensureBuilt(indexPath)(
      new java.io.File(s"$indexPath/codes/_SUCCESS").exists() &&
        new java.io.File(s"$indexPath/meta.properties").exists()) {
      writeSq8Index(e, indexPath)
    }
    sq8SearchAgainstIndex(e.filter(col("vec_id") < 20), indexPath)
  }

  // ===== PQ product quantization (q92 inline, q93 index serving) =====

  /** PQ dials: PQ_M subspaces × PQ_K codes each. 64-dim float32 vectors
    * (256 B) compress to PQ_M = 8 code BYTES — 32× — which is the tier
    * below SQ8's 4×: at 100 TB the PQ code table for a trillion vectors
    * fits in cluster RAM where even SQ8 codes spill. The codebook is
    * PQ_M × PQ_K × (dim/PQ_M) doubles (1024 here) — driver/closure state
    * the same size class as the IVF centroids. PQ_K is the accuracy dial
    * (codebook grows K per subspace, error shrinks); PQ_M trades code
    * bytes against subspace independence.
    */
  val PQ_M = 8
  val PQ_K = 16

  /** Per-subspace codebooks trained with the SAME one-refined-step
    * k-means the IVF quantizer uses (seeds = the PQ_K lowest vec_ids'
    * subvectors, one assignment pass, centroid = per-dimension mean,
    * one re-assignment at encode) — deterministic, corpus-independent
    * seeding, and the oracle unrolls the identical two steps in SQL.
    * Returns [s][code][j] centroid values (round6'd like the IVF cents,
    * so averaging order can never flip a cross-engine comparison).
    * A code whose step-0 cluster is empty simply has no centroid and is
    * never assigned — both engines derive the same surviving-code set.
    */
  private def trainPqCents(e: DataFrame, seeds: Array[(Long, Array[Double])],
                           m: Int): Array[Array[Array[Double]]] = {
    val dim = seeds.head._2.length
    val dsub = dim / m
    val rows = e
      .withColumn("c0", pqAssign0Udf(seeds.map(_._2), dsub, m)(col("embedding")))
      .select(col("c0"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("s", expr(s"cast(pos div $dsub as int)")) // div yields long
      .withColumn("j", expr(s"pos % $dsub"))
      .withColumn("code", col("c0").getItem(col("s")))
      .groupBy("s", "code", "j").agg(avg(col("v")).as("cv"))
      .collect() // ≤ m × k × dsub rows — bounded driver state
    val cents = Array.fill(m, seeds.length)(null: Array[Double])
    rows.foreach { r =>
      val (s, c, j) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (cents(s)(c) == null) cents(s)(c) = new Array[Double](dsub)
      cents(s)(c)(j) = round6(r.getDouble(3))
    }
    cents
  }

  /** Step-0 assignment: per subspace, squared-L2 argmin over the seed
    * subvectors — distance round6'd BEFORE the argmin, ties to the lower
    * seed ordinal (= lower seed vec_id), mirroring the oracle's
    * `ORDER BY d, code`. One kernel pass per vector.
    */
  private def pqAssign0Udf(seeds: Array[Array[Double]], dsub: Int, m: Int) =
    udf { (v: Array[Float]) =>
      Array.tabulate(m) { s =>
        var best = -1
        var bestD = Double.MaxValue
        var c = 0
        while (c < seeds.length) {
          var d = 0.0
          var j = 0
          while (j < dsub) {
            val df = v(s * dsub + j).toDouble - seeds(c)(s * dsub + j)
            d += df * df; j += 1
          }
          d = round6(d)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }

  /** Encode: re-assign each subspace to its nearest REFINED centroid
    * (surviving codes only, same round6 + lowest-code tie rule) and store
    * the PQ_M code bytes plus the reconstruction norm Σ cv² — computed
    * once at encode time so search never reconstructs for norms.
    */
  private def pqEncodeUdf(cents: Array[Array[Array[Double]]], dsub: Int) =
    udf { (v: Array[Float]) =>
      // dials read off the codebook shape — [m][k][dsub] — so every dial
      // a caller trained with is served without a second parameter path
      val m = cents.length
      val codes = new Array[Byte](m)
      var nq = 0.0
      var s = 0
      while (s < m) {
        var best = -1
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents(s).length) {
          val cv = cents(s)(c)
          if (cv != null) {
            var d = 0.0
            var j = 0
            while (j < dsub) { val df = v(s * dsub + j).toDouble - cv(j); d += df * df; j += 1 }
            d = round6(d)
            if (d < bestD) { bestD = d; best = c }
          }
          c += 1
        }
        codes(s) = best.toByte
        val bc = cents(s)(best)
        var j = 0
        while (j < dsub) { nq += bc(j) * bc(j); j += 1 }
        s += 1
      }
      (codes, nq)
    }

  /** Asymmetric-distance (ADC) dot: full-precision probe × the centroid
    * values its codes select — O(dim) per pair with the codebook riding
    * the closure. (The classic per-probe ADC lookup table saves the
    * centroid deref, not the O(dim) multiply — this direct form keeps the
    * kernel stateless per pair.)
    */
  private def pqDotUdf(cents: Array[Array[Array[Double]]], dsub: Int) =
    udf { (pe: Array[Float], codes: Array[Byte]) =>
      var dot = 0.0
      var s = 0
      while (s < cents.length) {
        val cv = cents(s)(codes(s) & 0xFF) // unsigned: code bytes cover k ≤ 256
        var j = 0
        while (j < dsub) { dot += pe(s * dsub + j).toDouble * cv(j); j += 1 }
        s += 1
      }
      dot
    }

  /** The one PQ train-and-encode path every PQ surface shares (q92 inline,
    * q94 refine, q95 IVF-PQ, [[writePqIndex]]): seeds → codebook → encoded
    * code frame. Centralized so the encode contract (dim validation, seed
    * ordinals, the codes/nq schema) cannot drift between the inline,
    * served and composed paths. Requires dim to be a positive multiple of
    * PQ_M — silently dropping trailing dimensions (dim % PQ_M != 0) or
    * producing zero-norm reconstructions (dim < PQ_M) would rank wrong
    * with no error.
    */
  private def pqModel(e: DataFrame, m: Int = PQ_M, k: Int = PQ_K)
      : (Array[Array[Array[Double]]], Int, DataFrame) = {
    val seeds = lowestIdSeeds(e, k)
    val dim = seeds.head._2.length
    require(dim % m == 0 && dim >= m,
      s"PQ needs dim to be a positive multiple of m=$m; got dim=$dim")
    require(k <= 256, s"PQ codes are one byte; k=$k exceeds 256")
    val dsub = dim / m
    val cents = trainPqCents(e, seeds, m)
    val q = pqEncodeUdf(cents, dsub)(col("embedding"))
    val codes = e.select(col("vec_id").as("c_id"), q.getField("_1").as("codes"),
      q.getField("_2").as("nq"))
    (cents, dsub, codes)
  }

  /** PQ-ADC scan (the 32×-compression counterpart of q90): the corpus is
    * visited in full but through PQ_M = 8 code bytes per vector; accuracy
    * is bounded by codebook resolution. On this synthetic corpus —
    * near-random directions, no per-subspace cluster structure, PQ's
    * worst regime — recall@3 measures ~0.30 (vs SQ8 0.97 at 8× the
    * bytes); AnnRecallSpec pins the floor and SCALE.md records the
    * measured recall-per-byte ladder. Deployment composes this tier with
    * an exact refine over its top-R candidates (floats touched ∝ R per
    * probe, not corpus size). Probes keep full precision — quantization
    * error enters once.
    */
  def q92AnnPq(spark: SparkSession, dir: String): DataFrame =
    pqAdcTopK(emb(spark, dir), PQ_M, PQ_K)

  /** q92's train→encode→ADC-rank chain with the code-resolution dials
    * exposed (q92 IS this at the fixture dials, so the ladder prices the
    * production path, not a fork).
    */
  private[graft] def pqAdcTopK(e0: DataFrame, m: Int, k: Int): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(e0))
    val (cents, dsub, codes) = pqModel(e, m, k)
    codesRerank(
      e.filter(col("vec_id") < 20).select(col("vec_id").as("p_id"),
        col("embedding").as("pe"), col("nn").as("np")),
      codes, (pe, cs) => pqDotUdf(cents, dsub)(pe, cs))
  }

  /** How many ADC candidates the refine re-ranks exactly. The dial that
    * trades float touches (∝ PQ_REFINE·|probes|, corpus-size-independent)
    * against recall recovered from the coarse 8-byte tier: measured on
    * this fixture, exact-top-3 coverage of the ADC top-R is 0.65 at
    * R=20, 0.83 at R=50, 0.92 at R=100.
    */
  val PQ_REFINE = 50

  /** PQ + exact refine (the deployment composition of q92): the 8-byte
    * ADC scan PRUNES to the top-PQ_REFINE candidates per probe, then the
    * exact cosine re-ranks just those — float vectors are touched for
    * PQ_REFINE rows per probe instead of the whole corpus, so the scan
    * cost stays the code table's and the rank quality returns to
    * near-exact on whatever the coarse tier surfaced (recall@3 0.83 here
    * vs pure ADC's 0.30 — AnnRecallSpec). Output contract and exact-tail
    * arithmetic are q57's ([[ivfRerank]] — literally the same kernel).
    */
  def q94PqRefine(spark: SparkSession, dir: String): DataFrame =
    pqRefineTopK(emb(spark, dir), PQ_M, PQ_K)

  /** q94's ADC-prune → exact-refine chain with the code-resolution dials
    * exposed — the entry point behind both the fixture gate (q94 = this
    * at PQ_M×PQ_K) and the corpus-scale gate (q179 = this at
    * [[PQ_M_SCALE]]×PQ_K), so the at-scale configuration is the SAME
    * code path the fixture hash-verifies, one dial over.
    */
  private[graft] def pqRefineTopK(e0: DataFrame, m: Int, k: Int,
                                  refine: Int = PQ_REFINE): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(e0))
    val (cents, dsub, codes) = pqModel(e, m, k)
    val cand = codesRerank(
      e.filter(col("vec_id") < 20).select(col("vec_id").as("p_id"),
        col("embedding").as("pe"), col("nn").as("np")),
      codes, (pe, cs) => pqDotUdf(cents, dsub)(pe, cs), k = refine)
      .select(col("p_id"), col("c_id"))
    ivfRerank(cand,
      e.select(col("vec_id").as("p_id"), col("embedding").as("pe"), col("nn").as("np")),
      e.select(col("vec_id").as("c_id"), col("embedding").as("ce2"), col("nn").as("nc2")))
  }

  /** The corpus-scale PQ code-resolution dial. The r15/r16 capacity
    * ladders MEASURED the shipped [[PQ_M]]=8 × 4-bit dial collapsing at
    * cluster occupancy (clustered corpora, 50k→5M vectors: ADC recall@3
    * 0.03→0.00, refine-50 0.65→0.00 — same-cluster vectors quantize to
    * identical 32-bit codes and the refine re-ranks a random sample),
    * while growing code RESOLUTION recovers it on the same production
    * path: at 50k, refine-50 recall is 0.65 (m=8, 32-bit) → 0.80 (m=16,
    * 64-bit) → 0.98 (m=32, 128-bit ≈ SQ8's 0.98 at twice the bytes).
    * q179 hash-gates THIS dial the way q178 gated the dedup dial — the
    * at-scale configuration verified end to end, not prose next to a
    * fixture gate. Code bytes stay 8× under float32 (32 B vs 256 B).
    */
  val PQ_M_SCALE = 32

  /** q94's ADC-prune → exact-refine composition at the corpus-scale code
    * resolution ([[PQ_M_SCALE]] subspaces × [[PQ_K]] codes): the PQ
    * configuration a 5M+-vector clustered corpus needs (measured — see
    * [[PQ_M_SCALE]]), hash-verified on the same [[pqRefineTopK]] path the
    * fixture dial gates as q94. Scale shape unchanged: codes are scanned
    * at 32 B/vector, floats touched ∝ PQ_REFINE·|probes|.
    */
  def q179PqScaled(spark: SparkSession, dir: String): DataFrame =
    pqRefineTopK(emb(spark, dir), PQ_M_SCALE, PQ_K)

  /** IVF-PQ with exact refine (q95) — the composition every
    * billion-vector serving system runs, assembled from this library's
    * own tested tiers: the IVF quantizer PRUNES the corpus to the probed
    * NPROBE/IVF_K lists (corpus fraction, not corpus size), the PQ codes
    * RANK those candidates at 8 bytes each (ADC), and the exact kernel
    * REFINES the surviving PQ_REFINE — float touches per probe stay a
    * constant, code touches a corpus fraction, and the full corpus is
    * never scanned at float width. All three stages reuse the exact
    * kernels of q57, q92 and q94, so this query cannot drift from the
    * tiers it composes; the oracle unrolls the same three stages in SQL.
    */
  def q95IvfPq(spark: SparkSession, dir: String): DataFrame =
    ivfPqTopK(emb(spark, dir), IVF_K, NPROBE, PQ_M, PQ_K)

  /** q95's three-stage composition with every deployment dial exposed
    * (q95 IS this at the fixture dials): `ivfK`/`nprobe` size the prune,
    * `m`/`pqK` the code resolution of the ADC rank. The IVF quantizer
    * trains through the [[IVF_TRAIN_PER_CENTROID]]-capped sample —
    * identity below the cap, so the gated fixture hash is untouched,
    * and the √N-list scale dial doesn't pay full-corpus training. The
    * r16 ladder measured WHY this composition is the 5M+ serving answer:
    * at 19.5k docs/cluster occupancy no fixed-budget flat PQ holds
    * (m=32 refine-50 reaches only 0.52) while IVF pruning + the scaled
    * codes + exact refine restores recall at list-fraction cost.
    */
  private[graft] def ivfPqTopK(e0: DataFrame, ivfK: Int, nprobe: Int,
                               m: Int, pqK: Int): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(e0))
    // IVF stage: same trained quantizer + pure-map assignment as q57
    val ivfCents = trainCentroidsSampled(e, ivfK, IVF_TRAIN_PER_CENTROID)
    val assign = e.select(col("vec_id").as("c_id"),
      corpusAssignUdf(e0.sparkSession, ivfCents)(col("embedding")).as("list_id"))
    val probeLists = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("p_id"),
        explode(probeListsUdf(e0.sparkSession, ivfCents, nprobe)(col("embedding"))).as("list_id"))
    val cand = probeLists
      .join(assign, Seq("list_id"))
      .filter(col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"))
    // PQ stage: ADC rank of the pruned candidates through the code bytes
    val (pqCents, dsub, codes) = pqModel(e, m, pqK)
    val adc = cand
      .join(broadcast(e.filter(col("vec_id") < 20).select(col("vec_id").as("p_id"),
        col("embedding").as("pe"), col("nn").as("np"))), Seq("p_id"))
      .join(codes, Seq("c_id"))
      .withColumn("acos",
        round6c(pqDotUdf(pqCents, dsub)(col("pe"), col("codes")) /
          (sqrt(col("np")) * sqrt(col("nq")))))
    val wAdc = Window.partitionBy(col("p_id")).orderBy(col("acos").desc, col("c_id"))
    val pruned = adc.withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= PQ_REFINE)
      .select(col("p_id"), col("c_id"))
    // refine stage: q57's exact tail over the survivors
    ivfRerank(pruned,
      e.select(col("vec_id").as("p_id"), col("embedding").as("pe"), col("nn").as("np")),
      e.select(col("vec_id").as("c_id"), col("embedding").as("ce2"), col("nn").as("nc2")))
  }

  // ===== Residual IVF-PQ (q181) — the Jégou et al. 2011 composition =====

  /** Residual vs the assigned list centroid, component-round6'd so both
    * engines train/encode the identical residual corpus (the centroid
    * values are themselves round6'd).
    */
  private def residualUdf(centMap: Map[Long, Array[Double]]) =
    udf { (v: Seq[Float], listId: Long) =>
      val c = centMap(listId)
      Array.tabulate(c.length)(j => round6(v(j).toDouble - c(j)))
    }

  /** [[pqAssign0Udf]] over a residual (array<double>) column. */
  private def pqAssign0UdfD(seeds: Array[Array[Double]], dsub: Int, m: Int) =
    udf { (v: Seq[Double]) =>
      Array.tabulate(m) { s =>
        var best = -1
        var bestD = Double.MaxValue
        var c = 0
        while (c < seeds.length) {
          var d = 0.0
          var j = 0
          while (j < dsub) {
            val df = v(s * dsub + j) - seeds(c)(s * dsub + j)
            d += df * df; j += 1
          }
          d = round6(d)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }

  /** Encode a residual against the residual codebook AND store the FULL
    * reconstruction norm ‖centroid + residual-recon‖² — computed at
    * encode time with the list centroid in hand, so ADC search never
    * reconstructs for norms (the [[pqEncodeUdf]] contract, residual
    * form).
    */
  private def pqEncodeResUdf(cents: Array[Array[Array[Double]]], dsub: Int,
                             centMap: Map[Long, Array[Double]]) =
    udf { (v: Seq[Double], listId: Long) =>
      val m = cents.length
      val codes = new Array[Byte](m)
      val ic = centMap(listId)
      var nq = 0.0
      var s = 0
      while (s < m) {
        var best = -1
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents(s).length) {
          val cv = cents(s)(c)
          if (cv != null) {
            var d = 0.0
            var j = 0
            while (j < dsub) { val df = v(s * dsub + j) - cv(j); d += df * df; j += 1 }
            d = round6(d)
            if (d < bestD) { bestD = d; best = c }
          }
          c += 1
        }
        codes(s) = best.toByte
        val bc = cents(s)(best)
        var j = 0
        while (j < dsub) {
          val fv = ic(s * dsub + j) + bc(j)
          nq += fv * fv; j += 1
        }
        s += 1
      }
      (codes, nq)
    }

  /** ADC dot against the FULL reconstruction (list centroid + residual
    * codewords) — the residual form of [[pqDotUdf]]; probes keep full
    * precision.
    */
  private def pqDotResUdf(cents: Array[Array[Array[Double]]], dsub: Int,
                          centMap: Map[Long, Array[Double]]) =
    udf { (pe: Array[Float], codes: Array[Byte], listId: Long) =>
      val ic = centMap(listId)
      var dot = 0.0
      var s = 0
      while (s < cents.length) {
        val cv = cents(s)(codes(s) & 0xFF)
        var j = 0
        while (j < dsub) {
          dot += pe(s * dsub + j).toDouble * (ic(s * dsub + j) + cv(j)); j += 1
        }
        s += 1
      }
      dot
    }

  /** Residual-codebook training: [[trainPqCents]] over an array<double>
    * residual column (the aggregate chain is type-agnostic; only the
    * step-0 kernel differs).
    */
  private def trainPqCentsD(e: DataFrame, seeds: Array[(Long, Array[Double])],
                            m: Int): Array[Array[Array[Double]]] = {
    val dim = seeds.head._2.length
    val dsub = dim / m
    val rows = e
      .withColumn("c0", pqAssign0UdfD(seeds.map(_._2), dsub, m)(col("embedding")))
      .select(col("c0"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("s", expr(s"cast(pos div $dsub as int)"))
      .withColumn("j", expr(s"pos % $dsub"))
      .withColumn("code", col("c0").getItem(col("s")))
      .groupBy("s", "code", "j").agg(avg(col("v")).as("cv"))
      .collect() // ≤ m × k × dsub rows — bounded driver state
    val cents = Array.fill(m, seeds.length)(null: Array[Double])
    rows.foreach { r =>
      val (s, c, j) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (cents(s)(c) == null) cents(s)(c) = new Array[Double](dsub)
      cents(s)(c)(j) = round6(r.getDouble(3))
    }
    cents
  }

  /** Residual IVF-PQ with exact refine — [[ivfPqTopK]] with the codes
    * trained and evaluated in the RESIDUAL domain (Jégou, Douze &
    * Schmid 2011, the form every production IVF-PQ serves): vectors
    * encode (v − centroid(list)), ADC ranks against centroid + codeword
    * reconstructions. WHY residuals: the r16 ladder measured raw-domain
    * IVF-PQ collapsing at cluster occupancy (0.550 recall at 5M even
    * with 128-bit codes + √N lists — SCALE.md's canonical r16 rung)
    * because within a probed list every vector shares the
    * globally-trained codewords; residuals subtract the list centroid so
    * the codebook spends its resolution on the within-list variation
    * that actually ranks candidates — measured: 0.967 at 5M with the
    * SAME byte budget (m=32) where the raw form reads 0.550, and 1.000
    * at the fixture dials.
    */
  def q181IvfPqResidual(spark: SparkSession, dir: String): DataFrame =
    ivfPqResidualTopK(emb(spark, dir), IVF_K, NPROBE, PQ_M, PQ_K)

  /** The residual model build every q181 surface shares (inline, index
    * write): quantizer → one pure-map assignment+residual pass →
    * residual codebook → encoded code frame (c_id, list_id, codes, nq).
    * Also returns the CACHED assign frame (c_id, list_id, residual) so
    * [[writeIvfPqIndex]] can derive the base drift statistic the
    * incremental-maintenance policy compares appends against, without a
    * second assignment pass.
    */
  private def ivfPqResidualModel(e: DataFrame, ivfK: Int, m: Int, pqK: Int)
      : (Array[(Long, Array[Double], Double)], Array[Array[Array[Double]]],
         Int, DataFrame, DataFrame) = {
    val ivfCents = trainCentroidsSampled(e, ivfK, IVF_TRAIN_PER_CENTROID)
    val centMap = ivfCents.map { case (id, c, _) => id -> c }.toMap
    // assignment + residual in ONE pure-map pass over the corpus; cached
    // because the codebook train and the encode both read it
    val assign = graft.CacheScope.cache(
      e.select(col("vec_id").as("c_id"),
          corpusAssignUdf(e.sparkSession, ivfCents)(col("embedding")).as("list_id"),
          col("embedding"))
        .withColumn("residual",
          residualUdf(centMap)(col("embedding"), col("list_id")))
        .select(col("c_id"), col("list_id"), col("residual")))
    val seeds = assign.select(col("c_id"), col("residual"))
      .orderBy(col("c_id")).limit(pqK).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val pqCents = trainPqCentsD(
      assign.select(col("c_id").as("vec_id"), col("residual").as("embedding")),
      seeds, m)
    val dsub = seeds.head._2.length / m
    val enc = pqEncodeResUdf(pqCents, dsub, centMap)(col("residual"), col("list_id"))
    (ivfCents, pqCents, dsub, assign.select(col("c_id"), col("list_id"),
      enc.getField("_1").as("codes"), enc.getField("_2").as("nq")), assign)
  }

  /** Mean squared residual norm of an assigned frame — the quantizer-
    * staleness statistic the incremental-maintenance policy uses: how far
    * (squared L2) vectors land from their assigned centroid, on average.
    * One map-side-combined aggregate over a frame the caller already has.
    */
  private def meanResid2(assign: DataFrame): Double =
    assign.select(expr(
        "aggregate(residual, 0d, (acc, x) -> acc + x * x)").as("r2"))
      .agg(coalesce(avg(col("r2")), lit(0.0))).head().getDouble(0)

  /** The serve tail every q181 surface shares: probes pick their lists,
    * ADC ranks the stored codes against centroid+codeword
    * reconstructions, exact refine over the PQ_REFINE survivors.
    */
  private def ivfPqResidualServe(probes: DataFrame,
                                 ivfCents: Array[(Long, Array[Double], Double)],
                                 pqCents: Array[Array[Array[Double]]],
                                 dsub: Int, codes: DataFrame,
                                 corpusVecs: DataFrame, nprobe: Int): DataFrame = {
    val centMap = ivfCents.map { case (id, c, _) => id -> c }.toMap
    val p = graft.CacheScope.cache(withNorm(probes))
    val probeLists = p.select(col("vec_id").as("p_id"),
      explode(probeListsUdf(probes.sparkSession, ivfCents, nprobe)(col("embedding"))).as("list_id"))
    val adc = probeLists
      .join(codes, Seq("list_id"))
      .filter(col("p_id") =!= col("c_id"))
      .join(broadcast(p.select(col("vec_id").as("p_id"),
        col("embedding").as("pe"), col("nn").as("np"))), Seq("p_id"))
      .withColumn("acos",
        round6c(pqDotResUdf(pqCents, dsub, centMap)(col("pe"), col("codes"), col("list_id")) /
          (sqrt(col("np")) * sqrt(col("nq")))))
    val wAdc = Window.partitionBy(col("p_id")).orderBy(col("acos").desc, col("c_id"))
    val pruned = adc.withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= PQ_REFINE)
      .select(col("p_id"), col("c_id"))
    ivfRerank(pruned,
      p.select(col("vec_id").as("p_id"), col("embedding").as("pe"), col("nn").as("np")),
      corpusVecs)
  }

  private[graft] def ivfPqResidualTopK(e0: DataFrame, ivfK: Int, nprobe: Int,
                                       m: Int, pqK: Int): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(e0))
    val (ivfCents, pqCents, dsub, codes, _) = ivfPqResidualModel(e, ivfK, m, pqK)
    ivfPqResidualServe(e.filter(col("vec_id") < 20), ivfCents, pqCents, dsub,
      codes,
      e.select(col("vec_id").as("c_id"), col("embedding").as("ce2"), col("nn").as("nc2")),
      nprobe)
  }

  /** Sentinel `m` for [[writeIvfPqIndex]]: derive the code resolution
    * from the measured occupancy law at build time instead of taking a
    * caller guess.
    */
  val PQ_M_AUTO = 0

  /** Anchor of the occupancy law: docs-per-list at the hash-verified
    * fixture point where [[PQ_M]]=8 holds recall (2000 vectors / 16
    * lists = 125 — q181/q183 measure 1.000 there).
    */
  val PQ_OCC_BASE = 125.0

  /** The occupancy-derived PQ code resolution (the r15/r16 ladder law
    * promoted from prose to the default dial): at the fixture occupancy
    * m=8 holds recall (1.000), and each DOUBLING of m buys roughly one
    * 10× occupancy rung — measured at 50k clustered (refine-50: m=8
    * 0.65 → m=16 0.80 → m=32 0.98) and at the 5M/√N rung (occupancy
    * ≈2236 ≈ 1.25 decades over base → 2 doublings → m=32, the dial that
    * measures 0.967 residual recall where m=8 reads 0.000 flat). So:
    * rungs = ⌈log10(occupancy / [[PQ_OCC_BASE]])⌉, m = 8·2^rungs,
    * clamped to the embedding dim and halved until it divides it (PQ
    * needs dim % m == 0). Explicit dials always override — this only
    * fills the [[PQ_M_AUTO]] default.
    */
  private[operators] def derivedPqM(nVecs: Long, ivfK: Int, dim: Int): Int = {
    val occ = nVecs.toDouble / math.max(ivfK, 1)
    val rungs =
      if (occ <= PQ_OCC_BASE) 0
      else math.min(math.ceil(math.log10(occ / PQ_OCC_BASE)).toInt, 16)
    var m = math.min(PQ_M.toLong << rungs, dim.toLong).toInt
    while (m > 1 && dim % m != 0) m /= 2
    m
  }

  /** Materialize the residual IVF-PQ index — the index-once/serve-many
    * shape for q181 (what a billion-vector deployment actually runs):
    * quantizer centroids, residual codebook, code table
    * (c_id, list_id, m bytes, full-reconstruction norm), and the
    * vectors+norms for the exact refine. Meta LAST with all dials AND
    * the m decision: by default (`m = PQ_M_AUTO`) the code resolution
    * comes from [[derivedPqM]]'s measured occupancy law — the fixture
    * corpora derive the law's anchor m=8, so every gated hash is
    * untouched — and an explicit m is served verbatim.
    */
  def writeIvfPqIndex(corpusEmb: DataFrame, path: String,
                      ivfK: Int = IVF_K, m: Int = PQ_M_AUTO,
                      pqK: Int = PQ_K,
                      note: Seq[(String, String)] = Nil): Unit = {
    val spark = corpusEmb.sparkSession
    import spark.implicits._
    IndexMeta.invalidate(spark, path)
    var mDecision = "explicit"
    var mUsed = m
    val (dim, nBase, baseResid2) = graft.CacheScope.run {
      val e = graft.CacheScope.cache(withNorm(corpusEmb))
      // n also feeds the maintenance policy's delta-fraction baseline; the
      // trainer re-reads it from cache so the stat costs no extra pass
      val n = e.count()
      // explicit refusal instead of head()'s opaque NoSuchElementException
      require(n > 0, s"writeIvfPqIndex: empty corpus at $path — nothing to " +
        "index (and nothing to derive the PQ resolution from)")
      if (m == PQ_M_AUTO) {
        val d = e.select(col("embedding")).head().getSeq[Float](0).length
        mUsed = derivedPqM(n, ivfK, d)
        // an odd/prime dim has no power-of-two divisor above 1; m=1 is a
        // single subquantizer (PQ degenerated to plain VQ over the whole
        // vector) — legal but almost never what the caller wants, so the
        // degradation is telemetried rather than silent
        if (mUsed < PQ_M) graft.Telemetry.record(
          s"ivfpq m=$mUsed DEGRADED below PQ_M=$PQ_M (dim=$d has no larger " +
            "divisor) — consider an explicit m or a padded embedding dim")
        mDecision = s"auto(n=$n,ivf_k=$ivfK,occ_base=$PQ_OCC_BASE)"
        graft.Telemetry.record(s"ivfpq m=$mUsed decision=$mDecision")
      }
      val (ivfCents, pqCents, dsub, codes, assign) =
        ivfPqResidualModel(e, ivfK, mUsed, pqK)
      ivfCents.toSeq.map { case (cid, c, nc) => (cid, c.toSeq, nc) }
        .toDF("cent_id", "centroid", "norm")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      // iterate the codebook's OWN code axis, not 0 until pqK: the trainer
      // sizes it to the seed count, which undercuts pqK when the corpus has
      // fewer than pqK vectors — indexing by pqK would throw on the guard
      val flat = for {
        s <- 0 until mUsed; c <- pqCents(s).indices if pqCents(s)(c) != null
        j <- 0 until dsub
      } yield (s, c, j, pqCents(s)(c)(j))
      flat.toDF("s", "code", "j", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
      codes.write.mode("overwrite").parquet(s"$path/codes")
      e.select(col("vec_id"), col("embedding"), col("nn"))
        .write.mode("overwrite").parquet(s"$path/vectors")
      // the base drift statistic appends compare against — one aggregate
      // over the assign frame the model build cached anyway
      (dsub * mUsed, n, meanResid2(assign))
    }
    IndexMeta.write(spark, path, "graft residual IVF-PQ index dials",
      (Seq("ivf_k" -> ivfK.toString, "m" -> mUsed.toString, "k" -> pqK.toString,
        "dim" -> dim.toString, "m_decision" -> mDecision,
        "n_base" -> nBase.toString, "base_resid2" -> f"$baseResid2%.6f",
        "deltas" -> "0") ++ note): _*)
  }

  /** A resolved residual IVF-PQ index — both bounded model tables
    * collected (quantizer ≤ recorded ivf_k rows, codebook ≤ m·k·dsub),
    * code/vector frames resolved ONCE (base ∪ live delta segments — the
    * serve kernel is one union-read away from incremental, exactly like
    * BM25's segment load).
    */
  final case class LoadedIvfPqIndex private[operators] (
      ivfCents: Array[(Long, Array[Double], Double)],
      pqCents: Array[Array[Array[Double]]], dsub: Int,
      codes: DataFrame, vecs: DataFrame)

  /** Live delta segment names from the meta's `deltas` count — the meta
    * is the single source of segment topology (a crashed append leaves a
    * meta-less dir refused everywhere; orphan `delta_*` dirs above the
    * recorded count are never listed).
    */
  private def deltaNames(meta: java.util.Properties): Seq[String] = {
    val n = Option(meta.getProperty("deltas")).map(_.toInt).getOrElse(0)
    (0 until n).map(i => s"delta_$i")
  }

  def loadIvfPqIndex(spark: SparkSession, indexPath: String): LoadedIvfPqIndex = {
    val meta = IndexMeta.read(spark, indexPath, "writeIvfPqIndex")
    val ivfK = meta.getProperty("ivf_k").toInt
    val m = meta.getProperty("m").toInt
    val k = meta.getProperty("k").toInt
    val dim = meta.getProperty("dim").toInt
    require(k <= 256 && m >= 1 && dim % m == 0,
      s"residual IVF-PQ index at $indexPath records unusable dials m=$m k=$k dim=$dim")
    val cents0 = spark.read.parquet(s"$indexPath/centroids").collect()
    require(cents0.length <= ivfK,
      s"index at $indexPath holds ${cents0.length} centroids but records ivf_k=$ivfK")
    val dsub = dim / m
    val pqCents = Array.fill(m, k)(null: Array[Double])
    spark.read.parquet(s"$indexPath/codebook").collect().foreach { r =>
      val (s, c, j) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (pqCents(s)(c) == null) pqCents(s)(c) = new Array[Double](dsub)
      pqCents(s)(c)(j) = r.getDouble(3)
    }
    LoadedIvfPqIndex(
      cents0.map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
        .sortBy(_._1),
      pqCents, dsub,
      spark.read.parquet(
        (s"$indexPath/codes" +: deltaNames(meta).map(d => s"$indexPath/$d/codes")): _*),
      spark.read.parquet(
        (s"$indexPath/vectors" +: deltaNames(meta).map(d => s"$indexPath/$d/vectors")): _*)
        .select(col("vec_id").as("c_id"), col("embedding").as("ce2"), col("nn").as("nc2")))
  }

  /** Serve against an ALREADY-RESOLVED residual IVF-PQ index — the form
    * streaming callers need: [[StreamingIvfPq]] hoists the load outside
    * `foreachBatch` (one meta read + two bounded collects per query
    * start, zero per batch), exactly like [[ivfSearch]]/[[sq8Search]].
    */
  def ivfPqSearch(probes: DataFrame, idx: LoadedIvfPqIndex,
                  nprobe: Int = NPROBE): DataFrame =
    ivfPqResidualServe(probes, idx.ivfCents, idx.pqCents, idx.dsub,
      idx.codes, idx.vecs, nprobe)

  def ivfPqSearchAgainstIndex(probes: DataFrame, indexPath: String,
                              nprobe: Int = NPROBE): DataFrame =
    ivfPqSearch(probes, loadIvfPqIndex(probes.sparkSession, indexPath), nprobe)

  /** Incremental-maintenance dials for the residual IVF-PQ index (the
    * BM25 `compactAtSegments` pattern at the vector tier): a re-train
    * fires when appended vectors reach this fraction of the base corpus
    * (occupancy trigger — the quantizer's √N list-count dial and the
    * occupancy-derived m both assume the corpus size it was trained at),
    * or when the latest delta's mean squared residual (distance to its
    * assigned FROZEN centroid) reaches this multiple of the base build's
    * (drift trigger — new vectors landing far from every centroid mean
    * the quantizer no longer tessellates the data). ≤ 0 disables either
    * trigger; callers then schedule [[retrainIvfPq]] themselves.
    * Defaults: 0.25 (at +25% the delta lists' occupancy skew starts
    * paying serve cost on every probe) and 2.0 (IvfPqDeltaSpec's planted
    * drift fixture measures in-distribution deltas at ~1.0× and a
    * shifted cluster well above 2×, so 2.0 separates the regimes).
    */
  val RETRAIN_FRACTION_CONF = "spark.graft.ivfpq.retrainDeltaFraction"
  val DEFAULT_RETRAIN_FRACTION = 0.25
  val RETRAIN_DRIFT_CONF = "spark.graft.ivfpq.retrainDriftRatio"
  val DEFAULT_RETRAIN_DRIFT = 2.0

  /** Append NEW vectors to a materialized residual IVF-PQ index at
    * delta-sized cost — the incremental story BM25 already had
    * ([[Bm25.appendBm25Delta]]), closing the r17 "what's missing #1":
    * without it, daily ingest at 100 TB forces re-training and
    * re-assigning ALL N vectors to serve ANY new ones. The delta is
    * assigned against the FROZEN quantizer (through [[corpusAssignUdf]]
    * — two-level above the gate, so assignment is ~(√k+wk/√k)·d per
    * vector) and encoded with the FROZEN codebook, then lands as one
    * `delta_<i>` code+vector segment; serving reads base ∪ deltas
    * through the same ADC kernel (the segments hold DISJOINT vec_ids, so
    * no merge logic exists anywhere). The new-ids-only contract is
    * ENFORCED (an overlapping delta would double-serve a vector from two
    * segments); refusal happens BEFORE the meta invalidate, so a
    * rejected append leaves the index serving. Meta-last with the delta
    * count as the single topology source: a crashed append leaves a
    * meta-less dir (refused loudly), orphan `delta_*` dirs are never
    * listed, and the meta rewrite flips the fingerprint so running
    * serving streams restart rather than serve a frame mix.
    * Maintenance rides the append ([[maintainIvfPq]] — the appender is
    * the maintenance window); returns whether it re-trained.
    */
  def appendIvfPqDelta(delta: DataFrame, path: String): Boolean = {
    val spark = delta.sparkSession
    val meta = IndexMeta.read(spark, path, "writeIvfPqIndex") // append extends, never creates
    val idx = loadIvfPqIndex(spark, path)
    val dup = idx.vecs.select(col("c_id").as("vec_id"))
      .join(delta.select(col("vec_id")).distinct(), Seq("vec_id"))
      .limit(5).collect().map(_.getLong(0))
    require(dup.isEmpty,
      s"appendIvfPqDelta: delta re-submits stored vec_ids (e.g. ${dup.mkString(", ")}) — " +
        "deltas must carry NEW vectors only; updates are a rebuild")
    val centMap = idx.ivfCents.map { case (id, c, _) => id -> c }.toMap
    val prevDeltas = Option(meta.getProperty("deltas")).map(_.toInt).getOrElse(0)
    val segName = s"delta_$prevDeltas"
    val (nDelta, deltaResid2) = graft.CacheScope.run {
      val e = graft.CacheScope.cache(withNorm(delta))
      val n = e.count()
      require(n > 0, "appendIvfPqDelta: empty delta — nothing to append")
      val assign = graft.CacheScope.cache(
        e.select(col("vec_id").as("c_id"),
            corpusAssignUdf(spark, idx.ivfCents)(col("embedding")).as("list_id"),
            col("embedding"))
          .withColumn("residual",
            residualUdf(centMap)(col("embedding"), col("list_id")))
          .select(col("c_id"), col("list_id"), col("residual")))
      // drift statistic computed eagerly BEFORE the invalidate: everything
      // that can refuse has refused by the time the meta comes down
      val r2 = meanResid2(assign)
      IndexMeta.invalidate(spark, path)
      val enc = pqEncodeResUdf(idx.pqCents, idx.dsub, centMap)(
        col("residual"), col("list_id"))
      assign.select(col("c_id"), col("list_id"),
          enc.getField("_1").as("codes"), enc.getField("_2").as("nq"))
        .write.mode("overwrite").parquet(s"$path/$segName/codes")
      e.select(col("vec_id"), col("embedding"), col("nn"))
        .write.mode("overwrite").parquet(s"$path/$segName/vectors")
      (n, r2)
    }
    val nDeltaTotal =
      Option(meta.getProperty("n_delta")).map(_.toLong).getOrElse(0L) + nDelta
    graft.Telemetry.record(
      f"ivfpq append seg=$segName n=$nDelta resid2=$deltaResid2%.4f")
    IndexMeta.write(spark, path, "graft residual IVF-PQ index dials",
      (Seq("ivf_k", "m", "k", "dim", "m_decision", "n_base", "base_resid2")
        .flatMap(k => Option(meta.getProperty(k)).map(k -> _)) ++ Seq(
        "deltas" -> (prevDeltas + 1).toString,
        "n_delta" -> nDeltaTotal.toString,
        "delta_resid2" -> f"$deltaResid2%.6f")): _*)
    maintainIvfPq(spark, path)
  }

  /** The re-train policy (BM25's [[Bm25.maintainBm25]] at the vector
    * tier): re-trains iff the delta fraction or the drift ratio crossed
    * its configured trigger — decision telemetried either way, and on
    * re-train recorded in the rebuilt index's meta. Called by
    * [[appendIvfPqDelta]] after every successful append (one-writer
    * contract); also safe on any maintenance schedule. Returns whether
    * it re-trained.
    */
  def maintainIvfPq(spark: SparkSession, path: String): Boolean = {
    val meta = IndexMeta.read(spark, path, "writeIvfPqIndex")
    // pre-delta-format indexes carry no n_base: fall back to a metadata-
    // only count of the stored base vectors rather than refusing
    val nBase = Option(meta.getProperty("n_base")).map(_.toLong)
      .getOrElse(spark.read.parquet(s"$path/vectors").count())
    val nDelta = Option(meta.getProperty("n_delta")).map(_.toLong).getOrElse(0L)
    val baseR2 = Option(meta.getProperty("base_resid2")).map(_.toDouble)
    val deltaR2 = Option(meta.getProperty("delta_resid2")).map(_.toDouble)
    val fracAt = spark.conf.getOption(RETRAIN_FRACTION_CONF).map(_.toDouble)
      .getOrElse(DEFAULT_RETRAIN_FRACTION)
    val driftAt = spark.conf.getOption(RETRAIN_DRIFT_CONF).map(_.toDouble)
      .getOrElse(DEFAULT_RETRAIN_DRIFT)
    val frac = if (nBase > 0) nDelta.toDouble / nBase else 0.0
    val drift = (for (b <- baseR2; d <- deltaR2 if b > 0) yield d / b)
    val fracHit = fracAt > 0 && frac >= fracAt
    val driftHit = driftAt > 0 && drift.exists(_ >= driftAt)
    val decision =
      f"fraction=$frac%.4f/at=$fracAt%.2f drift=${drift.fold("na")(d => f"$d%.3f")}/at=$driftAt%.2f"
    if (fracHit || driftHit) {
      graft.Telemetry.record(s"ivfpq maintain $decision action=retrain")
      retrainIvfPq(spark, path,
        s"retrain(${if (fracHit) "fraction" else "drift"};$decision)")
      true
    } else {
      graft.Telemetry.record(s"ivfpq maintain $decision action=none")
      false
    }
  }

  /** Fold base + every delta segment into a freshly trained index — the
    * compaction that restores the trained-at-N assumptions (quantizer
    * tessellation, occupancy-derived m). Vectors are STAGED to a side
    * dir first: [[writeIvfPqIndex]] overwrites `vectors/` while a naive
    * rebuild would still be reading it (the classic self-overwrite
    * hazard). The recorded m decision is honored — an auto-m index
    * re-derives m at the NEW corpus size (the occupancy law moving is
    * half the point of re-training); an explicit m stays explicit.
    * Covered delta dirs (and any orphans) are deleted after the new
    * meta lands — a crash mid-delete leaves unlisted orphans, deleted by
    * the next re-train.
    */
  def retrainIvfPq(spark: SparkSession, path: String,
                   decision: String = "manual"): Unit = {
    val meta = IndexMeta.read(spark, path, "writeIvfPqIndex")
    val ivfK = meta.getProperty("ivf_k").toInt
    val pqK = meta.getProperty("k").toInt
    val mPass =
      if (Option(meta.getProperty("m_decision")).forall(_.startsWith("auto")))
        PQ_M_AUTO
      else meta.getProperty("m").toInt
    val stage = s"$path/_retrain_stage"
    spark.read.parquet(
        (s"$path/vectors" +: deltaNames(meta).map(d => s"$path/$d/vectors")): _*)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(stage)
    writeIvfPqIndex(spark.read.parquet(stage), path, ivfK, mPass, pqK,
      note = Seq("maintain_decision" -> decision))
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    fs.listStatus(fsPath).foreach { st =>
      if (st.getPath.getName.matches("delta_\\d+"))
        fs.delete(st.getPath, true)
    }
  }

  /** q181 through the materialized residual IVF-PQ index (build-once per
    * sf dir, like q83/q91/q93): identical output contract, so it shares
    * q181's oracle. Serving retrains nothing — probes pick lists with a
    * pure map over the stored quantizer, ADC reads stored codes, the
    * refine reads stored vectors.
    */
  def q183IvfPqIndex(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val indexPath = graft.Tables.derivedIndexPath("graft_ivfpq_index", dir, "embeddings")
    IndexMeta.ensureBuilt(indexPath)(
      new java.io.File(s"$indexPath/vectors/_SUCCESS").exists() &&
        new java.io.File(s"$indexPath/meta.properties").exists()) {
      writeIvfPqIndex(e, indexPath)
    }
    ivfPqSearchAgainstIndex(e.filter(col("vec_id") < 20), indexPath)
  }

  /** Materialize the PQ index: the trained codebook (s, code, j, cv —
    * ≤ m·k·dsub rows) and the code table (c_id, m code bytes, stored
    * reconstruction norm). Codebook trains ONCE; serving reads codes and
    * never touches float vectors. Meta LAST with the dials recorded —
    * the loader serves whatever dials the meta names (the fixture
    * [[PQ_M]]×[[PQ_K]] default or the corpus-scale [[PQ_M_SCALE]]), so
    * the q179 configuration has the same index-once/serve-many path as
    * the fixture dial.
    */
  def writePqIndex(corpusEmb: DataFrame, path: String,
                   m: Int = PQ_M, k: Int = PQ_K): Unit = {
    val spark = corpusEmb.sparkSession
    import spark.implicits._
    // invalidate FIRST: a rebuild that crashes mid-write must leave a
    // meta-less dir (refused loudly) — never a new codebook paired with
    // old codes under the old meta, which every completeness and
    // fingerprint check would wave through
    IndexMeta.invalidate(spark, path)
    val dim = graft.CacheScope.run {
      val e = graft.CacheScope.cache(corpusEmb)
      val (cents, dsub, codes) = pqModel(e, m, k)
      // codebook's own code axis (sized to the seed count, ≤ k on corpora
      // smaller than k) — indexing by k would throw on the null guard
      val flat = for {
        s <- 0 until m; c <- cents(s).indices if cents(s)(c) != null
        j <- 0 until dsub
      } yield (s, c, j, cents(s)(c)(j))
      flat.toDF("s", "code", "j", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
      codes.write.mode("overwrite").parquet(s"$path/codes")
      dsub * m
    }
    IndexMeta.write(spark, path, "graft PQ index dials",
      "m" -> m.toString, "k" -> k.toString, "dim" -> dim.toString)
  }

  /** A resolved PQ index — codebook collected (≤ PQ_M·PQ_K·dsub rows,
    * bounded) and the code frame resolved ONCE; streaming callers hoist
    * this outside `foreachBatch` like [[LoadedSq8Index]].
    */
  final case class LoadedPqIndex private[operators] (
      cents: Array[Array[Array[Double]]], dsub: Int, codes: DataFrame)

  def loadPqIndex(spark: SparkSession, indexPath: String): LoadedPqIndex = {
    val meta = IndexMeta.read(spark, indexPath, "writePqIndex") // strict: no foreign indexes
    val m = meta.getProperty("m").toInt
    val k = meta.getProperty("k").toInt
    val dim = meta.getProperty("dim").toInt
    // the serve kernels read the dials off the codebook shape, so ANY
    // recorded (m, k) serves — k stays byte-addressable by construction
    require(k <= 256 && m >= 1 && dim % m == 0,
      s"PQ index at $indexPath records unusable dials m=$m k=$k dim=$dim")
    val dsub = dim / m
    val cents = Array.fill(m, k)(null: Array[Double])
    spark.read.parquet(s"$indexPath/codebook").collect().foreach { r =>
      val (s, c, j) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (cents(s)(c) == null) cents(s)(c) = new Array[Double](dsub)
      cents(s)(c)(j) = r.getDouble(3)
    }
    LoadedPqIndex(cents, dsub, spark.read.parquet(s"$indexPath/codes"))
  }

  def pqSearch(probes: DataFrame, idx: LoadedPqIndex): DataFrame = {
    val p = graft.CacheScope.cache(withNorm(probes))
    codesRerank(
      p.select(col("vec_id").as("p_id"), col("embedding").as("pe"), col("nn").as("np")),
      idx.codes, (pe, cs) => pqDotUdf(idx.cents, idx.dsub)(pe, cs))
  }

  def pqSearchAgainstIndex(probes: DataFrame, indexPath: String): DataFrame =
    pqSearch(probes, loadPqIndex(probes.sparkSession, indexPath))

  /** q92 through the materialized PQ index (build-once per sf dir, like
    * q91): identical output contract, so it shares q92's oracle.
    */
  def q93PqIndex(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val indexPath = graft.Tables.derivedIndexPath("graft_pq_index", dir, "embeddings")
    IndexMeta.ensureBuilt(indexPath)(
      new java.io.File(s"$indexPath/codes/_SUCCESS").exists() &&
        new java.io.File(s"$indexPath/meta.properties").exists()) {
      writePqIndex(e, indexPath)
    }
    pqSearchAgainstIndex(e.filter(col("vec_id") < 20), indexPath)
  }

  /** Embedding dedup pipeline: the vector-side counterpart of q66 —
    * banded-LSH cosine near-dup pairs (q56's machinery) become the edge
    * list for connected components, and every vector is assigned its
    * component's min vec_id as canonical. One composed query: candidate
    * equi-join → exact cosine verify → min-label CC → survival flag.
    */
  def q67EmbeddingDedupPipeline(spark: SparkSession, dir: String): DataFrame = {
    val edges = q56EmbeddingNeardup(spark, dir).select(
      col("a_id").as("a_id"), col("b_id").as("b_id"))
    val nodes = emb(spark, dir).select(col("vec_id").as("id"))
    Dedup.connectedComponents(edges, nodes)
      .select(col("id").as("vec_id"), col("label").as("canonical_id"),
        (col("label") === col("id")).as("is_canonical"))
  }

  /** K-means assignment for cluster-based data mixing: deterministic
    * centroids (the k = 8 lowest vec_ids), every vector assigned to its
    * nearest centroid by squared L2. The centroids are k-bounded driver
    * state baked into one kernel pass — assignment is a PURE MAP (no join,
    * no shuffle), the shape that holds at any corpus size; a Lloyd update
    * would add exactly one aggregation on top. dist2 is rounded to 6
    * BEFORE the argmin so ties break identically by centroid id on both
    * engines.
    */
  def q72KmeansAssign(spark: SparkSession, dir: String): DataFrame =
    assignClusters(emb(spark, dir), 8)
      .select(col("vec_id"), col("cluster"), col("dist2"))

  /** Appends `cluster` (and `dist2`) via the shared seeded-argmin kernel —
    * the ONE assignment definition behind q72, q87 and the
    * candidate-growth measurement, so the k dial can be exercised without
    * duplicating the kernel. Pure map after a k-bounded seed collect.
    */
  private[operators] def assignClusters(e: DataFrame, k: Int): DataFrame = {
    val cents = lowestIdSeeds(e, k)
    e.withColumn("a", nearestSeedU(cents)(col("embedding")))
      .withColumn("cluster", col("a._1"))
      .withColumn("dist2", col("a._2"))
      .drop("a")
  }

  /** Cross-modal dedup consensus: every embedded document judged by BOTH
    * dedup modalities — its simhash text cluster (q58) and its
    * embedding-cosine cluster (q67) — with `agree` flagging whether the
    * two modalities reach the same keep/drop decision. Disagreement is
    * the curation signal (noisy embeddings, templated text); the join is
    * id-to-id, so the composition adds one co-partitioned exchange on top
    * of the two pipelines.
    */
  def q76CrossmodalDedup(spark: SparkSession, dir: String): DataFrame = {
    // r19: ONE fused CC pass instead of two (guide §1 fewer jobs). The two
    // modality graphs live in DISJOINT id spaces — text node i ↦ 2i, vec
    // node i ↦ 2i+1 (exact bit shifts, no doubles) — so one
    // connectedComponents call contracts and solves both graphs at once:
    // components never cross parities, and min-label commutes with the
    // monotonic encoding (min{2i} = 2·min{i}, min{2i+1} = 2·min{i}+1), so
    // the decoded labels are bit-identical to the two separate CC passes
    // q58/q67 run for their own queries (edge builders shared verbatim).
    // One partition-local contraction job + one boundary solve + one
    // broadcast join back replaces two of each (~0.5 s fixed cost per CC
    // pass at bench scale; the same two driver round-trips saved on a
    // cluster).
    val textEdges = Dedup.q47Simhash(spark, dir)
      .select(shiftleft(col("a_id"), 1).as("a_id"),
        shiftleft(col("b_id"), 1).as("b_id"))
    val vecEdges = q56EmbeddingNeardup(spark, dir)
      .select((shiftleft(col("a_id"), 1) + 1).as("a_id"),
        (shiftleft(col("b_id"), 1) + 1).as("b_id"))
    val nodes = Dedup.docs(spark, dir).select(shiftleft(col("doc_id"), 1).as("id"))
      .unionByName(emb(spark, dir).select((shiftleft(col("vec_id"), 1) + 1).as("id")))
    val cc = Dedup.connectedComponents(textEdges.unionByName(vecEdges), nodes)
    val text = cc.filter(col("id").bitwiseAND(1) === 0)
      .select(shiftright(col("id"), 1).as("doc_id"),
        shiftright(col("label"), 1).as("cluster_id"))
    val vec = cc.filter(col("id").bitwiseAND(1) === 1)
      .select(shiftright(col("id"), 1).as("vec_id"),
        shiftright(col("label"), 1).as("canonical_id"))
    text.join(vec, col("doc_id") === col("vec_id"))
      .select(col("doc_id"),
        col("cluster_id").as("text_cluster"),
        col("canonical_id").as("vec_cluster"),
        ((col("cluster_id") === col("doc_id")) ===
          (col("canonical_id") === col("doc_id"))).as("agree"))
  }

  /** Cluster-balanced sampling — the semantic-diversity mixing operator a
    * training-data pipeline runs after clustering (q72): a fixed quota per
    * embedding cluster, rows chosen in deterministic md5 order (q63's
    * stratified-sample convention, keyed on vec_id).
    *
    * Scale shape: a naive `row_number over (partition by cluster)` would
    * funnel the WHOLE corpus through k reducers (k = 8 here — the
    * canonical few-huge-groups skew). Top-k-per-group with tiny k·quota
    * is therefore [[Ranked.twoPhaseTopK]] — the shared local-then-global
    * quota (phase 1 keyed by (cluster, input partition), so it spreads
    * over every reducer and forwards ≤ 25 rows per partition; the result
    * is partitioning-independent because a global winner is necessarily
    * a local winner). Assignment itself rides q72's pure-map kernel.
    */
  def q86ClusterSample(spark: SparkSession, dir: String): DataFrame =
    Ranked.twoPhaseTopK(
      q72KmeansAssign(spark, dir)
        .withColumn("ord", md5(col("vec_id").cast("string"))),
      Seq(col("cluster")), Seq(col("ord"), col("vec_id")), lit(25))
      .select(col("vec_id"), col("cluster"), col("rk"))

  /** Semantic dedup — the cluster-partitioned near-dup removal of SemDeDup
    * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus, then look
    * for semantic duplicates ONLY within each cluster, so the pairwise
    * comparison that is O(N²) globally becomes O(N²/k) — and with the
    * cluster count k scaled ∝ N (k ≈ N / target-occupancy, the paper's
    * deployment rule), per-cluster work is constant and total work is
    * linear in the corpus. This is a different modality from the LSH dup
    * path (q56/q67): no signatures, no recall loss WITHIN a cluster —
    * the approximation is that cross-cluster dups are invisible, the
    * trade SemDeDup makes by construction.
    *
    * Keep rule (deterministic, recursion-free): a vector is dropped iff
    * ANY lower-vec_id vector in the same cluster is a semantic duplicate
    * (cosine ≥ 0.35, the corpus's near-dup threshold — q56's dial);
    * `dup_of` records the earliest such neighbor. Order-independent, so
    * the result doesn't depend on partitioning.
    *
    * Scale shape: assignment is q72's pure-map kernel (zero shuffle);
    * the self-join shuffles each cluster's members to one reducer group
    * — candidate volume is exactly the within-cluster pair count that the
    * k-dial bounds (measured here: 1080 of 4137 ≥ τ pairs at sf0.1 fall
    * within-cluster at k = 8; CandidateGrowthSpec tracks growth). The
    * min-aggregate and left join are id-keyed, no skew.
    */
  def q87SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val m = assignClusters(withNorm(emb(spark, dir)), 8)
      .select(col("vec_id"), col("cluster"), col("embedding"), col("nn"))
    val left = m.select(col("cluster"), col("vec_id").as("a_id"),
      col("embedding").as("ae"), col("nn").as("na"))
    val right = m.select(col("cluster"), col("vec_id").as("b_id"),
      col("embedding").as("be"), col("nn").as("nb"))
    val dupOf = left.join(right, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cosine",
        round6c(dotC(spark, "ae", "be") / (sqrt(col("na")) * sqrt(col("nb")))))
      .filter(col("cosine") >= 0.35)
      .groupBy(col("b_id"))
      .agg(min(col("a_id")).as("dup_of"))
    m.select(col("vec_id"), col("cluster"))
      .join(dupOf, col("vec_id") === col("b_id"), "left")
      .select(col("vec_id"), col("cluster"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
  }

  /** How many clusters q114 drops — the Minipile "exclude list" size —
    * and how many clusters it builds (q72's k, stated once).
    */
  val PRUNE_CLUSTERS = 2
  val PRUNE_K = 8

  /** Cluster-level corpus pruning — the Minipile recipe (Kaddour 2023,
    * arXiv:2304.08442): cluster the corpus by embedding (q72's kernel),
    * score each CLUSTER by the mean text quality of its members (q88's
    * distinct-token-ratio score — one shared definition), and drop whole
    * low-quality clusters. This is the curation step per-doc thresholds
    * cannot replace: boilerplate / SEO-spam / gibberish pockets whose
    * individual documents each look acceptable give themselves away as a
    * cluster, and the paper's recipe is precisely "look at cluster
    * centroids, exclude entire clusters".
    *
    * Prune rule (deterministic): the [[PRUNE_CLUSTERS]] lowest clusters
    * under (mean quality asc, cluster id asc) are dropped. The mean is a
    * micro-unit integer sum (the DSIR/CCNet discipline): per-doc scores
    * round once to 1e-6 units and the cluster mean derives from an exact
    * 64-bit sum, so the cluster ranking cannot depend on summation order.
    *
    * Scale shape: assignment is q72's pure-map kernel (zero shuffle);
    * the doc↔embedding join is id-keyed; the per-cluster mean is a
    * map-side-combined aggregate down to k rows; and the verdict table is
    * k-bounded — the ONLY window ranks that k-row frame (the
    * IVF-centroid kind of bounded) before it BROADCASTs back as a
    * pure-map verdict. The corpus never funnels through a ranking window.
    */
  def q114ClusterPrune(spark: SparkSession, dir: String): DataFrame = {
    // cached: the verdict aggregate and the per-doc join both read the
    // scored-assignment frame — uncached, the embedding scan + argmin UDF
    // + quality scan would run twice
    val m = graft.CacheScope.cache(
      scoredAssignments(spark, dir, lowestIdSeeds(emb(spark, dir), PRUNE_K)))
    clusterPruneJoined(m, clusterVerdicts(m))
  }

  /** Lloyd iteration dials for q156: k seeds, L full assign→update
    * rounds before the output assignment.
    */
  val LLOYD_K = 8
  val LLOYD_ROUNDS = 3

  /** Multi-round Lloyd k-means (q156) — the ITERATIVE training loop the
    * one-update queries (q57's IVF train, q124's prototypes) stop short
    * of: [[LLOYD_ROUNDS]] full assign→update rounds from the
    * deterministic lowest-id seeds, then the assignment against the
    * final centroids. Every round's state is the k×dim centroid table —
    * BOUNDED driver memory at any corpus size — and every round's
    * corpus-side work is ONE pure-map argmin (broadcast centroids baked
    * into the kernel closure) feeding ONE map-side-combinable aggregate
    * of micro-unit integer sums; nothing corpus-sized ever shuffles
    * twice per round, and rounds are a FIXED count, not a convergence
    * test (the 100 TB discipline: plan shape must not depend on data).
    *
    * Determinism: dist2 rounds to 6 before each argmin (ties to the
    * lower centroid id — the q72 kernel, shared), centroid means are
    * exact 64-bit micro-unit sums divided once and rounded once
    * ([[round6]], the q124 prototype convention), and a cluster that
    * goes empty keeps its previous centroid. The oracle unrolls the
    * identical rounds in SQL, so the hash match certifies the whole
    * TRAJECTORY — seeds, every intermediate assignment, every update —
    * not just the final partition.
    */
  def q156LloydIterate(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.CacheScope.cache(emb(spark, dir))
    val cents = lloydCentroids(e, LLOYD_K, LLOYD_ROUNDS)
    e.withColumn("a", nearestSeedU(cents)(col("embedding")))
      .select(col("vec_id"), col("a._1").as("cluster"), col("a._2").as("dist2"))
  }

  /** The Lloyd trajectory: `rounds` assign→update steps from the
    * lowest-id seeds; a cluster that goes empty keeps its previous
    * centroid. Exposed for specs to drive constructed geometries through
    * the exact production arithmetic.
    */
  private[graft] def lloydCentroids(e: DataFrame, k: Int,
                                    rounds: Int): Array[(Long, Array[Double])] = {
    var cents = lowestIdSeeds(e, k)
    val dim = cents.head._2.length
    val sumCols = count(lit(1)).as("n") +: (0 until dim).map(i =>
      sum(round(element_at(col("embedding"), i + 1).cast("double") * 1e6, 0)
        .cast("long")).as(s"s$i"))
    for (_ <- 1 to rounds) {
      val updated = e
        .groupBy(nearestSeedU(cents)(col("embedding")).getField("_1").as("cid"))
        .agg(sumCols.head, sumCols.tail: _*)
        .collect() // ≤ k rows of dim+2 values — bounded driver state
        .map { r =>
          val n = r.getLong(1)
          (r.getLong(0),
            Array.tabulate(dim)(i => round6(r.getLong(i + 2).toDouble / n / 1e6)))
        }.toMap
      cents = cents.map { case (id, old) => (id, updated.getOrElse(id, old)) }
    }
    cents
  }

  /** (doc_id, cluster, score) under a given seed table — q88's quality
    * score per doc + q72's assignment, id-keyed join. ONE definition for
    * the inline query, the index build's verdict pass, and serving.
    */
  private def scoredAssignments(spark: SparkSession, dir: String,
                                seeds: Array[(Long, Array[Double])]): DataFrame = {
    val assigned = emb(spark, dir)
      .withColumn("cluster", nearestSeedU(seeds)(col("embedding")).getField("_1"))
      .select(col("vec_id"), col("cluster"))
    val quality = TextAnalysis.qualityScored(
      Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("score"))
    assigned.join(quality, assigned("vec_id") === quality("doc_id"))
      .select(col("doc_id"), col("cluster"), col("score"))
  }

  /** The k-row verdict frame of a (doc_id, cluster, score) frame:
    * micro-unit mean quality per cluster, the [[PRUNE_CLUSTERS]] lowest
    * pruned. The ranking window runs on the k-row aggregate only.
    */
  private def clusterVerdicts(m: DataFrame): DataFrame =
    m.withColumn("_sm", round(col("score") * 1e6, 0).cast("long"))
      .groupBy(col("cluster"))
      .agg(sum(col("_sm")).as("_sms"), count(lit(1)).as("n_docs"))
      .withColumn("mean_q", round(col("_sms") / col("n_docs") / 1e6, 6))
      .withColumn("q_rank",
        row_number().over(Window.orderBy(col("mean_q"), col("cluster"))))
      .select(col("cluster"), col("mean_q"), col("n_docs"),
        (col("q_rank") <= PRUNE_CLUSTERS).as("pruned"))

  /** The per-doc verdict projection shared by q114 and the serve path. */
  private def clusterPruneJoined(m: DataFrame, verdicts: DataFrame): DataFrame =
    m.join(broadcast(verdicts), Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("score"), col("mean_q"),
        col("n_docs"), col("pruned"))

  /** Materialized cluster-prune index — the serving half of q114 (the
    * q109/q113 shape applied to the Minipile verdicts): the k seed
    * centroids and the k-row verdict table land as parquet, meta LAST
    * with the per-build nonce. Verdicts are computed through the SAME
    * parquet round-trip serving will read (exact for doubles), so the
    * stored state reproduces the inline answer bitwise; scores are
    * micro-unit means, so the cluster ranking cannot drift with
    * partitioning either.
    */
  def writeClusterPruneIndex(spark: SparkSession, dir: String, path: String): Unit = {
    IndexMeta.invalidate(spark, path)
    // the ONE seed definition (lowestIdSeeds) materialized — the build
    // cannot drift from the inline q114 path
    import spark.implicits._
    lowestIdSeeds(emb(spark, dir), PRUNE_K).toSeq
      .toDF("cent_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val seeds = readPruneSeeds(spark, path)
    val verdicts = clusterVerdicts(scoredAssignments(spark, dir, seeds))
    verdicts.coalesce(1).write.mode("overwrite").parquet(s"$path/verdicts")
    IndexMeta.write(spark, path, "graft cluster-prune index",
      "kind" -> "cluster_prune", "k" -> seeds.length.toString,
      "pruned" -> PRUNE_CLUSTERS.toString)
  }

  private def readPruneSeeds(spark: SparkSession,
                             path: String): Array[(Long, Array[Double])] =
    spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  private[graft] final case class LoadedClusterPruneIndex(
      seeds: Array[(Long, Array[Double])], verdicts: DataFrame)

  private[graft] def loadClusterPruneIndex(spark: SparkSession,
                                           path: String): LoadedClusterPruneIndex = {
    IndexMeta.read(spark, path, rebuildHint = "writeClusterPruneIndex")
    LoadedClusterPruneIndex(readPruneSeeds(spark, path),
      spark.read.parquet(s"$path/verdicts"))
  }

  /** Verdict a (doc_id, text, embedding) frame against a loaded index —
    * the per-batch kernel of the streaming gate and the q118 serve path:
    * assignment is the shared seed-argmin over the STORED centroids (a
    * pure map), the quality score is q88's per-row kernel, and the
    * verdict is a broadcast join against the stored k-row table. No
    * aggregation over anything corpus-sized at serve time.
    */
  private[graft] def clusterPruneAgainstLoaded(df: DataFrame,
      idx: LoadedClusterPruneIndex): DataFrame =
    clusterPruneJoined(
      TextAnalysis.qualityScored(df)
        .withColumn("cluster",
          nearestSeedU(idx.seeds)(col("embedding")).getField("_1"))
        .select(col("doc_id"), col("cluster"), col("score")),
      idx.verdicts)

  /** q114 served from the materialized index: same answer, zero
    * re-clustering — the serve plan reads the stored centroids and the
    * frozen verdict table, never re-aggregating cluster quality.
    */
  def q118ClusterPruneIndex(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.derivedIndexPath("graft_cluster_prune_v1", dir, "embeddings")
    IndexMeta.ensure(spark, path) { writeClusterPruneIndex(spark, dir, path) }
    val docsWithEmb = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .join(emb(spark, dir).select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    clusterPruneAgainstLoaded(docsWithEmb, loadClusterPruneIndex(spark, path))
  }

  /** Prototypicality pruning — the Sorscher et al. 2022 recipe ("Beyond
    * neural scaling laws: beating power law scaling via data pruning",
    * arXiv:2206.14486): cluster the embeddings (q72's shared seed-argmin
    * kernel), take each cluster's MEAN embedding as its prototype (one
    * Lloyd update over the seeds), score every example by its squared L2
    * distance to its own prototype, and prune the PROTOTYPICAL examples —
    * the ones closer to the prototype than the cluster's mean distance.
    * In the data-abundant regime the paper keeps the HARD examples (far
    * from the prototype); the easy core is what a 100 TB corpus can
    * afford to drop.
    *
    * Determinism discipline: prototypes are micro-unit exact — each
    * dimension sums `round(v * 1e6)` as 64-bit integers (order-free),
    * divides once, rounds once — and the prune verdict compares in
    * INTEGER space (`_dm * n < Σ_dm` ⟺ dist2m < mean), so no engine's
    * rounding of the mean can flip a verdict at a boundary.
    *
    * Scale shape: assignment is the shared pure-map kernel; the
    * prototype aggregate is map-side-combined down to k×(dim+1) values of
    * bounded driver state (the IVF-centroid budget class); the distance
    * pass is a pure map over the closure-broadcast prototypes; the
    * verdict aggregate is k-bounded and BROADCASTS back. Nothing
    * corpus-sized is windowed, collected, or re-shuffled beyond the one
    * cluster-keyed aggregate.
    */
  def q124PrototypePrune(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // cached: the prototype aggregate and the distance projection both
    // read the assigned frame — uncached, the seed-argmin UDF runs twice
    val assigned = graft.CacheScope.cache(
      assignClusters(e, PRUNE_K)
        .select(col("vec_id"), col("cluster"), col("embedding")))
    val dim = lowestIdSeeds(e, 1).head._2.length
    // micro-unit exact per-dimension sums → k×dim prototypes on the driver
    val sumCols = count(lit(1)).as("n") +: (0 until dim).map(i =>
      sum(round(element_at(col("embedding"), i + 1).cast("double") * 1e6, 0)
        .cast("long")).as(s"s$i"))
    val protos: Map[Long, Array[Double]] = assigned
      .groupBy(col("cluster")).agg(sumCols.head, sumCols.tail: _*)
      .collect() // ≤ PRUNE_K rows of dim+2 values — bounded driver state
      .map { r =>
        val n = r.getLong(1)
        (r.getLong(0),
          Array.tabulate(dim)(i => round6(r.getLong(i + 2).toDouble / n / 1e6)))
      }.toMap
    val d2mU = udf((cl: Long, v0: Seq[Float]) => {
      val p = protos(cl)
      val v = v0.toArray
      var d = 0.0
      var i = 0
      while (i < p.length) { val df = v(i).toDouble - p(i); d += df * df; i += 1 }
      round6(d)
    })
    // cached: the verdict aggregate and the join back both read the
    // distance-scored frame
    val scored = graft.CacheScope.cache(
      assigned
        .withColumn("dist2m", d2mU(col("cluster"), col("embedding")))
        .withColumn("_dm", round(col("dist2m") * 1e6, 0).cast("long"))
        .select(col("vec_id"), col("cluster"), col("dist2m"), col("_dm")))
    val verdicts = scored.groupBy(col("cluster"))
      .agg(sum(col("_dm")).as("_dms"), count(lit(1)).as("n_vecs"))
      .withColumn("mean_d2", round(col("_dms") / col("n_vecs") / 1e6, 6))
    scored.join(broadcast(verdicts), Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("dist2m"), col("mean_d2"),
        col("n_vecs"),
        (col("_dm") * col("n_vecs") < col("_dms")).as("pruned"))
  }

  /** Embedding isotropy audit (q172; the anisotropy diagnosis of
    * Ethayarajh 2019): per q72 cluster, the mean vector norm and the
    * mean cosine to the GLOBAL centroid — a healthy embedding space
    * spreads directions (mean cos near 0); a collapsed "cone" (mean cos
    * → 1) silently breaks every cosine-threshold dial downstream
    * (q56/q87's dedup cuts, the ANN ladder's recall), so this row is
    * the precondition check for the whole similarity family.
    *
    * Determinism: the centroid is the q124 micro-mean convention
    * (dim-bounded driver state), cosines are q48's exact kernel shape
    * (dot / (√nn·√nm), rounded once at 6), and per-cluster means sum
    * micro-unit longs.
    *
    * Scale shape: TWO corpus passes, both pure maps after dim-bounded
    * aggregates — the centroid aggregate (map-side combined per-dim
    * sums) and the score pass (centroid in the kernel closure, q72
    * assignment fused in the same map) — plus one cluster-keyed
    * aggregate of micro longs.
    */
  def q172EmbeddingIsotropy(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.CacheScope.cache(withNorm(emb(spark, dir)))
    val dim = lowestIdSeeds(e, 1).head._2.length
    val sumCols = count(lit(1)).as("n") +: (0 until dim).map(i =>
      sum(round(element_at(col("embedding"), i + 1).cast("double") * 1e6, 0)
        .cast("long")).as(s"s$i"))
    val row = e.agg(sumCols.head, sumCols.tail: _*).head() // dim-bounded
    val nVec = row.getLong(0)
    val mu = Array.tabulate(dim)(i => round6(row.getLong(i + 1).toDouble / nVec / 1e6))
    val muNorm2 = {
      var s = 0.0; var i = 0
      while (i < mu.length) { s += mu(i) * mu(i); i += 1 }
      s
    }
    val scoreU = udf((v0: Seq[Float], nn: Double) => {
      val v = v0.toArray
      var d = 0.0
      var i = 0
      while (i < mu.length) { d += v(i).toDouble * mu(i); i += 1 }
      (round6(d / (math.sqrt(nn) * math.sqrt(muNorm2))), round6(math.sqrt(nn)))
    })
    assignClusters(e, PRUNE_K)
      .withColumn("sc", scoreU(col("embedding"), col("nn")))
      .select(col("cluster"),
        round(col("sc._1") * 1e6, 0).cast("long").as("_cm"),
        round(col("sc._2") * 1e6, 0).cast("long").as("_nm"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("_cm")).as("_cs"), sum(col("_nm")).as("_ns"))
      .select(col("cluster"), col("n_vecs"),
        round(col("_ns") / col("n_vecs") / 1e6, 6).as("mean_norm"),
        round(col("_cs") / col("n_vecs") / 1e6, 6).as("mean_cos"))
  }

  /** Labels per cluster emitted by q163. */
  val CTFIDF_TOP = 5

  /** c-TF-IDF cluster labeling (q163; the BERTopic class-TF-IDF,
    * Grootendorst 2022): treat each embedding cluster (q72's shared
    * assignment) as ONE class document; a token's label score is
    * tf_{t,c} · ln(1 + A/f_t) with A the average tokens per class and
    * f_t the token's corpus frequency — frequent-in-cluster but
    * corpus-rare tokens name the cluster. The top-[[CTFIDF_TOP]] tokens
    * per cluster are the human-readable face of every cluster-keyed
    * operator (q86's samples, q114's prune verdicts).
    *
    * Determinism: ln(1 + A/f_t) = ln((k·f_t + T)/(k·f_t)) — the q152
    * ratio form over exact integers — micro-rounded ONCE and multiplied
    * by the exact tf, so scores are 64-bit integers; ranking is the
    * shared two-phase take ordered (score desc, token).
    *
    * Scale shape: the (cluster, token) aggregate is the only
    * corpus-sized exchange (map-side partials; the assignment join is
    * id-keyed against q72's pure-map output); f_t and the total are
    * aggregates OF that frame; the take never windows more than the
    * per-partition survivors.
    */
  def q163ClusterLabels(spark: SparkSession, dir: String): DataFrame = {
    val assigned = assignClusters(emb(spark, dir), PRUNE_K)
      .select(col("vec_id").as("doc_id"), col("cluster"))
    val tf = graft.CacheScope.cache(
      Spread.scan(Tables.load(spark, dir, "documents"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .join(assigned, Seq("doc_id"))
        .groupBy(col("cluster"), col("w")).agg(count(lit(1)).as("tf")))
    val ft = tf.groupBy(col("w")).agg(sum(col("tf")).as("f_t"))
    val tot = tf.agg(sum(col("tf")).as("t"))
    val scored = tf.join(ft, Seq("w")).crossJoin(broadcast(tot))
      .withColumn("_lm",
        round(log((lit(PRUNE_K.toLong) * col("f_t") + col("t")).cast("double") /
          (lit(PRUNE_K.toLong) * col("f_t")).cast("double")) * 1e6, 0)
          .cast("long"))
      .withColumn("_sm", col("tf") * col("_lm"))
    Ranked.twoPhaseTopK(scored, Seq(col("cluster")),
      Seq(col("_sm").desc, col("w")), lit(CTFIDF_TOP))
      .select(col("cluster"), col("w").as("token"), col("tf"), col("f_t"),
        (col("_sm") / 1e6).as("score"), col("rk").cast("int").as("rk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_cosine_knn" -> q48CosineKnn,
    "q163_cluster_labels" -> q163ClusterLabels,
    "q172_embedding_isotropy" -> q172EmbeddingIsotropy,
    "q156_lloyd_iterate" -> q156LloydIterate,
    "q112_hard_negatives" -> q112HardNegatives,
    "q148_margin_mining" -> q148MarginMining,
    "q87_semantic_dedup" -> q87SemanticDedup,
    "q49_ann_lsh" -> q49AnnLsh,
    "q56_embedding_neardup" -> q56EmbeddingNeardup,
    "q57_ann_ivf" -> q57AnnIvf,
    "q83_ivf_index" -> q83IvfIndex,
    "q67_embedding_dedup" -> q67EmbeddingDedupPipeline,
    "q72_kmeans_assign" -> q72KmeansAssign,
    "q114_cluster_prune" -> q114ClusterPrune,
    "q118_cluster_prune_index" -> q118ClusterPruneIndex,
    "q124_prototype_prune" -> q124PrototypePrune,
    "q86_cluster_sample" -> q86ClusterSample,
    "q76_crossmodal_dedup" -> q76CrossmodalDedup,
    "q82_ann_index" -> q82AnnIndex,
    "q90_ann_sq8" -> q90AnnSq8,
    "q91_sq8_index" -> q91Sq8Index,
    "q92_ann_pq" -> q92AnnPq,
    "q93_pq_index" -> q93PqIndex,
    "q94_pq_refine" -> q94PqRefine,
    "q95_ivfpq" -> q95IvfPq,
    "q179_pq_scaled" -> q179PqScaled,
    "q181_ivfpq_residual" -> q181IvfPqResidual,
    "q183_ivfpq_index" -> q183IvfPqIndex)

  private val longFormCte =
    """e2 AS (
      |  SELECT vec_id, embedding,
      |    unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings),
      |ex AS (
      |  SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS v FROM e2)""".stripMargin

  /** Per-(vec_id, band) signatures with the same md5-derived planes.
    * Band count mirrors the Spark dial: LSH_BANDS for the ANN path,
    * DUP_BANDS for the corpus×corpus dup queries.
    */
  private def bandSigCte(nBands: Int = LSH_BANDS) = {
    val nPlanes = nBands * LSH_BITS
    s"""planes AS (
      |  SELECT ex.*, p,
      |    ('0x' || substr(md5(p || ':' || pos), 1, 15))::BIGINT / 576460752303423488.0 - 1.0 AS w
      |  FROM ex, generate_series(0, ${nPlanes - 1}) g(p)),
      |sigs AS (
      |  SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS sig FROM (
      |    SELECT vec_id, p // $LSH_BITS AS band,
      |      CASE WHEN sum(v * w) > 0 THEN CAST(pow(2, p % $LSH_BITS) AS BIGINT) ELSE 0 END AS bit
      |    FROM planes GROUP BY vec_id, p) GROUP BY vec_id, band),
      |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1)""".stripMargin
  }

  /** q49's full SQL — shared verbatim by q49 (inline corpus signing) and
    * q82 (the materialized ANN index): identical semantics by construction.
    */
  private val annLshSql: String =
    s"""WITH $longFormCte,
      |${bandSigCte()},
      |masks AS (
      |  SELECT m FROM range(0, ${1 << LSH_BITS}) r(m) WHERE bit_count(m) <= 2),
      |cand AS (
      |  SELECT DISTINCT x.vec_id AS p_id, y.vec_id AS c_id
      |  FROM sigs x CROSS JOIN masks JOIN sigs y
      |    ON y.band = x.band AND y.sig = xor(x.sig, m)
      |    AND x.vec_id < 50 AND x.vec_id != y.vec_id),
      |dots AS (
      |  SELECT p_id, c_id, sum(a.v * b.v) AS dot
      |  FROM cand JOIN ex a ON a.vec_id = p_id JOIN ex b
      |    ON b.vec_id = c_id AND b.pos = a.pos
      |  GROUP BY 1, 2),
      |cos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
      |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id)
      |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
      |  FROM cos) WHERE rn <= 3""".stripMargin

  /** q57's full SQL — shared verbatim by q57 (inline train+assign) and
    * q83 (the materialized IVF index): identical semantics by construction.
    */
  private val ivfSql: String =
    s"""WITH $longFormCte,
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |sd AS (
        |  SELECT a.vec_id, s.vec_id AS seed_id,
        |    round(sum((a.v - s.v) * (a.v - s.v)), 6) AS d
        |  FROM ex a JOIN ex s ON s.pos = a.pos AND s.vec_id < $IVF_K
        |  GROUP BY 1, 2),
        |sa AS (
        |  SELECT vec_id, seed_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d, seed_id) AS rn
        |    FROM sd) WHERE rn = 1),
        |cents AS (
        |  SELECT sa.seed_id AS cent_id, a.pos, round(avg(a.v), 6) AS cv
        |  FROM ex a JOIN sa ON sa.vec_id = a.vec_id
        |  GROUP BY 1, 2),
        |cnorm AS (SELECT cent_id, sum(cv * cv) AS nc FROM cents GROUP BY 1),
        |adots AS (
        |  SELECT a.vec_id, c.cent_id, sum(a.v * c.cv) AS dot
        |  FROM ex a JOIN cents c ON c.pos = a.pos
        |  GROUP BY 1, 2),
        |acos AS (
        |  SELECT d.vec_id, d.cent_id,
        |    round(dot / (sqrt(nv.nn) * sqrt(cn.nc)), 6) AS cos
        |  FROM adots d JOIN norms nv ON nv.vec_id = d.vec_id
        |    JOIN cnorm cn ON cn.cent_id = d.cent_id),
        |ranked AS (
        |  SELECT vec_id, cent_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
        |  FROM acos),
        |assign AS (SELECT vec_id, cent_id AS list_id FROM ranked WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS p_id, cent_id AS list_id FROM ranked
        |  WHERE vec_id < 20 AND rn <= $NPROBE),
        |cand AS (
        |  SELECT p_id, a.vec_id AS c_id
        |  FROM probes p JOIN assign a ON a.list_id = p.list_id AND a.vec_id != p.p_id),
        |dots AS (
        |  SELECT p_id, c_id, sum(a.v * b.v) AS dot
        |  FROM cand JOIN ex a ON a.vec_id = p_id
        |    JOIN ex b ON b.vec_id = c_id AND b.pos = a.pos
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
        |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id)
        |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
        |  FROM cos) WHERE rn <= 3""".stripMargin

  /** q90's full SQL — shared verbatim by q90 (inline quantize) and q91
    * (the materialized SQ8 index): identical semantics by construction.
    * Every arithmetic expression (operand order included) mirrors the
    * Scala kernels, so the 8-bit codes are integer-exact cross-engine and
    * only the final cosine needs the shared round-to-6.
    */
  private val sq8Sql: String =
    s"""WITH $longFormCte,
      |mm AS (SELECT pos, min(v) AS mn, max(v) - min(v) AS span FROM ex GROUP BY 1),
      |codes AS (
      |  SELECT vec_id, ex.pos,
      |    CASE WHEN span = 0 THEN 0
      |         ELSE least(255, floor((v - mn) / span * 256.0)) END AS code,
      |    mn, span
      |  FROM ex JOIN mm ON mm.pos = ex.pos),
      |recon AS (
      |  SELECT vec_id, pos, mn + (code + 0.5) * span / 256.0 AS rv FROM codes),
      |nq AS (SELECT vec_id, sum(rv * rv) AS nq FROM recon GROUP BY 1),
      |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
      |dots AS (
      |  SELECT a.vec_id AS p_id, r.vec_id AS c_id, sum(a.v * r.rv) AS dot
      |  FROM ex a JOIN recon r ON r.pos = a.pos
      |    AND a.vec_id < 20 AND a.vec_id != r.vec_id
      |  GROUP BY 1, 2),
      |cos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nq)), 6) AS cosine
      |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN nq nc ON nc.vec_id = c_id)
      |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
      |  FROM cos) WHERE rn <= 3""".stripMargin

  /** q92's full SQL — shared verbatim by q92 (inline train+encode) and
    * q93 (the materialized PQ index). The oracle unrolls the SAME two
    * quantizer steps the Scala runs: step-0 assignment against the PQ_K
    * lowest vec_ids' subvectors, round6'd per-subspace centroids, one
    * re-assignment against the refined codebook, then the asymmetric
    * reconstruction dot. Every distance and the averaged centroids are
    * round6'd on BOTH engines before any argmin/compare.
    */
  private def pqCtesFor(m: Int, k: Int): String = {
    val dsub = 64 / m // oracle mirrors the fixture's dim like the plane CTEs
    s"""$longFormCte,
      |sub AS (SELECT vec_id, pos, v,
      |  (pos - 1) // $dsub AS s, (pos - 1) % $dsub AS j FROM ex),
      |sd0 AS (
      |  SELECT a.vec_id, a.s, b.vec_id AS seed,
      |    round(sum((a.v - b.v) * (a.v - b.v)), 6) AS d
      |  FROM sub a JOIN sub b ON b.pos = a.pos AND b.vec_id < $k
      |  GROUP BY 1, 2, 3),
      |a0 AS (SELECT vec_id, s, seed AS code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, seed) AS rn
      |    FROM sd0) WHERE rn = 1),
      |cents AS (
      |  SELECT a0.s, a0.code, sb.j, round(avg(sb.v), 6) AS cv
      |  FROM sub sb JOIN a0 ON a0.vec_id = sb.vec_id AND a0.s = sb.s
      |  GROUP BY 1, 2, 3),
      |sd1 AS (
      |  SELECT sb.vec_id, sb.s, c.code,
      |    round(sum((sb.v - c.cv) * (sb.v - c.cv)), 6) AS d
      |  FROM sub sb JOIN cents c ON c.s = sb.s AND c.j = sb.j
      |  GROUP BY 1, 2, 3),
      |a1 AS (SELECT vec_id, s, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
      |    FROM sd1) WHERE rn = 1),
      |recon AS (
      |  SELECT a1.vec_id, c.s, c.j, c.cv
      |  FROM a1 JOIN cents c ON c.s = a1.s AND c.code = a1.code),
      |nq AS (SELECT vec_id, sum(cv * cv) AS nq FROM recon GROUP BY 1),
      |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
      |dots AS (
      |  SELECT p.vec_id AS p_id, r.vec_id AS c_id, sum(p.v * r.cv) AS dot
      |  FROM sub p JOIN recon r ON r.s = p.s AND r.j = p.j
      |    AND p.vec_id < 20 AND p.vec_id != r.vec_id
      |  GROUP BY 1, 2),
      |cos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nq)), 6) AS cosine
      |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN nq nc ON nc.vec_id = c_id)""".stripMargin
  }

  private val pqCtes: String = pqCtesFor(PQ_M, PQ_K)

  private val pqSql: String =
    s"""WITH $pqCtes
      |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
      |  FROM cos) WHERE rn <= 3""".stripMargin

  /** q94's SQL — the pq CTE chain with the ADC rank cut at PQ_REFINE and
    * q57's exact-cosine tail re-ranking just those candidates. Dial-
    * parameterized: q94 interpolates the fixture dials, q179 the
    * corpus-scale [[PQ_M_SCALE]] — the oracle chain and the Scala path
    * scale together, so the at-scale config can never drift ungated.
    */
  private def pqRefineSqlFor(m: Int, k: Int): String =
    s"""WITH ${pqCtesFor(m, k)},
      |adc AS (
      |  SELECT p_id, c_id FROM (
      |    SELECT p_id, c_id,
      |      row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
      |    FROM cos) WHERE rn <= $PQ_REFINE),
      |xdots AS (
      |  SELECT p_id, c_id, sum(a.v * b.v) AS dot
      |  FROM adc JOIN ex a ON a.vec_id = p_id
      |    JOIN ex b ON b.vec_id = c_id AND b.pos = a.pos
      |  GROUP BY 1, 2),
      |xcos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
      |  FROM xdots JOIN norms np ON np.vec_id = p_id
      |    JOIN norms nc ON nc.vec_id = c_id)
      |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
      |  FROM xcos) WHERE rn <= 3""".stripMargin

  private val pqRefineSql: String = pqRefineSqlFor(PQ_M, PQ_K)

  /** q95's SQL — q57's IVF assignment CTEs (renamed i*) + q92's PQ CTEs,
    * composed exactly as the Scala composes the kernels: candidates from
    * the probed lists, ADC rank through the PQ reconstruction, PQ_REFINE
    * cut, exact-cosine tail.
    */
  private val ivfPqSql: String =
    s"""WITH $pqCtes,
      |sd AS (
      |  SELECT a.vec_id, s.vec_id AS seed_id,
      |    round(sum((a.v - s.v) * (a.v - s.v)), 6) AS d
      |  FROM ex a JOIN ex s ON s.pos = a.pos AND s.vec_id < $IVF_K
      |  GROUP BY 1, 2),
      |sa AS (
      |  SELECT vec_id, seed_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY d, seed_id) AS rn
      |    FROM sd) WHERE rn = 1),
      |icents AS (
      |  SELECT sa.seed_id AS cent_id, a.pos, round(avg(a.v), 6) AS cv
      |  FROM ex a JOIN sa ON sa.vec_id = a.vec_id
      |  GROUP BY 1, 2),
      |icnorm AS (SELECT cent_id, sum(cv * cv) AS nc FROM icents GROUP BY 1),
      |iadots AS (
      |  SELECT a.vec_id, c.cent_id, sum(a.v * c.cv) AS dot
      |  FROM ex a JOIN icents c ON c.pos = a.pos
      |  GROUP BY 1, 2),
      |iacos AS (
      |  SELECT d.vec_id, d.cent_id,
      |    round(dot / (sqrt(nv.nn) * sqrt(cn.nc)), 6) AS cos
      |  FROM iadots d JOIN norms nv ON nv.vec_id = d.vec_id
      |    JOIN icnorm cn ON cn.cent_id = d.cent_id),
      |iranked AS (
      |  SELECT vec_id, cent_id,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
      |  FROM iacos),
      |iassign AS (SELECT vec_id, cent_id AS list_id FROM iranked WHERE rn = 1),
      |iprobes AS (
      |  SELECT vec_id AS p_id, cent_id AS list_id FROM iranked
      |  WHERE vec_id < 20 AND rn <= $NPROBE),
      |lcand AS (
      |  SELECT p_id, a.vec_id AS c_id
      |  FROM iprobes p JOIN iassign a ON a.list_id = p.list_id
      |    AND a.vec_id != p.p_id),
      |qdots AS (
      |  SELECT l.p_id, l.c_id, sum(p.v * r.cv) AS dot
      |  FROM lcand l JOIN sub p ON p.vec_id = l.p_id
      |    JOIN recon r ON r.vec_id = l.c_id AND r.s = p.s AND r.j = p.j
      |  GROUP BY 1, 2),
      |qcos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nq)), 6) AS acos
      |  FROM qdots JOIN norms np ON np.vec_id = p_id JOIN nq nc ON nc.vec_id = c_id),
      |pruned AS (
      |  SELECT p_id, c_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY acos DESC, c_id) AS rn
      |    FROM qcos) WHERE rn <= $PQ_REFINE),
      |xdots AS (
      |  SELECT p_id, c_id, sum(a.v * b.v) AS dot
      |  FROM pruned JOIN ex a ON a.vec_id = p_id
      |    JOIN ex b ON b.vec_id = c_id AND b.pos = a.pos
      |  GROUP BY 1, 2),
      |xcos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
      |  FROM xdots JOIN norms np ON np.vec_id = p_id
      |    JOIN norms nc ON nc.vec_id = c_id)
      |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
      |  FROM xcos) WHERE rn <= 3""".stripMargin

  /** q181's SQL — q95's IVF CTEs verbatim, then the PQ two-step unrolled
    * over the RESIDUAL corpus (rex = round6(v − assigned-list centroid)),
    * the full reconstruction (list centroid + residual codeword) feeding
    * the ADC dots and norms, and the shared refine tail. Every rounding
    * point mirrors the Scala kernels: icents/rcents round6'd, residuals
    * component-round6'd, distances round6'd before each argmin, acos/
    * cosine round6'd after the divide.
    */
  private val ivfPqResidualSql: String = {
    val dsub = 64 / PQ_M
    s"""WITH $longFormCte,
      |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
      |sd AS (
      |  SELECT a.vec_id, s.vec_id AS seed_id,
      |    round(sum((a.v - s.v) * (a.v - s.v)), 6) AS d
      |  FROM ex a JOIN ex s ON s.pos = a.pos AND s.vec_id < $IVF_K
      |  GROUP BY 1, 2),
      |sa AS (
      |  SELECT vec_id, seed_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY d, seed_id) AS rn
      |    FROM sd) WHERE rn = 1),
      |icents AS (
      |  SELECT sa.seed_id AS cent_id, a.pos, round(avg(a.v), 6) AS cv
      |  FROM ex a JOIN sa ON sa.vec_id = a.vec_id
      |  GROUP BY 1, 2),
      |icnorm AS (SELECT cent_id, sum(cv * cv) AS nc FROM icents GROUP BY 1),
      |iadots AS (
      |  SELECT a.vec_id, c.cent_id, sum(a.v * c.cv) AS dot
      |  FROM ex a JOIN icents c ON c.pos = a.pos
      |  GROUP BY 1, 2),
      |iacos AS (
      |  SELECT d.vec_id, d.cent_id,
      |    round(dot / (sqrt(nv.nn) * sqrt(cn.nc)), 6) AS cos
      |  FROM iadots d JOIN norms nv ON nv.vec_id = d.vec_id
      |    JOIN icnorm cn ON cn.cent_id = d.cent_id),
      |iranked AS (
      |  SELECT vec_id, cent_id,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id) AS rn
      |  FROM iacos),
      |iassign AS (SELECT vec_id, cent_id AS list_id FROM iranked WHERE rn = 1),
      |iprobes AS (
      |  SELECT vec_id AS p_id, cent_id AS list_id FROM iranked
      |  WHERE vec_id < 20 AND rn <= $NPROBE),
      |rex AS (
      |  SELECT e.vec_id, e.pos, round(e.v - c.cv, 6) AS v
      |  FROM ex e JOIN iassign a ON a.vec_id = e.vec_id
      |    JOIN icents c ON c.cent_id = a.list_id AND c.pos = e.pos),
      |rsub AS (SELECT vec_id, pos, v,
      |  (pos - 1) // $dsub AS s, (pos - 1) % $dsub AS j FROM rex),
      |rsd0 AS (
      |  SELECT a.vec_id, a.s, b.vec_id AS seed,
      |    round(sum((a.v - b.v) * (a.v - b.v)), 6) AS d
      |  FROM rsub a JOIN rsub b ON b.pos = a.pos AND b.vec_id < $PQ_K
      |  GROUP BY 1, 2, 3),
      |ra0 AS (SELECT vec_id, s, seed AS code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, seed) AS rn
      |    FROM rsd0) WHERE rn = 1),
      |rcents AS (
      |  SELECT ra0.s, ra0.code, sb.j, round(avg(sb.v), 6) AS cv
      |  FROM rsub sb JOIN ra0 ON ra0.vec_id = sb.vec_id AND ra0.s = sb.s
      |  GROUP BY 1, 2, 3),
      |rsd1 AS (
      |  SELECT sb.vec_id, sb.s, c.code,
      |    round(sum((sb.v - c.cv) * (sb.v - c.cv)), 6) AS d
      |  FROM rsub sb JOIN rcents c ON c.s = sb.s AND c.j = sb.j
      |  GROUP BY 1, 2, 3),
      |ra1 AS (SELECT vec_id, s, code FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
      |    FROM rsd1) WHERE rn = 1),
      |rrecon AS (
      |  SELECT ra1.vec_id, c.s, c.j, c.cv
      |  FROM ra1 JOIN rcents c ON c.s = ra1.s AND c.code = ra1.code),
      |recon_full AS (
      |  SELECT rr.vec_id, ic.pos, ic.cv + rr.cv AS fv
      |  FROM rrecon rr JOIN iassign a ON a.vec_id = rr.vec_id
      |    JOIN icents ic ON ic.cent_id = a.list_id
      |      AND ic.pos = rr.s * $dsub + rr.j + 1),
      |nqf AS (SELECT vec_id, sum(fv * fv) AS nq FROM recon_full GROUP BY 1),
      |lcand AS (
      |  SELECT p_id, a.vec_id AS c_id
      |  FROM iprobes p JOIN iassign a ON a.list_id = p.list_id
      |    AND a.vec_id != p.p_id),
      |qdots AS (
      |  SELECT l.p_id, l.c_id, sum(p.v * rf.fv) AS dot
      |  FROM lcand l JOIN ex p ON p.vec_id = l.p_id
      |    JOIN recon_full rf ON rf.vec_id = l.c_id AND rf.pos = p.pos
      |  GROUP BY 1, 2),
      |qcos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nq)), 6) AS acos
      |  FROM qdots JOIN norms np ON np.vec_id = p_id JOIN nqf nc ON nc.vec_id = c_id),
      |pruned AS (
      |  SELECT p_id, c_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY acos DESC, c_id) AS rn
      |    FROM qcos) WHERE rn <= $PQ_REFINE),
      |xdots AS (
      |  SELECT p_id, c_id, sum(a.v * b.v) AS dot
      |  FROM pruned JOIN ex a ON a.vec_id = p_id
      |    JOIN ex b ON b.vec_id = c_id AND b.pos = a.pos
      |  GROUP BY 1, 2),
      |xcos AS (
      |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
      |  FROM xdots JOIN norms np ON np.vec_id = p_id
      |    JOIN norms nc ON nc.vec_id = c_id)
      |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
      |  FROM xcos) WHERE rn <= 3""".stripMargin
  }

  /** q114's oracle — q72 assignment + q88 score + micro-unit cluster
    * means + the bottom-2 prune; q118 (index serving) shares it.
    */
  private[graft] lazy val clusterPruneOracleSql: String =
    // Seed shorthand: lowestIdSeeds picks the PRUNE_K smallest vec_ids and
    // the fixture ids are contiguous from 0, so `vec_id < $PRUNE_K` states
    // the same seed set. Both dials interpolate so a constant change
    // cannot desync the oracle from the implementation.
    s"""WITH $longFormCte,
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex WHERE vec_id < $PRUNE_K),
        |d AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, c_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist2, c_id) AS rn
        |    FROM d) WHERE rn = 1),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS score
        |  FROM documents),
        |m AS (
        |  SELECT sc.doc_id, a.cluster, sc.score
        |  FROM assigned a JOIN sc ON sc.doc_id = a.vec_id),
        |bc AS (
        |  SELECT cluster,
        |    round(sum(CAST(round(score * 1e6, 0) AS BIGINT))
        |      / count(*) / 1e6, 6) AS mean_q,
        |    count(*) AS n_docs
        |  FROM m GROUP BY 1),
        |rk AS (
        |  SELECT cluster, mean_q, n_docs,
        |    row_number() OVER (ORDER BY mean_q, cluster) AS q_rank
        |  FROM bc)
        |SELECT m.doc_id, m.cluster, m.score, rk.mean_q, rk.n_docs,
        |  (rk.q_rank <= $PRUNE_CLUSTERS) AS pruned
        |FROM m JOIN rk USING (cluster)""".stripMargin

  /** q124's oracle — q72 assignment + micro-unit mean prototypes +
    * dist2-to-prototype + the integer-space below-mean prune. The seed
    * shorthand `vec_id < $PRUNE_K` matches lowestIdSeeds on the
    * contiguous-id fixtures (same note as [[clusterPruneOracleSql]]).
    */
  private[graft] lazy val prototypePruneOracleSql: String =
    s"""WITH $longFormCte,
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex WHERE vec_id < $PRUNE_K),
        |d AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, c_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist2, c_id) AS rn
        |    FROM d) WHERE rn = 1),
        |ps AS (
        |  SELECT a.cluster, ex.pos,
        |    round(sum(CAST(round(ex.v * 1e6, 0) AS BIGINT))
        |      / count(*) / 1e6, 6) AS pv
        |  FROM ex JOIN assigned a USING (vec_id)
        |  GROUP BY 1, 2),
        |d2 AS (
        |  SELECT ex.vec_id, a.cluster,
        |    round(sum((ex.v - ps.pv) * (ex.v - ps.pv)), 6) AS dist2m
        |  FROM ex JOIN assigned a USING (vec_id)
        |  JOIN ps ON ps.cluster = a.cluster AND ps.pos = ex.pos
        |  GROUP BY 1, 2),
        |dm AS (
        |  SELECT vec_id, cluster, dist2m,
        |    CAST(round(dist2m * 1e6, 0) AS BIGINT) AS _dm
        |  FROM d2),
        |v AS (
        |  SELECT cluster, sum(_dm) AS _dms, count(*) AS n_vecs,
        |    round(sum(_dm) / count(*) / 1e6, 6) AS mean_d2
        |  FROM dm GROUP BY 1)
        |SELECT dm.vec_id, dm.cluster, dm.dist2m, v.mean_d2, v.n_vecs,
        |  (dm._dm * v.n_vecs < v._dms) AS pruned
        |FROM dm JOIN v USING (cluster)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q124_prototype_prune" -> prototypePruneOracleSql,
    "q82_ann_index" -> annLshSql,
    "q90_ann_sq8" -> sq8Sql,
    "q91_sq8_index" -> sq8Sql,
    "q92_ann_pq" -> pqSql,
    "q93_pq_index" -> pqSql,
    "q94_pq_refine" -> pqRefineSql,
    "q179_pq_scaled" -> pqRefineSqlFor(PQ_M_SCALE, PQ_K),
    "q181_ivfpq_residual" -> ivfPqResidualSql,
    "q183_ivfpq_index" -> ivfPqResidualSql,
    "q95_ivfpq" -> ivfPqSql,
    "q112_hard_negatives" ->
      s"""WITH $longFormCte,
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex WHERE vec_id < 8),
        |dst AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2),
        |asg AS (
        |  SELECT vec_id, c_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist2, c_id) AS rn
        |    FROM dst) WHERE rn = 1),
        |dots AS (
        |  SELECT a.vec_id AS p_id, b.vec_id AS c_id, sum(a.v * b.v) AS dot
        |  FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id < 20
        |  JOIN asg pa ON pa.vec_id = a.vec_id
        |  JOIN asg ca ON ca.vec_id = b.vec_id AND pa.cluster != ca.cluster
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
        |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id)
        |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
        |  FROM cos) WHERE rn <= 5""".stripMargin,
    "q148_margin_mining" ->
      s"""WITH $longFormCte,
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |sides AS (SELECT vec_id, label % 2 AS side FROM embeddings),
        |dots AS (
        |  SELECT a.vec_id AS p_id, b.vec_id AS c_id, sum(a.v * b.v) AS dot
        |  FROM ex a JOIN sides sa ON sa.vec_id = a.vec_id AND sa.side = 0
        |    AND a.vec_id < $MM_P
        |  JOIN ex b ON b.pos = a.pos
        |  JOIN sides sb ON sb.vec_id = b.vec_id AND sb.side = 1
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT p_id, c_id,
        |    round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
        |  FROM dots JOIN norms np ON np.vec_id = p_id
        |    JOIN norms nc ON nc.vec_id = c_id),
        |nbhd AS (
        |  SELECT p_id, c_id, cosine,
        |    CAST(round(cosine * 1e6, 0) AS BIGINT) AS cos_u, rn
        |  FROM (
        |    SELECT *, row_number() OVER (PARTITION BY p_id
        |      ORDER BY CAST(round(cosine * 1e6, 0) AS BIGINT) DESC, c_id) AS rn
        |    FROM cos) WHERE rn <= $MM_K),
        |denom AS (
        |  SELECT p_id, sum(cos_u) AS denom_u FROM nbhd
        |  GROUP BY 1 HAVING count(*) = $MM_K)
        |SELECT n.p_id, n.c_id, n.cosine,
        |  round(n.cos_u * $MM_K / d.denom_u, 6) AS margin,
        |  CAST(n.rn AS INT) AS rn
        |FROM nbhd n JOIN denom d ON d.p_id = n.p_id
        |WHERE n.cos_u * $MM_K * $MM_DEN >= $MM_NUM * d.denom_u""".stripMargin,
    "q48_cosine_knn" ->
      s"""WITH $longFormCte,
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS p_id, b.vec_id AS c_id, sum(a.v * b.v) AS dot
        |  FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id < 20 AND a.vec_id != b.vec_id
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
        |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id)
        |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
        |  FROM cos) WHERE rn <= 5""".stripMargin,
    "q56_embedding_neardup" ->
      s"""WITH $longFormCte,
        |${bandSigCte(DUP_BANDS)},
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
        |  FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
        |    AND x.vec_id < y.vec_id),
        |dots AS (
        |  SELECT p_id, c_id, sum(a.v * b.v) AS dot FROM (
        |    SELECT a_id AS p_id, b_id AS c_id FROM cand) q
        |  JOIN ex a ON a.vec_id = p_id JOIN ex b ON b.vec_id = c_id AND b.pos = a.pos
        |  GROUP BY 1, 2)
        |SELECT p_id AS a_id, c_id AS b_id,
        |  round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
        |FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id
        |WHERE round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) >= 0.35""".stripMargin,
    "q49_ann_lsh" -> annLshSql,
    "q67_embedding_dedup" ->
      s"""WITH RECURSIVE $longFormCte,
        |${bandSigCte(DUP_BANDS)},
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
        |  FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
        |    AND x.vec_id < y.vec_id),
        |dots AS (
        |  SELECT p_id, c_id, sum(a.v * b.v) AS dot FROM (
        |    SELECT a_id AS p_id, b_id AS c_id FROM cand) q
        |  JOIN ex a ON a.vec_id = p_id JOIN ex b ON b.vec_id = c_id AND b.pos = a.pos
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT p_id AS a_id, c_id AS b_id
        |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id
        |  WHERE round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) >= 0.35),
        |bi AS (SELECT a_id AS src, b_id AS dst FROM edges
        |       UNION ALL SELECT b_id, a_id FROM edges),
        |reach(id, label) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT bi.src, reach.label FROM reach JOIN bi ON bi.dst = reach.id)
        |SELECT id AS vec_id, min(label) AS canonical_id,
        |  (min(label) = id) AS is_canonical
        |FROM reach GROUP BY 1""".stripMargin,
    "q57_ann_ivf" -> ivfSql,
    "q83_ivf_index" -> ivfSql,
    "q76_crossmodal_dedup" -> {
      val nPlanes = DUP_BANDS * LSH_BITS
      s"""WITH RECURSIVE
        |th AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))::BIGINT AS h
        |  FROM documents),
        |tbits AS (
        |  SELECT doc_id, lang, j, sum(((h // CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1) AS vote
        |  FROM th, generate_series(0, 15) g(j)
        |  GROUP BY doc_id, lang, j),
        |tsim AS (
        |  SELECT doc_id, lang,
        |    CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM tbits GROUP BY doc_id, lang),
        |t_edges AS (
        |  SELECT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM tsim x JOIN tsim y ON x.lang = y.lang AND x.doc_id < y.doc_id
        |  WHERE bit_count(xor(x.simhash, y.simhash)) <= 2),
        |t_bi AS (SELECT a_id AS src, b_id AS dst FROM t_edges
        |         UNION ALL SELECT b_id, a_id FROM t_edges),
        |t_reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT t_bi.src, t_reach.label FROM t_reach JOIN t_bi ON t_bi.dst = t_reach.id),
        |t_clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM t_reach GROUP BY 1),
        |e2 AS (
        |  SELECT vec_id, embedding,
        |    unnest(generate_series(1, len(embedding))) AS pos
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS v FROM e2),
        |planes AS (
        |  SELECT ex.*, p,
        |    ('0x' || substr(md5(p || ':' || pos), 1, 15))::BIGINT / 576460752303423488.0 - 1.0 AS w
        |  FROM ex, generate_series(0, ${nPlanes - 1}) g(p)),
        |sigs AS (
        |  SELECT vec_id, band, CAST(sum(bit) AS BIGINT) AS sig FROM (
        |    SELECT vec_id, p // $LSH_BITS AS band,
        |      CASE WHEN sum(v * w) > 0 THEN CAST(pow(2, p % $LSH_BITS) AS BIGINT) ELSE 0 END AS bit
        |    FROM planes GROUP BY vec_id, p) GROUP BY vec_id, band),
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
        |  FROM sigs x JOIN sigs y ON x.band = y.band AND x.sig = y.sig
        |    AND x.vec_id < y.vec_id),
        |dots AS (
        |  SELECT p_id, c_id, sum(a.v * b.v) AS dot FROM (
        |    SELECT a_id AS p_id, b_id AS c_id FROM cand) q
        |  JOIN ex a ON a.vec_id = p_id JOIN ex b ON b.vec_id = c_id AND b.pos = a.pos
        |  GROUP BY 1, 2),
        |v_edges AS (
        |  SELECT p_id AS a_id, c_id AS b_id
        |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id
        |  WHERE round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) >= 0.35),
        |v_bi AS (SELECT a_id AS src, b_id AS dst FROM v_edges
        |         UNION ALL SELECT b_id, a_id FROM v_edges),
        |v_reach(id, label) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT v_bi.src, v_reach.label FROM v_reach JOIN v_bi ON v_bi.dst = v_reach.id),
        |v_clusters AS (SELECT id AS vec_id, min(label) AS canonical_id FROM v_reach GROUP BY 1)
        |SELECT t.doc_id, t.cluster_id AS text_cluster, v.canonical_id AS vec_cluster,
        |  ((t.cluster_id = t.doc_id) = (v.canonical_id = t.doc_id)) AS agree
        |FROM t_clusters t JOIN v_clusters v ON v.vec_id = t.doc_id""".stripMargin
    },
    // q72's assignment + the q124 micro-mean centroid + q48's cosine
    // shape; per-cluster means in micro units
    "q172_embedding_isotropy" ->
      s"""WITH $longFormCte,
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex
        |  WHERE vec_id < $PRUNE_K),
        |d AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, c_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist2, c_id) AS rn
        |    FROM d) WHERE rn = 1),
        |cent AS (
        |  SELECT pos,
        |    round(sum(CAST(round(v * 1e6, 0) AS BIGINT)) / count(*) / 1e6, 6)
        |      AS cv
        |  FROM ex GROUP BY 1),
        |nm AS (SELECT sum(cv * cv) AS nm2 FROM cent),
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT ex.vec_id, sum(ex.v * c.cv) AS dot
        |  FROM ex JOIN cent c USING (pos) GROUP BY 1),
        |per AS (
        |  SELECT vec_id,
        |    CAST(round(round(dot / (sqrt(nn) * sqrt(nm2)), 6) * 1e6, 0)
        |      AS BIGINT) AS cm,
        |    CAST(round(round(sqrt(nn), 6) * 1e6, 0) AS BIGINT) AS nmv
        |  FROM dots JOIN norms USING (vec_id) CROSS JOIN nm)
        |SELECT cluster, count(*) AS n_vecs,
        |  round(sum(nmv) / count(*) / 1e6, 6) AS mean_norm,
        |  round(sum(cm) / count(*) / 1e6, 6) AS mean_cos
        |FROM per JOIN assigned USING (vec_id)
        |GROUP BY 1""".stripMargin,
    // q72's assignment CTEs + per-class counts + the ratio-form ln; the
    // seeds note and every dial interpolate as usual
    "q163_cluster_labels" ->
      s"""WITH $longFormCte,
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex
        |  WHERE vec_id < $PRUNE_K),
        |d AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id AS doc_id, c_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist2, c_id) AS rn
        |    FROM d) WHERE rn = 1),
        |tf AS (
        |  SELECT cluster, w, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) tk
        |  JOIN assigned USING (doc_id)
        |  GROUP BY 1, 2),
        |ft AS (SELECT w, CAST(sum(tf) AS BIGINT) AS f_t FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS t FROM tf),
        |sc AS (
        |  SELECT cluster, w, tf, f_t,
        |    tf * CAST(round(ln(CAST($PRUNE_K * f_t + t AS DOUBLE)
        |      / CAST($PRUNE_K * f_t AS DOUBLE)) * 1e6, 0) AS BIGINT) AS sm
        |  FROM tf JOIN ft USING (w) CROSS JOIN tot)
        |SELECT cluster, w AS token, tf, f_t, sm / 1e6 AS score,
        |  CAST(rk AS INT) AS rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY cluster
        |    ORDER BY sm DESC, w) AS rk
        |  FROM sc) WHERE rk <= $CTFIDF_TOP""".stripMargin,
    "q72_kmeans_assign" ->
      s"""WITH $longFormCte,
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex WHERE vec_id < 8),
        |d AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2)
        |SELECT vec_id, c_id AS cluster, dist2 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist2, c_id) AS rn
        |  FROM d) WHERE rn = 1""".stripMargin,
    // q72's assignment + the q88 quality score joined doc-to-vec, cluster
    // means in exact micro-units, the 2 lowest-mean clusters pruned
    // the Lloyd rounds unroll mechanically — seeds (the `vec_id < k`
    // contiguous-id shorthand, same note as clusterPruneOracleSql),
    // per-round argmin + micro-unit mean + empty-cluster carry-over, then
    // the final assignment; every dial interpolates
    "q156_lloyd_iterate" -> {
      val rounds = (1 to LLOYD_ROUNDS).map { r =>
        s"""d$r AS (
          |  SELECT ex.vec_id, c.c_id,
          |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS d
          |  FROM ex JOIN c${r - 1} c ON c.pos = ex.pos
          |  GROUP BY 1, 2),
          |a$r AS (SELECT vec_id, c_id FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id
          |      ORDER BY d, c_id) AS rn
          |    FROM d$r) WHERE rn = 1),
          |m$r AS (
          |  SELECT a.c_id, ex.pos,
          |    round(sum(CAST(round(ex.v * 1e6, 0) AS BIGINT))
          |      / count(*) / 1e6, 6) AS v
          |  FROM a$r a JOIN ex ON ex.vec_id = a.vec_id
          |  GROUP BY 1, 2),
          |c$r AS (
          |  SELECT c_id, pos, v FROM m$r
          |  UNION ALL
          |  SELECT c.c_id, c.pos, c.v FROM c${r - 1} c
          |  WHERE c.c_id NOT IN (SELECT c_id FROM m$r))""".stripMargin
      }.mkString(",\n")
      s"""WITH $longFormCte,
        |c0 AS (SELECT vec_id AS c_id, pos, v FROM ex WHERE vec_id < $LLOYD_K),
        |$rounds,
        |df AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS d
        |  FROM ex JOIN c$LLOYD_ROUNDS c ON c.pos = ex.pos
        |  GROUP BY 1, 2)
        |SELECT vec_id, c_id AS cluster, d AS dist2 FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY d, c_id) AS rn
        |  FROM df) WHERE rn = 1""".stripMargin
    },
    "q114_cluster_prune" -> clusterPruneOracleSql,
    // the index path serves the SAME answer from stored centroids +
    // verdicts — one oracle serves both, certifying the round trip
    "q118_cluster_prune_index" -> clusterPruneOracleSql,
    // q72's assignment + a 25-per-cluster quota in md5(vec_id) order; the
    // oracle states the two-phase Spark plan's semantic equivalent (a
    // global winner is necessarily a local winner, so one window suffices)
    "q86_cluster_sample" ->
      s"""WITH $longFormCte,
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex WHERE vec_id < 8),
        |d AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, c_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist2, c_id) AS rn
        |    FROM d) WHERE rn = 1)
        |SELECT vec_id, cluster, CAST(rk AS INT) AS rk FROM (
        |  SELECT vec_id, cluster,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |  FROM assigned) WHERE rk <= 25""".stripMargin,
    // q72's assignment + within-cluster pairwise cosine (q56's rounding
    // and threshold) + earliest-duplicate aggregate — the SemDeDup keep
    // rule stated declaratively
    "q87_semantic_dedup" ->
      s"""WITH $longFormCte,
        |cents AS (SELECT vec_id AS c_id, pos, v FROM ex WHERE vec_id < 8),
        |d AS (
        |  SELECT ex.vec_id, c.c_id,
        |    round(sum((ex.v - c.v) * (ex.v - c.v)), 6) AS dist2
        |  FROM ex JOIN cents c ON c.pos = ex.pos
        |  GROUP BY 1, 2),
        |assigned AS (
        |  SELECT vec_id, c_id AS cluster FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id
        |      ORDER BY dist2, c_id) AS rn
        |    FROM d) WHERE rn = 1),
        |nrm AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM assigned a JOIN assigned b
        |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
        |dots AS (
        |  SELECT a_id, b_id, sum(x.v * y.v) AS dot FROM pairs
        |  JOIN ex x ON x.vec_id = a_id
        |  JOIN ex y ON y.vec_id = b_id AND y.pos = x.pos
        |  GROUP BY 1, 2),
        |dup AS (
        |  SELECT b_id, min(a_id) AS dup_of
        |  FROM dots JOIN nrm na ON na.vec_id = a_id
        |  JOIN nrm nb ON nb.vec_id = b_id
        |  WHERE round(dot / (sqrt(na.nn) * sqrt(nb.nn)), 6) >= 0.35
        |  GROUP BY 1)
        |SELECT s.vec_id, s.cluster, dup.dup_of, dup.dup_of IS NULL AS keep
        |FROM assigned s LEFT JOIN dup ON dup.b_id = s.vec_id""".stripMargin)

  /** Recall@3 floors for the approximate paths, PER SCALE FACTOR — the
    * one table both AnnRecallSpec (fixture sf) and Bench (the sf whose
    * recall the artifact PUBLISHES) enforce, so the number a round
    * records is always a gated number: a codebook/quantizer regression
    * that only shows at bench scale fails the bench, not just a fixture
    * spec it never ran under. Floors sit below the measured values with
    * retune headroom (sf0.1 measured r9: q49 0.82, q57 0.95, q90 0.98,
    * q92 0.17 — the documented coarse tier, q94 0.73, q95 0.77); an
    * unlisted sf takes the query's most permissive recorded floor (the
    * dials are corpus-dependent; a new sf should gate loosely, then get
    * its own row once measured).
    */
  val RecallFloors: Map[String, Map[String, Double]] = Map(
    "q49_ann_lsh"   -> Map("sf0.001" -> 0.6, "sf0.1" -> 0.55),
    "q57_ann_ivf"   -> Map("sf0.001" -> 0.5, "sf0.1" -> 0.6),
    "q90_ann_sq8"   -> Map("sf0.001" -> 0.9, "sf0.1" -> 0.9),
    "q92_ann_pq"    -> Map("sf0.001" -> 0.2, "sf0.1" -> 0.1),
    "q94_pq_refine" -> Map("sf0.001" -> 0.6, "sf0.1" -> 0.5),
    "q95_ivfpq"     -> Map("sf0.001" -> 0.5, "sf0.1" -> 0.5),
    // the corpus-scale resolution dial: measured 1.000 at both fixture
    // sfs (128-bit codes are near-exact at fixture occupancy; the floor
    // the dial exists for is the 5M-occupancy one — SCALE.md r16 ladder)
    "q179_pq_scaled" -> Map("sf0.001" -> 0.9, "sf0.1" -> 0.9),
    // residual-domain IVF-PQ: measured 0.917/0.833 at the fixture dials
    // (the ceiling is the 16-list/4-probe IVF stage, same as q95's);
    // q183 is the same computation served from the materialized index
    "q181_ivfpq_residual" -> Map("sf0.001" -> 0.8, "sf0.1" -> 0.7),
    "q183_ivfpq_index" -> Map("sf0.001" -> 0.8, "sf0.1" -> 0.7))

  /** The floor for `query` at the sf named by `sfDir`'s basename. */
  def recallFloor(query: String, sfDir: String): Double = {
    val bySf = RecallFloors.getOrElse(query, Map.empty)
    if (bySf.isEmpty) 0.0
    else bySf.getOrElse(new java.io.File(sfDir).getName, bySf.values.min)
  }
}
