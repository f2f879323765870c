package graft.functions.expressions

import graft.functions.PortableHash
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup signature kernels — the
  * per-row hot path of every near-dup operator (q46/q47/q49/q56/q58/q66/
  * q67/q76/q79). They replace the ScalaUDF kernels, which paid a
  * catalyst-array → boxed `Seq` conversion per row before the kernel
  * could run; these read `ArrayData`/`UTF8String` straight from Tungsten
  * and emit one static call inside whole-stage codegen, so the signature
  * pass never leaves generated code. The hash family is byte-identical to
  * the UDFs and the DuckDB oracle (PortableHash md5-60, k-prefixed), so
  * every hash-matched query stays hash-matched.
  */
object SignatureExprs {

  /** Bits per LSH band — buckets per band = 2^LSH_BITS, the occupancy
    * dial. Owned here because the codegen'd kernel bakes it into the
    * generated call; `Similarity.LSH_BITS` aliases it (single source).
    */
  val LSH_BITS = 12

  /** Register all signature functions on a session — idempotent. */
  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark,
      "simhash16" -> (exprs => SimhashExpr(exprs.head)),
      "simhash_bits" -> (exprs => SimhashBitsExpr(exprs(0), exprs(1))),
      "minhash16" -> (exprs => MinhashSigExpr(exprs.head)),
      "minhash_k" -> (exprs => MinhashKExpr(exprs(0), exprs(1))),
      "lsh_band_sigs" -> lshBandSigsBuilder,
      "winnow_fps" -> (exprs => WinnowFpsExpr(exprs.head)),
      "sig_match16" -> (exprs => SigMatchExpr(exprs(0), exprs(1))))

  /** THE lsh_band_sigs arity dispatch — shared by [[register]] and
    * `GraftExtensions` so the temp-function and SQL-extension paths can
    * never diverge: the 2-arg form bakes the LSH_BITS dial, the 3-arg
    * form makes bits per band a caller dial (bucket count 2^bits is the
    * occupancy lever).
    */
  val lshBandSigsBuilder: Seq[Expression] => Expression = {
    case Seq(e, b)    => LshBandSigsExpr(e, b)
    case Seq(e, b, w) => LshBandSigsBitsExpr(e, b, w)
    case exprs => throw new IllegalArgumentException(
      s"lsh_band_sigs expects 2 or 3 arguments, got ${exprs.length}")
  }

  /** Total hyperplane budget (nBands × bitsPerBand): the planes matrix is
    * cached per executor and each row allocates an nBands-slot signature,
    * so an absurd literal must fail ANALYSIS, not OOM a task. 2^16 planes
    * is far past any sane banding (production dials run tens of bands ×
    * tens of bits).
    */
  val LSH_MAX_PLANES = 65536

  /** Shared analysis-time check for a foldable positive int dial. */
  private[expressions] def foldableDial(e: Expression): Option[Int] =
    if (e.dataType == IntegerType && e.foldable)
      e.eval() match {
        case n: Int => Some(n)
        case _      => None
      }
    else None

  /** Winnowing dials (q78): gram length and window size in CODEPOINTS —
    * any shared substring of ≥ WINNOW_GRAM + WINNOW_WINDOW − 1 chars
    * selects at least one common fingerprint.
    */
  val WINNOW_GRAM = 20
  val WINNOW_WINDOW = 10

  /** Distinct winnowing fingerprints of a text: every WINNOW_GRAM-codepoint
    * gram is hashed, each WINNOW_WINDOW-gram window keeps its minimum.
    * CODEPOINT indexing, not UTF-16 units: DuckDB's substr/length count
    * codepoints, and astral chars would misalign gram boundaries (and
    * split surrogates) under String.substring.
    */
  def winnowFps(text: UTF8String): ArrayData = {
    val cp = text.toString.codePoints().toArray
    val a = WINNOW_GRAM
    val w = WINNOW_WINDOW
    if (cp.length < a + w - 1) new GenericArrayData(Array.emptyLongArray)
    else {
      val hs = Array.tabulate(cp.length - a + 1)(i =>
        PortableHash.md5Int60(new String(cp, i, a)))
      val out = new scala.collection.mutable.ArrayBuffer[Long]()
      val seen = new scala.collection.mutable.HashSet[Long]()
      var j = 0
      while (j <= hs.length - w) {
        var m = Long.MaxValue
        var k = j
        while (k < j + w) { if (hs(k) < m) m = hs(k); k += 1 }
        if (seen.add(m)) out += m
        j += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  private[expressions] def isStringArr(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  /** Maximum simhash width: the portable md5 hash yields 60 usable bits.
    * 16 is the reference/oracle dial (q47); a 100 TB corpus runs 48-60 —
    * at N >> 2^bits random hashes collide constantly and the pigeonhole
    * band buckets go quadratic, so bit width is THE simhash scale dial.
    */
  val SIMHASH_MAX_BITS = 60

  /** Token-vote SimHash at `nBits` width — one pass over the token array
    * with multiplicity (the oracle's `unnest`): bit j's vote is Σ ±1 by
    * token hash bit j. Null elements are skipped (internal callers never
    * produce them, but the function is registered for ad-hoc SQL where
    * `array('a', NULL)` is legal input and must not NPE).
    */
  def simhashBits(arr: ArrayData, nBits: Int): Long = {
    val votes = new Array[Int](nBits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = PortableHash.md5Int60(EmptyPrefix, arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < nBits) { votes(j) += (((h >> j) & 1L) * 2 - 1).toInt; j += 1 }
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < nBits) { if (votes(j) > 0) v |= (1L << j); j += 1 }
    v
  }

  /** The 16-bit reference dial (q47's oracle twin). */
  def simhash16(arr: ArrayData): Long = simhashBits(arr, 16)

  /** Fraction of agreeing slots between two equal-length signatures —
    * THE minhash similarity estimator (matching slots / signature length),
    * shared by q46's verify, q79's incremental verify, and the
    * band-index path so the estimator can never drift between them.
    * Length mismatch is a kernel-contract violation (signatures all come
    * from minhash16) and raises rather than silently truncating. For
    * ad-hoc SQL robustness (the registered function accepts any
    * array<bigint>): a NULL slot never matches (ArrayData.getLong would
    * read it as a phantom 0 and two nulls would count as agreement), and
    * two empty arrays score 0.0 rather than NaN.
    */
  def sigMatch(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"sig_match16: signature lengths differ (${n} vs ${b.numElements()})")
    if (n == 0) return 0.0
    var same = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) same += 1
      i += 1
    }
    same.toDouble / n
  }

  private val EmptyPrefix = Array.emptyByteArray

  /** Maximum minhash signature length. 16 is the reference/oracle dial
    * (q46/q79/q81); the estimator's std-dev is √(J(1−J)/k), so a
    * production near-dup pass runs 64-256 permutations for a usable
    * similarity resolution. Bounded so a bad literal cannot allocate
    * absurd per-row state.
    */
  val MINHASH_MAX_K = 256

  // "0:" … — the slot-prefix bytes of the minhash hash family, built once
  // per slot index and shared by every width (slot k's hash is identical
  // at every signature length, so a k-wide signature is a PREFIX of a
  // wider one — estimators at different widths stay comparable)
  private val KPrefixes: Array[Array[Byte]] =
    Array.tabulate(MINHASH_MAX_K)(k => s"$k:".getBytes("UTF-8"))

  /** k-slot MinHash signature — min over the shingle set per slot-prefixed
    * hash; empty input yields all-Long.MaxValue (same as the UDF). Null
    * elements are skipped, matching how the expression null-propagates a
    * null ARRAY — ad-hoc SQL can pass `array('a', NULL)`.
    */
  def minhashK(arr: ArrayData, slots: Int): ArrayData = {
    val mh = Array.fill(slots)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < slots) {
          val h = PortableHash.md5Int60(KPrefixes(k), b)
          if (h < mh(k)) mh(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mh)
  }

  /** The 16-slot reference dial (q46/q79/q81's oracle twin). */
  def minhash16(arr: ArrayData): ArrayData = minhashK(arr, 16)

  /** Per-band hyperplane LSH signatures over a float embedding — all
    * bands×LSH_BITS plane dots in one kernel pass, band b's bits packed
    * into slot b. Planes are the md5-derived cached family.
    */
  def lshBandSigs(arr: ArrayData, nBands: Int, bitsPerBand: Int): ArrayData = {
    val e = arr.toFloatArray()
    val nPlanes = nBands * bitsPerBand
    val planes = PortableHash.lshPlanes(nPlanes, e.length)
    val sigs = new Array[Long](nBands)
    var p = 0
    while (p < nPlanes) {
      val w = planes(p)
      var dot = 0.0
      var i = 0
      while (i < e.length) { dot += e(i).toDouble * w(i); i += 1 }
      if (dot > 0) sigs(p / bitsPerBand) |= (1L << (p % bitsPerBand))
      p += 1
    }
    new GenericArrayData(sigs)
  }
}

case class WinnowFpsExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects string, got ${child.dataType}")

  override protected def nullSafeEval(a: Any): Any =
    SignatureExprs.winnowFps(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.winnowFps($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `simhash_bits(tokens, nBits)` — token-vote SimHash at a caller-chosen
  * width (1..[[SignatureExprs.SIMHASH_MAX_BITS]]); nBits must be a
  * foldable int literal (a deployment dial, never data-derived).
  */
case class SimhashBitsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "simhash_bits"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (SignatureExprs.isStringArr(left.dataType) &&
        right.dataType == IntegerType && right.foldable)
      right.eval() match {
        case n: Int if n >= 1 && n <= SignatureExprs.SIMHASH_MAX_BITS =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"simhash_bits expects 1..${SignatureExprs.SIMHASH_MAX_BITS} bits, got $other")
      }
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_bits expects (array<string>, int literal), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SignatureExprs.simhashBits(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.simhashBits($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash16"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (SignatureExprs.isStringArr(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string>, got ${child.dataType}")

  override protected def nullSafeEval(a: Any): Any =
    SignatureExprs.simhash16(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.simhash16($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `minhash_k(shingles, k)` — MinHash signature at a caller-chosen
  * permutation count (1..[[SignatureExprs.MINHASH_MAX_K]]); k must be a
  * foldable int literal. Slot hashes are width-independent, so a k-wide
  * signature is a prefix of any wider one.
  */
case class MinhashKExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "minhash_k"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SignatureExprs.isStringArr(left.dataType) &&
        right.dataType == IntegerType && right.foldable)
      right.eval() match {
        case n: Int if n >= 1 && n <= SignatureExprs.MINHASH_MAX_K =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"minhash_k expects 1..${SignatureExprs.MINHASH_MAX_K} slots, got $other")
      }
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_k expects (array<string>, int literal), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SignatureExprs.minhashK(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.minhashK($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

case class MinhashSigExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "minhash16"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (SignatureExprs.isStringArr(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash16 expects array<string>, got ${child.dataType}")

  override protected def nullSafeEval(a: Any): Any =
    SignatureExprs.minhash16(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.minhash16($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `sig_match16(sig_a, sig_b)` — fraction of agreeing slots between two
  * minhash16 signatures: the similarity estimator of every banded-LSH
  * verify stage (q46/q79/band index), as one codegen'd kernel instead of
  * per-call ScalaUDF closures with boxed Seq conversions.
  */
case class SigMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "sig_match16"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sig_match16 expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SignatureExprs.sigMatch(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.sigMatch($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** `lsh_band_sigs(embedding, nBands, bitsPerBand)` — the 3-arg form with
  * bits per band as an explicit caller dial (bucket count 2^bits is the
  * occupancy lever a deployment turns as the corpus grows; ≤ 62 so the
  * packed band signature stays a positive long). Both dial args must be
  * positive foldable int literals.
  */
case class LshBandSigsBitsExpr(first: Expression, second: Expression,
                               third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def prettyName: String = "lsh_band_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType, _) =>
      (SignatureExprs.foldableDial(second), SignatureExprs.foldableDial(third)) match {
        case (Some(n), Some(w)) if n > 0 && w > 0 && w <= 62 &&
            n.toLong * w <= SignatureExprs.LSH_MAX_PLANES =>
          TypeCheckResult.TypeCheckSuccess
        case (Some(n), Some(w)) => TypeCheckResult.TypeCheckFailure(
          s"lsh_band_sigs expects positive band count, 1..62 bits per band, and " +
            s"bands*bits <= ${SignatureExprs.LSH_MAX_PLANES} planes, got ($n, $w)")
        case _ => TypeCheckResult.TypeCheckFailure(
          s"lsh_band_sigs expects (array<float>, int literal, int literal), got " +
            s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_sigs expects (array<float>, int literal, int literal), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    SignatureExprs.lshBandSigs(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.lshBandSigs($a, $b, $c);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `lsh_band_sigs(embedding, nBands)` — nBands must be a POSITIVE foldable
  * int literal (it sizes the output array — validated here so a bad
  * literal fails analysis with a readable message, not a
  * NegativeArraySizeException at runtime); LSH_BITS rides from the
  * Similarity dial at construction time via the registry closure.
  */
case class LshBandSigsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "lsh_band_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(FloatType, _) =>
      SignatureExprs.foldableDial(right) match {
        case Some(n) if n > 0 &&
            n.toLong * SignatureExprs.LSH_BITS <= SignatureExprs.LSH_MAX_PLANES =>
          TypeCheckResult.TypeCheckSuccess
        case Some(n) => TypeCheckResult.TypeCheckFailure(
          s"lsh_band_sigs expects a positive band count with bands*${SignatureExprs.LSH_BITS}" +
            s" <= ${SignatureExprs.LSH_MAX_PLANES} planes, got $n")
        case None => TypeCheckResult.TypeCheckFailure(
          s"lsh_band_sigs expects (array<float>, int literal), got " +
            s"(${left.dataType}, ${right.dataType})")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_sigs expects (array<float>, int literal), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  private def bits = SignatureExprs.LSH_BITS

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SignatureExprs.lshBandSigs(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SignatureExprs.lshBandSigs($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}
