package graft.functions

/** Symbolic Aggregate approXimation (`lcc/stars_processing/utilities/sax.py`)
  * and the word-comparison logic of
  * (`lcc/stars_processing/utilities/symbolic_representation.py`), as pure
  * Scala. Stateless: the reference's mutable `scaling_factor` attribute is
  * modeled by returning the factor alongside the word and letting callers
  * apply the reference's "factor of the last word built" rule explicitly.
  */
object Sax {

  val MinAlphabet = 3
  val MaxAlphabet = 20
  val MaxSlideIter = 500 // curves_shape_descr.py:42

  /** Gaussian breakpoints per alphabet size (`sax.py:203-233`). */
  val breakpoints: Map[Int, Array[Double]] = Map(
    3 -> Array(-0.43, 0.43),
    4 -> Array(-0.67, 0, 0.67),
    5 -> Array(-0.84, -0.25, 0.25, 0.84),
    6 -> Array(-0.97, -0.43, 0, 0.43, 0.97),
    7 -> Array(-1.07, -0.57, -0.18, 0.18, 0.57, 1.07),
    8 -> Array(-1.15, -0.67, -0.32, 0, 0.32, 0.67, 1.15),
    9 -> Array(-1.22, -0.76, -0.43, -0.14, 0.14, 0.43, 0.76, 1.22),
    10 -> Array(-1.28, -0.84, -0.52, -0.25, 0, 0.25, 0.52, 0.84, 1.28),
    11 -> Array(-1.34, -0.91, -0.6, -0.35, -0.11, 0.11, 0.35, 0.6, 0.91, 1.34),
    12 -> Array(-1.38, -0.97, -0.67, -0.43, -0.21, 0, 0.21, 0.43, 0.67, 0.97, 1.38),
    13 -> Array(-1.43, -1.02, -0.74, -0.5, -0.29, -0.1, 0.1, 0.29, 0.5, 0.74, 1.02, 1.43),
    14 -> Array(-1.47, -1.07, -0.79, -0.57, -0.37, -0.18, 0, 0.18, 0.37, 0.57, 0.79, 1.07, 1.47),
    15 -> Array(-1.5, -1.11, -0.84, -0.62, -0.43, -0.25, -0.08, 0.08, 0.25, 0.43, 0.62, 0.84, 1.11, 1.5),
    16 -> Array(-1.53, -1.15, -0.89, -0.67, -0.49, -0.32, -0.16, 0, 0.16, 0.32, 0.49, 0.67, 0.89, 1.15, 1.53),
    17 -> Array(-1.56, -1.19, -0.93, -0.72, -0.54, -0.38, -0.22, -0.07, 0.07, 0.22, 0.38, 0.54, 0.72, 0.93, 1.19, 1.56),
    18 -> Array(-1.59, -1.22, -0.97, -0.76, -0.59, -0.43, -0.28, -0.14, 0, 0.14, 0.28, 0.43, 0.59, 0.76, 0.97, 1.22, 1.59),
    19 -> Array(-1.62, -1.25, -1, -0.8, -0.63, -0.48, -0.34, -0.2, -0.07, 0.07, 0.2, 0.34, 0.48, 0.63, 0.8, 1, 1.25, 1.62),
    20 -> Array(-1.64, -1.28, -1.04, -0.84, -0.67, -0.52, -0.39, -0.25, -0.13, 0, 0.13, 0.25, 0.39, 0.52, 0.67, 0.84, 1.04, 1.28, 1.64))

  /** A SAX word plus the scaling factor `√(n/word_size)` captured when the
    * word was built (`sax.py:59-78` mutates this on every `to_letter_rep`).
    */
  final case class Word(word: String, scalingFactor: Double)

  /** `to_letter_rep` (`sax.py:59-78`): z-normalize, PAA to `wordSize`,
    * alphabetize against the Gaussian breakpoints.
    */
  def toLetterRep(x: Array[Double], wordSize: Int, alphabetSize: Int): Word = {
    val paaX = Kernels.paa(Kernels.normalize(x), wordSize)
    Word(alphabetize(paaX, alphabetSize), math.sqrt(x.length.toDouble / wordSize))
  }

  /** `alphabetize` (`sax.py:80-105`): first breakpoint greater than the value
    * picks the letter; NaN (never `<`) falls through to the last letter.
    */
  def alphabetize(paaX: Array[Double], alphabetSize: Int): String = {
    val beta = breakpoints(alphabetSize)
    val sb = new StringBuilder(paaX.length)
    var i = 0
    while (i < paaX.length) {
      var j = 0
      var found = false
      while (!found && j < beta.length) {
        if (paaX(i) < beta(j)) {
          sb += ('a' + j).toChar
          found = true
        }
        j += 1
      }
      if (!found) sb += ('a' + beta.length).toChar
      i += 1
    }
    sb.result()
  }

  /** Letter distance (`sax.py:152-174`): adjacent letters are distance 0,
    * otherwise `beta[max-1] - beta[min]`.
    */
  def letterDist(la: Char, lb: Char, alphabetSize: Int): Double = {
    val beta = breakpoints(alphabetSize)
    val i = la - 'a'
    val j = lb - 'a'
    if (math.abs(i - j) <= 1) 0.0
    else beta(math.max(i, j) - 1) - beta(math.min(i, j))
  }

  /** MINDIST (`sax.py:107-150`): √(Σ letterDist²) × scalingFactor. */
  def minDist(a: String, b: String, alphabetSize: Int, scalingFactor: Double): Double = {
    require(a.length == b.length, "StringsAreDifferentLength")
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = letterDist(a(i), b(i), alphabetSize)
      s += d * d
      i += 1
    }
    scalingFactor * math.sqrt(s)
  }

  /** Shifted-alignment dissimilarity (`symbolic_representation.py:64-94`):
    * shift the shorter word through the longer, score each alignment with
    * MINDIST using `scalingFactor`, return the minimum; a falsy `slide`
    * stops after the first alignment.
    */
  def dissimilarityShift(inspected: String, filterWord: String,
                         alphabetSize: Int, scalingFactor: Double,
                         slide: Boolean): Double = {
    val (a, b) = if (filterWord.length < inspected.length) (filterWord, inspected)
                 else (inspected, filterWord)
    var best = 1e9
    var shift = 0
    var continue = true
    while (continue && a.length + shift <= b.length) {
      val score = minDist(b.substring(shift, shift + a.length), a, alphabetSize, scalingFactor)
      if (score < best) best = score
      shift += 1
      if (!slide) continue = false
    }
    best
  }

  /** Sliding-window comparison of two unequal-word-size curves
    * (`curves_shape_descr.py:95-150` + `symbolic_representation.py:29-62`).
    *
    * `magsA`/`wordSizeA` belong to the star passed first in the reference's
    * `getWords(star1=comp_star, star2=star)` call. Windows of the
    * longer-word-size star's RAW curve are re-encoded at the shorter word
    * size; the score is the min MINDIST over windows, scaled by the factor of
    * the LAST word built (the shorter star's word — reference statefulness).
    */
  def dissimilaritySlide(magsA: Array[Double], wordSizeA: Int,
                         magsB: Array[Double], wordSizeB: Int,
                         alphabetSize: Int, slide: Double): Double = {
    if (wordSizeA == wordSizeB) {
      // equal word sizes: single aligned compare; last word built is B's
      val wa = toLetterRep(magsA, wordSizeA, alphabetSize)
      val wb = toLetterRep(magsB, wordSizeB, alphabetSize)
      minDist(wa.word, wb.word, alphabetSize, wb.scalingFactor)
    } else {
      val (longMags, longWs, shortMags, shortWs) =
        if (wordSizeA >= wordSizeB) (magsA, wordSizeA, magsB, wordSizeB)
        else (magsB, wordSizeB, magsA, wordSizeA)
      // a sub-unit window (sparse curve over a huge time span) would slice
      // zero points per window — clamp to one so every window carries data
      val windowSize = math.max(1.0, longMags.length * shortWs / longWs.toDouble)
      val overlay = slide * windowSize
      val words = new scala.collection.mutable.ArrayBuffer[String]()
      var fromI = 0
      var i = 0
      var stop = false
      while (i < MaxSlideIter && !stop) {
        val toI = (fromI + windowSize).toInt
        if (toI > longMags.length) stop = true
        else {
          words += toLetterRep(longMags.slice(fromI, toI), shortWs, alphabetSize).word
          fromI += (windowSize - overlay).toInt
          i += 1
        }
      }
      val shortWord = toLetterRep(shortMags, shortWs, alphabetSize)
      var best = 1e9
      words.foreach { w =>
        val score = minDist(w, shortWord.word, alphabetSize, shortWord.scalingFactor)
        if (score < best) best = score
      }
      best
    }
  }
}
