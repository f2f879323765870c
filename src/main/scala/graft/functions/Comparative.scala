package graft.functions

/** Comparative-descriptor math (`lcc/stars_processing/utilities/compare.py` +
  * the three SAX descriptors): dissimilarity of one inspected star against
  * each template star, aggregated by `meth` (closest = min, average = mean,
  * bestN = mean of the N smallest).
  *
  * Pure per-pair / per-star functions: in the Spark plan these run inside a
  * broadcast nested-loop cross join (templates are 1–50 stars, always
  * broadcastable) followed by a groupBy(starId) aggregation — no large-side
  * shuffle of the inspected stars is required beyond the aggregation itself,
  * and template words are precomputed once and broadcast.
  */
object Comparative {

  /** `ComparativeBase.getFeatures` aggregation (`compare.py:39-86`). */
  def aggregate(coords: Array[Double], meth: String): Double = {
    require(coords.nonEmpty, "no comparative coordinates")
    meth match {
      case "closest" => coords.min
      case "average" => coords.sum / coords.length
      case m if m.startsWith("best") =>
        val spec = m.substring(4)
        val n: Int =
          try spec.toInt
          catch {
            case _: NumberFormatException =>
              try (coords.length * spec.toDouble).toInt
              catch { case _: NumberFormatException => 1 }
          }
        val best = coords.sorted.take(n)
        best.sum / best.length
      case other => throw new IllegalArgumentException(
        s"Unresolved coordinates calculation method $other")
    }
  }

  /** `CurvesShapeDescr` pairwise dissimilarity (`curves_shape_descr.py:79-150`
    * + `symbolic_representation.py:15-45`). `slide=Some(f)` triggers the
    * sliding-window path (the class defines `getWords`); `None` falls back to
    * the single-alignment compare with the comp star's scaling factor.
    */
  def curvesShapePair(starTime: Array[Double], starMag: Array[Double],
                      compTime: Array[Double], compMag: Array[Double],
                      daysPerBin: Double, alphabetSize: Int,
                      slide: Option[Double]): Double = {
    val wsStar = Kernels.computeBins(starTime, daysPerBin)
    val wsComp = Kernels.computeBins(compTime, daysPerBin)
    slide match {
      case Some(f) =>
        // getWords(star1=comp, star2=star) ordering
        Sax.dissimilaritySlide(compMag, wsComp, starMag, wsStar, alphabetSize, f)
      case None =>
        val wi = Sax.toLetterRep(starMag, wsStar, alphabetSize)
        val wc = Sax.toLetterRep(compMag, wsComp, alphabetSize)
        Sax.dissimilarityShift(wi.word, wc.word, alphabetSize, wc.scalingFactor, slide = false)
    }
  }

  /** `HistShapeDescr` pairwise dissimilarity (`hist_shape_descr.py:77-87`):
    * words over the z-scored histogram counts; single-alignment compare.
    */
  def histShapePair(starTime: Array[Double], starMag: Array[Double],
                    compTime: Array[Double], compMag: Array[Double],
                    bins: Int, alphabetSize: Int, slide: Boolean = false): Double = {
    val hi = Kernels.histogram(starTime, starMag, bins)._1
    val hc = Kernels.histogram(compTime, compMag, bins)._1
    val wi = Sax.toLetterRep(hi, bins, alphabetSize)
    val wc = Sax.toLetterRep(hc, bins, alphabetSize)
    Sax.dissimilarityShift(wi.word, wc.word, alphabetSize, wc.scalingFactor, slide)
  }

  /** `VariogramShapeDescr` pairwise dissimilarity
    * (`variogram_shape_descr.py:74-84`): words over the log10 variogram.
    */
  def varioShapePair(starTime: Array[Double], starMag: Array[Double],
                     compTime: Array[Double], compMag: Array[Double],
                     bins: Int, alphabetSize: Int, slide: Boolean = false): Double = {
    val vi = Kernels.variogram(starTime, starMag, bins)._2
    val vc = Kernels.variogram(compTime, compMag, bins)._2
    val wi = Sax.toLetterRep(vi, bins, alphabetSize)
    val wc = Sax.toLetterRep(vc, bins, alphabetSize)
    Sax.dissimilarityShift(wi.word, wc.word, alphabetSize, wc.scalingFactor, slide)
  }

  /** Full per-star feature: pairwise dissimilarity vs every template, then
    * [[aggregate]]. `pair` is one of the three *Pair functions partially
    * applied to its params.
    */
  def feature(starTime: Array[Double], starMag: Array[Double],
              templates: Seq[(Array[Double], Array[Double])],
              meth: String)(
              pair: (Array[Double], Array[Double], Array[Double], Array[Double]) => Double): Double = {
    val coords = templates.map { case (ct, cm) => pair(starTime, starMag, ct, cm) }
    aggregate(coords.toArray, meth)
  }
}
