package graft.sources

import graft.model.{Coordinates, LightCurveData, Star}

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Minimal FITS reader for the reference's star interchange format
  * (FIXTURES.md §1; written by `file_manager.py:350-404`, read by
  * `file_manager.py:255-348`): a header-only primary HDU carrying
  * ident/coo/class/`more` keywords, then one BINTABLE extension per light
  * curve with float32 (TFORM 'E') Time/Magnitudes/error columns.
  *
  * Pure byte-array parser — invoked per file from the `binaryFile` data
  * source, so reading N files is N parallel tasks with no driver
  * involvement.
  */
object Fits {

  private val BlockSize = 2880
  private val CardSize = 80

  final case class Hdu(header: LinkedHashMap[String, String], data: Array[Byte])

  private def parseHeaderValue(raw: String): String = {
    val v = raw.trim
    if (v.startsWith("'")) {
      val end = v.indexOf('\'', 1)
      if (end > 0) v.substring(1, end).trim else v
    } else {
      // strip trailing comment
      val slash = v.indexOf('/')
      (if (slash >= 0) v.substring(0, slash) else v).trim
    }
  }

  /** Split a FITS byte stream into HDUs (header map + raw data). */
  def readHdus(bytes: Array[Byte]): Seq[Hdu] = {
    val hdus = ArrayBuffer[Hdu]()
    var off = 0
    while (off + BlockSize <= bytes.length) {
      val header = LinkedHashMap[String, String]()
      var ended = false
      val headerStart = off
      while (!ended && off + BlockSize <= bytes.length) {
        var c = 0
        while (c < BlockSize / CardSize) {
          val card = new String(bytes, off + c * CardSize, CardSize, "US-ASCII")
          val key = card.substring(0, math.min(8, card.length)).trim
          if (key == "END") ended = true
          else if (key.nonEmpty && card.length > 10 && card.charAt(8) == '=') {
            header(key) = parseHeaderValue(card.substring(10))
          } else if (key == "HIERARCH") {
            // ESO HIERARCH convention: "HIERARCH name = 'value'"
            val rest = card.substring(8)
            val eq = rest.indexOf('=')
            if (eq > 0) header(rest.substring(0, eq).trim) = parseHeaderValue(rest.substring(eq + 1))
          }
          c += 1
        }
        off += BlockSize
      }
      if (header.isEmpty && !ended) {
        off = bytes.length // trailing padding
      } else {
        val dataBytes = dataSize(header)
        val padded = ((dataBytes + BlockSize - 1) / BlockSize) * BlockSize
        val data = bytes.slice(off, off + dataBytes)
        off += padded
        hdus += Hdu(header, data)
        if (headerStart == off && dataBytes == 0 && header.isEmpty) off = bytes.length
      }
    }
    hdus.toSeq
  }

  private def dataSize(h: LinkedHashMap[String, String]): Int = {
    val naxis = h.getOrElse("NAXIS", "0").toInt
    if (naxis == 0) 0
    else {
      val dims = (1 to naxis).map(i => h.getOrElse(s"NAXIS$i", "0").toLong)
      val bitpix = math.abs(h.getOrElse("BITPIX", "8").toInt)
      val groups = dims.product
      ((bitpix / 8) * groups).toInt
    }
  }

  /** Decode one BINTABLE HDU with float32 columns into a light curve
    * (2-column tables get err = 0, `file_manager.py:325-327`).
    */
  def readLightCurve(hdu: Hdu): Option[LightCurveData] = {
    val h = hdu.header
    if (!h.get("XTENSION").exists(_.startsWith("BINTABLE"))) return None
    val rowBytes = h("NAXIS1").toInt
    val rows = h("NAXIS2").toInt
    val nFields = h.getOrElse("TFIELDS", "0").toInt
    if (nFields < 2 || rows == 0) return None
    val buf = java.nio.ByteBuffer.wrap(hdu.data) // FITS is big-endian (default)
    val time = new Array[Double](rows)
    val mag = new Array[Double](rows)
    val err = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      val base = r * rowBytes
      time(r) = buf.getFloat(base).toDouble
      mag(r) = buf.getFloat(base + 4).toDouble
      err(r) = if (nFields >= 3) buf.getFloat(base + 8).toDouble else 0.0
      r += 1
    }
    val meta = Map(
      "color" -> h.getOrElse("FILTER", "N/A"),
      "origin" -> h.getOrElse("DB_ORIGIN", ""))
    Some(LightCurveData(time, mag, err, meta))
  }

  // ---------- writer (`writeToFITS`, file_manager.py:350-404) ----------

  private def card(key: String, value: String, quote: Boolean): String = {
    val prefix =
      if (key.length <= 8) f"${key}%-8s= "
      else s"HIERARCH $key = " // ESO long-keyword convention
    // A card is exactly 80 chars: clamp the VALUE so a quoted string keeps
    // its closing quote (a blind substring would corrupt it on read-back).
    // Deviation: over-long values truncate cleanly instead of using the
    // CONTINUE long-string convention.
    val room = CardSize - prefix.length - (if (quote) 2 else 0)
    val clamped = if (value.length > room) value.substring(0, room.max(0)) else value
    val v = if (quote) s"'$clamped'" else clamped
    (prefix + v).padTo(CardSize, ' ').substring(0, CardSize)
  }

  private def pad(bytes: Array[Byte]): Array[Byte] = {
    val padded = ((bytes.length + BlockSize - 1) / BlockSize) * BlockSize
    java.util.Arrays.copyOf(bytes, padded)
  }

  private def headerBlock(cards: Seq[String]): Array[Byte] = {
    val all = (cards :+ "END".padTo(CardSize, ' ')).mkString
    val b = all.getBytes("US-ASCII")
    // header padding is spaces, not NULs
    val padded = ((b.length + BlockSize - 1) / BlockSize) * BlockSize
    val out = Array.fill[Byte](padded)(' '.toByte)
    System.arraycopy(b, 0, out, 0, b.length)
    out
  }

  /** Serialize a Star to the reference's multi-HDU FITS layout: header-only
    * primary HDU with identity keywords, one float32 BINTABLE per light
    * curve. Byte-level format matches what [[readStar]] parses.
    */
  def writeStar(star: graft.model.Star): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val primary = ArrayBuffer(
      card("SIMPLE", "T", quote = false),
      card("BITPIX", "8", quote = false),
      card("NAXIS", "0", quote = false),
      card("EXTEND", "T", quote = false),
      card("IDENT", star.starId, quote = true))
    star.coo.foreach { c =>
      primary += card("RA", c.ra.toString, quote = false)
      primary += card("DEC", c.dec.toString, quote = false)
      primary += card("RA_UN", "deg", quote = true)
      primary += card("DEC_UN", "deg", quote = true)
    }
    star.starClass.foreach(c => primary += card("CLASS", c, quote = true))
    star.identNames.foreach { case (db, n) =>
      primary += card(s"${db}_name", n, quote = true)
    }
    star.identIds.foreach { case (k, v) =>
      val Array(db, key) = k.split(":", 2)
      primary += card(s"${db}_id_$key", v, quote = true)
    }
    star.more.foreach { case (k, v) => primary += card(k.toUpperCase, v, quote = true) }
    out.write(headerBlock(primary.toSeq))

    star.lightCurves.foreach { lc =>
      val n = lc.time.length
      val header = Seq(
        card("XTENSION", "BINTABLE", quote = true),
        card("BITPIX", "8", quote = false),
        card("NAXIS", "2", quote = false),
        card("NAXIS1", "12", quote = false),
        card("NAXIS2", n.toString, quote = false),
        card("PCOUNT", "0", quote = false),
        card("GCOUNT", "1", quote = false),
        card("TFIELDS", "3", quote = false),
        card("TTYPE1", "Time", quote = true),
        card("TFORM1", "E", quote = true),
        card("TUNIT1", "days", quote = true),
        card("TTYPE2", "Magnitudes", quote = true),
        card("TFORM2", "E", quote = true),
        card("TUNIT2", "mag", quote = true),
        card("TTYPE3", "error", quote = true),
        card("TFORM3", "E", quote = true),
        card("TUNIT3", "mag", quote = true),
        card("FILTER", lc.meta.getOrElse("color", "N/A"), quote = true),
        // readLightCurve sources `origin` from DB_ORIGIN — emit it so a
        // write→read round-trip keeps the curve's provenance
        card("DB_ORIGIN", lc.meta.getOrElse("origin", ""), quote = true))
      out.write(headerBlock(header))
      val data = java.nio.ByteBuffer.allocate(n * 12) // big-endian default
      var i = 0
      while (i < n) {
        data.putFloat(lc.time(i).toFloat)
        data.putFloat(lc.mag(i).toFloat)
        data.putFloat(lc.err(i).toFloat)
        i += 1
      }
      out.write(pad(data.array()))
    }
    out.toByteArray
  }

  /** Assemble a Star from all HDUs (`_createStarFromFITS`,
    * `file_manager.py:255-348`): primary header → identity/coords/class/
    * `more`; each BINTABLE extension → one light curve.
    */
  def readStar(bytes: Array[Byte]): Star = {
    val hdus = readHdus(bytes)
    val primary = hdus.head.header
    val reserved = Set("SIMPLE", "BITPIX", "NAXIS", "EXTEND", "IDENT", "RA", "DEC",
      "RA_UN", "DEC_UN", "CLASS", "COMMENT", "HISTORY")
    val identNames = LinkedHashMap[String, String]()
    val identIds = LinkedHashMap[String, String]()
    val more = LinkedHashMap[String, String]()
    primary.foreach { case (k, v) =>
      if (k.endsWith("_name")) identNames(k.stripSuffix("_name")) = v
      else if (k.contains("_id_")) {
        val Array(db, key) = k.split("_id_", 2)
        identIds(s"$db:$key") = v
      } else if (!reserved.contains(k)) {
        more(k.toLowerCase) = v // lowercased on read, file_manager.py:305-306
      }
    }
    val coo = for {
      ra <- primary.get("RA").flatMap(_.toDoubleOption)
      dec <- primary.get("DEC").flatMap(_.toDoubleOption)
    } yield Coordinates(ra, dec)
    val lcs = hdus.tail.flatMap(readLightCurve)
    Star(
      starId = primary.getOrElse("IDENT",
        identNames.headOption.map(_._2).getOrElse("unknown")),
      coo = coo,
      identNames = identNames.toMap,
      identIds = identIds.toMap,
      more = more.toMap,
      starClass = primary.get("CLASS"),
      lightCurves = lcs)
  }
}
