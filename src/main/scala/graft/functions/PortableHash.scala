package graft.functions

import java.security.MessageDigest

/** md5-derived 60-bit integers, identical to the SQL form
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` /
  * `conv(substring(md5(s), 1, 15), 16, 10)` used by the oracle queries —
  * one portable hash family shared by MinHash, SimHash and the LSH planes,
  * so every engine and every executor derives the same values with no
  * shared state.
  *
  * Hot path: thread-local digest (MessageDigest is not thread-safe and
  * getInstance per call dominates at millions of hashes per task) and the
  * 15-hex-char prefix extracted directly from the first 8 digest bytes
  * (top 60 bits) without building a hex string.
  */
object PortableHash {
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def top60(d: Array[Byte]): Long =
    // first 15 hex chars == top 60 bits of the first 8 bytes
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4

  def md5Int60(s: String): Long = {
    val md = local.get()
    md.reset()
    top60(md.digest(s.getBytes("UTF-8")))
  }

  /** Byte-level form for native expressions: digest of `prefix ++ s` —
    * identical to `md5Int60(new String(prefix) + new String(s))` when both
    * are UTF-8 (concatenating UTF-8 byte strings IS the UTF-8 of the
    * concatenated string), without materializing a java.lang.String per
    * element per hash.
    */
  def md5Int60(prefix: Array[Byte], s: Array[Byte]): Long = {
    val md = local.get()
    md.reset()
    md.update(prefix)
    md.update(s)
    top60(md.digest())
  }

  /** Full md5 hex digest (thread-local digest reuse). */
  def md5Hex(s: String): String = {
    val md = local.get()
    md.reset()
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** LSH plane weights w(p, pos) ∈ [-1, 1) for an embedding dimension —
    * md5-derived, cached per dimension (weights depend only on (plane,
    * position), recomputing them per vector would do dims×planes digests
    * per row).
    */
  // Long key: an Int `planes * K + dims` would overflow (and collide) at
  // plane counts LSH_MAX_PLANES still permits. Bounded in practice by the
  // distinct (planes, dims) dial pairs a job uses.
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  def lshPlanes(planes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes.toLong << 32) | (dims & 0xffffffffL), _ =>
      Array.tabulate(planes, dims)((p, i) =>
        md5Int60(s"$p:${i + 1}") / 576460752303423488.0 - 1.0)) // 2^59
}
