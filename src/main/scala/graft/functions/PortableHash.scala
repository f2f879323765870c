package graft.functions

import java.security.MessageDigest

/** md5-derived 60-bit integers, identical to the SQL form
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` /
  * `conv(substring(md5(s), 1, 15), 16, 10)` used by the oracle queries —
  * one portable hash family shared by MinHash, SimHash and the LSH planes,
  * so every engine and every executor derives the same values with no
  * shared state.
  */
object PortableHash {
  def md5Int60(s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString // 16 hex chars; need 15
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}
