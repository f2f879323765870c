package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._

/** Multimodal plumbing: stub codec determinism, frame sampling byte math,
  * resize stub. The oracle queries (q54/q59) pin the byte math against
  * DuckDB; this spec pins the library-level edge cases.
  */
class MultimodalSpec extends SparkSpec {

  test("frame sampler: 4 frames cover the payload exactly, short docs skip") {
    val sf = "/root/testdata/sf0.001"
    val frames = frameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.foreach { case (id, fs) =>
      assert(fs.length == 4, s"doc $id frame count")
      val sorted = fs.sortBy(_.frame_idx)
      // frames tile the payload: contiguous offsets, lengths sum to total
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.frame_off + a.frame_len == b.frame_off, s"doc $id gap")
      }
      assert(sorted.head.frame_off == 0)
    }
    // checksums of the frames sum to the whole-payload checksum (q54's)
    val whole = decodeFeatures(spark, sf).collect().map(f => f.doc_id -> f.checksum).toMap
    byDoc.foreach { case (id, fs) =>
      assert(fs.map(_.frame_checksum).sum == whole(id), s"doc $id checksum split")
    }
  }

  test("stub codec and resize are deterministic") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val f1 = StubCodec.decode(7L, bytes)
    val f2 = StubCodec.decode(7L, bytes)
    assert(f1 == f2)
    assert(f1.byte_len == bytes.length && f1.first_byte == 'h'.toInt)
    val r = StubResize.resize(f1, 32, 24)
    assert(r.width == 32 && r.height == 24)
    assert(r.checksum == f1.checksum, "resize must not touch payload identity")
    // empty payload is well-defined
    val e = StubCodec.decode(1L, Array.emptyByteArray)
    assert(e.byte_len == 0 && e.first_byte == -1 && e.checksum == 0L)
  }
}
