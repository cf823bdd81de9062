package graft

import graft.llm.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing: schema, partition-parallel
  * decode, frame sampling (the codec itself is a documented stub). */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("assetsFromDocuments produces binary payloads with typed metadata") {
    val assets = MultimodalOps.assetsFromDocuments(spark, sfDir)
    val first = assets.orderBy("doc_id").head()
    assert(first.mime == "application/octet-stream")
    assert(first.bytes.nonEmpty)
    // bytes round-trip the original text
    assert(new String(first.bytes, "UTF-8").nonEmpty)
  }

  test("decodeAssets runs partition-parallel and matches the stub per row") {
    val assets = MultimodalOps.assetsFromDocuments(spark, sfDir).limit(50)
    val metas = MultimodalOps.decodeAssets(assets).collect()
    assert(metas.length == 50)
    val byId = assets.collect().map(a => a.doc_id -> a.bytes).toMap
    metas.foreach { m =>
      val (w, h, f) = MultimodalOps.decodeStub(byId(m.doc_id))
      assert((m.width, m.height, m.n_frames) == (w, h, f))
      assert(m.byte_size == byId(m.doc_id).length.toLong)
    }
  }

  test("frameSample keeps every k-th block") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val frames = MultimodalOps.frameSample(bytes, every = 2, blockSize = 10)
    assert(frames.length == 5) // blocks 0,2,4,6,8
    assert(frames(0).toSeq == bytes.slice(0, 10).toSeq)
    assert(frames(1).toSeq == bytes.slice(20, 30).toSeq)
  }

  test("resize stub downsamples deterministically") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    val half = MultimodalOps.resizeStub(bytes, 2)
    assert(half.length == 50 && half(1) == 2.toByte)
    assert(MultimodalOps.resizeStub(bytes, 1).toSeq == bytes.toSeq)
  }

  test("decode stub is deterministic") {
    val b = "hello world".getBytes("UTF-8")
    assert(MultimodalOps.decodeStub(b) == MultimodalOps.decodeStub(b.clone()))
  }
}
