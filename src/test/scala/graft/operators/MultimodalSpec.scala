package graft.operators

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("decodeMeta is deterministic and consistent with the stub decoder") {
    val metas = Multimodal.decodeMeta(docs).collect()
    assert(metas.nonEmpty)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    metas.foreach { m =>
      val expected = Multimodal.StubDecoder.decode(
        m.doc_id, texts(m.doc_id).getBytes(StandardCharsets.UTF_8))
      assert(m == expected)
      assert(m.width >= 64 && m.width < 256)
      assert(m.checksum_hex.length == 32)
    }
  }

  test("frame sampling covers the payload in fixed-size strided windows") {
    val frames = Multimodal.sampleFrames(docs, frameSize = 64, stride = 4).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("frame_bytes")
      assert(bytes.length <= 64)
      assert(r.getInt(1) % 4 == 0)
    }
    // every doc contributes at least one frame
    assert(frames.map(_.getLong(0)).distinct.length == docs.count())
  }
}
