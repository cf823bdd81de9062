package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.llm.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing AND the real javax.imageio codec
  * path: PNG encode→decode roundtrip, raster metadata, average-hash
  * properties. The stub decoder remains only as the non-image-mime
  * fallback and keeps its determinism test. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("assetsFromDocuments produces binary payloads with typed metadata") {
    val assets = MultimodalOps.assetsFromDocuments(spark, sfDir)
    val first = assets.orderBy("doc_id").head()
    assert(first.mime == "application/octet-stream")
    assert(first.bytes.nonEmpty)
    // bytes round-trip the original text
    assert(new String(first.bytes, "UTF-8").nonEmpty)
  }

  test("real PNG decode: dimensions and pixels survive the roundtrip bit-exact") {
    val docId = 42L
    val bytes = MultimodalOps.encodePng(docId)
    // PNG magic — these really are image bytes, not a fake
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = MultimodalOps.imageParams(docId)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val g = MultimodalOps.pixelGray(docId, x, y)
      assert(((rgb >> 16) & 0xff) == g && ((rgb >> 8) & 0xff) == g && (rgb & 0xff) == g,
        s"pixel ($x,$y) of doc $docId lost in PNG roundtrip")
    }
  }

  test("decodeImage reports raster metadata from the decoded image") {
    val dec = MultimodalOps.decodeImage(7L, MultimodalOps.encodePng(7L))
    val (w, h) = MultimodalOps.imageParams(7L)
    assert(dec.width == w && dec.height == h && dec.channels == 3)
    assert(dec.ahash_bits.length == 64 && dec.ahash_bits.forall(c => c == '0' || c == '1'))
  }

  test("tryDecodeImage returns None on garbage bytes; decodeImage fails loudly") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(MultimodalOps.tryDecodeImage(1L, junk).isEmpty)
    assertThrows[IllegalArgumentException](MultimodalOps.decodeImage(1L, junk))
  }

  test("ahash: solid image hashes to all-zero bits (no cell exceeds the mean)") {
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    assert(MultimodalOps.averageHashBits(img) == "0" * 64)
  }

  test("ahash: half-bright image sets exactly the bright half's bits") {
    // left half black, right half white → right 4 columns of each grid row
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0x000000 else 0xffffff)
    val bits = MultimodalOps.averageHashBits(img)
    assert(bits == ("0000" + "1111") * 8)
  }

  test("ahash is deterministic and survives PNG re-encode") {
    val bytes = MultimodalOps.encodePng(123L)
    val d1 = MultimodalOps.decodeImage(123L, bytes)
    // re-encode the decoded raster and hash again
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val d2 = MultimodalOps.decodeImage(123L, out.toByteArray)
    assert(d1.ahash_bits == d2.ahash_bits)
    assert(d1 == MultimodalOps.decodeImage(123L, bytes.clone()))
  }

  test("resizeNearest samples exactly the predicted source pixels") {
    val docId = 17L
    val img = ImageIO.read(new java.io.ByteArrayInputStream(
      MultimodalOps.encodePng(docId)))
    val (w, h) = MultimodalOps.imageParams(docId)
    val half = MultimodalOps.resizeNearest(img, w / 2, h / 2)
    assert(half.getWidth == w / 2 && half.getHeight == h / 2)
    for (y <- 0 until h / 2; x <- 0 until w / 2) {
      // w and h are even, so nearest-neighbor maps (x,y) -> (2x,2y)
      val expected = MultimodalOps.pixelGray(docId, 2 * x, 2 * y)
      assert((half.getRGB(x, y) & 0xff) == expected,
        s"resized pixel ($x,$y) should sample source (${2 * x},${2 * y})")
    }
    // and the luminance checksum matches the analytic prediction
    val predicted = (for (y <- 0 until h / 2; x <- 0 until w / 2)
      yield ((2 * x * 7 + 2 * y * 13 + docId) % 256)).sum
    assert(MultimodalOps.luminanceSum(half) == predicted)
  }

  test("block banding is pigeonhole-complete for hamming <= 7 (neardup's candidate bound)") {
    val rnd = new scala.util.Random(99)
    (1 to 500).foreach { _ =>
      val a = Array.fill(64)(rnd.nextBoolean())
      val b = a.clone()
      // flip up to 7 random positions — the worst case the <=6
      // threshold plus one can produce
      val flips = rnd.nextInt(8)
      rnd.shuffle((0 until 64).toList).take(flips).foreach(i => b(i) = !b(i))
      val hamming = (0 until 64).count(i => a(i) != b(i))
      val sharedBlock = (0 until 8).exists(blk =>
        (0 until 8).forall(j => a(blk * 8 + j) == b(blk * 8 + j)))
      // 8 blocks, <=7 differing bits: the bits cannot touch all 8
      assert(hamming > 7 || sharedBlock,
        s"pair with hamming $hamming shared no block — banding would miss it")
    }
  }

  test("packAhash packs MSB-first") {
    assert(MultimodalOps.packAhash("0" * 64) == 0L)
    assert(MultimodalOps.packAhash("0" * 63 + "1") == 1L)
    assert(MultimodalOps.packAhash("1" + "0" * 63) == Long.MinValue)
  }

  test("decodeAssets routes image mimes through the real codec in parallel") {
    val assets = MultimodalOps.imageAssets(spark, sfDir).limit(50)
    val metas = MultimodalOps.decodeAssets(assets).collect()
    assert(metas.length == 50)
    metas.foreach { m =>
      val (w, h) = MultimodalOps.imageParams(m.doc_id)
      assert((m.width, m.height) == (w, h), s"doc ${m.doc_id} decoded wrong dims")
      assert(m.byte_size > 8) // real PNG payload, not empty
    }
  }

  test("decodeAssets falls back to the stub for non-image mimes, matching per row") {
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

  test("animated GIF roundtrip: every frame's pixels survive the container bit-exact") {
    val docId = 23L
    val bytes = MultimodalOps.encodeGif(docId)
    assert(bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte)
    val frames = MultimodalOps.readGifFrames(bytes)
    assert(frames.length == MultimodalOps.frameCount(docId))
    val (w, h) = MultimodalOps.imageParams(docId)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expected = MultimodalOps.framePixelGray(docId, f, x, y)
        assert((img.getRGB(x, y) & 0xff) == expected,
          s"frame $f pixel ($x,$y) lost in GIF roundtrip")
      }
    }
  }

  test("WAV roundtrip: every PCM sample survives the RIFF container bit-exact") {
    val docId = 31L
    val bytes = MultimodalOps.encodeWav(docId)
    assert(bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte)
    val dec = MultimodalOps.decodeWav(docId, bytes)
    val n = MultimodalOps.sampleCount(docId)
    assert(dec.n_samples == n && dec.sample_rate == 8000 &&
      dec.channels == 1 && dec.bits == 16)
    val expectedSum = (0 until n).map(i =>
      MultimodalOps.sampleValue(docId, i).toLong).sum
    assert(dec.pcm_sum == expectedSum)
    // negative samples really occur (signed PCM is exercised)
    assert((0 until n).exists(i => MultimodalOps.sampleValue(docId, i) < 0))
  }

  test("GIF frame counts span the designed 2..6 range") {
    val counts = (0L to 9L).map(MultimodalOps.frameCount).toSet
    assert(counts == Set(2, 3, 4, 5, 6))
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

  test("JPEG lossy decode: dims exact, luminance and ahash within bounds") {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    (0L to 99L).foreach { id =>
      val src = MultimodalOps.renderRaster(id)
      val bytes = MultimodalOps.encodeJpeg(src, MultimodalOps.JpegQuality)
      // real JFIF container
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
        s"doc $id: not a JPEG SOI marker")
      val dec = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(dec.getWidth == src.getWidth && dec.getHeight == src.getHeight)
      assert(dec.getRaster.getNumBands == 3)
      val err = MultimodalOps.maxLumError(src, dec)
      assert(err <= MultimodalOps.JpegMaxLumError,
        s"doc $id: luminance error $err exceeds bound")
      // lossy really is lossy — at least one doc must show nonzero error,
      // or the "bounded error" contract is vacuous
      val drift = MultimodalOps.ahashHamming(
        MultimodalOps.averageHashBits(src), MultimodalOps.averageHashBits(dec))
      assert(drift <= MultimodalOps.JpegMaxAhashDrift,
        s"doc $id: ahash drift $drift exceeds bound")
    }
    val someLoss = (0L to 99L).exists { id =>
      val src = MultimodalOps.renderRaster(id)
      val dec = ImageIO.read(new ByteArrayInputStream(
        MultimodalOps.encodeJpeg(src, MultimodalOps.JpegQuality)))
      MultimodalOps.maxLumError(src, dec) > 0
    }
    assert(someLoss, "q=0.9 JPEG decoded bit-exact everywhere — lossy path not exercised")
  }

  test("cross-codec near-dup: banded pipeline finds every PNG→JPEG re-encode pair") {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // corpus = PNG originals + JPEG(q=0.9) re-encodes (the realistic
    // image-dedup case): every (orig, re-encode) pair must fall within
    // hamming <= 6, and the SAME banded 8-block×8-bit candidate join
    // the neardup query uses must surface all of them — no O(n²) pass
    val ids = (0L to 39L)
    val rows = ids.flatMap { id =>
      val src = MultimodalOps.renderRaster(id)
      val jpegDec = ImageIO.read(new ByteArrayInputStream(
        MultimodalOps.encodeJpeg(src, MultimodalOps.JpegQuality)))
      Seq((id, MultimodalOps.averageHashBits(src)),
        (id + MultimodalOps.VariantIdOffset,
          MultimodalOps.averageHashBits(jpegDec)))
    }
    val hashed = rows.toDF("doc_id", "ahash_bits")
      .withColumn("blocks", expr(
        """transform(sequence(0, 7),
          |  b -> CAST(conv(substring(ahash_bits, b * 8 + 1, 8), 2, 10)
          |            AS INT))""".stripMargin))
    val banded = hashed.select(col("doc_id"),
      posexplode(col("blocks")).as(Seq("band", "bval")))
    val cand = banded.select(col("doc_id").as("doc_a"), col("band"), col("bval"))
      .join(banded.select(col("doc_id").as("doc_b"), col("band"), col("bval")),
        Seq("band", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ids.foreach { id =>
      val pair = (id, id + MultimodalOps.VariantIdOffset)
      assert(cand.contains(pair),
        s"banded candidates missed the cross-codec pair for doc $id")
    }
  }
}
