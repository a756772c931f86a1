package graft

import graft.multimodal.Multimodal

/** Real pure-JVM image codec (multimodal/Multimodal.scala): PPM/BMP
  * encode→decode roundtrips (incl. BMP row padding and bottom-up order),
  * header parsing edges, and the batched Spark decode path. */
class MultimodalSpec extends SparkSpec {

  private def raster(w: Int, h: Int): Array[Byte] =
    Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)

  test("PPM roundtrip: encode → decode is the identity on dims and raster") {
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 8), (5, 7))) {
      val px = raster(w, h)
      val (dw, dh, out) = Multimodal.decodeImage(Multimodal.encodePpm(w, h, px))
      assert((dw, dh) == (w, h))
      assert(out.toSeq == px.toSeq)
    }
  }

  test("BMP roundtrip: bottom-up padded rows come back top-down unpadded") {
    // w ∈ {1, 2, 3, 5} exercises every 4-byte row-padding residue (3w % 4)
    for ((w, h) <- Seq((1, 3), (2, 2), (3, 4), (5, 7), (4, 1))) {
      val px = raster(w, h)
      val enc = Multimodal.encodeBmp(w, h, px)
      assert(enc.length == 54 + h * (((3 * w + 3) / 4) * 4))
      val (dw, dh, out) = Multimodal.decodeImage(enc)
      assert((dw, dh) == (w, h))
      assert(out.toSeq == px.toSeq)
    }
  }

  test("PNG roundtrip: lossless through ImageIO, magic-dispatched") {
    for ((w, h) <- Seq((1, 1), (3, 2), (8, 8))) {
      val px = raster(w, h)
      val bytes = Multimodal.encodePng(w, h, px)
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
      val (dw, dh, out) = Multimodal.decodeImage(bytes)
      assert((dw, dh) == (w, h))
      assert(out.toSeq == px.toSeq) // PNG is lossless
    }
  }

  test("JPEG roundtrip: exact dims, pixels within lossy tolerance") {
    for ((w, h) <- Seq((8, 8), (5, 7))) {
      val px = raster(w, h)
      val bytes = Multimodal.encodeJpeg(w, h, px)
      assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      val (dw, dh, out) = Multimodal.decodeImage(bytes)
      assert((dw, dh) == (w, h))
      assert(out.length == px.length)
      // lossy: mean absolute error bounded (default-quality JPEG on a
      // smooth-ish synthetic raster)
      val mae = px.indices.map(i => math.abs((px(i) & 0xff) - (out(i) & 0xff))).sum.toDouble / px.length
      assert(mae < 48.0, s"jpeg mae $mae for ${w}x$h")
    }
  }

  test("four-lane dispatch: payloadFor4 selects by doc_id mod 4") {
    val digest = Array.tabulate(16)(i => (i * 29 + 3).toByte)
    assert(Multimodal.payloadFor4(0L, digest)(0) == 'P')
    assert(Multimodal.payloadFor4(1L, digest)(0) == 'B')
    assert((Multimodal.payloadFor4(2L, digest)(0) & 0xff) == 0x89)
    assert((Multimodal.payloadFor4(3L, digest)(0) & 0xff) == 0xff)
    // all four decode to the SAME dims from the same digest
    val dims = (0L to 3L).map { id =>
      val (w, h, _) = Multimodal.decodeImage(Multimodal.payloadFor4(id, digest))
      (w, h)
    }
    assert(dims.distinct.size == 1)
  }

  test("PPM header parsing: comments and multi-digit dims") {
    val px = raster(12, 10)
    val withComment = ("P6\n# a comment line\n12 10\n255\n").getBytes("US-ASCII") ++ px
    val (w, h, out) = Multimodal.decodeImage(withComment)
    assert((w, h) == (12, 10) && out.toSeq == px.toSeq)
  }

  test("decoder rejects unknown magic and unsupported depths") {
    intercept[IllegalArgumentException](Multimodal.decodeImage(Array[Byte](0x47, 0x49, 0, 0)))
    // 16-bit BMP: flip the bpp field of a valid encoding
    val bad = Multimodal.encodeBmp(2, 2, raster(2, 2))
    bad(28) = 16
    intercept[IllegalArgumentException](Multimodal.decodeImage(bad))
  }

  test("decodeDocuments: batched Spark decode equals the driver-side codec per doc") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Multimodal.decodeDocuments(spark, docs).collect()
      .map(d => d.doc_id -> d).toMap
    // ≥ BatchSize docs so the grouped() batching boundary is crossed
    assert(got.size > Multimodal.BatchSize)
    val hexes = docs.select(col("doc_id").cast("long"), md5(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    hexes.foreach { case (id, hex) =>
      val digest = Array.tabulate(16)(i =>
        Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
      val expected = Multimodal.decodeBatch(
        Seq(Multimodal.MediaRow(id, Multimodal.payloadFor(id, digest)))).head
      val d = got(id)
      assert((d.width, d.height, d.n_bytes) == (expected.width, expected.height, expected.n_bytes))
      assert(d.mean_byte == expected.mean_byte)
      assert(d.features.toSeq == expected.features.toSeq)
      // even ids rode PPM, odd ids BMP — both lanes really in play
      val magic = Multimodal.payloadFor(id, digest).take(2).map(_.toChar).mkString
      assert(if (id % 2 == 0) magic == "P6" else magic == "BM")
    }
  }
}
