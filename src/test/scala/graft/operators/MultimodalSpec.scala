package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: binary payload schema, stub decode contract,
  * bounded frame sampling. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val withBin = Multimodal.withBinaryPayload(docs)

  test("real image decode: PNG and BMP payloads round-trip through the platform codecs") {
    val sub = docs.limit(20)
    val decoded = Multimodal.decodeImageFeatures(Multimodal.imagePayload(sub))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5), r.getString(6)))
      .toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, (ok, w, h, ch, sum, fmt)) =>
      assert(ok, s"doc $id must decode")
      assert(w == 16 && h == 16)
      assert(ch == (if (id % 2 == 0) 1 else 3))
      assert(fmt == (if (id % 2 == 0) "png" else "bmp"),
        s"sniffed format must match the written container for doc $id")
      val expected = (for (y <- 0 until 16; x <- 0 until 16)
        yield Multimodal.pixelValue(id, x, y).toLong).sum
      assert(sum == expected,
        s"decoded luminance sum must equal the generator's arithmetic for doc $id")
    }
  }

  test("real image decode: corrupt and non-image payloads report decoded=false, not a crash") {
    import spark.implicits._
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),                          // garbage
      (2L, "plain text".getBytes("UTF-8")),                // not a container
      (3L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0)), // truncated PNG header
      (4L, Array.empty[Byte])                              // empty
    ).toDF("doc_id", "payload")
    val out = Multimodal.decodeImageFeatures(junk).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(!r.getBoolean(1))
      assert(r.getLong(5) == 0L)
    }
    // the truncated-PNG row still SNIFFS as png (routing is header-based)
    assert(out.find(_.getLong(0) == 3L).get.getString(6) == "png")
  }

  test("real audio decode: WAV and AIFF payloads round-trip through the platform codecs") {
    val sub = docs.limit(20)
    val decoded = Multimodal.decodeAudioFeatures(Multimodal.audioPayload(sub))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getLong(5), r.getLong(6), r.getString(7)))
      .toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, (ok, rate, ch, bits, nSamples, sumAbs, fmt)) =>
      assert(ok, s"doc $id must decode")
      assert(rate == Multimodal.AudioSampleRate && ch == 1 && bits == 16)
      assert(nSamples == Multimodal.numSamples(id).toLong)
      assert(fmt == (if (id % 2 == 0) "wav" else "aiff"),
        s"sniffed container must match the written one for doc $id")
      val expected = (0 until Multimodal.numSamples(id))
        .map(i => math.abs(Multimodal.sampleValue(id, i)).toLong).sum
      assert(sumAbs == expected,
        s"decoded |amplitude| sum must equal the generator's arithmetic for doc $id")
    }
  }

  test("real audio decode: corrupt and non-audio payloads report decoded=false, not a crash") {
    import spark.implicits._
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, "plain text".getBytes("UTF-8")),
      (3L, "RIFFxxxxWAVE".getBytes("UTF-8")), // sniffs wav, truncated body
      (4L, Array.empty[Byte])
    ).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudioFeatures(junk).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(!r.getBoolean(1))
      assert(r.getLong(5) == 0L && r.getLong(6) == 0L)
    }
    assert(out.find(_.getLong(0) == 3L).get.getString(7) == "wav")
  }

  test("real video decode: AVI payloads demux and every frame round-trips the platform codec") {
    val sub = docs.limit(20)
    val decoded = Multimodal.decodeVideoFeatures(Multimodal.videoPayload(sub))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getInt(5), r.getLong(6), r.getString(7)))
      .toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, (ok, w, h, nf, fps, sum, fmt)) =>
      assert(ok, s"doc $id must decode")
      assert(w == 16 && h == 16, "geometry must be READ from avih, not assumed")
      assert(nf == Multimodal.numVideoFrames(id),
        s"frame count must come from counting movi chunks for doc $id")
      assert(fps == Multimodal.videoFps(id),
        s"fps must come from strh rate/scale for doc $id")
      assert(fmt == "avi")
      val expected = (for {
        f <- 0 until Multimodal.numVideoFrames(id)
        y <- 0 until 16; x <- 0 until 16
      } yield Multimodal.pixelValue(Multimodal.videoFrameSeed(id, f), x, y).toLong).sum
      assert(sum == expected,
        s"decoded all-frame luminance sum must equal the generator's arithmetic for doc $id")
    }
  }

  test("real INTER-frame decode: RLE8 delta frames carry the canvas — sums match the retained/repainted composition") {
    val sub = docs.limit(20)
    val decoded = Multimodal.decodeVideoFeatures(Multimodal.videoPayloadRle(sub))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getInt(5), r.getLong(6), r.getString(7)))
      .toMap
    assert(decoded.nonEmpty)
    decoded.foreach { case (id, (ok, w, h, nf, fps, sum, fmt)) =>
      assert(ok, s"doc $id must decode")
      assert(w == 16 && h == 16 && fmt == "avi")
      assert(nf == Multimodal.numVideoFrames(id))
      assert(fps == Multimodal.videoFps(id))
      // frame f's canvas: rows 1..f repainted from their own frame's
      // seed, everything else retained from the keyframe — only a
      // decoder that carries state across frames reproduces this
      val expected = (for {
        f <- 0 until Multimodal.numVideoFrames(id)
        y <- 0 until 16; x <- 0 until 16
      } yield {
        val seedFrame = if (y >= 1 && y <= f) y else 0
        Multimodal.pixelValue(Multimodal.videoFrameSeed(id, seedFrame), x, y).toLong
      }).sum
      assert(sum == expected,
        s"inter-frame luminance composition diverged for doc $id")
    }
  }

  test("RLE8 fuzz: mutated and truncated inter-frame AVI bytes never crash the scan") {
    import spark.implicits._
    val base = Multimodal.videoPayloadRle(docs.limit(4)).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    val rng = new scala.util.Random(4321)
    val mutants = (0 until 120).map { i =>
      val (_, src) = base(i % base.length)
      val b = src.clone()
      rng.nextInt(3) match {
        case 0 =>
          (0 to rng.nextInt(8)).foreach { _ =>
            b(rng.nextInt(b.length)) = rng.nextInt(256).toByte }
          (i.toLong, b)
        case 1 => (i.toLong, b.take(rng.nextInt(b.length)))
        case 2 =>
          val off = rng.nextInt(math.max(1, b.length - 4))
          b(off) = 0xff.toByte; b(off + 1) = 0xff.toByte
          (i.toLong, b.take(math.max(12, rng.nextInt(b.length))))
      }
    }
    val out = Multimodal.decodeVideoFeatures(mutants.toDF("doc_id", "payload")).collect()
    assert(out.length == mutants.length)
    out.foreach { r =>
      if (!r.getBoolean(1)) assert(r.getLong(6) == 0L)
      else assert(r.getInt(4) > 0 && r.getLong(6) >= 0L)
    }
  }

  test("real video decode: corrupt and non-AVI payloads report decoded=false, not a crash") {
    import spark.implicits._
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, "plain text".getBytes("UTF-8")),
      (3L, "RIFFxxxxAVI LIST".getBytes("UTF-8")), // sniffs avi, truncated body
      (4L, Array.empty[Byte]),
      // RIFF but not AVI (size field zeroed, then the WAVE form type)
      (5L, "RIFF".getBytes("UTF-8") ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.decodeVideoFeatures(junk).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(!r.getBoolean(1))
      assert(r.getLong(6) == 0L)
    }
    assert(out.find(_.getLong(0) == 3L).get.getString(7) == "avi")
    assert(out.find(_.getLong(0) == 5L).get.getString(7) == "unknown")
  }

  test("hostile deep LIST nesting reports decoded=false instead of StackOverflowError") {
    import spark.implicits._
    // 10k nested LIST/hdrl headers: before the depth cap this drove the
    // recursive RIFF walk into a StackOverflowError, which is an Error
    // the decoded=false catch does NOT absorb — it killed the task.
    val depth = 10000
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    bos.write("RIFF".getBytes("US-ASCII")); le32(12 * depth + 4)
    bos.write("AVI ".getBytes("US-ASCII"))
    (1 to depth).foreach { i =>
      bos.write("LIST".getBytes("US-ASCII")); le32(12 * (depth - i) + 4)
      bos.write("hdrl".getBytes("US-ASCII"))
    }
    val bomb = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = Multimodal.decodeVideoFeatures(bomb).collect()
    assert(out.length == 1 && !out(0).getBoolean(1))
    assert(out(0).getString(7) == "avi") // sniffs avi; decode refuses
  }

  test("video demux fuzz: mutated and truncated AVI bytes never crash the scan") {
    import spark.implicits._
    // seed corpus: real AVI payloads; mutants: random byte flips and
    // truncations at seeded offsets. A poisoned container may still
    // happen to decode (flip in padding) — the contract under fuzz is
    // "row comes back, decoded true or false", never an exception.
    val base = Multimodal.videoPayload(docs.limit(4)).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    val rng = new scala.util.Random(1234)
    val mutants = (0 until 120).map { i =>
      val (_, src) = base(i % base.length)
      val b = src.clone()
      rng.nextInt(3) match {
        case 0 => // flip 1-8 random bytes
          (0 to rng.nextInt(8)).foreach { _ =>
            b(rng.nextInt(b.length)) = rng.nextInt(256).toByte }
          (i.toLong, b)
        case 1 => // truncate at a random offset (including inside headers)
          (i.toLong, b.take(rng.nextInt(b.length)))
        case 2 => // corrupt a length field region then truncate
          val off = rng.nextInt(math.max(1, b.length - 4))
          b(off) = 0xff.toByte; b(off + 1) = 0xff.toByte
          (i.toLong, b.take(math.max(12, rng.nextInt(b.length))))
      }
    }
    val out = Multimodal.decodeVideoFeatures(mutants.toDF("doc_id", "payload")).collect()
    assert(out.length == mutants.length)
    out.foreach { r =>
      // undecoded rows must report zeroed stats; decoded rows sane ones
      if (!r.getBoolean(1)) assert(r.getLong(6) == 0L)
      else assert(r.getInt(4) > 0 && r.getLong(6) >= 0L)
    }
  }

  test("stub decode: typed mapPartitions yields deterministic fixed-dim features") {
    val f1 = Multimodal.stubDecodeFeatures(withBin)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toMap
    val f2 = Multimodal.stubDecodeFeatures(withBin)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.size == 8))
    assert(f1.nonEmpty && f1.values.exists(_.exists(_ != 0f)))
  }

  test("decoded features flow into the vector operators (similarity plumbing e2e)") {
    val feats = Multimodal.stubDecodeFeatures(withBin)
    val qs = feats.filter(col("id") % 100 === 0)
      .select(col("id").as("qid"), col("features").as("qvec"))
    val vs = feats.select(col("id"), col("features").as("vec"))
    val knn = ExactKnn.search(qs, vs, 5, "cosine")
    val perQ = knn.groupBy("qid").count().collect()
    assert(perQ.nonEmpty && perQ.forall(_.getLong(1) == 5))
  }

  test("frame sampling: bounded rows, positional bytes, no payload-width rows") {
    val frames = Multimodal.sampleFrames(withBin)
    val stats = frames.agg(max(col("frame_idx")), max(col("frame_bytes"))).head()
    assert(stats.getInt(0) <= 7)    // maxFrames = 8
    assert(stats.getInt(1) <= 256)  // frameBytes cap
    // every doc appears, with n_frames = min(8, max(1, floor(bytes/256)))
    val n = frames.select("doc_id").distinct().count()
    assert(n == docs.count())
  }

  test("nibble histogram: bins sum to the hex length, known payload exact") {
    val hists = Multimodal.nibbleHistogram(withBin)
    val bad = hists.filter(
      aggregate(col("hist"), lit(0L), (a, x) => a + x) =!= col("tot"))
    assert(bad.count() == 0)
    // "AB" = bytes 0x41 0x42 -> hex "4142": nibble '4' x2, '1' x1, '2' x1
    import spark.implicits._
    val one = Multimodal.nibbleHistogram(
      Multimodal.withBinaryPayload(Seq((0L, "AB")).toDF("doc_id", "text")))
      .head()
    assert(one.getAs[Long]("tot") == 4L)
    val h = one.getSeq[Long](one.fieldIndex("hist"))
    assert(h(4) == 2L && h(1) == 1L && h(2) == 1L && h.sum == 4L)
  }

  test("fingerprint pairs: exact L1, identical payloads at rel_bp 0") {
    import spark.implicits._
    val df = Multimodal.withBinaryPayload(Seq(
      (0L, "hello world hello"), // media image (0 % 3)
      (3L, "hello world hello"), // identical, same media
      (6L, "zzzzzzzzzzzzzzzzz")  // same media, different content
    ).toDF("doc_id", "text"))
    val pairs = Multimodal.fingerprintPairs(
        Multimodal.nibbleHistogram(df), num = 1, den = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.toSeq == Seq((0L, 3L, 0L, 0L)))
  }
}
