package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity}
import graft.queries.Tables

/** Ground-truth pinning for the Spark-native (non-oracle) pipeline ops:
  * sign-LSH ANN recall vs brute force, simhash near-dup recall on known
  * synthesized duplicates, and the multimodal decode plumbing. */
class PipelineSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("sign-LSH ANN finds the true nearest neighbors it claims (subset of brute force)") {
    val emb = Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") % 50 === 0
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQuery, k = 20)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", isQuery, k = 5, nPlanes = 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ann.nonEmpty, "ANN returned nothing")
    // every ANN hit must be a genuinely similar vector: within brute-force
    // top-20 (multi-probe sign-LSH measures >= 0.96 on this corpus; 0.8
    // leaves headroom for draw variance without masking a regression to
    // single-probe quality)
    val recallable = ann.count(brute.contains)
    assert(recallable.toDouble / ann.length >= 0.8,
      s"ANN precision vs brute-force top-20 too low: $recallable/${ann.length}")
  }

  test("margin mining: best match = brute top-1, margin >= 1, hub-normalized") {
    val emb = Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") % 50 === 0
    val brute1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQuery, k = 1)
      .select("query_id", "cand_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = Similarity.marginTopK(emb, "vec_id", "embedding", isQuery, k = 4)
      .collect()
    assert(m.nonEmpty, "margin mining returned nothing")
    m.foreach { r =>
      val (q, best, cos, margin) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(brute1(q) == best, s"query $q: best_id $best != brute top-1 ${brute1(q)}")
      // for a positive best cosine: best >= each of top-4 => best >= their
      // mean => ratio margin >= 1 (the sign flips the inequality otherwise)
      if (cos > 0) assert(margin >= 1.0, s"query $q: margin $margin < 1")
    }
  }

  test("IVF ANN results are genuinely similar vectors (within brute-force top-20)") {
    val emb = Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") % 50 === 0
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQuery, k = 20)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", isQuery, k = 5,
        nCells = 16, nProbe = 2)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.nonEmpty, "IVF returned nothing")
    val good = ivf.count(brute.contains)
    assert(good.toDouble / ivf.length >= 0.4,
      s"IVF precision vs brute-force top-20 too low: $good/${ivf.length}")
  }

  test("PQ ADC results are genuinely near vectors (within exact-L2 top-20)") {
    val emb = Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") % 50 === 0
    // ground truth in the SAME metric PQ approximates: exact integer
    // squared L2 over micro-unit vectors
    val base = emb.select(col("vec_id").cast("long").as("id"),
      graft.ops.Clustering.microVec(col("embedding")).as("xm"))
    val q = base.filter(col("id") % 50 === 0)
      .select(col("id").as("query_id"), col("xm").as("qm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d").asc, col("cand_id").asc)
    val brute = base.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("cand_id"),
        graft.functions.long_sqdist(col("qm"), col("xm")).as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 20)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = graft.ops.Pq.pqTopK(emb, "vec_id", "embedding", isQuery,
        k = 5, dim = 64, m = 8, ks = 64, iters = 2)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.nonEmpty, "PQ returned nothing")
    val good = pq.count(brute.contains)
    assert(good.toDouble / pq.length >= 0.4,
      s"PQ ADC precision vs exact-L2 top-20 too low: $good/${pq.length}")

    // IVF-PQ must not lose precision vs the flat-ADC pin above: pruning
    // to 4 of 16 probed cells keeps the true near-neighbors (which land
    // in nearby coarse cells by construction)
    val ivfpq = graft.ops.Pq.ivfPqTopK(emb, "vec_id", "embedding", isQuery,
        k = 5, dim = 64, m = 8, ks = 64, iters = 2, nCells = 16, nProbe = 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivfpq.nonEmpty, "IVF-PQ returned nothing")
    val goodIvf = ivfpq.count(brute.contains)
    assert(goodIvf.toDouble / ivfpq.length >= 0.4,
      s"IVF-PQ precision vs exact-L2 top-20 too low: $goodIvf/${ivfpq.length}")

    // residual encoding is the quantization-error REDUCTION: codewords
    // describe within-cell variation, so precision must hold the same
    // bar and not regress below the non-residual composition
    val resid = graft.ops.Pq.ivfPqResidualTopK(emb, "vec_id", "embedding",
        isQuery, k = 5, dim = 64, m = 8, ks = 64, iters = 2,
        nCells = 16, nProbe = 4)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(resid.nonEmpty, "residual IVF-PQ returned nothing")
    val goodRes = resid.count(brute.contains)
    assert(goodRes.toDouble / resid.length >= 0.4,
      s"residual IVF-PQ precision vs exact-L2 top-20 too low: $goodRes/${resid.length}")
    assert(goodRes >= goodIvf,
      s"residual encoding REDUCED precision: $goodRes < $goodIvf of ${resid.length}")

    // exact re-rank refinement (FAISS IndexRefineFlat): ADC selects
    // top-20 candidates, exact full-dim integer L2 re-ranks to top-5 —
    // precision must hold the family bar and not regress below ADC-only
    val rerank = graft.ops.Pq.ivfPqRerankTopK(emb, "vec_id", "embedding",
        isQuery, k = 5, dim = 64, m = 8, ks = 64, iters = 2,
        nCells = 16, nProbe = 4, rerankR = 20)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rerank.nonEmpty, "re-rank IVF-PQ returned nothing")
    val goodRr = rerank.count(brute.contains)
    assert(goodRr.toDouble / rerank.length >= 0.4,
      s"re-rank IVF-PQ precision vs exact-L2 top-20 too low: $goodRr/${rerank.length}")
    assert(goodRr >= goodIvf,
      s"exact re-rank REDUCED precision: $goodRr < $goodIvf of ${rerank.length}")
  }

  test("persisted IVF-PQ index probe returns the inline composition bit-for-bit") {
    val emb = Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") % 50 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rk", "cand_id", "adist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val inline = rows(graft.ops.Pq.ivfPqTopK(emb, "vec_id", "embedding",
      isQuery, k = 5, dim = 64, m = 8, ks = 64, iters = 2, nCells = 16, nProbe = 4))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    try {
      graft.ops.Pq.writeIvfPqIndex(emb, "vec_id", "embedding",
        "ivfpq_codes_spec", buckets = 4, sidecarPath = s"$dir/sidecar",
        dim = 64, path = Some(s"$dir/codes"), m = 8, ks = 64, iters = 2, nCells = 16)
      val probed = rows(graft.ops.Pq.ivfPqIndexedTopK(emb.filter(isQuery),
        "vec_id", "embedding", "ivfpq_codes_spec", s"$dir/sidecar",
        k = 5, dim = 64, m = 8, nProbe = 4))
      assert(probed.nonEmpty, "index probe returned nothing")
      assert(probed == inline,
        s"persisted-index probe diverged from inline IVF-PQ: " +
          s"${(probed -- inline).take(3)} vs ${(inline -- probed).take(3)}")
    } finally spark.sql("DROP TABLE IF EXISTS ivfpq_codes_spec")
  }

  test("IVF-PQ index append: frozen-sidecar encode, old files untouched, batch-split invariant") {
    val emb = Tables.embeddings(spark, sf)
    val old = emb.filter(col("vec_id") % 10 =!= 9)
    val nw = emb.filter(col("vec_id") % 10 === 9)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    def build(tbl: String, codes: String): Unit =
      graft.ops.Pq.writeIvfPqIndex(old, "vec_id", "embedding", tbl, buckets = 4,
        sidecarPath = s"$dir/sidecar", dim = 64, path = Some(s"$dir/$codes"),
        m = 8, ks = 64, iters = 2, nCells = 16)
    def rows(tbl: String) = spark.table(tbl)
      .select(col("id"), col("cell"), concat_ws(",", col("code")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    try {
      build("ivfpq_app_a", "codesA")
      val before = rows("ivfpq_app_a")
      graft.ops.Pq.appendIvfPqIndex(nw, "vec_id", "embedding", "ivfpq_app_a",
        buckets = 4, sidecarPath = s"$dir/sidecar", dim = 64, m = 8)
      val after = rows("ivfpq_app_a")
      // append only ADDS: every pre-append row survives byte-identically,
      // and exactly the new-batch ids arrive
      assert(before.subsetOf(after), "append rewrote or dropped existing index rows")
      assert(after.size == before.size + nw.count(), "append missed new-batch rows")
      assert((after -- before).forall(_._1 % 10 == 9), "append invented non-batch ids")
      // batch-split invariance: absorbing the batch in two appends lands
      // the identical table — the encode is row-local against the frozen
      // sidecars, nothing retrains on batch composition
      build("ivfpq_app_b", "codesB")
      graft.ops.Pq.appendIvfPqIndex(nw.filter(col("vec_id") < 250), "vec_id",
        "embedding", "ivfpq_app_b", buckets = 4, s"$dir/sidecar", dim = 64, m = 8)
      graft.ops.Pq.appendIvfPqIndex(nw.filter(col("vec_id") >= 250), "vec_id",
        "embedding", "ivfpq_app_b", buckets = 4, s"$dir/sidecar", dim = 64, m = 8)
      assert(rows("ivfpq_app_b") == after, "append result depends on batch split")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivfpq_app_a")
      spark.sql("DROP TABLE IF EXISTS ivfpq_app_b")
    }
  }

  test("int8-quantized top-k stays close to the float top-k (within brute-force top-20)") {
    val emb = Tables.embeddings(spark, sf)
    val isQuery = col("vec_id") % 50 === 0
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", isQuery, k = 20)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val q8 = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .select(col("id").as("vec_id"), col("q").cast("array<float>").as("embedding"))
    val int8 = Similarity.bruteForceTopK(q8, "vec_id", "embedding", isQuery, k = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(int8.nonEmpty, "int8 top-k returned nothing")
    // int8 codes preserve ~7 bits per dim; top-5 under quantized cosine
    // should overwhelmingly land inside the float top-20
    val good = int8.count(brute.contains)
    assert(good.toDouble / int8.length >= 0.8,
      s"int8 top-k diverged from float ranking: $good/${int8.length}")
  }

  test("simhash pairs recover synthesized near-duplicates") {
    val docs = Tables.documents(spark, sf)
    val near = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" extratoken")).as("text"))
    val corpus = docs.select(col("doc_id"), col("text")).union(near)
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (id, id + 200000)).toSet
    val found = expected.count(pairs.contains)
    // one appended token flips few simhash bits: expect most planted pairs found
    assert(found.toDouble / expected.size >= 0.8,
      s"simhash missed too many planted near-dups: $found/${expected.size}")
  }

  test("containment catches a quote inside a much longer doc that Jaccard cannot see, directed") {
    import spark.implicits._
    // doc 1 = a 12-word paragraph; doc 2 = that paragraph quoted verbatim
    // inside ~10x filler; doc 3 = unrelated. All words distinct so the
    // shingle arithmetic is exact: grams(1) ⊂ grams(2), |grams(1)| = 10.
    val para = (0 until 12).map(i => s"p$i").mkString(" ")
    val filler = (0 until 110).map(i => s"f$i").mkString(" ")
    val other = (0 until 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, para), (2L, s"$filler $para"), (3L, other))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont == Set((1L, 2L)),
      s"expected exactly the directed contained-in pair (1,2), got $cont")
    // the same pair is invisible to resemblance at any usable threshold:
    // J(1,2) = 10 / (10 + 120 - 10) ≈ 0.08
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.isEmpty, s"Jaccard unexpectedly fired on the quote pair: $jac")
  }

  test("minhash signatures are deterministic and band-join finds exact copies") {
    val docs = Tables.documents(spark, sf).limit(50)
    val copies = docs.select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val pairs = Dedup.minhashLshPairs(docs.select(col("doc_id"), col("text")).union(copies),
        "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // an exact copy has an identical signature -> must be a candidate pair
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    ids.foreach(id => assert(pairs.contains((id, id + 1000)), s"missing exact-copy pair for $id"))
  }

  test("multimodal resize + frame-sample plumbing") {
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf))
    val resized = Multimodal.resizeStub(media, 64, 64)
    val r = resized.head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getLong(meta.fieldIndex("n_bytes")) <= 64L * 64 / 64)
    val frames = Multimodal.frameSampleStub(media, nFrames = 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "payload", "n_bytes"))
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty && perVideo.forall(_.getLong(1) == 4))
  }

  test("multimodal decode plumbing: schema, determinism, per-row features") {
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf))
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "modality", "payload", "meta"))
    val feats = Multimodal.decodeFeatures(media, dim = 8)
    assert(feats.schema == Multimodal.featureSchema.copy(fields =
      Multimodal.featureSchema.fields.map(f =>
        if (f.name == "feature") f.copy(dataType =
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false))
        else f)))
    val twice = Multimodal.decodeFeatures(media, dim = 8)
    val a = feats.orderBy("media_id").collect().map(_.toString)
    val b = twice.orderBy("media_id").collect().map(_.toString)
    assert(a.sameElements(b), "decode stub must be deterministic")
    val row = feats.filter(col("media_id") === 0).head()
    assert(row.getSeq[Float](row.fieldIndex("feature")).length == 8)
    assert(row.getAs[Long]("n_bytes") > 0)
  }

  test("real JDK image codec: PNG and BMP encode->decode round-trips every closed-form pixel") {
    for (id <- Seq(0L, 1L, 7L, 12L, 123L, 498L, 499L)) {
      val fmt = if (id % 2 == 0) "png" else "bmp"
      val bytes = Multimodal.encodeImage(Multimodal.synthImage(id), fmt)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"$fmt payload for id=$id did not decode")
      assert(img.getWidth == (8 + id % 8).toInt, s"width mismatch id=$id")
      assert(img.getHeight == (8 + id % 5).toInt, s"height mismatch id=$id")
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xFF) == ((id * 31 + x * 7 + y * 13) % 256).toInt,
          s"red mismatch id=$id at ($x,$y) via $fmt")
        assert(((p >> 8) & 0xFF) == ((id * 17 + x * 11 + y * 3) % 256).toInt,
          s"green mismatch id=$id at ($x,$y) via $fmt")
        assert((p & 0xFF) == ((id * 13 + x * 5 + y * 19) % 256).toInt,
          s"blue mismatch id=$id at ($x,$y) via $fmt")
      }
    }
  }

  test("resizeImages: re-encoded PNG payload re-decodes to the reported resized raster") {
    val media = Multimodal.imageCorpus(Tables.documents(spark, sf))
    val out = Multimodal.resizeImages(media, w = 7, h = 9).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img != null, s"resized payload for ${r.getLong(0)} did not decode")
      assert(img.getWidth.toLong == r.getAs[Long]("width") && img.getWidth == 7)
      assert(img.getHeight.toLong == r.getAs[Long]("height") && img.getHeight == 9)
      var s = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        s += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
      }
      assert(s == r.getAs[Long]("pixel_sum"),
        s"lossless PNG round-trip changed pixels for media_id=${r.getLong(0)}")
    }
  }

  test("uncompressed AVI: encode -> parse -> index-seek round-trips every closed-form frame") {
    for (id <- Seq(0L, 1L, 5L, 42L, 123L, 499L)) {
      val n = (2 + id % 4).toInt
      val frames = (0 until n).map(f => Multimodal.synthFrame(id, f))
      val bytes = Multimodal.encodeAvi(frames)
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI ", s"id=$id: not a RIFF AVI")
      val idx = Multimodal.parseAvi(bytes)
      assert(idx.width == (8 + id % 8).toInt && idx.height == (8 + id % 5).toInt,
        s"id=$id: header dims wrong")
      assert(idx.nFrames == n, s"id=$id: header frame count wrong")
      for (f <- 0 until n) {
        var expected = 0L
        for (y <- 0 until idx.height; x <- 0 until idx.width) {
          expected += ((id * 31 + f * 41 + x * 7 + y * 13) % 256) +
            ((id * 17 + f * 29 + x * 11 + y * 3) % 256) +
            ((id * 13 + f * 23 + x * 5 + y * 19) % 256)
        }
        assert(Multimodal.aviFramePixelSum(bytes, idx, f) == expected,
          s"id=$id frame=$f: seeked raster diverges from the closed form")
      }
    }
  }

  test("decodeImagesSafe flags corrupt payloads without failing and decodes the rest exactly") {
    val media = Multimodal.imageCorpus(Tables.documents(spark, sf).limit(40))
      .withColumn("payload",
        when(col("media_id") % 3 === 0, lit("not an image at all".getBytes))
          .when(col("media_id") % 3 === 1, expr("substring(payload, 1, 5)"))
          .otherwise(col("payload")))
    val out = Multimodal.decodeImagesSafe(media).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 2) {
        assert(r.getBoolean(2), s"valid payload $id flagged corrupt")
        assert(r.getLong(3) == 8 + id % 8 && r.getLong(4) == 8 + id % 5,
          s"valid payload $id decoded wrong dims")
      } else {
        assert(!r.getBoolean(2), s"corrupt payload $id not flagged")
        assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
          s"corrupt payload $id carries stats")
      }
    }
  }

  test("safe audio/video decoders quarantine corrupt containers and keep healthy ones exact") {
    val docs = Tables.documents(spark, sf).limit(30)
    val audio = Multimodal.audioCorpus(docs)
      .withColumn("payload",
        when(col("media_id") % 5 === 0, expr("substring(payload, 1, 7)"))
          .otherwise(col("payload")))
    Multimodal.decodeAudioSafe(audio).collect().foreach { r =>
      val id = r.getLong(0)
      if (id % 5 == 0) assert(!r.getBoolean(1) && r.isNullAt(3), s"audio $id not quarantined")
      else {
        assert(r.getBoolean(1), s"healthy audio $id flagged")
        assert(r.getLong(3) == 64 + id % 64, s"healthy audio $id wrong sample count")
      }
    }
    val video = Multimodal.videoCorpus(docs)
      .withColumn("payload",
        when(col("media_id") % 5 === 0, expr("substring(payload, 1, 11)"))
          .otherwise(col("payload")))
    val frames = Multimodal.sampleVideoFramesSafe(video, everyNth = 2).collect()
    val byId = frames.groupBy(_.getLong(0))
    byId.foreach { case (id, rs) =>
      if (id % 5 == 0)
        assert(rs.length == 1 && !rs.head.getBoolean(1), s"video $id not quarantined")
      else {
        assert(rs.forall(_.getBoolean(1)), s"healthy video $id flagged")
        assert(rs.map(_.getLong(2)).sorted.toSeq == (0L until 2 + id % 4 by 2).toSeq,
          s"healthy video $id sampled wrong frames")
      }
    }
  }

  test("JPEG codec: JDK round-trip preserves dims exactly; lossy pixels stay within tolerance") {
    val media = Multimodal.jpegCorpus(Tables.documents(spark, sf).limit(40))
      .withColumn("payload",
        when(col("media_id") % 10 === 0, expr("substring(payload, 1, 10)"))
          .otherwise(col("payload")))
    val out = Multimodal.decodeImagesSafe(media).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 10 == 0) {
        assert(!r.getBoolean(2), s"truncated JPEG $id not flagged")
      } else {
        assert(r.getBoolean(2), s"healthy JPEG $id flagged corrupt")
        assert(r.getLong(3) == 8 + id % 8 && r.getLong(4) == 8 + id % 5,
          s"JPEG $id decoded wrong dims — dims must survive a lossy round-trip")
        // lossy tolerance: the raster's total RGB mass is dominated by
        // the DC coefficients JPEG preserves, so the decoded sum must
        // stay near the exact pre-encode sum even on noise rasters
        val w = 8 + id % 8; val h = 8 + id % 5
        var exact = 0L
        var y = 0L
        while (y < h) {
          var x = 0L
          while (x < w) {
            exact += (id * 31 + x * 7 + y * 13) % 256 +
              (id * 17 + x * 11 + y * 3) % 256 + (id * 13 + x * 5 + y * 19) % 256
            x += 1
          }
          y += 1
        }
        val got = r.getLong(5)
        assert(math.abs(got - exact).toDouble <= 0.15 * exact,
          s"JPEG $id pixel sum $got drifted >15% from exact $exact")
      }
    }
  }

  test("sampleVideoFramesSafe quarantines movi bit-rot under an intact header/idx1") {
    // the corruption class the lazy-iterator trap missed: the RIFF tree
    // and idx1 parse fine, but a frame chunk's fourcc is rotted — decode
    // fails only when the frame is READ, which must still be inside the
    // quarantine (materialized rows), not a task failure at consumption
    val rows = Multimodal.videoCorpus(Tables.documents(spark, sf).limit(20)).collect()
    val patched = rows.map { r =>
      val id = r.getLong(0)
      val bytes = r.get(2).asInstanceOf[Array[Byte]].clone()
      if (id % 4 == 0) {
        val idx = Multimodal.parseAvi(bytes)
        bytes(idx.moviPos + idx.frameOffsets(0)) = 'X'.toByte // rot frame 0's fourcc
      }
      org.apache.spark.sql.Row(id, r.getLong(1), bytes)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_frames",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(patched.toSeq, 2), schema)
    val out = Multimodal.sampleVideoFramesSafe(df, everyNth = 1).collect()
    out.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      if (id % 4 == 0)
        assert(rs.length == 1 && !rs.head.getBoolean(1), s"bit-rot video $id not quarantined")
      else assert(rs.forall(_.getBoolean(1)), s"healthy video $id flagged")
    }
  }

  test("PCM WAV: AudioSystem encode -> decode round-trips every closed-form sample") {
    for (id <- Seq(0L, 1L, 63L, 64L, 123L, 499L)) {
      val samples = Multimodal.synthSamples(id)
      val bytes = Multimodal.encodeWav(samples)
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE", s"id=$id: not a RIFF WAVE")
      val (rate, decoded) = Multimodal.decodeWav(bytes)
      assert(rate == 8000f, s"id=$id: sample rate mangled")
      assert(decoded.length == (64 + id % 64).toInt, s"id=$id: sample count wrong")
      assert(decoded.sameElements(samples), s"id=$id: PCM samples diverged")
    }
  }

  test("sampleVideoFrames seeks only every Nth frame and matches the direct frame sums") {
    val media = Multimodal.videoCorpus(Tables.documents(spark, sf).limit(50))
    val out = Multimodal.sampleVideoFrames(media, everyNth = 2).collect()
    assert(out.nonEmpty)
    // every sampled frame_no is even and below its video's frame count
    out.foreach { r =>
      val id = r.getLong(0); val f = r.getLong(1)
      assert(f % 2 == 0 && f < 2 + id % 4, s"bad sampled frame ($id, $f)")
    }
    // ids with n=2 frames sample exactly {0}; n=3 or 4 sample {0, 2}
    val perId = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toSeq)
    perId.foreach { case (id, fs) =>
      val n = 2 + id % 4
      assert(fs == (0L until n by 2).toSeq, s"id=$id sampled $fs of $n frames")
    }
  }

  test("fused safe-feature pass equals decodeImagesSafe + imagePixelFeatures, one decode each") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 80)
    val media = Multimodal.imageCorpus(docs)
      .withColumn("payload",
        when(col("media_id") % 10 === 0, expr("substring(payload, 1, 10)"))
          .otherwise(col("payload")))
    val fused = Multimodal.imagePixelFeaturesSafe(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    // quarantine verdicts match decodeImagesSafe exactly
    val safe = Multimodal.decodeImagesSafe(media).collect()
    safe.foreach { r =>
      val f = fused(r.getLong(0))
      assert(f.getBoolean(2) === r.getBoolean(2), s"decode_ok diverged for ${r.getLong(0)}")
      if (r.getBoolean(2)) {
        assert(f.getLong(3) === r.getLong(3) && f.getLong(4) === r.getLong(4))
      } else assert(f.isNullAt(3) && f.isNullAt(4) && f.isNullAt(5))
    }
    // healthy features match the strict single-purpose extractor
    val healthyIds = safe.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val feats = Multimodal.imagePixelFeatures(
        Multimodal.imageCorpus(docs).filter(col("media_id").isInCollection(healthyIds)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    healthyIds.foreach { id =>
      assert(fused(id).getSeq[Float](5) === feats(id), s"feature diverged for $id")
    }
  }

  test("blocked near-dup pairs = unblocked pairs restricted to equal block keys") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 120)
    val feats = Multimodal.imagePixelFeatures(Multimodal.imageCorpus(docs))
      .withColumn("width", element_at(col("feature"), 1).cast("long"))
      .withColumn("height", element_at(col("feature"), 2).cast("long"))
    val blocked = Similarity.cosineNearDupPairsBlocked(
        feats, "media_id", "feature", Seq("width", "height"), threshold = 0.9999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dims = feats.select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val unblocked = Similarity.cosineNearDupPairs(
        feats, "media_id", "feature", lit(true), threshold = 0.9999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === unblocked.filter { case (a, b) => dims(a) == dims(b) })
  }

  test("e2lsh near-dup blocking: identical rasters always collide, cell count scales with the corpus") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val corpus = Multimodal.imageCorpus(docs)
      .union(Multimodal.imageCorpusCrossDup(docs, every = 25, idOffset = 100000L))
    val feats = Multimodal.imagePixelFeaturesSafe(corpus).filter(col("decode_ok"))
    // recall 1 for the re-encode channel: equal features => equal key
    val pairs = Similarity.cosineNearDupPairsLsh(feats, "media_id", "feature",
        threshold = 0.999999, nPlanes = 4, dim = 5, bucketWidth = 4.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 200L by 25).foreach { case orig =>
      assert(pairs.contains((orig, orig + 100000L)),
        s"missed cross-format duplicate ($orig, ${orig + 100000L})")
    }
    // the block key's cardinality grows with the data — the property the
    // (width, height) key lacked (it is capped at 8x5 forever)
    def cells(n: Int): Long = {
      val f = Multimodal.imagePixelFeaturesSafe(
          Multimodal.imageCorpus(Tables.documents(spark, sf)
            .filter(col("doc_id") < n)))
        .filter(col("decode_ok"))
      f.select(Similarity.e2lshKey(col("feature"), 4, 5, 4.0).as("blk"))
        .distinct().count()
    }
    val (c100, c200) = (cells(100), cells(200))
    assert(c200 > c100, s"cell count must grow with the corpus ($c100 -> $c200)")
    assert(c200 > 40, s"cells must stay fine-grained, got $c200 for 200 images")
  }

  test("dedup_embedding: unit-normalized e2lsh key recovers every 1.01x-scaled copy") {
    // The near-dup gate keys on v/||v||, so the scaling channel shifts each
    // projection only by float-rounding noise (~1e-6 vs bucketWidth 0.25)
    // — recall on (k, k+100000) must be exactly 1. A raw-vector key would
    // shift projections by 1% of magnitude and miss at cell boundaries.
    val out = SparkEntry.allQueries.find(_.name == "dedup_embedding").get
      .build(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseIds = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 0)
      .select("vec_id").collect().map(_.getLong(0))
    assert(baseIds.nonEmpty)
    baseIds.foreach { k =>
      assert(out.contains((k, k + 100000L)),
        s"missed 1.01x-scaled duplicate ($k, ${k + 100000L})")
    }
    // and the LSH blocking admits no spurious pairs on this corpus: the
    // random synthetic embeddings have no organic cos >= 0.99 neighbors
    assert(out.size == baseIds.length,
      s"expected exactly the ${baseIds.length} scaled pairs, got ${out.size}")
  }

  test("aHash is container-invariant: every cross-format re-encode hashes equal to its original") {
    val docs = Tables.documents(spark, sf)
    val orig = Multimodal.imageAHashes(Multimodal.imageCorpus(docs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dups = Multimodal.imageAHashes(
        Multimodal.imageCorpusCrossDup(docs, every = 10, idOffset = 100000))
      .collect().map(r => (r.getLong(0) - 100000) -> r.getString(1))
    assert(dups.nonEmpty)
    dups.foreach { case (sid, h) =>
      assert(orig(sid) == h, s"re-encode of $sid hashes differently")
    }
    // and the hash is a genuine 64-bit structural signature, not constant
    assert(orig.values.toSet.size > 1, "aHash degenerate: all images hash equal")
  }

  test("cross-format duplicates are caught by decoded-feature near-dup, invisible to byte dedup") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val corpus = Multimodal.imageCorpus(docs)
      .union(Multimodal.imageCorpusCrossDup(docs, every = 25, idOffset = 100000L))
    // payload bytes differ (PNG vs BMP container), so byte-exact dedup sees nothing
    val byteDup = corpus.groupBy(md5(col("payload"))).count().filter(col("count") > 1).count()
    assert(byteDup === 0, "cross-format copies should have distinct payload bytes")
    // decoded features are identical -> every dup id pairs with its original at cos=1
    val pairs = Similarity.cosineNearDupPairsBlocked(
        Multimodal.imagePixelFeaturesSafe(corpus).filter(col("decode_ok")),
        "media_id", "feature", Seq("width", "height"), threshold = 0.999999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dupIds = (0L until 200L by 25).map(id => (id, id + 100000L))
    dupIds.foreach { case (orig, dup) =>
      assert(pairs.contains((orig, dup)), s"missed cross-format duplicate ($orig, $dup)")
    }
  }

  test("scene cuts fire exactly at the synthetic scene boundaries, any partitioning") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    def cuts(parts: Int) = graft.ops.Multimodal.detectSceneCuts(
        graft.ops.Multimodal.gifSceneCorpus(docs).repartition(parts), tau = 40L)
      .orderBy("media_id", "frame_no")
      .select("media_id", "frame_no", "is_cut")
      .as[(Long, Long, Boolean)].collect().toSeq
    val r = cuts(3)
    assert(r.nonEmpty)
    // scenes are length 3 by construction: a cut iff frame_no % 3 == 0
    for ((id, f, c) <- r)
      assert(c == (f % 3 == 0), s"media $id frame $f: is_cut=$c")
    assert(cuts(11) == r)
  }

  test("imagePHashes: flat raster hashes to 0; identical rasters collide; DCT is partitioning-invariant") {
    import spark.implicits._
    def png(gray: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    // flat image: every AC DCT coefficient is exactly 0 -> sign bits all 0
    val flat = Seq((1L, png(120, 9, 7)), (2L, png(200, 12, 8)))
      .toDF("media_id", "payload")
    val r = graft.ops.Multimodal.imagePHashes(flat)
      .orderBy("media_id").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 0L), (2L, 0L)), r.toString)
    // identical synthetic rasters (same source id) collide across ids
    val docs = (0L until 30L).toDF("doc_id")
    val media = graft.ops.Multimodal.imageCorpus(docs)
    val h1 = graft.ops.Multimodal.imagePHashes(media)
      .orderBy("media_id").as[(Long, Long)].collect().toSeq
    val h2 = graft.ops.Multimodal.imagePHashes(media.repartition(7))
      .orderBy("media_id").as[(Long, Long)].collect().toSeq
    assert(h1 == h2)
  }

  test("MMR actually diversifies: round 2 skips the duplicate of round 1's pick") {
    val s = spark
    import s.implicits._
    // hand-checked geometry: a (id 1) is most relevant, b (id 2) is an
    // EXACT duplicate of a, c (id 3) is slightly less relevant but
    // diverse. Pure relevance ranks (a, b); MMR round 2 must skip b
    // (sim-to-selected = 1.0 costs the full 0.3 penalty) and take c:
    //   score(b) = 0.7*0.9 - 0.3*1.0    = 0.33
    //   score(c) = 0.7*0.8 - 0.3*0.4585 = 0.4225
    val emb = Seq(
      (100L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.4359f)),
      (2L, Seq(0.9f, 0.4359f)),
      (3L, Seq(0.8f, -0.6f))).toDF("vec_id", "embedding")
    val sel = Similarity.mmrTopK(emb, "vec_id", "embedding",
        col("vec_id") === 100, perList = 3, k = 2)
      .orderBy("rk").select("rk", "cand_id")
      .as[(Long, Long)].collect().toSeq
    assert(sel == Seq((1L, 1L), (2L, 3L)),
      s"expected relevance pick then diversity pick, got $sel")
    // and the relevance-only ranking WOULD have taken the duplicate
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        col("vec_id") === 100, k = 2)
      .orderBy("rk").select("cand_id").as[Long].collect().toSeq
    assert(brute == Seq(1L, 2L), s"geometry changed: brute top-2 = $brute")
  }

  test("DP quantile: deterministic, on the public grid, noise within the cap") {
    val q = SparkEntry.allQueries.find(_.name == "privacy_dp_quantile").get
    val a = q.build(spark, sf).collect()
    val b = q.build(spark, sf).collect()
    assert(a.sameElements(b), "seeded mechanism must replay exactly")
    val row = a.head
    val med = row.getAs[Long]("dp_median_cents")
    assert(med % 1562500L == 0 && med >= 1562500L && med <= 32 * 1562500L,
      s"released value off the public candidate grid: $med")
    // score = -|rank - n/2| + G with |G| <= 16: the winner's score can
    // never exceed the noise cap
    assert(row.getAs[Long]("noisy_score") <= 16L)
  }
}
