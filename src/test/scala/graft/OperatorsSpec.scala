package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  import spark.implicits._

  private val texts = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different content about spark distributed query engines"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (5L, "yet another unrelated piece of text mentioning nothing similar at all"))

  test("exact dedup finds duplicate groups and keeps min id") {
    val df = texts.toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(df, "doc_id", "text").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("n_copies") == 2)
    assert(groups(0).getAs[Long]("keep_id") == 1L)
    val deduped = Dedup.exactDedup(df, "doc_id", "text")
    assert(deduped.count() == 4)
    assert(deduped.where($"doc_id" === 4L).isEmpty)
  }

  test("minhash LSH finds near-dup and exact-dup pairs, not unrelated ones") {
    val df = texts.toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup must collide in every band")
    assert(pairs.contains((1L, 2L)), "one-word-changed near dup should collide")
    assert(!pairs.contains((3L, 5L)), "unrelated texts should not pair")
  }

  test("simhash pairs have verified hamming distance and find near-dups") {
    val df = texts.toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 3)
    val rows = pairs.collect()
    rows.foreach { r =>
      val h = java.lang.Long.bitCount(
        Dedup.simHash64(texts.find(_._1 == r.getLong(0)).get._2) ^
          Dedup.simHash64(texts.find(_._1 == r.getLong(1)).get._2))
      assert(h == r.getAs[Int]("hamming") && h <= 3)
    }
    assert(rows.exists(r => r.getLong(0) == 1L && r.getLong(1) == 4L))
  }

  test("ngram jaccard: identical = 1.0, near-dup high, unrelated low") {
    val df = texts.toDF("doc_id", "text")
    val cand = Seq((1L, 4L), (1L, 2L), (3L, 5L)).toDF("idA", "idB")
    val j = Dedup.ngramJaccard(cand, df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 2L)) > 0.6)
    assert(j((3L, 5L)) < 0.1)
  }

  test("brute-force knn matches an independent in-memory computation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = Similarity.bruteKnn(emb, emb.where($"vec_id" < 5), k = 3)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq).toMap

    // independent: collect vectors, compute cosine in plain Scala
    val vecs = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
    }
    for (q <- 0L until 5L) {
      val qv = vecs.find(_._1 == q).get._2
      val expected = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).map(_._1).toSeq
      assert(got(q) == expected, s"query $q: got ${got(q)}, expected $expected")
    }
  }

  test("lsh knn achieves reasonable recall vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.where($"vec_id" < 20)
    val brute = Similarity.bruteKnn(emb, qs, k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val approx = Similarity.lshKnn(emb, qs, k = 5, planeBits = 4, tables = 8).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = brute.keys.toSeq.map { q =>
      val a = approx.getOrElse(q, Set.empty)
      brute(q).intersect(a).size.toDouble / brute(q).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"mean LSH recall@5 = $meanRecall")
  }

  test("ivf knn: deterministic, and probing more lists raises recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.where($"vec_id" < 20)
    val brute = Similarity.bruteKnn(emb, qs, k = 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    def recallAt(nprobe: Int): Double = {
      val approx = Similarity.ivfKnn(emb, qs, k = 5, nlist = 16, nprobe = nprobe).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      val rs = brute.keys.toSeq.map { q =>
        brute(q).intersect(approx.getOrElse(q, Set.empty)).size.toDouble / brute(q).size
      }
      rs.sum / rs.size
    }
    val r4 = recallAt(4)
    val r16 = recallAt(16) // probing every list == brute force
    assert(r16 >= 0.999, s"full-probe recall $r16 should be exact")
    assert(r4 >= 0.3, s"nprobe=4 recall $r4 too low")
    assert(r16 >= r4)
    // determinism: centroids are seeded, so results repeat exactly
    val a = Similarity.ivfKnn(emb, qs, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = Similarity.ivfKnn(emb, qs, k = 5, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b)
  }

  test("multimodal assets + stub features are deterministic and complete") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(Multimodal.assets(docs)).persist()
    assert(feats.count() == docs.count())
    val f1 = feats.orderBy($"asset_id").head()
    val f2 = Multimodal.extractFeatures(Multimodal.assets(docs)).orderBy($"asset_id").head()
    assert(f1.asset_id == f2.asset_id && f1.width == f2.width &&
      f1.height == f2.height && f1.feature.toSeq == f2.feature.toSeq,
      "stub decode must be deterministic")
    assert(feats.where($"width" < 64 || $"width" >= 256).isEmpty)
    // feature vectors are L1-normalized byte histograms
    val sums = feats.select(aggregate($"feature", lit(0.0), (a, x) => a + x).as("s"))
      .where(abs($"s" - 1.0) > 1e-3)
    assert(sums.isEmpty)
    val frames = Multimodal.sampleFrames(feats, stride = 10)
    assert(frames.count() > 0)
    assert(frames.where($"frame_idx" % 10 =!= 0).isEmpty)
  }

  test("nearDupKeepers: transitive closure keeps one survivor per near-dup component") {
    val df = texts.toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(df, "doc_id", "text")
    // 1~2 (near), 1~4 (exact) => component {1,2,4}; 3 and 5 are singletons
    val keepers = Dedup.nearDupKeepers(df, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(keepers == Set(1L, 3L, 5L),
      s"expected one survivor for the {1,2,4} component plus singletons, got $keepers")
  }

  test("incremental minhash dedup: equals batch pairs without eviction, superset under eviction") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    def batches(p: Dedup.MinHashParams) = (0 until 3).map(b =>
      docs.where(pmod($"doc_id", lit(3)) === b))
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val p = Dedup.MinHashParams()
    val inc = pairSet(Dedup.minHashPairsIncremental(batches(p), "doc_id", "text", p))
    val bat = pairSet(Dedup.minHashPairs(docs, "doc_id", "text", p))
    assert(inc == bat, "incremental must equal batch when no block overflows the cap")

    // force evictions: the incremental result may only GAIN pairs
    // (found-then-evicted members), never lose any
    val tiny = Dedup.MinHashParams(cap = 2)
    val incT = pairSet(Dedup.minHashPairsIncremental(batches(tiny), "doc_id", "text", tiny))
    val batT = pairSet(Dedup.minHashPairs(docs, "doc_id", "text", tiny))
    assert(batT.subsetOf(incT), "incremental under eviction must be a superset of batch")
  }

  test("real PNG encode -> ImageIO decode roundtrip recovers dims and gradient") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val decoded = Multimodal.decodeImages(Multimodal.pngAssets(docs))
      .persist()
    assert(decoded.count() == docs.count(), "every asset must decode")
    // independent in-memory recompute of the expected roundtrip values
    // straight from the seed arithmetic (no Spark, no ImageIO)
    decoded.orderBy($"asset_id").take(25).foreach { r =>
      val seed = Multimodal.pngSeed(r.asset_id)
      val w = 64 + ((seed >>> 8) % 192).toInt
      val h = 64 + ((seed >>> 16) % 192).toInt
      val g0 = ((seed >>> 32) % 256).toInt
      val expSum = w.toLong * (0 until h).map(y => (g0 + y) % 256).sum
      assert(r.width == w && r.height == h, s"dims mismatch for ${r.asset_id}")
      assert(r.sum_gray == expSum, s"gray sum mismatch for ${r.asset_id}")
    }
    // the payloads are REAL PNGs: magic bytes present
    val first = Multimodal.pngAssets(docs).orderBy($"asset_id").head()
    assert(first.payload.take(8).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    decoded.unpersist()
    ()
  }

  test("real WAV encode -> AudioSystem decode roundtrip recovers frames and ramp") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val decoded = Multimodal.decodeAudio(Multimodal.wavAssets(docs)).persist()
    assert(decoded.count() == docs.count(), "every asset must decode")
    decoded.orderBy($"asset_id").take(25).foreach { r =>
      val seed = Multimodal.wavSeed(r.asset_id)
      val n = 256 + ((seed >>> 8) % 1024).toInt
      val s0 = ((seed >>> 16) % 256).toInt
      val expSum = (0 until n).map(t => (s0 + 7 * t) % 256).map(_.toLong).sum
      assert(r.n_samples == n && r.sample_rate == 8000,
        s"format mismatch for ${r.asset_id}")
      assert(r.sum_amp == expSum, s"amplitude sum mismatch for ${r.asset_id}")
    }
    // the payloads are REAL WAVs: RIFF/WAVE magic present
    val first = Multimodal.wavAssets(docs).orderBy($"asset_id").head()
    assert(new String(first.payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(first.payload.slice(8, 12), "US-ASCII") == "WAVE")
    decoded.unpersist()
    ()
  }

  test("real MP4 container: ISO-BMFF demux recovers stsz/mdhd written by the encoder") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val demuxed = Multimodal.demuxVideo(Multimodal.mp4Assets(docs)).persist()
    assert(demuxed.count() == docs.count(), "every container must demux")
    demuxed.orderBy($"asset_id").take(25).foreach { r =>
      val seed = Multimodal.mp4Seed(r.asset_id)
      val n = 8 + ((seed >>> 8) % 56).toInt
      val expBytes = (0 until n)
        .map(i => 64L + (((seed >>> 16) + 13L * i) % 192)).sum
      assert(r.n_frames == n, s"frame count mismatch for ${r.asset_id}")
      assert(r.sum_frame_bytes == expBytes, s"frame bytes mismatch for ${r.asset_id}")
      assert(r.timescale == 1000 && r.duration == n * 100L,
        s"mdhd mismatch for ${r.asset_id}")
    }
    // the payloads are REAL ISO-BMFF: 'ftyp' at offset 4, and the stco
    // chunk offset points exactly at the first mdat payload byte
    val first = Multimodal.mp4Assets(docs).orderBy($"asset_id").head()
    val bytes = first.payload
    assert(new String(bytes.slice(4, 8), "US-ASCII") == "ftyp")
    def find4cc(cc: String): Int =
      bytes.indices.indexWhere(i => i + 4 <= bytes.length &&
        new String(bytes.slice(i, i + 4), "US-ASCII") == cc)
    val stcoAt = find4cc("stco")
    val off = java.nio.ByteBuffer.wrap(bytes.slice(stcoAt + 12, stcoAt + 16)).getInt
    assert(off == find4cc("mdat") + 4, "stco must point at the mdat payload")
    demuxed.unpersist()
    ()
  }

  test("MP4 demux handles mdhd version 1 and refuses multi-trak files loudly") {
    import spark.implicits._
    def b(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12 + 8)
      bb.putInt(0).putInt(0).putInt(2).putInt(10).putInt(20)
      b("stsz", bb.array())
    }
    val mdhdV1 = { // version 1: 64-bit ctime/mtime/duration
      val bb = java.nio.ByteBuffer.allocate(36)
      bb.putInt(0x01000000).putLong(0L).putLong(0L).putInt(90000).putLong(123456L)
      b("mdhd", bb.array())
    }
    def asset(payload: Array[Byte]) =
      Multimodal.AssetRow(1L, "video/mp4", payload.length.toLong, payload)
    val v1 = b("moov", b("trak", b("mdia", mdhdV1 ++ b("minf", b("stbl", stsz)))))
    val r = Multimodal.demuxVideo(Seq(asset(v1)).toDS()).head()
    assert(r.n_frames == 2 && r.sum_frame_bytes == 30L &&
      r.timescale == 90000 && r.duration == 123456L,
      s"mdhd v1 must parse with the 64-bit layout, got $r")
    // two traks: must fail loudly, never silently keep the last one
    val twoTraks = b("moov",
      b("trak", b("mdia", mdhdV1 ++ b("minf", b("stbl", stsz)))) ++
      b("trak", b("mdia", mdhdV1 ++ b("minf", b("stbl", stsz)))))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.demuxVideo(Seq(asset(twoTraks)).toDS()).head()
    }
    assert(e.getMessage.contains("multiple traks") ||
      Option(e.getCause).exists(_.getMessage.contains("multiple traks")))
  }

  test("winnowing fingerprints: deterministic, overlapping for near-dups") {
    // long prefix identical; single change near the end so early windows
    // provably share their minima
    val a = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray zulu one").split(" ")
    val b = a.clone(); b(b.length - 2) = "CHANGED"
    val fa = TextAnalysis.winnow(a)
    val fb = TextAnalysis.winnow(b)
    assert(fa.toSeq == TextAnalysis.winnow(a).toSeq)
    assert(fa.intersect(fb).length > 0, "near-dup docs share fingerprints")
    assert(TextAnalysis.winnow(Array.empty[String]).isEmpty)
  }

  test("decontamination flags exactly the docs sharing an n-gram with the benchmark") {
    import graft.operators.Decontaminate
    // doc 1 copies an 8-token run from benchmark doc 100 twice (2 distinct
    // positions but via two DIFFERENT grams), doc 2 shares only 7 tokens
    // (below n), doc 3 is clean, doc 4 is too short to shingle at all
    val run = "alpha bravo charlie delta echo foxtrot golf hotel"
    val corpus = Seq(
      (1L, s"intro $run and also $run india"),
      (2L, "alpha bravo charlie delta echo foxtrot golf NOPE tail pad pad pad"),
      (3L, "totally unrelated words that never appear in the benchmark set here"),
      (4L, "too short")).toDF("doc_id", "text")
    val bench = Seq((100L, s"$run india juliet kilo")).toDF("doc_id", "text")
    val got = Decontaminate.flag(corpus, bench, n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "every corpus doc gets a verdict row")
    assert(got(1L)._2 && got(1L)._1 >= 2, s"planted dup: ${got(1L)}") // distinct grams
    assert(got(2L) == ((0L, false)), "7-token overlap must NOT flag at n=8")
    assert(got(3L) == ((0L, false)))
    assert(got(4L) == ((0L, false)), "sub-n doc contributes no grams")
    // scale shape: the benchmark set broadcasts; the corpus grams must
    // never reach a sort-merge join
    val plan = Decontaminate.flag(corpus, bench, n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side not broadcast\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus grams shuffled into a merge join\n$plan")
  }

  test("PII redaction: counts audit the input, the chain reaches a fixpoint") {
    import graft.operators.TextAnalysis._
    val df = Seq(
      (1L, "reach me at jane.doe+x@sub.example.org or 10.1.2.3 call 555-0199"),
      (2L, "two mails a@b.co c.d@e.io one ip 192.168.0.255"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        piiCountCol($"text", "email").as("e"),
        piiCountCol($"text", "ipv4").as("i"),
        piiCountCol($"text", "phone").as("p"),
        redactPiiCol($"text").as("r"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got(1L)._1 == 1 && got(1L)._2 == 1 && got(1L)._3 == 1)
    assert(got(2L)._1 == 2 && got(2L)._2 == 1 && got(2L)._3 == 0)
    assert(got(3L) == ((0, 0, 0, "no pii here at all")), "clean text passes through")
    assert(got(1L)._4 == "reach me at <EMAIL> or <IP> call <PHONE>",
      s"unexpected redaction: ${got(1L)._4}")
    // fixpoint: nothing matches after redaction
    val residual = df.select(redactPiiCol($"text").as("r"))
      .select(piiCountCol($"r", "email") + piiCountCol($"r", "ipv4") +
        piiCountCol($"r", "phone"))
      .collect().map(_.getInt(0)).sum
    assert(residual == 0, "redaction chain did not reach a fixpoint")
  }

  test("language guess heuristic picks the dominant stopword language") {
    val df = Seq(
      ("the cat and the dog is on a mat", "en"),
      ("le chat et la vache dans une maison", "fr"),
      ("el gato y el perro en una casa que", "es"),
      ("der hund und die katze ist im haus", "de"),
      ("zzz qqq xxx", "und")).toDF("text", "expected")
    val got = df.select(TextAnalysis.langGuessCol($"text").as("g"), $"expected")
      .where($"g" =!= $"expected").count()
    assert(got == 0)
  }
}
