package graft

import graft.ops.{Codec, FakeImageDecoder, FakeImageResizer, Multimodal, Tables}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, metadata-only pruning,
  * frame fan-out, and the mapPartitions decode stage with pinned stub
  * features.
  */
class MultimodalSpec extends SparkSpec {

  test("media view: payload is binary, metadata typed, one row per doc") {
    val m = Multimodal.media(spark, Sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("width").dataType.typeName == "integer")
    assert(m.count() == Tables.documents(spark, Sf).count())
  }

  test("m1 reads no payload bytes: plan prunes payload for metadata-only aggregates") {
    // metadata-only query over the media view must not carry payload
    // into the aggregate
    val metaOnly = Multimodal
      .media(spark, Sf)
      .groupBy(col("format"))
      .agg(avg(col("width") * col("height")).as("avg_px"))
    val plan = metaOnly.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"), s"payload survived pruning:\n$plan")
  }

  test("m2 frame sampling: every 5th second from 0 to duration inclusive") {
    val rows = Multimodal.m2FrameSample(spark, Sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, fs) =>
      val dur = fs.head.getInt(1)
      val expected = (0 to dur by 5).toSeq
      assert(fs.map(_.getInt(2)).toSeq.sorted == expected)
    }
  }

  test("stub decoder is deterministic and pins known values") {
    val d = FakeImageDecoder.open()
    val out = d.decode("abc".getBytes("UTF-8"))
    assert(out.nBytes == 3)
    assert(math.abs(out.meanByte - (97 + 98 + 99) / 3.0) < 1e-9)
    // mod-1e9+7 polynomial of "abc": ((97*131 + 98)*131 + 99) % P
    assert(out.fingerprint == ((97L * 131 + 98) * 131 + 99) % 1000000007L)
    assert(d.decode("abc".getBytes("UTF-8")).fingerprint == out.fingerprint)
  }

  test("m3 features agree with a local decode of the same payloads") {
    val feats = Multimodal
      .m3ImageFeatures(spark, Sf)
      .limit(50)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(4)))
      .toMap
    val local = Tables
      .documents(spark, Sf)
      .select(col("doc_id"), col("text"))
      .collect()
      .map { r =>
        val d = FakeImageDecoder.open().decode(r.getString(1).getBytes("UTF-8"))
        r.getLong(0) -> (d.nBytes, d.fingerprint)
      }
      .toMap
    feats.foreach { case (id, f) => assert(local(id) == f, s"doc $id") }
  }

  test("codec seam: a second provider swaps into m3/m4/m7 without touching the plans") {
    val alt = new Codec.XorMaskedProvider(0x5A)
    // m3 under the default provider == m3 with Stub passed explicitly
    val base = Multimodal.m3ImageFeatures(spark, Sf).limit(30).collect()
    val stub = Multimodal.m3ImageFeatures(spark, Sf, Codec.Stub).limit(30).collect()
    assert(base.toSeq == stub.toSeq, "explicit Stub must equal the default")
    // the swapped codec flows through the SAME operator: same schema,
    // same row count, same byte counts - different decoded features
    val swapped = Multimodal.m3ImageFeatures(spark, Sf, alt).limit(30).collect()
    assert(swapped.length == base.length)
    base.zip(swapped).foreach { case (b, a) =>
      assert(b.getLong(0) == a.getLong(0) && b.getInt(2) == a.getInt(2))
      assert(b.getLong(4) != a.getLong(4), s"doc ${b.getLong(0)}: mask must change the fingerprint")
    }
    // and the swapped fingerprint is exactly the stub arithmetic over
    // the masked bytes - the provider is the only thing that moved
    val doc0 = Tables.documents(spark, Sf).filter(col("doc_id") === base.head.getLong(0))
      .select(col("text")).head().getString(0).getBytes("UTF-8")
    val masked = doc0.map(b => (b ^ 0x5A).toByte)
    assert(swapped.head.getLong(4) == FakeImageDecoder.open().decode(masked).fingerprint)
    // m4's output is metadata + lengths only: invariant under any
    // byte-preserving codec swap (the plan never looks at byte VALUES)
    val r0 = Multimodal.m4Resize(spark, Sf).limit(20).collect()
    val r1 = Multimodal.m4Resize(spark, Sf, alt).limit(20).collect()
    assert(r0.toSeq == r1.toSeq)
    // m7 energies shift deterministically under the mask
    val a0 = Multimodal.m7AudioFrames(spark, Sf).limit(10).collect()
    val a1 = Multimodal.m7AudioFrames(spark, Sf, alt).limit(10).collect()
    assert(a0.zip(a1).forall { case (x, y) =>
      x.getLong(0) == y.getLong(0) && x.getInt(1) == y.getInt(1)
    }, "frame counts depend only on length: invariant under the mask")
    assert(a0.map(_.getLong(3)).toSeq != a1.map(_.getLong(3)).toSeq,
      "total energies must differ under the masked codec")
  }

  test("stub resizer box-fits with one shared integer scale and subsamples bytes") {
    val r = FakeImageResizer.open(box = 64)
    // 200×100 → scale 4 (width-bound), dims 50×25, aspect preserved
    val out = r.resize(200, 100, Array.tabulate(10)(_.toByte))
    assert(out.scale == 4 && out.width == 50 && out.height == 25)
    assert(out.payload.toSeq == Seq[Byte](0, 4, 8)) // every 4th byte
    // already inside the box → identity
    val id = r.resize(64, 64, Array[Byte](1, 2))
    assert(id.scale == 1 && id.width == 64 && id.height == 64)
    assert(id.payload.toSeq == Seq[Byte](1, 2))
    assert(r.resize(65, 64, Array.empty[Byte]).payload.isEmpty)
  }

  test("m6 perceptual near-dup: every brightness-shifted plant found at Hamming 0") {
    import org.apache.spark.sql.functions._
    val rows = Multimodal.m6PerceptualNearDup(spark, Sf).collect()
    val planted = Tables.documents(spark, Sf)
      .filter(length(col("text")) >= 32)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the +1-per-byte copy of doc i lives at id i + 1e6; brightness
    // invariance must land every such pair at exactly Hamming 0
    val zeroPairs = rows
      .filter(_.getAs[Int]("hamming") == 0)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    planted.foreach { id =>
      assert(zeroPairs.contains((id, id + 1000000L)),
        s"planted re-encode of $id not found at Hamming 0")
    }
    rows.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("m7 audio frames: counts and energies are consistent with payload bytes") {
    import org.apache.spark.sql.functions._
    val frames = Multimodal.m7AudioFrames(spark, Sf)
    val truth = Multimodal
      .media(spark, Sf)
      .select(col("doc_id"), length(col("payload")).as("nb"))
    val joined = frames.join(truth, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nf, ns, total, peak, nb) =
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5))
      assert(nf == (nb + 199) / 200, s"doc ${r.getLong(0)}: frame count")
      assert(ns >= 0 && ns <= nf)
      assert(peak <= total && peak >= total / nf,
        s"doc ${r.getLong(0)}: peak must bound the mean frame energy")
    }
  }

  test("m8 scenes partition each title's frame timeline; frame counts agree with m7") {
    import org.apache.spark.sql.functions._
    val scenes = Multimodal.m8SceneCuts(spark, Sf)
    val frames = Multimodal.m7AudioFrames(spark, Sf).select(
      col("doc_id"), col("n_frames").as("m7_frames"))
    val joined = scenes.join(frames, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (ns, nf, longest, shortest, m7f) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))
      assert(nf == m7f.toLong, s"doc ${r.getLong(0)}: m8/m7 frame counts differ")
      assert(ns >= 1 && shortest >= 1 && longest <= nf)
      assert(shortest <= longest && ns * shortest <= nf && ns * longest >= nf)
    }
  }

  test("m4 output dims always fit the 64-box and n_bytes_out matches the subsample") {
    val rows = Multimodal.m4Resize(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, w, h, n) = (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(w <= 64 && h <= 64, s"doc ${r.getLong(0)}: $w x $h escapes the box")
      assert(scale >= 1 && n >= 0)
    }
  }

  test("m19 size sanity: flags partition assets, fill ratio consistent with byte totals") {
    val rows = Multimodal.m19SizeSanity(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("jpeg", "png", "webp"))
    assert(rows.map(_.getLong(1)).sum ==
      graft.ops.Tables.documents(spark, Sf).count())
    rows.foreach { r =>
      val (n, trunc, bloat, act, exp, fill) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(trunc + bloat <= n, "a single asset cannot be both suspect classes")
      assert(act > 0L && exp > 0L && fill == act * 10000L / exp)
    }
  }

  test("m20 chunk delta: only edited docs cost bytes, and far less than their volume") {
    val rows = Multimodal.m20ChunkDelta(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nChanged, nNew, total, newB, reuse) =
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      if (nChanged == 0L)
        assert(nNew == 0L && newB == 0L,
          s"${r.getString(0)}: unchanged sources must be fully chunk-reused")
      assert(reuse == (total - newB) * 10000L / total)
      // CDC re-sync: an edit disturbs the chunk it lands in plus at
      // most a shifted boundary — a bounded constant per edited doc
      // (avg chunk ≈ 32 bytes + the 9-byte splice), never per-doc
      // volume. The fixture's source keying puts ALL of a source's
      // docs in the edit class (doc_id ≡ 5 mod 10 vs mod-20 sources),
      // so the bound must be per changed doc, not per source volume.
      assert(newB <= nChanged * 200L,
        s"${r.getString(0)}: new bytes $newB exceed the re-sync bound for $nChanged edits")
    }
    val changed = rows.map(_.getLong(2)).sum
    val expected = graft.ops.Tables.documents(spark, Sf)
      .filter(pmod(col("doc_id"), lit(10)) === 5 && length(col("text")) >= 8)
      .count()
    assert(changed == expected, "changed-doc accounting covers exactly the planted edits")
  }
}
