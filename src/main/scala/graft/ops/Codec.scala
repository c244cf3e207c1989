package graft.ops

/** The pluggable multimodal codec seam (round-9 mandate): m3/m4/m7/m8
  * consume DECODERS THROUGH THESE TRAITS ONLY, so swapping the
  * deterministic offline stubs for real codecs (libjpeg-turbo, libvips,
  * ffmpeg/libsndfile bindings) means implementing one [[Codec.Provider]]
  * — zero changes to any operator's plan, schema, partitioning, or
  * batch shape. The operators keep their `mapPartitions` contract: the
  * provider ships in the task closure (hence `Serializable`), `open*`
  * runs ONCE PER PARTITION on the executor (where a real codec
  * allocates its native context), and rows stream through the opened
  * handle.
  *
  * The decoded-result case classes live here (not in the stubs) because
  * they are part of the OPERATOR contract — a real codec must produce
  * the same shapes.
  *
  * reference: the mandate list in VERDICT.md round 8 §Next-round item 6;
  * the stub behavior itself is pinned by MultimodalSpec and the m3/m4/
  * m7/m8 oracle entries, which are provider-independent for any codec
  * that reproduces the stub arithmetic (and rows-only otherwise).
  */
object Codec {

  /** Image decode output: size, mean byte, content fingerprint. */
  final case class Decoded(nBytes: Int, meanByte: Double, fingerprint: Long)

  /** Resize output: the single integer scale factor applied to both
    * axes, the new dimensions, and the resized payload bytes.
    */
  final case class Resized(scale: Int, width: Int, height: Int, payload: Array[Byte])

  /** Audio analysis rollup over fixed-length frames. */
  final case class Frames(nFrames: Int, nSilent: Int, totalEnergy: Long, peakEnergy: Long)

  /** Per-row image feature extraction (m3's handle). */
  trait ImageDecoder {
    def decode(payload: Array[Byte]): Decoded
  }

  /** Per-row box-fit thumbnailing (m4's handle). */
  trait ImageResizer {
    def resize(w: Int, h: Int, payload: Array[Byte]): Resized
  }

  /** Per-row audio framing + energy analysis (m7/m8's handle). */
  trait AudioAnalyzer {
    def analyze(payload: Array[Byte]): Frames
    def frameEnergies(payload: Array[Byte]): Array[Long]
  }

  /** Per-row perceptual hash (m18's handle): a 64-bit dHash emitted
    * as FOUR 16-bit words (0..65535) — word granularity is the
    * operator contract because m18's pigeonhole banding keys on
    * exact word equality, and 16-bit ints sidestep the sign/shift
    * portability traps a packed 64-bit hash would carry across
    * engines. A real codec downsamples to a 9×8 grayscale grid and
    * emits horizontal gradient signs; the stub derives the "pixels"
    * from payload bytes deterministically.
    */
  trait ImageHasher {
    def dhashWords(payload: Array[Byte]): Array[Int]
  }

  /** The injection point. Implementations MUST be cheap to construct
    * and serializable — the expensive native setup belongs in the
    * `open*` calls, which the operators invoke once per partition.
    */
  trait Provider extends Serializable {
    def openImageDecoder(): ImageDecoder
    def openImageResizer(box: Int): ImageResizer
    def openAudioAnalyzer(frameLen: Int, silenceMeanByte: Int): AudioAnalyzer
    def openImageHasher(): ImageHasher
  }

  /** The deterministic offline stubs — the default provider, whose
    * arithmetic the DuckDB oracles replay byte-for-byte.
    */
  object Stub extends Provider {
    override def openImageDecoder(): ImageDecoder = new FakeImageDecoder()
    override def openImageResizer(box: Int): ImageResizer = new FakeImageResizer(box)
    override def openAudioAnalyzer(frameLen: Int, silenceMeanByte: Int): AudioAnalyzer =
      new FakeAudioDecoder(frameLen, silenceMeanByte)
    override def openImageHasher(): ImageHasher = new FakeImageHasher()
  }

  /** A SECOND fake codec family, existing to prove the seam: it
    * xor-masks every payload byte before the stub arithmetic —
    * deterministically DIFFERENT outputs through the SAME operator
    * plans (MultimodalSpec pins both directions: swap changes values,
    * swap does not change shape/rowcount). A real-codec Provider slots
    * in exactly like this one.
    */
  final class XorMaskedProvider(mask: Int) extends Provider {
    private def m(payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](payload.length)
      var i = 0
      while (i < payload.length) { out(i) = (payload(i) ^ mask).toByte; i += 1 }
      out
    }
    override def openImageDecoder(): ImageDecoder = {
      val inner = new FakeImageDecoder()
      (payload: Array[Byte]) => inner.decode(m(payload))
    }
    override def openImageResizer(box: Int): ImageResizer = {
      val inner = new FakeImageResizer(box)
      (w: Int, h: Int, payload: Array[Byte]) => inner.resize(w, h, m(payload))
    }
    override def openAudioAnalyzer(frameLen: Int, silenceMeanByte: Int): AudioAnalyzer = {
      val inner = new FakeAudioDecoder(frameLen, silenceMeanByte)
      new AudioAnalyzer {
        override def analyze(payload: Array[Byte]): Frames = inner.analyze(m(payload))
        override def frameEnergies(payload: Array[Byte]): Array[Long] =
          inner.frameEnergies(m(payload))
      }
    }
    override def openImageHasher(): ImageHasher = {
      val inner = new FakeImageHasher()
      (payload: Array[Byte]) => inner.dhashWords(m(payload))
    }
  }
}

/** STUB: stands in for a real image decoder (libjpeg-turbo / ffmpeg
  * bindings) that this container cannot provide. Deterministic on the
  * payload bytes so specs can pin outputs. The interface — open once
  * per partition, decode per row, stateless output — is the real
  * contract a native codec would implement.
  */
final class FakeImageDecoder private[ops] () extends Codec.ImageDecoder {

  /** Byte-fold features. The fingerprint is a mod-1e9+7 polynomial
    * (same arithmetic family as t7/m5) rather than FNV: identical
    * discriminating power for a stub, but free of 64-bit wraparound —
    * so the DuckDB oracle can recompute it and m3 graduates from a
    * rows-only check to a full hash-matched gate.
    */
  override def decode(payload: Array[Byte]): Codec.Decoded = {
    var sum = 0L
    var fp = 0L
    var i = 0
    while (i < payload.length) {
      sum += payload(i) & 0xFF
      fp = (fp * 131L + (payload(i) & 0xFF)) % 1000000007L
      i += 1
    }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    Codec.Decoded(payload.length, mean, fp)
  }
}

object FakeImageDecoder {
  def open(): FakeImageDecoder = new FakeImageDecoder()
}

/** STUB: stands in for a real image scaler (libvips / swscale) that
  * this container cannot provide. Box-fits (w, h) into `box`×`box`
  * with one integer scale factor shared by both axes, and subsamples
  * the payload by the same factor — deterministic integer arithmetic
  * end-to-end so the DuckDB oracle can verify the full output. The
  * interface (open once per partition, resize per row) is the real
  * codec contract.
  */
final class FakeImageResizer private[ops] (box: Int) extends Codec.ImageResizer {

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  override def resize(w: Int, h: Int, payload: Array[Byte]): Codec.Resized = {
    val scale = math.max(math.max(ceilDiv(w, box), ceilDiv(h, box)), 1)
    val out = new Array[Byte](ceilDiv(payload.length max 0, scale) max 0)
    var i = 0
    while (i < out.length) {
      out(i) = payload(i * scale)
      i += 1
    }
    Codec.Resized(scale, ceilDiv(w, scale), ceilDiv(h, scale), out)
  }
}

object FakeImageResizer {
  def open(box: Int): FakeImageResizer = new FakeImageResizer(box)
}

/** STUB: stands in for a real audio decoder + framer (ffmpeg/libsndfile
  * → PCM → fixed windows). Deterministic integer byte arithmetic so
  * both the unit spec and the DuckDB oracle can recompute every frame.
  * The interface — open once per partition with the analysis config,
  * analyze per row — is the contract a native audio library would get.
  */
final class FakeAudioDecoder private[ops] (frameLen: Int, silenceMeanByte: Int)
    extends Codec.AudioAnalyzer {

  /** Frame the byte stream; the trailing partial frame counts with its
    * own length so "silence" (`energy < silenceMeanByte × len`) stays
    * an exact integer comparison on every frame.
    */
  override def analyze(payload: Array[Byte]): Codec.Frames = {
    var nFrames = 0
    var nSilent = 0
    var total = 0L
    var peak = 0L
    var start = 0
    while (start < payload.length) {
      val end = math.min(start + frameLen, payload.length)
      var e = 0L
      var i = start
      while (i < end) { e += payload(i) & 0xFF; i += 1 }
      nFrames += 1
      if (e < silenceMeanByte.toLong * (end - start)) nSilent += 1
      total += e
      if (e > peak) peak = e
      start = end
    }
    Codec.Frames(nFrames, nSilent, total, peak)
  }

  /** Per-frame energies in frame order — the scene-segmentation input
    * (m8); identical framing rule to [[analyze]] (trailing partial
    * frame kept at its own length).
    */
  override def frameEnergies(payload: Array[Byte]): Array[Long] = {
    val n = (payload.length + frameLen - 1) / frameLen
    val out = new Array[Long](math.max(n, 0))
    var f = 0
    var start = 0
    while (start < payload.length) {
      val end = math.min(start + frameLen, payload.length)
      var e = 0L
      var i = start
      while (i < end) { e += payload(i) & 0xFF; i += 1 }
      out(f) = e
      f += 1
      start = end
    }
    out
  }
}

object FakeAudioDecoder {
  def open(frameLen: Int, silenceMeanByte: Int): FakeAudioDecoder =
    new FakeAudioDecoder(frameLen, silenceMeanByte)
}

/** STUB: stands in for a real perceptual hasher (a decoder + 9×8
  * grayscale downsample + dHash). The stub's "pixel" (r, c) is the
  * payload byte at index (r·9 + c) mod len — deterministic on the
  * bytes, oracle-replicable — and the dHash bit is the horizontal
  * gradient sign pixel(r, c+1) > pixel(r, c), packed little-endian
  * into four 16-bit words (bit b → word b/16, position b mod 16).
  */
final class FakeImageHasher private[ops] () extends Codec.ImageHasher {
  override def dhashWords(payload: Array[Byte]): Array[Int] = {
    val out = new Array[Int](4)
    val n = payload.length
    if (n == 0) return out
    var b = 0
    while (b < 64) {
      val r = b / 8
      val c = b % 8
      val p0 = payload((r * 9 + c) % n) & 0xFF
      val p1 = payload((r * 9 + c + 1) % n) & 0xFF
      if (p1 > p0) out(b / 16) |= 1 << (b % 16)
      b += 1
    }
    out
  }
}

object FakeImageHasher {
  def open(): FakeImageHasher = new FakeImageHasher()
}
