package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * batched per partition.
  *
  * The actual media codecs are NOT available in this environment, so
  * `decodeStub` produces a deterministic fake feature vector — the Spark
  * side (schema, batching, partitioning, output shape) is real and tested.
  * Swapping in a real decoder means replacing only the marked function.
  */
object Multimodal {

  /** Canonical multimodal schema fragment: payload + metadata columns. */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("mime", lit("application/octet-stream"))
      .withColumn("byte_len", octet_length(col("payload")))
      .withColumn("digest", sha2(col("payload"), 256))

  val FeatureDim = 8

  /** STUB — stands in for a real media decoder (image resize, audio
    * frame sampling, …). Deterministic: derives FeatureDim floats from the
    * payload bytes so tests and oracles are stable. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched per-partition feature extraction over a binary column — the
    * Scala analogue of a pandas-UDF `mapInPandas` decode stage: one decoder
    * init per partition, rows streamed through in batches. Output schema:
    * (id, features array<float>). */
  def extractFeatures(df: DataFrame, idCol: String,
                      payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      // per-partition decoder init would go here (real codec handle)
      it.map { row =>
        Row(row.get(idIdx), decodeStub(row.getAs[Array[Byte]](pIdx)))
      }
    }(enc)
  }

  /** Frame-sampling stub for video-like payloads: slice the payload into
    * `n` equally spaced 1-byte "frames" — exercises the 1→N shape
    * (explode) of a real frame sampler. */
  def sampleFrames(payload: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)), i =>
      call_function("substr", payload,
        least(i * floor(octet_length(payload) / n).cast("int") + 1,
          octet_length(payload)), lit(1)))


  // --- Perceptual image dedup: dHash + Hamming-band LSH ---------------
  //
  // The header parsers above read metadata; CONTENT dedup needs pixels.
  // The decode step (codec → resized grayscale grid) is stubbed per the
  // module contract: [[pixelGridStub]] synthesizes a deterministic 9×7
  // grayscale grid from the document text, so near-dup TEXTS produce
  // near-dup IMAGES (pixel i = md5₄₀(token[i mod n]) % 256 — one changed
  // token perturbs ~1/7 of pixels). Everything downstream of the stub —
  // the dHash, the band index, the Hamming verify — is the real
  // production plumbing and is what the oracles gate.

  val DHashW = 9
  val DHashH = 7
  val DHashBits: Int = (DHashW - 1) * DHashH // 56: keeps the packed hash
  // in POSITIVE int64 — a 64-bit hash's top bit would overflow the
  // doubling fold under ANSI semantics (both engines reject it loudly)
  val DHashBands = 4
  val DHashBandBits: Int = DHashBits / DHashBands // 14

  /** Deterministic "decoded" 9×7 grayscale pixel grid (the decode STUB —
    * a real pipeline replaces exactly this function with codec + resize;
    * see the module doc). */
  def pixelGridStub(text: Column): Column = {
    val toks = split(text, " ")
    transform(sequence(lit(0), lit(DHashW * DHashH - 1)), i =>
      (graft.catalyst.Md5Prefix40(
        element_at(toks, (i % size(toks)) + 1)) % 256).cast("int"))
  }

  /** 56-bit difference hash over a 9×7 grid: bit (r,c) = 1 iff
    * pixel(r,c) < pixel(r,c+1) — the standard dHash gradient signature,
    * invariant to uniform brightness shifts. Packed MSB-first by a
    * doubling fold (acc·2 + bit), identical in any SQL engine. */
  def dHash(pixels: Column): Column =
    aggregate(
      sequence(lit(DHashBits - 1), lit(0)),
      lit(0L),
      (acc, i) => {
        // floor-division: Column `/` on ints is DOUBLE division
        val r = floor(i / (DHashW - 1)).cast("int")
        val c = (i % (DHashW - 1)).cast("int")
        val p1 = element_at(pixels, r * DHashW + c + 1)
        val p2 = element_at(pixels, r * DHashW + c + 2)
        acc * 2L + when(p1 < p2, 1L).otherwise(0L)
      })


  /** Kernel-fused [[dHash]]∘[[pixelGridStub]] — the production path
    * (codegen, one pass); the composed Column form above stays as the
    * oracle-mirroring reference, spec-pinned identical. */
  def dHashStub(text: Column): Column =
    graft.catalyst.DHashStub(split(text, " "))

  /** Hamming distance between two packed hashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** (hash, band, key) rows: 4 bands × 14 bits, with the band index
    * FOLDED INTO the key (key = band·2¹⁴ + bits) so downstream joins key
    * on ONE column — the single-column shape a BucketedTap needs for a
    * zero-exchange bucketed index scan. Pigeonhole: two hashes within
    * Hamming distance 3 share at least one exact band key. */
  def dhashBandRows(hashes: DataFrame, hashCol: String): DataFrame =
    hashes.select(col(hashCol).as("h"),
        explode(bandKeys(col(hashCol))).as("bk"))
      .select(col("h"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** The 4 (band, key) pairs of a hash as an array — one scan via
    * explode (a 4-way union re-reads the source per band, and Spark's
    * Union constraint rewrite chokes on higher-order-function
    * constraints; explode has neither problem). */
  def bandKeys(h: Column): Column =
    array((0 until DHashBands).map { b =>
      struct(lit(b).as("band"),
        (lit(b.toLong * (1 << DHashBandBits)) +
          shiftrightunsigned(h, b * DHashBandBits)
            % (1 << DHashBandBits)).as("key"))
    }: _*)

  /** Near-dup image pairs over the DISTINCT hash set: exact duplicates
    * collapse to one hash first (with multiplicities n1/n2), then banded
    * candidates verify by exact Hamming ≤ maxHamming. The collapse is
    * what bounds Σ bucket² — a template image repeated 10⁴ times is ONE
    * band row, not 10⁴ (the q178 load lesson applied to images). */
  def imageNearDupPairs(images: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame =
    nearDupPairsFromHashes(
      images.select(col(idCol).as("id"), dHashStub(col(textCol)).as("h")),
      maxHamming)

  /** The banded pair pipeline over PRECOMPUTED hashes (one row per image,
    * column `h`) — shared by the stub path above and the real-decode path
    * (q201: [[dhashFromPayload]] hashes). */
  def nearDupPairsFromHashes(hashes: DataFrame,
                             maxHamming: Int = 3): DataFrame = {
    val counts = hashes.groupBy(col("h")).agg(count(lit(1)).as("n"))
    val rows = dhashBandRows(counts.select("h"), "h")
    val l = rows.select(col("h").as("h1"), col("key"))
    val r = rows.select(col("h").as("h2"), col("key"))
    l.join(r, Seq("key"))
      .filter(col("h1") < col("h2"))
      .select(col("h1"), col("h2")).distinct()
      .filter(hamming(col("h1"), col("h2")) <= maxHamming)
      .join(counts.select(col("h").as("h1"), col("n").as("n1")), Seq("h1"))
      .join(counts.select(col("h").as("h2"), col("n").as("n2")), Seq("h2"))
      .select(col("h1"), col("h2"),
        hamming(col("h1"), col("h2")).as("hamming"),
        col("n1"), col("n2"))
  }

  def dhashIndexTap(table: String, buckets: Int): graft.sources.BucketedTap =
    graft.sources.BucketedTap(table, buckets, Seq("key"))

  /** Corpus dHash index rows for [[graft.sources.BucketedTap]] persistence
    * (bucketed by key): (h, band, key) over the corpus's DISTINCT hashes.
    *
    * Hash-width note (the winnow/MinHash 40-bit-collision concern does
    * NOT transfer here): the index persists the FULL 56-bit perceptual
    * hash, and every banded candidate is verified by exact Hamming
    * against it — the 14-bit band keys are CANDIDATE-GENERATION ONLY.
    * A band-key collision costs a discarded candidate, never a false
    * match; recall at maxHamming ≤ 3 is guaranteed by pigeonhole
    * (4 bands, ≤ 3 flipped bits → one band intact). Both halves are
    * spec-pinned (FunctionsSpec "dHash band keys are candidate-only"). */
  def dhashIndex(images: DataFrame, idCol: String, textCol: String): DataFrame =
    dhashBandRows(
      images.select(dHashStub(col(textCol)).as("h")).distinct(), "h")

  /** Match an arriving batch against the PERSISTED dHash band index:
    * batch images hash in-flight, bands join the index on the bucketed
    * key, candidates verify by exact Hamming. Corpus side plans with no
    * exchange (the q180 discipline); output one row per (batch image,
    * matched corpus hash). */
  def imageMatchesAgainstIndex(corpusIndex: DataFrame, batch: DataFrame,
                               idCol: String, textCol: String,
                               maxHamming: Int = 3): DataFrame =
    matchesAgainstIndexFromHashes(corpusIndex,
      batch.select(col(idCol).as("id"), dHashStub(col(textCol)).as("h")),
      maxHamming)

  /** Batch-vs-index matching over PRECOMPUTED batch hashes (id, h) — the
    * hash-level core shared by every modality that persists perceptual
    * hashes through [[dhashIndexTap]] (image dHash q191, video keyframes
    * q265): batch hashes are collapsed to DISTINCT (id, h) — a carrier
    * with a repeated hash (e.g. a keyframe recurring inside one video)
    * contributes ONE band probe — then the band rows join the index on
    * the bucketed key and candidates verify by exact Hamming. Corpus
    * side plans with no exchange (the q180 discipline); the batch id
    * rides the band rows (no hash-collapse + join-back: the batch side
    * is small, and re-joining the hash frame with its own band-derived
    * candidates would self-join the same plan subtree). Output one row
    * per (batch id, matched corpus hash). */
  def matchesAgainstIndexFromHashes(corpusIndex: DataFrame,
                                    batchHashes: DataFrame,
                                    maxHamming: Int = 3): DataFrame = {
    val bh = batchHashes.select(col("id"), col("h").as("bh")).distinct()
    val bRows = bh.select(col("id"), col("bh"),
        explode(bandKeys(col("bh"))).as("bk"))
      .select(col("id"), col("bh"), col("bk.key").as("key"))
    val ci = corpusIndex.select(col("h").as("ch"), col("key"))
    bRows.join(ci, Seq("key"))
      .select(col("id"), col("bh"), col("ch")).distinct()
      .filter(hamming(col("bh"), col("ch")) <= maxHamming)
      .select(col("id"), col("ch").as("corpus_h"),
        hamming(col("bh"), col("ch")).as("hamming"))
  }

  // --- REAL pixel decode for the uncompressed formats ------------------
  //
  // The dHash pipeline above rides the documented decode STUB (no codecs
  // in this environment). For the two uncompressed container formats a
  // full decoder needs no codec at all — so these are REAL: binary PGM
  // (P5) and uncompressed 24-bit BMP (BI_RGB, bottom-up or top-down,
  // 4-byte row padding) parse byte-exactly, resample nearest-neighbor to
  // the 9×7 dHash grid, and feed the SAME grid fold as the stub path.
  // Payload synthesis (for gates/oracles) is deterministic — pixel j =
  // md5₄₀(token[j mod n]) mod 256 at the chosen source size — so a DuckDB
  // oracle recomputes the decoded grid arithmetically while the Spark
  // path round-trips it through real container bytes: any parser bug
  // (offset, padding, row order) diverges from the oracle immediately.

  /** Deterministic grayscale source image for a text (the camera stand-in
    * gates use): w×h pixels, pixel j = md5₄₀(token[j mod n]) mod 256. */
  def synthPixels(text: String, w: Int, h: Int): Array[Int] = {
    val toks = text.split(" ")
    Array.tabulate(w * h) { j =>
      (graft.catalyst.Md5Prefix40.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks(j % toks.length))) % 256L).toInt
    }
  }

  /** Deterministic BLOCK-CONSTANT grayscale source (the JPEG gate's
    * synth): every 8×8 block holds one value, block b (row-major over
    * ceil(w/8) block columns) = md5₄₀(token[b mod n]) mod 256. Constant
    * blocks are DC-only under the FDCT, which makes baseline JPEG with
    * flat quantization EXACTLY invertible — the property that lets the
    * arithmetic oracle cover a lossy codec (see [[encodeJpegGray]]). */
  def synthBlockPixels(text: String, w: Int, h: Int): Array[Int] = {
    val toks = text.split(" ")
    val bcols = (w + 7) / 8
    Array.tabulate(w * h) { j =>
      val b = (j / w / 8) * bcols + (j % w) / 8
      (graft.catalyst.Md5Prefix40.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks(b % toks.length))) % 256L).toInt
    }
  }

  /** Binary PGM (P5) encoding of a grayscale grid. */
  def encodePgm(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < w * h) { out(header.length + i) = px(i).toByte; i += 1 }
    out
  }

  /** Uncompressed 24-bit BMP (BI_RGB, bottom-up) encoding of a grayscale
    * grid (r = g = b = gray), rows padded to 4 bytes per the format. */
  def encodeBmp24(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    @inline def le16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    @inline def le32(i: Int, v: Int): Unit = {
      le16(i, v & 0xffff); le16(i + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataSize); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, dataSize)
    var r = 0
    while (r < h) {
      val srcRow = h - 1 - r // bottom-up: file row r = image row h-1-r
      var c = 0
      while (c < w) {
        val v = px(srcRow * w + c).toByte
        val off = 54 + r * rowBytes + c * 3
        out(off) = v; out(off + 1) = v; out(off + 2) = v
        c += 1
      }
      r += 1
    }
    out
  }

  /** PNG (RFC 2083) encoding of a grayscale grid: 8-bit grayscale
    * (color type 0), zlib IDAT via `java.util.zip.Deflater`, CRC32
    * chunk checksums, and scanline filters CYCLING None/Sub/Up by row —
    * so a decoder must actually DE-FILTER, not just inflate. This is the
    * gate-side synthesizer that brings a COMPRESSED container under the
    * q201 oracle trick: pixels are deterministic, the container is real. */
  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    // filtered scanlines: one filter byte + w raw bytes per row
    val raw = new Array[Byte](h * (w + 1))
    var r = 0
    while (r < h) {
      val off = r * (w + 1)
      val f = r % 3
      raw(off) = f.toByte
      var c = 0
      while (c < w) {
        val x = px(r * w + c)
        val v = f match {
          case 0 => x
          case 1 => x - (if (c > 0) px(r * w + c - 1) else 0) // Sub
          case _ => x - (if (r > 0) px((r - 1) * w + c) else 0) // Up
        }
        raw(off + 1 + c) = (v & 0xff).toByte
        c += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    val idat = bos.toByteArray
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val t = tag.getBytes("US-ASCII")
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length); out.put(t); out.put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w); ihdr.putInt(h)
    ihdr.put(8.toByte); ihdr.put(0.toByte) // bit depth 8, color type 0
    ihdr.put(0.toByte); ihdr.put(0.toByte); ihdr.put(0.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr.array()) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** REAL PNG decode via `java.util.zip.Inflater`: 8-bit grayscale
    * (color type 0) or truecolor (type 2, gray = (r + g + b) / 3 like
    * the BMP path), non-interlaced, multi-IDAT, ALL FIVE scanline
    * filters (None/Sub/Up/Average/Paeth) reconstructed, per-chunk CRC32
    * verified. None for anything else — palette, 16-bit, interlaced,
    * truncated, or corrupt payloads fail soft, never throw. */
  def decodePngGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 8 || (p(0) & 0xff) != 0x89 || p(1) != 'P' ||
        p(2) != 'N' || p(3) != 'G') return None
    @inline def be32(i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    var i = 8
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false; var sawIend = false
    while (!sawIend) {
      if (i + 12 > p.length) return None
      val len = be32(i)
      if (len < 0 || i + 12 + len > p.length) return None
      val tag = new String(p, i + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(p, i + 4, 4 + len)
      if (crc.getValue.toInt != be32(i + 8 + len)) return None
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(i + 8); h = be32(i + 12)
          val bitDepth = p(i + 16) & 0xff
          colorType = p(i + 17) & 0xff
          val (compression, filter, interlace) =
            (p(i + 18) & 0xff, p(i + 19) & 0xff, p(i + 20) & 0xff)
          if (w <= 0 || h <= 0 || bitDepth != 8 ||
              (colorType != 0 && colorType != 2) ||
              compression != 0 || filter != 0 || interlace != 0) return None
          // decompression-bomb guard: reject rasters the gates (and any
          // sane metadata pipeline) would never decode inline
          if (w.toLong * h > (1L << 24)) return None
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(p, i + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len
    }
    if (!sawIhdr) return None
    val bpp = if (colorType == 0) 1 else 3
    val rowBytes = w * bpp
    val expected = h * (rowBytes + 1)
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(raw, got, expected - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got < expected) return None
    // de-filter (RFC 2083 §6): recon bytes in place, row by row
    @inline def paeth(a: Int, b: Int, c: Int): Int = {
      val pa = math.abs(b - c); val pb = math.abs(a - c)
      val pc = math.abs(a + b - c - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val recon = new Array[Int](h * rowBytes)
    var r = 0
    while (r < h) {
      val f = raw(r * (rowBytes + 1)) & 0xff
      if (f > 4) return None
      var c = 0
      while (c < rowBytes) {
        val x = raw(r * (rowBytes + 1) + 1 + c) & 0xff
        val left = if (c >= bpp) recon(r * rowBytes + c - bpp) else 0
        val up = if (r > 0) recon((r - 1) * rowBytes + c) else 0
        val ul = if (r > 0 && c >= bpp) recon((r - 1) * rowBytes + c - bpp)
                 else 0
        recon(r * rowBytes + c) = f match {
          case 0 => x
          case 1 => (x + left) & 0xff
          case 2 => (x + up) & 0xff
          case 3 => (x + (left + up) / 2) & 0xff
          case _ => (x + paeth(left, up, ul)) & 0xff
        }
        c += 1
      }
      r += 1
    }
    val px = Array.tabulate(w * h) { j =>
      if (bpp == 1) recon(j)
      else (recon(j * 3) + recon(j * 3 + 1) + recon(j * 3 + 2)) / 3
    }
    Some((w, h, px))
  }

  /** GIF (87a/89a) encoding of a grayscale grid with REAL LZW
    * compression — the second COMPRESSED container (after [[encodePng]])
    * under the q201 deterministic-pixel oracle trick. The global color
    * table is the 256-entry gray ramp, so palette index == gray value
    * and the decoder's palette mapping is the identity on this fixture
    * (the decoder still maps through the table — LCT/colored-GCT specs
    * exercise the non-identity path). The compressor builds a genuine
    * string table with code-width growth and mid-stream CLEAR resets
    * (not the degenerate literals-only stream the spec permits), so
    * gates prove the decoder's dictionary RECONSTRUCTION, including the
    * deferred width bump and the cScSc corner.
    * `interlaced = true` writes rows in the 4-pass GIF interlace order. */
  def encodeGif(px: Array[Int], w: Int, h: Int,
                interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    @inline def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 8 bits/channel, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor: full frame, GCT, maybe interlaced
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    val minCode = 8
    out.write(minCode)
    // pixel emission order: raster rows, or interlace passes 8/0 8/4 4/2 2/1
    val rows: Array[Int] =
      if (!interlaced) Array.tabulate(h)(identity)
      else (Range(0, h, 8) ++ Range(4, h, 8) ++ Range(2, h, 4) ++
        Range(1, h, 2)).toArray
    // GIF-variant LZW: 9-bit codes growing to 12, clear=256 eoi=257,
    // width bumps AFTER the first entry of the wider range is assigned
    // (next > 1<<codeSize), table-full → CLEAR + reset
    val clear = 1 << minCode; val eoi = clear + 1
    var codeSize = minCode + 1; var next = eoi + 1
    val dict = new java.util.HashMap[Integer, Integer]()
    val data = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << nBits; nBits += codeSize
      while (nBits >= 8) { data.write((bitBuf & 0xff).toInt); bitBuf >>= 8; nBits -= 8 }
    }
    emit(clear)
    var cur = -1
    var r = 0
    while (r < h) {
      val row = rows(r)
      var c = 0
      while (c < w) {
        val k = px(row * w + c) & 0xff
        if (cur < 0) cur = k
        else {
          val key = Integer.valueOf((cur << 8) | k)
          val hit = dict.get(key)
          if (hit != null) cur = hit.intValue()
          else {
            emit(cur)
            if (next < 4096) {
              dict.put(key, Integer.valueOf(next)); next += 1
              if (next > (1 << codeSize) && codeSize < 12) codeSize += 1
            } else {
              emit(clear)
              dict.clear(); codeSize = minCode + 1; next = eoi + 1
            }
            cur = k
          }
        }
        c += 1
      }
      r += 1
    }
    if (cur >= 0) emit(cur)
    emit(eoi)
    if (nBits > 0) data.write((bitBuf & 0xff).toInt)
    // data sub-blocks of ≤ 255 bytes, zero-length terminator, trailer
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n); out.write(bytes, off, n); off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  /** REAL GIF decode: LZW decompression with full dictionary semantics
    * (deferred code-width growth, the cScSc first-char corner, CLEAR
    * resets, table-full streams), 87a/89a, global or local color table
    * (gray = (r + g + b) / 3), 4-pass interlace, extension blocks
    * skipped, first image frame returned. Decompression-bomb guard as
    * [[decodePngGray]]; truncated/corrupt payloads fail soft to None. */
  def decodeGifGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 13 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F' ||
        p(3) != '8' || (p(4) != '7' && p(4) != '9') || p(5) != 'a')
      return None
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    var i = 6
    i += 4 // logical screen w/h: the frame descriptor's dims are used
    val lsdPacked = u8(i); i += 3
    var gct: Array[Int] = null
    if ((lsdPacked & 0x80) != 0) {
      val n = 1 << ((lsdPacked & 7) + 1)
      if (i + n * 3 > p.length) return None
      gct = Array.tabulate(n)(j =>
        (u8(i + j * 3) + u8(i + j * 3 + 1) + u8(i + j * 3 + 2)) / 3)
      i += n * 3
    }
    while (i < p.length) {
      u8(i) match {
        case 0x21 => // extension: label, then sub-blocks to a 0 terminator
          i += 2
          var len = if (i < p.length) u8(i) else return None
          while (len != 0) {
            i += 1 + len
            if (i >= p.length) return None
            len = u8(i)
          }
          i += 1
        case 0x3b => return None // trailer before any image frame
        case 0x2c =>
          if (i + 10 > p.length) return None
          val iw = le16(i + 5); val ih = le16(i + 7)
          val packed = u8(i + 9)
          i += 10
          var pal = gct
          if ((packed & 0x80) != 0) {
            val n = 1 << ((packed & 7) + 1)
            if (i + n * 3 > p.length) return None
            pal = Array.tabulate(n)(j =>
              (u8(i + j * 3) + u8(i + j * 3 + 1) + u8(i + j * 3 + 2)) / 3)
            i += n * 3
          }
          if (pal == null || iw <= 0 || ih <= 0) return None
          if (iw.toLong * ih > (1L << 24)) return None // bomb guard
          val interlaced = (packed & 0x40) != 0
          if (i >= p.length) return None
          val minCode = u8(i); i += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          var len = if (i < p.length) u8(i) else return None
          while (len != 0) {
            if (i + 1 + len > p.length) return None
            data.write(p, i + 1, len)
            i += 1 + len
            if (i >= p.length) return None
            len = u8(i)
          }
          val d = data.toByteArray
          val nPx = iw * ih
          val idx = new Array[Int](nPx)
          // LZW decode (mirror of the encoder's width/reset discipline)
          val clear = 1 << minCode; val eoi = clear + 1
          var codeSize = minCode + 1; var next = eoi + 1
          val prefix = new Array[Int](4096); val suffix = new Array[Int](4096)
          val stack = new Array[Int](4097)
          var bitBuf = 0L; var nBits = 0; var di = 0; var outN = 0
          var prev = -1; var prevFirst = 0
          while (outN < nPx) {
            while (nBits < codeSize) {
              if (di >= d.length) return None // truncated stream
              bitBuf |= (d(di) & 0xffL) << nBits; nBits += 8; di += 1
            }
            val code = (bitBuf & ((1L << codeSize) - 1)).toInt
            bitBuf >>= codeSize; nBits -= codeSize
            if (code == clear) {
              codeSize = minCode + 1; next = eoi + 1; prev = -1
            } else if (code == eoi) {
              return None // EOI before the raster filled
            } else if (prev < 0) {
              if (code >= clear) return None // first code must be a root
              idx(outN) = code; outN += 1
              prev = code; prevFirst = code
            } else {
              var sp = 0
              var cc = code
              if (code == next) { stack(sp) = prevFirst; sp += 1; cc = prev }
              else if (code > next) return None // corrupt: undefined code
              while (cc >= clear + 2) {
                stack(sp) = suffix(cc); sp += 1; cc = prefix(cc)
              }
              if (cc >= clear) return None
              val first = cc
              stack(sp) = cc; sp += 1
              if (outN + sp > nPx) return None
              while (sp > 0) { sp -= 1; idx(outN) = stack(sp); outN += 1 }
              if (next < 4096) {
                prefix(next) = prev; suffix(next) = first; next += 1
                // the decoder's table lags the encoder's by ONE entry
                // (it can only add after the next code arrives), so its
                // width bump fires at next == 1<<codeSize where the
                // encoder's fires at next == (1<<codeSize)+1 — the
                // classic GIF-LZW asymmetry the round-trip spec pins
                if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
              }
              prev = code; prevFirst = first
            }
          }
          // palette map (identity on the gray-ramp fixture, exercised by
          // the colored-table specs); out-of-table index = corrupt
          val px = new Array[Int](nPx)
          var j = 0
          while (j < nPx) {
            val v = idx(j)
            if (v >= pal.length) return None
            px(j) = pal(v); j += 1
          }
          if (!interlaced) return Some((iw, ih, px))
          val rows = (Range(0, ih, 8) ++ Range(4, ih, 8) ++
            Range(2, ih, 4) ++ Range(1, ih, 2)).toArray
          val out = new Array[Int](nPx)
          var r = 0
          while (r < ih) {
            System.arraycopy(px, r * iw, out, rows(r) * iw, iw)
            r += 1
          }
          return Some((iw, ih, out))
        case _ => return None
      }
    }
    None
  }

  // ---- baseline JPEG (ITU-T T.81), the third compressed container ----

  /** Raster index of each zigzag position (u = horizontal frequency
    * varies fastest), T.81 Figure A.6. */
  private val JpegZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Encoder-side canonical Huffman tables, WRITTEN INTO the DHT
    * segments (the decoder rebuilds from the stream, so any valid
    * canonical table exercises the real path). DC: category 0 at 2
    * bits, 1-11 at 4 bits. AC: EOB at 2 bits, ZRL + all 160 (run,size)
    * symbols at 8 bits — Kraft-valid, all-ones codes unused. */
  private val JpegDcCounts: Array[Int] =
    Array(0, 1, 0, 11, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcSymbols: Array[Int] = (0 to 11).toArray
  private val JpegAcCounts: Array[Int] =
    Array(0, 1, 0, 0, 0, 0, 0, 161, 0, 0, 0, 0, 0, 0, 0, 0)
  private val JpegAcSymbols: Array[Int] =
    (Seq(0x00, 0xf0) ++ (for (run <- 0 to 15; size <- 1 to 10)
      yield (run << 4) | size)).toArray

  /** (code, length) per symbol from a canonical (BITS, HUFFVAL) pair —
    * the T.81 Annex C generation procedure. */
  private def canonicalCodes(counts: Array[Int],
                             symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < counts(len - 1)) {
        out += symbols(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  private def jpegCategory(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Baseline JPEG encoding of a grayscale grid — the third COMPRESSED
    * container under the gate after PNG (Deflate) and GIF (LZW). One
    * luminance component, FLAT quantization (all 1s): an 8×8-CONSTANT
    * source block is then DC-only and the nominally lossy pipeline is
    * exactly invertible (FDCT of a constant block is 8·(v−128) at DC
    * with ~1e-13 AC residue killed by the coefficient round; the
    * decoder's DC-only IDCT is the exact inverse division by 8), which
    * is what lets the deterministic-synthesis oracle cover a lossy
    * codec. The entropy layer is fully real regardless of content:
    * canonical Huffman tables shipped via DHT, DC prediction across
    * blocks, zigzag, category/extend coding, 0xFF byte stuffing, edge
    * padding to the MCU grid, and optional restart markers
    * (`restartInterval` > 0 → DRI segment + RSTm every n MCUs with
    * predictor resets and bit realignment). */
  def encodeJpegGray(px: Array[Int], w: Int, h: Int,
                     restartInterval: Int = 0): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); u8(0x00) // DQT, Pq=0 Tq=0
    var i = 0
    while (i < 64) { u8(1); i += 1 } // flat table
    marker(0xc0); u16(2 + 6 + 3) // SOF0
    u8(8); u16(h); u16(w); u8(1) // precision, dims, 1 component
    u8(1); u8(0x11); u8(0) // id=1, 1x1 sampling, Tq=0
    def dht(clazz: Int, counts: Array[Int], symbols: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + symbols.length)
      u8(clazz << 4) // Tc | Th=0
      counts.foreach(u8); symbols.foreach(u8)
    }
    dht(0, JpegDcCounts, JpegDcSymbols)
    dht(1, JpegAcCounts, JpegAcSymbols)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(2 + 1 + 2 + 3) // SOS
    u8(1); u8(1); u8(0x00) // 1 component, id=1, Td=0 Ta=0
    u8(0); u8(63); u8(0) // Ss, Se, Ah/Al
    val dcCodes = canonicalCodes(JpegDcCounts, JpegDcSymbols)
    val acCodes = canonicalCodes(JpegAcCounts, JpegAcSymbols)
    // entropy-coded data with 0xFF byte stuffing
    var acc = 0; var nbits = 0
    def putBits(bits: Int, n: Int): Unit = {
      var b = n - 1
      while (b >= 0) {
        acc = (acc << 1) | ((bits >> b) & 1); nbits += 1
        if (nbits == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; nbits = 0
        }
        b -= 1
      }
    }
    def align(): Unit = while (nbits != 0) putBits(1, 1) // pad with 1s
    val cosT = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16))
    def c0(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    var pred = 0
    var mcu = 0; var rst = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          align(); marker(0xd0 + rst % 8); rst += 1; pred = 0
        }
        // sample (edge-replicated) + level shift
        val s = new Array[Double](64)
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, w - 1)
            s(y * 8 + x) = px(sy * w + sx) - 128.0
            x += 1
          }
          y += 1
        }
        // FDCT + round (quant = 1)
        val coef = new Array[Int](64)
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var sum = 0.0
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                sum += s(yy * 8 + xx) * cosT(xx)(u) * cosT(yy)(v)
                xx += 1
              }
              yy += 1
            }
            coef(v * 8 + u) = math.round(0.25 * c0(u) * c0(v) * sum).toInt
            u += 1
          }
          v += 1
        }
        // DC: category + extend bits of the prediction difference
        val diff = coef(0) - pred; pred = coef(0)
        val dcCat = jpegCategory(diff)
        val (dcC, dcL) = dcCodes(dcCat)
        putBits(dcC, dcL)
        if (dcCat > 0)
          putBits(if (diff >= 0) diff else diff + (1 << dcCat) - 1, dcCat)
        // AC: run/size with ZRL and EOB
        var k = 1; var run = 0
        while (k < 64) {
          val a = coef(JpegZigZag(k))
          if (a == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = acCodes(0xf0); putBits(zc, zl); run -= 16
            }
            val size = jpegCategory(a)
            val (c, l) = acCodes((run << 4) | size)
            putBits(c, l)
            putBits(if (a >= 0) a else a + (1 << size) - 1, size)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); putBits(ec, el) }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    align()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** REAL baseline-JPEG decode: generic DHT canonical-Huffman rebuild
    * (mincode/maxcode/valptr, T.81 Annex F), 8-bit DQT dequantization,
    * DC prediction, category/extend, ZRL/EOB, 0xFF00 unstuffing,
    * restart markers with predictor reset, double IDCT with round +
    * clamp, and MCU-grid crop to the SOF dimensions. Grayscale baseline
    * only (SOF0, one 1×1 component, 8-bit) — progressive, multi-
    * component, 16-bit-quant, arithmetic-coded, truncated, or corrupt
    * payloads fail soft to None, never throw. */
  def decodeJpegGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    try decodeJpegGrayImpl(p)
    catch { case _: Exception => None }
  }

  private final class JpegHuff(counts: Array[Int], symbols: Array[Int]) {
    // T.81 F.2.2.3 decode tables
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        if (counts(len - 1) == 0) maxCode(len) = -1
        else {
          valPtr(len) = k
          minCode(len) = code
          code += counts(len - 1); k += counts(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def value(len: Int, code: Int): Int =
      symbols(valPtr(len) + code - minCode(len))
  }

  private def decodeJpegGrayImpl(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var i = 2
    var w = 0; var h = 0
    var restartInterval = 0
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[JpegHuff](4)
    val acTabs = new Array[JpegHuff](4)
    var qSel = -1; var dcSel = -1; var acSel = -1
    var scanStart = -1
    while (scanStart < 0) {
      if (i + 4 > p.length || u8(i) != 0xff) return None
      val m = u8(i + 1)
      if (m == 0xd9) return None // EOI before any scan
      val len = u16(i + 2)
      if (i + 2 + len > p.length) return None
      m match {
        case 0xdb => // DQT: one or more tables
          var j = i + 4
          while (j < i + 2 + len) {
            val pq = u8(j) >> 4; val tq = u8(j) & 0x0f
            if (pq != 0 || tq > 3 || j + 65 > i + 2 + len) return None
            quant(tq) = Array.tabulate(64)(k => u8(j + 1 + k))
            j += 65
          }
        case 0xc4 => // DHT: one or more tables
          var j = i + 4
          while (j < i + 2 + len) {
            val tc = u8(j) >> 4; val th = u8(j) & 0x0f
            if (tc > 1 || th > 3) return None
            val counts = Array.tabulate(16)(k => u8(j + 1 + k))
            val n = counts.sum
            if (j + 17 + n > i + 2 + len) return None
            val symbols = Array.tabulate(n)(k => u8(j + 17 + k))
            val tab = new JpegHuff(counts, symbols)
            if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
            j += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (u8(i + 4) != 8) return None // 8-bit precision only
          h = u16(i + 5); w = u16(i + 7)
          if (u8(i + 9) != 1) return None // one component only
          if (u8(i + 11) != 0x11) return None // 1x1 sampling
          qSel = u8(i + 12)
          if (w <= 0 || h <= 0 || w * h > (1 << 24)) return None
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
             0xcb | 0xcd | 0xce | 0xcf =>
          return None // non-baseline frame types
        case 0xdd => // DRI
          restartInterval = u16(i + 4)
        case 0xda => // SOS
          if (u8(i + 4) != 1) return None
          dcSel = u8(i + 6) >> 4; acSel = u8(i + 6) & 0x0f
          scanStart = i + 2 + len
        case _ => () // APPn / COM / others: skip
      }
      if (scanStart < 0) i = i + 2 + len
    }
    if (w == 0 || qSel < 0 || quant(qSel) == null ||
        dcTabs(dcSel) == null || acTabs(acSel) == null) return None
    val qt = quant(qSel); val dcTab = dcTabs(dcSel); val acTab = acTabs(acSel)
    // entropy-coded bit reader with 0xFF00 unstuffing
    var pos = scanStart
    var acc = 0; var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) throw new IllegalStateException("truncated")
        var b = u8(pos); pos += 1
        if (b == 0xff) {
          val b2 = if (pos < p.length) u8(pos) else -1
          if (b2 == 0x00) pos += 1 // stuffed byte
          else throw new IllegalStateException("marker in scan")
          b = 0xff
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def huffDecode(tab: JpegHuff): Int = {
      var code = nextBit(); var len = 1
      while (len <= 16 && (tab.maxCode(len) < 0 || code > tab.maxCode(len))) {
        code = (code << 1) | nextBit(); len += 1
      }
      if (len > 16) throw new IllegalStateException("bad huffman code")
      tab.value(len, code)
    }
    def extend(bits: Int, s: Int): Int =
      if (s == 0) 0
      else if (bits < (1 << (s - 1))) bits - (1 << s) + 1
      else bits
    def readBits(n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) { v = (v << 1) | nextBit(); k += 1 }
      v
    }
    val cosT = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16))
    def c0(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    val out = new Array[Int](w * h)
    var pred = 0
    var mcu = 0; var rst = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align, then consume the expected RSTm marker
          nbits = 0
          if (pos + 2 > p.length || u8(pos) != 0xff ||
              u8(pos + 1) != 0xd0 + rst % 8)
            throw new IllegalStateException("missing restart marker")
          pos += 2; rst += 1; pred = 0
        }
        val coef = new Array[Int](64)
        val dcCat = huffDecode(dcTab)
        if (dcCat > 11) throw new IllegalStateException("bad DC category")
        val diff = extend(readBits(dcCat), dcCat)
        pred += diff
        coef(0) = pred * qt(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = huffDecode(acTab)
          if (rs == 0x00) eob = true
          else if (rs == 0xf0) k += 16
          else {
            k += rs >> 4
            val size = rs & 0x0f
            if (k > 63) throw new IllegalStateException("AC overrun")
            coef(JpegZigZag(k)) = extend(readBits(size), size) * qt(k)
            k += 1
          }
        }
        // IDCT + level unshift + clamp, cropped into the output grid
        var y = 0
        while (y < 8) {
          val oy = by * 8 + y
          if (oy < h) {
            var x = 0
            while (x < 8) {
              val ox = bx * 8 + x
              if (ox < w) {
                var sum = 0.0
                var v = 0
                while (v < 8) {
                  var u = 0
                  while (u < 8) {
                    val cv = coef(v * 8 + u)
                    if (cv != 0)
                      sum += c0(u) * c0(v) * cv * cosT(x)(u) * cosT(y)(v)
                    u += 1
                  }
                  v += 1
                }
                val px = math.round(0.25 * sum + 128.0).toInt
                out(oy * w + ox) = math.max(0, math.min(255, px))
              }
              x += 1
            }
          }
          y += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    Some((w, h, out))
  }

  /** REAL binary-PGM (P5) decode: whitespace- and comment-tolerant
    * header, maxval ≤ 255, raw 8-bit samples. None for anything else. */
  def decodePgmGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p.length < 2 || p(0) != 'P' || p(1) != '5') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < p.length) {
        val c = p(i) & 0xff
        if (c == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = int(); val h = int(); val maxv = int()
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    // dimension sanity BEFORE any w*h arithmetic: a crafted header like
    // 65536×65536 overflows Int w*h to 0 and would pass the bounds check
    // with an empty pixel array (crashing downstream instead of the
    // documented None); the raster cannot exceed the payload anyway
    if (w.toLong * h > p.length) return None
    i += 1 // exactly one whitespace byte separates maxval from raster
    if (i + w * h > p.length) return None
    val px = new Array[Int](w * h)
    var j = 0
    while (j < w * h) { px(j) = p(i + j) & 0xff; j += 1 }
    Some((w, h, px))
  }

  /** REAL uncompressed 24-bit BMP decode: BI_RGB only, padded rows,
    * bottom-up (positive height) or top-down (negative), gray =
    * (b + g + r) / 3. None for anything else. */
  def decodeBmpGray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val off = le32(10)
    val w = le32(18)
    val rawH = le32(22)
    val topDown = rawH < 0
    // Int.MinValue survives math.abs still-negative; Long first
    val h = math.abs(rawH.toLong)
    // malformed-header hardening (the documented contract is None, never
    // a crash): negative/short data offset, dimensions whose pixel count
    // or row size exceeds the payload (also forecloses w*3 overflow)
    if (le16(28) != 24 || le32(30) != 0 || w <= 0 || h <= 0 ||
        off < 54 || w.toLong * h > p.length) return None
    val hI = h.toInt // ≤ p.length after the check above
    val rowBytes = ((w.toLong * 3 + 3) / 4 * 4).toInt
    if (off + rowBytes.toLong * hI > p.length) return None
    val px = new Array[Int](w * hI)
    var r = 0
    while (r < hI) {
      val imgRow = if (topDown) r else hI - 1 - r
      var c = 0
      while (c < w) {
        val o = off + r * rowBytes + c * 3
        px(imgRow * w + c) = (u8(o) + u8(o + 1) + u8(o + 2)) / 3
        c += 1
      }
      r += 1
    }
    Some((w, hI, px))
  }

  /** Nearest-neighbor resample to the dHash grid: dst(r, c) =
    * src(r·h/H, c·w/W) — pure integer index math, oracle-recomputable. */
  def resampleToGrid(px: Array[Int], w: Int, h: Int): Array[Int] =
    Array.tabulate(DHashW * DHashH) { i =>
      val r = i / DHashW; val c = i % DHashW
      px((r * h / DHashH) * w + (c * w / DHashW))
    }

  /** dHash over REAL decoded pixels: per-partition batched decode
    * (PGM then BMP attempted — the [[extractFeatures]] shape), resample
    * to 9×7, and the SAME grid fold as the stub kernel. Output
    * (id, h: long, format: string); unrecognized payloads yield null h
    * with format null. */
  def dhashFromPayload(df: DataFrame, idCol: String,
                       payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("h", LongType),
      StructField("format", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val p = row.getAs[Array[Byte]](pIdx)
        // a NULL payload is "undecodable", not a task-killing NPE
        val dec = if (p == null) None
          else decodePgmGray(p).map(d => (d, "pgm"))
            .orElse(decodeBmpGray(p).map(d => (d, "bmp")))
            .orElse(decodePngGray(p).map(d => (d, "png")))
            .orElse(decodeGifGray(p).map(d => (d, "gif")))
            .orElse(decodeJpegGray(p).map(d => (d, "jpeg")))
        dec match {
          case Some(((w, h, px), fmt)) =>
            Row(row.get(idIdx),
              graft.catalyst.DHashStub.ofGrid(resampleToGrid(px, w, h)), fmt)
          case None => Row(row.get(idIdx), null, null)
        }
      }
    }(enc)
  }

  /** Gate-side payload synthesis: text → real container bytes, even ids
    * as 18×14 PGM (exercising the resample), odd ids as 9×7 24-bit BMP
    * (exercising padding + bottom-up rows). */
  def withSynthImagePayload(df: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val text = row.getString(tIdx)
        val payload =
          if (id % 2 == 0) encodePgm(synthPixels(text, 18, 14), 18, 14)
          else encodeBmp24(synthPixels(text, 9, 7), 9, 7)
        Row(id, payload)
      }
    }(enc)
  }

  /** Gate-side PNG payload synthesis: text → a real COMPRESSED container
    * (18×14 grayscale PNG — exercising inflate, CRC verification, all
    * three encoder filter types, and the nearest-neighbor resample). */
  def withSynthPngPayload(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        Row(row.getLong(idIdx),
          encodePng(synthPixels(row.getString(tIdx), 18, 14), 18, 14))
      }
    }(enc)
  }

  /** Gate-side GIF payload synthesis: text → a real LZW-COMPRESSED
    * container (18×14 grayscale GIF; odd ids interlaced, so the gate
    * exercises both row orders — decoded pixels are identical, which is
    * exactly what lets one oracle cover both). */
  def withSynthGifPayload(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        Row(id, encodeGif(synthPixels(row.getString(tIdx), 18, 14), 18, 14,
          interlaced = id % 2 == 1))
      }
    }(enc)
  }

  /** Gate-side JPEG payload synthesis: text → a real baseline-JPEG
    * container (36×28 grayscale, BLOCK-CONSTANT pixels so the lossy
    * codec is exactly invertible; odd ids encode with restart interval
    * 3, so the gate exercises RST markers + predictor resets alongside
    * the plain entropy stream). 36×28 is not MCU-aligned on either axis
    * — every payload also exercises edge padding and decoder crop. */
  def withSynthJpegPayload(df: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        Row(id, encodeJpegGray(synthBlockPixels(row.getString(tIdx), 36, 28),
          36, 28, restartInterval = if (id % 2 == 1) 3 else 0))
      }
    }(enc)
  }

  /** REAL (non-stub) image header parsing: container format + pixel
    * dimensions from the first bytes of a binary payload — PNG (IHDR),
    * GIF87a/89a (logical screen), and JPEG (SOF0/1/2 scan). Pure byte
    * reading, no codec dependency; returns null for unrecognized payloads.
    * This is the typed-metadata step of an image pipeline (filter by
    * resolution, bucket by aspect ratio) that runs at full scan speed
    * before any expensive decode. */
  def imageDims(p: Array[Byte]): Option[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G')
      Some(("png", be32(16), be32(20)))
    else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8')
      Some(("gif", le16(6), le16(8)))
    else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk JPEG segments to the first start-of-frame marker; runs of
      // 0xFF are fill bytes before the marker code (spec-legal padding)
      var i = 2
      while (i < p.length - 1) {
        if (u8(i) != 0xff) return None
        var j = i
        while (j < p.length && u8(j) == 0xff) j += 1
        if (j >= p.length) return None
        val marker = u8(j)
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2)
          return if (j + 8 <= p.length) Some(("jpeg", be16(j + 6), be16(j + 4)))
                 else None
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i = j + 1
        else {
          if (j + 3 > p.length) return None
          i = j + 1 + be16(j + 1)
        }
      }
      None
    } else None
  }

  /** REAL (non-stub) WAV/RIFF header parsing: (channels, sample rate,
    * bits per sample) from the canonical fmt chunk at fixed offsets —
    * pure little-endian byte reads, no codec dependency; null for
    * non-RIFF payloads. The audio counterpart of [[imageDims]]: the
    * typed-metadata step (filter by sample rate, bucket by channels)
    * that runs at scan speed before any decode. */
  def audioMeta(p: Array[Byte]): Option[(Int, Int, Int)] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length >= 36 &&
        u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
        u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E' &&
        u8(12) == 'f' && u8(13) == 'm' && u8(14) == 't' && u8(15) == ' ')
      Some((le16(22), le32(24), le16(34)))
    else None
  }

  /** Batched per-partition image-metadata extraction: (id, format, width,
    * height) with nulls for unrecognized payloads — same mapPartitions
    * batch shape as [[extractFeatures]]. */
  def withImageMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        imageDims(row.getAs[Array[Byte]](pIdx)) match {
          case Some((f, w, h)) => Row(row.get(idIdx), f, w, h)
          case None            => Row(row.get(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /** Batched per-partition audio-metadata extraction — the [[audioMeta]]
    * counterpart of [[withImageMeta]]. */
  def withAudioMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("bits", IntegerType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        audioMeta(row.getAs[Array[Byte]](pIdx)) match {
          case Some((c, r, b)) => Row(row.get(idIdx), c, r, b)
          case None            => Row(row.get(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  // ---- REAL audio: RIFF/WAVE 16-bit PCM codec + sample-domain features --
  //
  // WAV carries raw PCM — no entropy coding — so it is the one audio
  // container decodable here with zero codec dependencies, and every
  // decoded sample is an exact int16 the DuckDB oracle can recompute
  // arithmetically (the q201 discipline applied to sound). Reference
  // scope: the reference treats media as opaque bytes; decode + features
  // are this engine's extension surface (SURVEY.md §2 multimodal rows).

  /** Deterministic int16 PCM source for a text (the microphone stand-in):
    * sample i = md5₄₀(token[i mod n] ⊕ "@i") mod 65536 − 32768. The synth
    * is the audio twin of [[synthPixels]] with a POSITION salt: without
    * it, docs shorter than the sample count produce periodic sample
    * streams, whose delta-sign fingerprints collapse onto few values and
    * skew the band buckets (a synth artifact, not engine behavior — the
    * first sf1 rehearsal measured the skew at ratio 6.6). A DuckDB oracle
    * replays the decoded samples without ever seeing the container. */
  def synthSamples(text: String, n: Int): Array[Int] = {
    val toks = text.split(" ")
    Array.tabulate(n) { i =>
      (graft.catalyst.Md5Prefix40.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks(i % toks.length) + "@" + i)) % 65536L).toInt - 32768
    }
  }

  /** 16-bit mono PCM RIFF/WAVE encoding. `junkChunk` inserts an
    * odd-length unknown chunk between `fmt ` and `data` so decoders must
    * honor the chunk walk + the RIFF odd-size pad byte. */
  def encodeWavPcm16(samples: Array[Int], rate: Int,
                     junkChunk: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
    def tag(s: String): Unit = s.foreach(c => u8(c.toInt))
    val dataBytes = samples.length * 2
    val junk = if (junkChunk) 8 + 5 + 1 else 0 // odd payload + pad byte
    tag("RIFF"); le32(4 + 24 + junk + 8 + dataBytes); tag("WAVE")
    tag("fmt "); le32(16)
    le16(1) // PCM
    le16(1) // mono
    le32(rate)
    le32(rate * 2)  // byte rate
    le16(2)         // block align
    le16(16)        // bits
    if (junkChunk) { tag("LIST"); le32(5); tag("INFO"); u8('x'); u8(0) }
    tag("data"); le32(dataBytes)
    samples.foreach(s => le16(s))
    bos.toByteArray
  }

  /** Real RIFF/WAVE chunk-walking parser: validates the RIFF/WAVE form,
    * walks chunks honoring the odd-size pad byte, requires PCM (format 1),
    * mono, 16-bit, and returns (sampleRate, samples). Anything else —
    * wrong magic, compressed format, multi-channel, truncated data —
    * fails soft with None (decode failure is data, not an exception). */
  def decodeWavPcm16(p: Array[Byte]): Option[(Int, Array[Int])] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def tagAt(i: Int, s: String): Boolean =
      s.indices.forall(j => u8(i + j) == s(j).toInt)
    if (p.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "WAVE")) return None
    var i = 12
    var rate = -1; var ok = false; var fmtSeen = false
    var data: Array[Int] = null
    while (i + 8 <= p.length) {
      val size = le32(i + 4)
      if (size < 0 || i + 8 + size > p.length) return None
      if (tagAt(i, "fmt ")) {
        // ANY second fmt chunk — even after an invalid first one — is a
        // refusal, not last-wins (round-12 advice: an invalid-fmt →
        // valid-fmt → data sequence must not be accepted)
        if (fmtSeen) return None
        fmtSeen = true
        if (size < 16) return None
        val fmt = le16(i + 8); val ch = le16(i + 10)
        rate = le32(i + 12)
        val bits = le16(i + 22)
        ok = fmt == 1 && ch == 1 && bits == 16
      } else if (tagAt(i, "data")) {
        // RIFF/WAVE ordering: data must FOLLOW a valid fmt chunk (a
        // decoder that accepts fmt-after-data or keeps the last of two
        // data chunks silently reinterprets bytes — round-11 advice)
        if (!ok || data != null) return None
        if (size % 2 != 0) return None
        data = Array.tabulate(size / 2) { j =>
          val v = le16(i + 8 + 2 * j)
          if (v >= 32768) v - 65536 else v // sign-extend int16
        }
      }
      i += 8 + size + (size & 1) // odd chunks are padded to even offsets
    }
    if (ok && rate > 0 && data != null) Some((rate, data)) else None
  }

  /** Gate-side WAV payload synthesis: even ids n=64 samples plain; odd
    * ids n=48 with a junk LIST chunk before `data` (exercising the chunk
    * walk + pad byte — decoded samples are unaffected, which is what lets
    * one oracle cover both container layouts). */
  def withSynthWavPayload(df: DataFrame, idCol: String, textCol: String,
                          nEven: Int = 64, nOdd: Int = 48): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val n = if (id % 2 == 0) nEven else nOdd
        Row(id, encodeWavPcm16(synthSamples(row.getString(tIdx), n),
          rate = 8000, junkChunk = id % 2 == 1))
      }
    }(enc)
  }

  /** Sample-domain audio features over REAL decoded PCM — all exact
    * integers so the oracle hashes them: n_samples, peak = max |s|,
    * zero_crossings (sign(x) = x ≥ 0 transitions), energy = Σ s². An
    * undecodable payload yields nulls (fail-soft, directed by callers). */
  def audioFeaturesFromPayload(df: DataFrame, idCol: String,
                               payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("peak", IntegerType),
      StructField("zero_cross", IntegerType),
      StructField("energy", LongType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val p = row.getAs[Array[Byte]](pIdx)
        (if (p == null) None else decodeWavPcm16(p)) match {
          case Some((rate, ss)) =>
            var peak = 0; var zc = 0; var energy = 0L
            var i = 0
            while (i < ss.length) {
              val a = math.abs(ss(i))
              if (a > peak) peak = a
              if (i > 0 && (ss(i - 1) >= 0) != (ss(i) >= 0)) zc += 1
              energy += ss(i).toLong * ss(i)
              i += 1
            }
            Row(row.get(idIdx), rate, ss.length, peak, zc, energy)
          case None =>
            Row(row.get(idIdx), null, null, null, null, null)
        }
      }
    }(enc)
  }

  /** Audio fingerprint: frame the PCM into `frame`-sample windows, take
    * per-frame energies (exact Σ s²), and fold the 56 energy-delta signs
    * e_b < e_{b+1} MSB-first into a long — the same bit layout and band
    * pipeline as dHash, so [[nearDupPairsFromHashes]] and the persisted
    * index machinery apply to sound unchanged. 228 samples at frame=4
    * give exactly 57 frames → 56 bits = [[DHashBits]]. */
  def audioFingerprintFromPayload(df: DataFrame, idCol: String,
                                  payloadCol: String,
                                  frame: Int = 4): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("h", LongType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    val bits = DHashBits
    df.mapPartitions { it =>
      it.map { row =>
        val p = row.getAs[Array[Byte]](pIdx)
        (if (p == null) None else decodeWavPcm16(p)) match {
          case Some((_, ss)) if ss.length >= (bits + 1) * frame =>
            val e = Array.tabulate(bits + 1) { f =>
              var acc = 0L; var j = 0
              while (j < frame) {
                val s = ss(f * frame + j); acc += s.toLong * s; j += 1
              }
              acc
            }
            var acc = 0L
            var b = bits - 1
            while (b >= 0) {
              acc = acc * 2L + (if (e(b) < e(b + 1)) 1L else 0L)
              b -= 1
            }
            Row(row.get(idIdx), acc)
          case _ => Row(row.get(idIdx), null)
        }
      }
    }(enc)
  }

  // ---- REAL video: AVI/MJPEG container + temporal analysis --------------
  //
  // MJPEG-in-AVI is the one video form decodable with what this repo
  // already owns: the RIFF walk (audio's container grammar) around the
  // real baseline-JPEG decoder (q240). Block-constant synth frames keep
  // the lossy codec exactly invertible, so per-frame pixels — and hence
  // frame hashes, scene boundaries, and keyframes — replay in the oracle.

  /** Salted block-constant grayscale source: block b = md5₄₀(
    * token[(b + salt) mod n]) mod 256 — [[synthBlockPixels]] with a frame
    * salt, so frames of the same scene are bit-identical and scenes far
    * apart in Hamming space (unless the text has too few distinct tokens,
    * in which case BOTH engines see the same degenerate content). */
  def synthBlockPixelsSalted(text: String, w: Int, h: Int,
                             salt: Int): Array[Int] = {
    val toks = text.split(" ")
    val bcols = (w + 7) / 8
    Array.tabulate(w * h) { j =>
      val b = (j / w / 8) * bcols + (j % w) / 8
      (graft.catalyst.Md5Prefix40.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          toks((b + salt) % toks.length))) % 256L).toInt
    }
  }

  /** Minimal AVI/MJPEG container: RIFF('AVI '){ LIST('hdrl'){ avih,
    * LIST('strl'){ strh, strf } }, LIST('movi'){ '00dc' frames } }.
    * Structure follows the public AVI RIFF form (msdn AVI RIFF File
    * Reference); only the fields the decoder validates are populated. */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def le32(v: Int): Unit = { le16(v); le16(v >> 16) }
    def tag(s: String): Unit = s.foreach(c => u8(c.toInt))
    // avih: 14 dwords; we populate frame count (idx 4), streams (idx 6),
    // width/height (idx 8/9)
    val avih = new Array[Byte](56)
    def putLe32(a: Array[Byte], i: Int, v: Int): Unit = {
      a(i) = (v & 0xff).toByte; a(i + 1) = ((v >> 8) & 0xff).toByte
      a(i + 2) = ((v >> 16) & 0xff).toByte; a(i + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(avih, 16, frames.length) // dwTotalFrames
    putLe32(avih, 24, 1)             // dwStreams
    putLe32(avih, 32, w)
    putLe32(avih, 36, h)
    val strh = new Array[Byte](56)
    "vids".zipWithIndex.foreach { case (c, i) => strh(i) = c.toByte }
    "MJPG".zipWithIndex.foreach { case (c, i) => strh(4 + i) = c.toByte }
    putLe32(strh, 20, 1)  // dwScale
    putLe32(strh, 24, 25) // dwRate (25 fps)
    putLe32(strh, 32, frames.length)
    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    putLe32(strf, 0, 40); putLe32(strf, 4, w); putLe32(strf, 8, h)
    strf(12) = 1; strf(14) = 24
    "MJPG".zipWithIndex.foreach { case (c, i) => strf(16 + i) = c.toByte }
    // assemble: sizes are computed bottom-up, so build the LISTs as bytes
    def listBytes(listType: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val inner = parts.map(_.length).sum + 4
      val b = java.nio.ByteBuffer.allocate(8 + 4 + parts.map(_.length).sum)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")); b.putInt(inner)
      b.put(listType.getBytes("US-ASCII"))
      parts.foreach(b.put); b.array()
    }
    def chunkBytes(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2
      val b = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")); b.putInt(body.length); b.put(body)
      b.array() // trailing pad byte is already zero
    }
    val strl = listBytes("strl",
      Seq(chunkBytes("strh", strh), chunkBytes("strf", strf)))
    val hdrl = listBytes("hdrl", Seq(chunkBytes("avih", avih), strl))
    val movi = listBytes("movi", frames.map(f => chunkBytes("00dc", f)))
    tag("RIFF"); le32(4 + hdrl.length + movi.length); tag("AVI ")
    bos.write(hdrl, 0, hdrl.length); bos.write(movi, 0, movi.length)
    bos.toByteArray
  }

  /** Real AVI RIFF walker: validates the 'AVI ' form, reads dwTotalFrames
    * from avih, collects '00dc'/'00db' payloads inside LIST('movi')
    * honoring the odd-size pad, and returns the frames only when the
    * count matches the header (a truncated movi fails soft). */
  def decodeAviFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
    @inline def u8(i: Int): Int = p(i) & 0xff
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def tagAt(i: Int, s: String): Boolean =
      i + s.length <= p.length && s.indices.forall(j => u8(i + j) == s(j).toInt)
    if (p.length < 12 || !tagAt(0, "RIFF") || !tagAt(8, "AVI ")) return None
    var declared = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(from: Int, to: Int, inMovi: Boolean): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val size = le32(i + 4)
        if (size < 0 || i + 8 + size > to) return false
        if (tagAt(i, "LIST")) {
          val listType = new String(p, i + 8, 4, "US-ASCII")
          if (!walk(i + 12, i + 8 + size, inMovi || listType == "movi"))
            return false
        } else if (tagAt(i, "avih")) {
          if (size < 56) return false
          declared = le32(i + 8 + 16)
        } else if (inMovi && (tagAt(i, "00dc") || tagAt(i, "00db"))) {
          frames += java.util.Arrays.copyOfRange(p, i + 8, i + 8 + size)
        }
        i += 8 + size + (size & 1)
      }
      true
    }
    if (!walk(12, p.length, inMovi = false)) return None
    if (declared >= 0 && frames.length == declared && declared > 0)
      Some(frames.toSeq)
    else None
  }

  /** Gate-side AVI payload synthesis: `nFrames` 36×28 block-constant
    * baseline JPEGs per doc (the q240 invertibility trick), frame f
    * salted by its SCENE index — even ids cut scenes every 2 frames, odd
    * ids every 3 — so frames within a scene are bit-identical and scene
    * changes are Hamming-visible. */
  def withSynthAviPayload(df: DataFrame, idCol: String, textCol: String,
                          nFrames: Int = 6): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        val text = row.getString(tIdx)
        val sceneLen = if (id % 2 == 0) 2 else 3
        // frames within a scene share their salt, so their JPEG bytes
        // are bit-identical by construction — encode each DISTINCT salt
        // once and reuse the bytes (r16: the encoder's DCT dominated the
        // synth pass; 6 frames carry only 2-3 distinct scenes)
        val bySalt = scala.collection.mutable.HashMap.empty[Int, Array[Byte]]
        val frames = (0 until nFrames).map { f =>
          val salt = (f / sceneLen) * 7
          bySalt.getOrElseUpdate(salt, encodeJpegGray(
            synthBlockPixelsSalted(text, 36, 28, salt), 36, 28))
        }
        Row(id, encodeAviMjpeg(frames, 36, 28))
      }
    }(enc)
  }

  /** Per-frame hashes over REAL decoded video: AVI walk → baseline-JPEG
    * decode per frame → resample → the shared dHash fold. Output
    * (id, frame_idx, h); an undecodable container or frame emits one
    * (id, -1, null) row so callers fail directed in-query. Partition
    * shape: one input row → nFrames output rows, all scan-local — no
    * shuffle until the caller's temporal analysis. */
  def videoFrameHashes(df: DataFrame, idCol: String,
                       payloadCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("frame_idx", IntegerType),
      StructField("h", LongType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val pIdx = df.columns.indexOf(payloadCol)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val p = row.getAs[Array[Byte]](pIdx)
        (if (p == null) None else decodeAviFrames(p)) match {
          case Some(frames) =>
            // repeated frames are common (static scenes re-encode to
            // identical bytes): decode+resample+hash each DISTINCT frame
            // payload once per video, keyed on content (ByteBuffer's
            // content hash) — identical results for any input, 2-3×
            // fewer JPEG decodes on scene-structured video (r16)
            val seen = scala.collection.mutable.HashMap
              .empty[java.nio.ByteBuffer, Option[Long]]
            val hashes = frames.map { fb =>
              seen.getOrElseUpdate(java.nio.ByteBuffer.wrap(fb),
                decodeJpegGray(fb).map { case (w, h, px) =>
                  graft.catalyst.DHashStub.ofGrid(resampleToGrid(px, w, h))
                })
            }
            if (hashes.exists(_.isEmpty))
              Seq(Row(row.get(idIdx), -1, null))
            else hashes.zipWithIndex.map { case (hv, f) =>
              Row(row.get(idIdx), f, hv.get)
            }
          case None => Seq(Row(row.get(idIdx), -1, null))
        }
      }
    }(enc)
  }

  /** Per-video KEYFRAME hashes: frame 0 plus every frame whose dHash
    * differs from its predecessor by > `boundaryBits` (q247's scene-
    * boundary rule) — the set worth indexing: keyframe selection cuts
    * the indexable hashes by the average scene length BEFORE any join.
    * An undecodable payload FAILS DIRECTED here (raise_error naming the
    * carrier) rather than flowing a null hash into the lag, where it
    * would silently promote its successor to keyframe. The per-video
    * window is bounded by the frame count — never corpus-sized. */
  def videoKeyframeHashes(df: DataFrame, idCol: String, payloadCol: String,
                          boundaryBits: Int = 3): DataFrame = {
    val fh = videoFrameHashes(df, idCol, payloadCol)
    val verified = fh.select(col("id"), col("frame_idx"),
      when(col("h").isNull, raise_error(concat(
        lit("videoKeyframeHashes: payload for id "), col("id").cast("string"),
        lit(" failed to decode — container/JPEG regression"))))
        .otherwise(col("h")).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("frame_idx"))
    verified
      .withColumn("prev", lag(col("h"), 1).over(w))
      .filter(col("prev").isNull ||
        hamming(col("h"), col("prev")) > boundaryBits)
      .select(col("id"), col("frame_idx"), col("h"))
  }

  /** Corpus video-keyframe index rows for [[dhashIndexTap]] persistence
    * (the q191 layout — (h, band, key), bucketed by key): the corpus is
    * DECODED ONCE at build time, and every later arrival batch matches
    * against these rows via [[matchesAgainstIndexFromHashes]] with zero
    * corpus-side decode or exchange (q265's in-plan asserts). Same
    * hash-width note as [[dhashIndex]]: the full 56-bit hash persists,
    * band keys are candidate-generation only. */
  def videoKeyframeIndex(videos: DataFrame, idCol: String,
                         payloadCol: String,
                         boundaryBits: Int = 3): DataFrame =
    dhashBandRows(
      videoKeyframeHashes(videos, idCol, payloadCol, boundaryBits)
        .select(col("h")).distinct(), "h")
}
