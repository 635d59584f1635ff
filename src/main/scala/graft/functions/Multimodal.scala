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
                               maxHamming: Int = 3): DataFrame = {
    // the batch id rides the band rows (no hash-collapse + join-back:
    // the batch side is small, and re-joining the hash frame with its
    // own band-derived candidates would self-join the same plan subtree)
    val bh = batch.select(col(idCol).as("id"),
      dHashStub(col(textCol)).as("bh"))
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
}
