package graft.operators

/** Real PNG pixel decode, pure JVM — no image library.
  *
  * Implements the public PNG spec (RFC 2083 / W3C PNG): chunk walk,
  * zlib-inflate of the concatenated IDAT stream (`java.util.zip.Inflater`
  * — zlib is in the JDK), then per-scanline un-filtering (None / Sub /
  * Up / Average / Paeth). This replaces the byte-histogram stand-in for
  * PNG payloads in [[Multimodal.extractFeatures]]; JPEG stays header-only
  * (a baseline DCT entropy decoder is out of scope — loudly, not
  * silently: non-PNG payloads keep the clearly-documented fake).
  *
  * Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
  * 4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else (16-bit,
  * sub-byte depths, Adam7) returns None and the caller falls back — a
  * pipeline must never throw on a malformed or exotic payload.
  *
  * Defensive by design for an untrusted corpus: a tiny PNG can declare
  * enormous dimensions and inflate into executor-OOM territory (a
  * decompression bomb), so `decode` refuses images above `maxPixels`
  * BEFORE allocating. CRCs are not verified — truncated or corrupt
  * streams already fail at inflate/size checks, and a quality pipeline
  * prefers decoding a bit-flipped image over dropping it.
  */
object PngCodec {

  /** Decoded raster: `samples` is row-major, channel-interleaved, one
    * unsigned byte per sample (mask with `& 0xff`). Palette images are
    * expanded to 3-channel RGB.
    */
  final case class Image(width: Int, height: Int, channels: Int,
                         samples: Array[Byte])

  private val SIG =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Decode a PNG payload to pixels, or None if the payload is not a
    * PNG, uses an unsupported encoding, is malformed/truncated, or would
    * exceed `maxPixels` (decompression-bomb guard).
    */
  def decode(b: Array[Byte], maxPixels: Long = 1L << 24): Option[Image] = {
    if (b.length < 8 || !SIG.indices.forall(i => b(i) == SIG(i))) return None
    var w, h, bitDepth, colorType, interlace = -1
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var end = false
    while (!end && i + 8 <= b.length) {
      val len = u32(b, i).toInt
      val dataOff = i + 8
      // long arithmetic: a crafted length near Int.MaxValue would wrap
      // the int sum negative and sneak past the truncation check
      if (len < 0 || dataOff.toLong + len + 4 > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = u32(b, dataOff).toInt
          h = u32(b, dataOff + 4).toInt
          bitDepth = b(dataOff + 8) & 0xff
          colorType = b(dataOff + 9) & 0xff
          interlace = b(dataOff + 12) & 0xff
        case "PLTE" =>
          plte = java.util.Arrays.copyOfRange(b, dataOff, dataOff + len)
        case "IDAT" => idat.write(b, dataOff, len)
        case "IEND" => end = true
        case _ => () // ancillary chunks skipped
      }
      i = dataOff + len + 4 // data + CRC
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
    if (w.toLong * h > maxPixels) return None
    val ch = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && plte == null) return None

    // zlib-inflate the filtered scanlines: h rows of (1 filter byte +
    // w*ch samples); exact-size output is itself a validity check
    val stride = w * ch
    val raw = new Array[Byte](h * (stride + 1))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    if (off < raw.length) return None

    // un-filter (PNG spec §6): each row's filter byte chooses the
    // predictor; reconstruction references the already-reconstructed
    // left (a), up (b), and up-left (c) samples, ch bytes back
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val a = if (x >= ch) out(rowOut + x - ch) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val c = if (x >= ch && y > 0) out(rowOut - stride + x - ch) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + up
          case 3 => cur + ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            cur + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None // invalid filter type
        }
        out(rowOut + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }

    if (colorType == 3) { // palette → RGB expansion
      val rgb = new Array[Byte](w * h * 3)
      var j = 0
      while (j < w * h) {
        val idx = (out(j) & 0xff) * 3
        if (idx + 2 >= plte.length) return None // index past palette
        rgb(j * 3) = plte(idx)
        rgb(j * 3 + 1) = plte(idx + 1)
        rgb(j * 3 + 2) = plte(idx + 2)
        j += 1
      }
      Some(Image(w, h, 3, rgb))
    } else Some(Image(w, h, ch, out))
  }

  /** 16-dim feature vector from REAL pixels: 4 channel means (RGBA order,
    * 0–1; gray replicates into RGB, absent alpha reads opaque) followed by
    * a 12-bin Rec.709 luminance histogram normalized to sum 1 — the same
    * shape [[Multimodal.FakeCodec]] emits, so PNG and non-PNG features mix
    * in one column.
    */
  def pixelFeatures(img: Image): Array[Double] = {
    val n = (img.width.toLong * img.height).toDouble
    val means = new Array[Double](4)
    val hist = new Array[Double](12)
    val s = img.samples
    var j = 0
    while (j < s.length) {
      val (r, g, b, a) = img.channels match {
        case 1 => val v = s(j) & 0xff; (v, v, v, 255)
        case 2 => val v = s(j) & 0xff; (v, v, v, s(j + 1) & 0xff)
        case 3 => (s(j) & 0xff, s(j + 1) & 0xff, s(j + 2) & 0xff, 255)
        case _ => (s(j) & 0xff, s(j + 1) & 0xff, s(j + 2) & 0xff, s(j + 3) & 0xff)
      }
      means(0) += r; means(1) += g; means(2) += b; means(3) += a
      val lum = 0.2126 * r + 0.7152 * g + 0.0722 * b
      hist(math.min(11, (lum * 12.0 / 256.0).toInt)) += 1.0
      j += img.channels
    }
    Array(means(0) / (n * 255.0), means(1) / (n * 255.0),
      means(2) / (n * 255.0), means(3) / (n * 255.0)) ++ hist.map(_ / n)
  }
}
