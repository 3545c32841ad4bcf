package graft.operators

/** Real JPEG pixel decode via the JDK's bundled baseline reader
  * (`javax.imageio.ImageIO` — in every JDK, zero new dependencies),
  * closing the last pixel-level gap [[PngCodec]] left: PNG decodes from
  * first principles (bit-exact, engine-pinned), JPEG through the JDK.
  *
  * Output shape is [[PngCodec.Image]] with 3 RGB channels, so
  * [[PngCodec.pixelFeatures]] applies unchanged and PNG/JPEG features
  * mix in one column.
  *
  * Determinism: the JDK's decoder is deterministic for a given JDK
  * build; unlike [[PngCodec]] the IDCT is not pinned bit-for-bit across
  * runtimes (JPEG decoders may legitimately differ by ±1 in a sample).
  * Tests therefore assert exact pixels only against the SAME JDK's
  * encoder, and tolerance elsewhere.
  *
  * Defensive like PngCodec: dimensions come from the SOFn header
  * ([[Multimodal.HeaderCodec.jpegDims]]) and are checked against
  * `maxPixels` BEFORE the decoder allocates a raster (decompression-bomb
  * guard), and any malformed stream declines with None — a pipeline
  * must never throw on an untrusted payload.
  */
object JpegCodec {

  /** Decode a JPEG payload to RGB pixels, or None if the payload is not
    * a JPEG, is malformed/truncated, or would exceed `maxPixels`.
    */
  def decode(b: Array[Byte], maxPixels: Long = 1L << 24): Option[PngCodec.Image] = {
    if (!Multimodal.HeaderCodec.isJpeg(b)) return None
    // the JVM's own ceiling binds too: samples is one Array[Byte] of
    // w*h*3, so a caller-raised maxPixels above ~715 M pixels must not
    // wrap the Int allocation size negative
    def fits(w: Int, h: Int): Boolean =
      w > 0 && h > 0 && w.toLong * h <= maxPixels &&
        w.toLong * h * 3 <= Int.MaxValue
    Multimodal.HeaderCodec.jpegDims(b) match {
      case Some((w, h)) if fits(w, h) => ()
      case _ => return None
    }
    try {
      // an explicit in-memory ImageInputStream per call: passing a plain
      // InputStream would route through ImageIO's stream-cache factory,
      // whose default writes every payload to an executor-local temp
      // FILE — and flipping that off via ImageIO.setUseCache(false) is
      // JVM-global state this library must not own (the host application
      // may want the file cache for its own ImageIO use)
      val img = javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(b)))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (!fits(w, h)) return None
      val samples = new Array[Byte](w * h * 3)
      val row = new Array[Int](w) // packed ARGB, one getRGB call per row
      var y = 0
      var k = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          samples(k) = ((p >> 16) & 0xff).toByte
          samples(k + 1) = ((p >> 8) & 0xff).toByte
          samples(k + 2) = (p & 0xff).toByte
          k += 3
          x += 1
        }
        y += 1
      }
      Some(PngCodec.Image(w, h, 3, samples))
    } catch {
      // corrupt entropy stream, unsupported subformat, reader bugs — the
      // caller falls back to the byte-level stand-in rather than failing
      // a 100 TB job on one bad payload. NonFatal only: an OOM/JVM error
      // must propagate and fail the task (silent fallback in a corrupted
      // JVM would be wrong data with no error signal)
      case scala.util.control.NonFatal(_) => None
    }
  }
}
