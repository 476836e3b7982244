package graft.multimodal

/** REAL image header parsing in pure JVM bytes — no native codec needed:
  * PNG IHDR, JPEG SOF markers, GIF logical screen descriptor, and BMP
  * BITMAPINFOHEADER all carry dimensions/channels in their first bytes.
  * This removes the "decode is a stub" ceiling for metadata extraction;
  * only PIXEL decode (which genuinely needs libjpeg/ffmpeg) remains
  * behind the deterministic-fake boundary.
  *
  * Format references (public specs): PNG (ISO 15948 §11.2.2 — IHDR is
  * always the first chunk at byte 8: width/height as big-endian u32,
  * color type byte 25), JPEG (ITU T.81 §B.2.2 — SOFn segment:
  * precision u8, height u16, width u16, components u8), GIF
  * (GIF89a spec §18 — logical screen w/h as little-endian u16 at 6/8),
  * BMP (BITMAPINFOHEADER — width/height little-endian i32 at 18/22,
  * bits-per-pixel u16 at 28).
  */
object ImageHeaders {

  /** (width, height, channels) when a known header parses; None for
    * unknown/truncated/corrupt payloads (caller decides the fallback).
    */
  def parse(b: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      if (isPng(b)) parsePng(b)
      else if (isJpeg(b)) parseJpeg(b)
      else if (isGif(b)) parseGif(b)
      else if (isBmp(b)) parseBmp(b)
      else None
    } catch { case _: IndexOutOfBoundsException => None }

  private def u(x: Byte): Int = x & 0xff
  private def be16(b: Array[Byte], i: Int): Int = u(b(i)) << 8 | u(b(i + 1))
  private def be32(b: Array[Byte], i: Int): Int =
    u(b(i)) << 24 | u(b(i + 1)) << 16 | u(b(i + 2)) << 8 | u(b(i + 3))
  private def le16(b: Array[Byte], i: Int): Int = u(b(i + 1)) << 8 | u(b(i))
  private def le32(b: Array[Byte], i: Int): Int =
    u(b(i + 3)) << 24 | u(b(i + 2)) << 16 | u(b(i + 1)) << 8 | u(b(i))

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 26 && u(b(0)) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && u(b(4)) == 0x0d && u(b(5)) == 0x0a &&
      u(b(6)) == 0x1a && u(b(7)) == 0x0a

  private def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    // IHDR is mandatory-first: 4-byte length, "IHDR", then the fields
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16); val h = be32(b, 20)
    val channels = u(b(25)) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette (one index per pixel)
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    if (w > 0 && h > 0) Some((w, h, channels)) else None
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u(b(0)) == 0xff && u(b(1)) == 0xd8

  private def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int)] = {
    // walk marker segments until a start-of-frame (SOFn, n != 4/8/12)
    var i = 2
    while (i + 3 < b.length) {
      if (u(b(i)) != 0xff) return None
      // T.81 B.1.1.2: any number of 0xff FILL bytes may precede a marker
      while (i + 3 < b.length && u(b(i + 1)) == 0xff) i += 1
      if (i + 3 >= b.length) return None
      val marker = u(b(i + 1))
      if (marker == 0xd8 || marker == 0x01 ||
          (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone marker (SOI/TEM/RSTn), no length field
      } else if (marker == 0xda || marker == 0xd9) {
        return None // scan data / EOI before any SOF
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOF: [len][precision u8][height u16][width u16][components u8]
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          val channels = u(b(i + 9))
          return if (w > 0 && h > 0 && channels > 0) Some((w, h, channels))
                 else None
        }
        i += 2 + len
      }
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def parseGif(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val w = le16(b, 6); val h = le16(b, 8)
    if (w > 0 && h > 0) Some((w, h, 3)) else None
  }

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 30 && b(0) == 'B' && b(1) == 'M'

  private def parseBmp(b: Array[Byte]): Option[(Int, Int, Int)] = {
    // only BITMAPINFOHEADER and its extensions (DIB size >= 40) store
    // width/height as i32 at 18/22 — a BITMAPCOREHEADER (size 12) packs
    // u16 dims at 18/20 and would parse here as garbage
    if (le32(b, 14) < 40) return None
    val w = le32(b, 18); val h = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    val channels = bpp match {
      case 1 | 4 | 8 => 1
      case 16 | 24   => 3
      case 32        => 4
      case _         => return None
    }
    if (w > 0 && h > 0) Some((w, h, channels)) else None
  }
}
