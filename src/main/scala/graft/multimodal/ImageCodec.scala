package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pure-JVM image handling for the multimodal pipeline — no native
  * libraries involved:
  *
  *  - [[header]] is a hand-written magic-byte + header parser for
  *    PNG/JPEG/GIF/BMP. At 100 TB this is the path that matters: a corpus
  *    gate wants width/height/channels to filter and route WITHOUT paying
  *    a full pixel decode — it reads at most a few hundred bytes per blob
  *    and never allocates pixel buffers.
  *  - [[decode]] is a real pixel decode through `javax.imageio` (PNG,
  *    JPEG, GIF, BMP readers ship with the JDK) producing exact-pixel
  *    statistics and a deterministic nearest-neighbor grayscale thumb.
  *    For formats the JDK can't decode, production swaps this one method
  *    for a library call; the header path and all dataflow stay as-is.
  *
  * Both are total functions returning Option — truncated or non-image
  * bytes yield None, never an exception (a corpus gate must not die on a
  * corrupt blob).
  */
object ImageCodec {

  /** Format + dimensions readable from the first bytes of a blob. */
  final case class ImageMeta(format: String, width: Int, height: Int, channels: Int)

  // Big-endian reads (PNG/JPEG lengths) with bounds checks.
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  // Little-endian (GIF/BMP).
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Container format from magic bytes, or None. */
  def sniff(b: Array[Byte]): Option[String] =
    if (b.length >= 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A)
      Some("png")
    else if (b.length >= 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte &&
      b(2) == 0xFF.toByte) Some("jpeg")
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') Some("gif")
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') Some("bmp")
    else None

  /** Width/height/channels parsed from header bytes only — no pixel
    * decode, reads O(100) bytes regardless of blob size. */
  def header(b: Array[Byte]): Option[ImageMeta] = sniff(b).flatMap {
    case "png"  => pngHeader(b)
    case "jpeg" => jpegHeader(b)
    case "gif"  => gifHeader(b)
    case "bmp"  => bmpHeader(b)
  }

  /** PNG: 8-byte magic, then the IHDR chunk (len, "IHDR", w:4, h:4,
    * bit-depth:1, color-type:1, ...). Channels from the color type. */
  private def pngHeader(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 29) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    val channels = b(25) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette index (expands to 3 on decode)
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return None
    }
    Some(ImageMeta("png", w.toInt, h.toInt, channels))
  }

  /** JPEG: walk the marker stream from SOI to the first SOF frame header
    * (FFC0-FFCF except DHT/JPG/DAC): precision:1, height:2, width:2,
    * components:1. Skips every other segment by its declared length. */
  private def jpegHeader(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 3 < b.length) {
      if (b(i) != 0xFF.toByte) return None // marker stream out of sync
      var marker = b(i + 1) & 0xFF
      // fill bytes: consecutive FFs before a marker are legal padding
      var j = i + 1
      while (marker == 0xFF && j + 1 < b.length) { j += 1; marker = b(j) & 0xFF }
      i = j - 1
      marker match {
        case 0xD8 | 0x01 => i += 2 // SOI / TEM — parameterless
        case m if m >= 0xD0 && m <= 0xD7 => i += 2 // RSTn — parameterless
        case 0xD9 | 0xDA => return None // EOI / SOS before any SOF
        case m if m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
          // SOFn frame header
          if (i + 9 >= b.length) return None
          val h = be16(b, i + 5); val w = be16(b, i + 7)
          val comps = b(i + 9) & 0xFF
          if (w <= 0 || h <= 0 || comps <= 0) return None
          return Some(ImageMeta("jpeg", w, h, comps))
        case _ =>
          if (i + 3 >= b.length) return None
          val len = be16(b, i + 2)
          if (len < 2) return None
          i += 2 + len
      }
    }
    None
  }

  /** GIF: 6-byte signature then the logical screen descriptor (w,h LE16).
    * Decodes to RGB regardless of palette depth. */
  private def gifHeader(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 10) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageMeta("gif", w, h, 3))
  }

  /** BMP: 14-byte file header, then a BITMAPINFOHEADER (or larger):
    * width:int32 LE at 18, height at 22 (negative = top-down), bpp at 28. */
  private def bmpHeader(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 30) return None
    val dibSize = le32(b, 14)
    if (dibSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32(b, 18); val h = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    if (w <= 0 || h <= 0 || bpp <= 0) return None
    Some(ImageMeta("bmp", w, h, math.max(1, bpp / 8)))
  }

  /** Real pixel statistics + thumbnail. */
  final case class Decoded(meta: ImageMeta, lumaMean: Double, thumb: Array[Byte])

  /** Full pixel decode via the JDK's ImageIO readers. The luma mean is the
    * exact average of ITU-R BT.601 integer luma over all pixels; the thumb
    * is a `thumbSide²` nearest-neighbor grayscale sample — both pure
    * integer/pixel arithmetic, so results are bit-stable across platforms
    * for lossless formats. Returns None when no JDK reader accepts the
    * bytes. */
  def decode(b: Array[Byte], thumbSide: Int = 4): Option[Decoded] =
    header(b).flatMap { meta =>
      val img =
        try Option(ImageIO.read(new ByteArrayInputStream(b)))
        catch { case scala.util.control.NonFatal(_) => None }
      img.map { im =>
        var sum = 0L
        var y = 0
        while (y < im.getHeight) {
          var x = 0
          while (x < im.getWidth) {
            sum += luma(im.getRGB(x, y)); x += 1
          }
          y += 1
        }
        val n = im.getWidth.toLong * im.getHeight
        val side = math.max(1, thumbSide)
        val thumb = new Array[Byte](side * side)
        var ty = 0
        while (ty < side) {
          var tx = 0
          while (tx < side) {
            val sx = (tx.toLong * im.getWidth / side).toInt
            val sy = (ty.toLong * im.getHeight / side).toInt
            thumb(ty * side + tx) = luma(im.getRGB(sx, sy)).toByte
            tx += 1
          }
          ty += 1
        }
        Decoded(meta, if (n == 0) 0.0 else sum.toDouble / n, thumb)
      }
    }

  /** Integer BT.601 luma from a packed ARGB pixel. */
  private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xFF; val g = (argb >> 8) & 0xFF; val b = argb & 0xFF
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Deterministic PNG synthesis — renders a pixel function into real PNG
    * bytes via the JDK encoder. Used by tests and the m11 pipeline to
    * feed the codec genuine image bytes without binary fixtures in the
    * repo (PNG is lossless, so decode(encodePng(f)) recovers f exactly). */
  def encodePng(width: Int, height: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val im = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { im.setRGB(x, y, pixel(x, y) & 0xFFFFFF); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(im, "png", out)
    out.toByteArray
  }
}
