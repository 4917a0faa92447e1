package graft.tools

import graft.multimodal.JpegDecoder
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

object JpegDebug {
  def main(args: Array[String]): Unit = {
    sys.props("graft.jpeg.debug") = "1"
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, Array(32, 96, 160, 224)((y / 8) * 2 + (x / 8)))
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.75f)
    val bos = new ByteArrayOutputStream()
    val out = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(out)
    writer.write(null, new IIOImage(img, null, null), params)
    out.close(); writer.dispose()
    val bytes = bos.toByteArray
    // dump marker structure
    var i = 0
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i+1) & 0xff) != 0 && (bytes(i+1) & 0xff) != 0xff) {
        println(f"marker FF${bytes(i+1) & 0xff}%02X at $i")
      }
      i += 1
    }
    println("decode: " + JpegDecoder.decodeJpegBaseline(bytes).map(r => (r.width, r.height)))
  }
}
