package graft.multimodal

/**
 * Embedded baseline-JPEG driver fixtures for `multimodal_jpeg_decode`
 * — generated ONCE by `graft.tools.JpegFixtureGen` with the JDK's own
 * ImageIO JPEG encoder (an independent implementation of public
 * ITU-T T.81), then frozen here. All three are block-UNIFORM rasters:
 * every 8x8 block is a flat color, so every AC coefficient is exactly
 * zero and any conforming IDCT reproduces the plane exactly —
 * `JpegDecoderSpec` asserts our decode of this family is bit-identical
 * to ImageIO's, which makes the driver oracle's pinned luminance
 * histograms decoder-independent ground truth rather than
 * self-confirmation.
 *
 *  - 0: 16x16 grayscale, blocks 32/96/160/224, quality 0.75
 *  - 1: 24x8 grayscale, blocks 0/128/255, quality 0.9
 *  - 2: 32x16 RGB (YCbCr, subsampled chroma), eight uniform color
 *       blocks, quality 0.85 — exercises the multi-component scan and
 *       chroma-block bitstream sync with Y-only rasterization
 */
object JpegFixtures {
  private def b64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)

  val payloads: Seq[(Long, Array[Byte])] = Seq(
    0L -> b64(
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof" +
      "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAQABABAREA/8QAHwAA" +
      "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR" +
      "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF" +
      "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip" +
      "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB" +
      "AAA/APH69Ar0CvQK/9k="),
    1L -> b64(
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoHBwYIDAoM" +
      "DAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/wAALCAAIABgBAREA/8QAHwAA" +
      "AQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQR" +
      "BRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6Q0RF" +
      "RkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ip" +
      "qrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEB" +
      "AAA/APyqr9Va/VOv/9k="),
    2L -> b64(
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8KCwkMEQ8S" +
      "EhEPERATFhwXExQaFRARGCEYGhwdHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEU" +
      "Hh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/wAAR" +
      "CAAQACADASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAA" +
      "AgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkK" +
      "FhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWG" +
      "h4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl" +
      "5ufo6erx8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREA" +
      "AgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAVYnLRChYk" +
      "NOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hpanN0dXZ3eHl6goOE" +
      "hYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPExcbHyMnK0tPU1dbX2Nna4uPk" +
      "5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDga9OrYrzGu7/U76//AMvuXl/u33/7eXYn" +
      "6x/xFXp9W+rf9xOb2n/gFrcnne/S2vG19Z14tX2zXm8dU/8AWz2GvsvZc396/Ny/4bW5fPcz" +
      "wFL6nza3vby2uf/Z"))

  /** Pinned per-fixture ground truth: (fix_id, width, height, n_pixels,
    * set of 16-bin histogram bins that hold exactly 64 pixels — every
    * other bin holds zero). One uniform 8x8 block = 64 identical pixels
    * = one full bin. */
  val expected: Seq[(Int, Int, Int, Int, Set[Int])] = Seq(
    (0, 16, 16, 256, Set(2, 6, 10, 14)),
    (1, 24, 8, 192, Set(0, 8, 15)),
    (2, 32, 16, 512, Set(4, 5, 6, 7, 8, 9, 11, 15)))

  /**
   * The SAME three rasters written with ImageIO's PROGRESSIVE (SOF2)
   * scan script, for `multimodal_progressive_decode` — frozen from the
   * same generator, which asserts the gray payloads decode bit-exactly
   * to ImageIO's own progressive decode before printing. DC-only
   * blocks reconstruct exactly through successive approximation, so
   * the pinned stats are [[expected]] verbatim: the quantized
   * coefficients are identical to the baseline encodes (same quality,
   * same tables), only the entropy-coding order differs.
   */
  val progressivePayloads: Seq[(Long, Array[Byte])] = Seq(
    0L -> b64(
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8UHRof" +
      "Hh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wgALCAAQABABAREA/8QAFAAB" +
      "AAAAAAAAAAAAAAAAAAAABv/aAAgBAQAAAAEegQIP/8QAFBABAAAAAAAAAAAAAAAAAAAAIP/a" +
      "AAgBAQABBQIf/8QAFBABAAAAAAAAAAAAAAAAAAAAIP/aAAgBAQAGPwIf/8QAFBABAAAAAAAA" +
      "AAAAAAAAAAAAIP/aAAgBAQABPyEf/9oACAEBAAAAEA//xAAUEAEAAAAAAAAAAAAAAAAAAAAg" +
      "/9oACAEBAAE/EB//2Q=="),
    1L -> b64(
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoHBwYIDAoM" +
      "DAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/wgALCAAIABgBAREA/8QAFAAB" +
      "AAAAAAAAAAAAAAAAAAAACP/aAAgBAQAAAAEqKtU//8QAFBABAAAAAAAAAAAAAAAAAAAAEP/a" +
      "AAgBAQABBQJ//8QAFBABAAAAAAAAAAAAAAAAAAAAEP/aAAgBAQAGPwJ//8QAFBABAAAAAAAA" +
      "AAAAAAAAAAAAEP/aAAgBAQABPyF//9oACAEBAAAAEL//xAAUEAEAAAAAAAAAAAAAAAAAAAAQ" +
      "/9oACAEBAAE/EH//2Q=="),
    2L -> b64(
      "/9j/4AAQSkZJRgABAgAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8KCwkMEQ8S" +
      "EhEPERATFhwXExQaFRARGCEYGhwdHx8fExciJCIeJBweHx7/2wBDAQUFBQcGBw4ICA4eFBEU" +
      "Hh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh7/wgAR" +
      "CAAQACADASIAAhEBAxEB/8QAFwAAAwEAAAAAAAAAAAAAAAAABQYHBP/EABcBAAMBAAAAAAAA" +
      "AAAAAAAAAAECAwT/2gAMAwEAAhADEAAAAQDPsWLgNWUu2Zl//8QAFBABAAAAAAAAAAAAAAAA" +
      "AAAAMP/aAAgBAQABBQIP/8QAHhEAAAQHAAAAAAAAAAAAAAAAAAIREwMSFlFjgpH/2gAIAQMB" +
      "AT8BcqrG3ss3LCAVlR//xAAgEQABAgUFAAAAAAAAAAAAAAARABICBRVCYRMxUXHh/9oACAEC" +
      "AQE/AaPr3gY9U9hqzLWnO464X//EABQQAQAAAAAAAAAAAAAAAAAAADD/2gAIAQEABj8CD//E" +
      "ABQQAQAAAAAAAAAAAAAAAAAAADD/2gAIAQEAAT8hD//aAAwDAQACAAMAAAAQAU//xAAbEQEA" +
      "AgIDAAAAAAAAAAAAAAARQWEAITFx8P/aAAgBAwEBPxCn2KndYNzilcOf/8QAHBEAAQMFAAAA" +
      "AAAAAAAAAAAAABExoUFRcYHx/9oACAECAQE/EO4PpYqM5ATJz//EABQQAQAAAAAAAAAAAAAA" +
      "AAAAADD/2gAIAQEAAT8QD//Z"))
}
