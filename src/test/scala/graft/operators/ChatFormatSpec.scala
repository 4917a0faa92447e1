package graft.operators

import graft.SparkFunSuite

/** Chat rendering: template shape, turn ordering, mask boundary
  * arithmetic, multi-assistant conversations, and the no-assistant
  * degenerate case. */
class ChatFormatSpec extends SparkFunSuite {
  import spark.implicits._

  private def turns(rows: (Long, Long, String, String)*) =
    rows.toDF("conv_id", "turn_idx", "role", "content")

  test("render: template shape and mask boundary on a 3-turn conversation") {
    val got = ChatFormat.render(
      turns((1L, 0L, "system", "Be kind."), (1L, 1L, "user", "Hi"),
        (1L, 2L, "assistant", "Hello!")),
      "conv_id", "turn_idx", "role", "content").collect().head
    val expected =
      "<|im_start|>system\nBe kind.<|im_end|>\n" +
        "<|im_start|>user\nHi<|im_end|>\n" +
        "<|im_start|>assistant\nHello!<|im_end|>\n"
    assert(got.getAs[String]("text") === expected)
    assert(got.getAs[Long]("n_turns") === 3L)
    // mask_from points at the 'H' of "Hello!"
    val maskFrom = got.getAs[Long]("mask_from")
    assert(expected.substring(maskFrom.toInt - 1).startsWith("Hello!"))
    assert(got.getAs[Long]("target_len") === 6L)
  }

  test("render: turns sort by index regardless of input order; last assistant wins") {
    val got = ChatFormat.render(
      turns((7L, 3L, "assistant", "second"), (7L, 1L, "assistant", "first"),
        (7L, 0L, "user", "q1"), (7L, 2L, "user", "q2")),
      "conv_id", "turn_idx", "role", "content").collect().head
    val text = got.getAs[String]("text")
    assert(text.indexOf("q1") < text.indexOf("first"))
    assert(text.indexOf("first") < text.indexOf("q2"))
    val maskFrom = got.getAs[Long]("mask_from")
    assert(text.substring(maskFrom.toInt - 1).startsWith("second"))
  }

  test("render: conversation without an assistant turn → mask_from 0") {
    val got = ChatFormat.render(
      turns((2L, 0L, "system", "x"), (2L, 1L, "user", "y")),
      "conv_id", "turn_idx", "role", "content").collect().head
    assert(got.getAs[Long]("mask_from") === 0L)
    assert(got.getAs[Long]("target_len") === 0L)
  }

  test("render: empty assistant content — boundary lands on <|im_end|>") {
    val got = ChatFormat.render(
      turns((3L, 0L, "user", "u"), (3L, 1L, "assistant", "")),
      "conv_id", "turn_idx", "role", "content").collect().head
    val text = got.getAs[String]("text")
    val maskFrom = got.getAs[Long]("mask_from")
    assert(got.getAs[Long]("target_len") === 0L)
    assert(text.substring(maskFrom.toInt - 1).startsWith("<|im_end|>"))
  }
}
