package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Luhn checksum audit: known-valid/invalid card numbers, every check
  * digit variant, and extraction from surrounding text. */
class PiiLuhnSpec extends SparkFunSuite {
  import spark.implicits._

  private def verdicts(nums: String*): Map[String, Boolean] =
    Pii.luhnAudit(
      nums.zipWithIndex.map { case (n, i) => (i.toLong, s"pay $n now") }
        .toDF("id", "text"),
      "id", "text").collect()
      .map(r => r.getString(1) -> r.getBoolean(2)).toMap

  test("textbook valid numbers pass, off-by-one check digits fail") {
    // 4539578763621486 is a standard Luhn-valid test number
    val v = verdicts("4539578763621486", "4539578763621487",
      "4111111111111111", "4111111111111112")
    assert(v("4539578763621486") === true)
    assert(v("4111111111111111") === true)
    assert(v("4539578763621487") === false)
    assert(v("4111111111111112") === false)
  }

  test("exactly one of the ten check digits validates any prefix") {
    val prefix = "123456789012345"
    val v = verdicts((0 to 9).map(d => s"$prefix$d"): _*)
    assert(v.values.count(identity) === 1)
  }

  test("no digit runs → no candidates; long runs match only at 16") {
    val df = Pii.luhnAudit(
      Seq((1L, "no numbers here"), (2L, "short 123456 run")).toDF("id", "text"),
      "id", "text")
    assert(df.count() === 0L)
  }
}
