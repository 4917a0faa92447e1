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

  test("iban: published examples validate; one-digit corruption fails") {
    val docs = Seq(
      (1L, "pay GB82WEST12345698765432 now"),   // canonical valid example
      (2L, "sepa DE89370400440532013000 ok"),   // valid
      (3L, "ref DE89370400440532013001 bad"),   // corrupted last digit
      (4L, "FR1420041010050500013M02606 fr"),   // valid, mixed letter BBAN
      (5L, "nothing here")
    ).toDF("id", "text")
    val got = Pii.ibanAudit(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
  }

  test("iban: lowercase and short runs are not candidates") {
    val docs = Seq(
      (1L, "gb82west12345698765432"),          // lowercase → no match
      (2L, "DE893704004405")                   // 10-char BBAN → no match
    ).toDF("id", "text")
    assert(Pii.ibanAudit(docs, "id", "text").count() === 0L)
  }
}
