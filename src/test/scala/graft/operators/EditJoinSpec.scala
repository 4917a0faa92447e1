package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/**
 * Deletion-neighborhood edit-distance self-join: completeness (≡
 * brute force — the blocking misses nothing at τ = 1), no false
 * positives (the kernel verify), and the plan shape (bucket-equality
 * join, never a cartesian).
 */
class EditJoinSpec extends SparkFunSuite {

  import spark.implicits._

  test("synthetic fixture: substitution, insertion, deletion, multibyte") {
    val rows = Seq(
      (1L, "kitten"), (2L, "mitten"),   // substitution: ed 1
      (3L, "cat"), (4L, "cats"),        // insertion: ed 1
      (5L, "hello"), (6L, "hell"),      // deletion: ed 1
      (7L, "héllo"),                    // multibyte sub vs 5: ed 1
      (8L, "zebra"),                    // no partner
      (9L, ""), (10L, "x"))             // empty vs 1-char: ed 1
      .toDF("id", "s")
    val got = EditJoin.editSelfJoin(rows, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, 2L, 1L), (3L, 4L, 1L), (5L, 6L, 1L), (5L, 7L, 1L),
      (9L, 10L, 1L)))
  }

  test("completeness: equals brute force on sf0.001 customer names") {
    val cust = spark.read.parquet(s"$Sf0001/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val got = EditJoin.editSelfJoin(cust, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the collected names (sf0.001 is small)
    val names = cust.collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      d = graft.functions.TextHashKernels.editDistance(
        org.apache.spark.unsafe.types.UTF8String.fromString(sa),
        org.apache.spark.unsafe.types.UTF8String.fromString(sb),
        graft.functions.TextHashKernels.UnitCodepoint)
      if d <= 1
    } yield (ia, ib)).toSet
    assert(want.nonEmpty)       // the fixture actually has ed-1 pairs
    assert(got === want)
  }

  test("plan is a bucket-equality join — no cartesian, no nested loop") {
    val plan = graft.SparkEntry.queries("dedup_edit_join")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("kernel signatures ≡ materialized-variant FNV hashes (HOF formulation)") {
    import graft.functions.TextHashKernels
    import org.apache.spark.unsafe.types.UTF8String
    // reference formulation: materialize identity + every single-
    // code-point-deletion variant as strings (what the pre-kernel
    // transform(sequence(...)) HOF did), hash each with FNV-1a 64
    def reference(s: String): Set[Long] = {
      val cps = s.codePoints().toArray
      val variants = cps.indices.map { i =>
        new String(cps.take(i) ++ cps.drop(i + 1), 0, cps.length - 1)
      } :+ s
      variants.map { v =>
        val b = v.getBytes("UTF-8")
        TextHashKernels.fnv1a64(b, 0, b.length)
      }.toSet
    }
    for (s <- Seq("", "a", "aa", "kitten", "héllo", "日本語", "aab aab")) {
      val got = TextHashKernels
        .deletionNeighborhoodHashes(UTF8String.fromString(s))
        .toLongArray().toSeq
      assert(got.toSet === reference(s), s"string '$s'")
      assert(got === got.sorted && got.distinct === got,
        s"sorted+deduped for '$s'")
    }
  }

  test("interpreted ≡ codegen for deletion_neighborhood_hashes") {
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val df = Seq("kitten", "héllo", "", "x", "aab").toDF("s")
    val viaSql = df.selectExpr("deletion_neighborhood_hashes(s) AS h")
      .collect().map(_.getSeq[Long](0))
    val viaKernel = Seq("kitten", "héllo", "", "x", "aab").map(s =>
      graft.functions.TextHashKernels.deletionNeighborhoodHashes(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .toLongArray().toSeq)
    assert(viaSql.map(_.toSeq).toSeq === viaKernel)
  }

  test("tau != 1 rejected (blocking is only complete for 1)") {
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException] {
      EditJoin.editSelfJoin(df, "id", "s", tau = 2)
    }
  }
}
