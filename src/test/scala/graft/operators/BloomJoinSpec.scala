package graft.operators

import graft.SparkFunSuite
import graft.functions.{BloomKernels, GraftFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class BloomJoinSpec extends SparkFunSuite {
  import spark.implicits._

  test("kernel: no false negatives, bounded false positives") {
    val filter = BloomKernels.create(BloomKernels.optimalNumBits(1000, 0.01),
      BloomKernels.optimalNumHashes(1000, BloomKernels.optimalNumBits(1000, 0.01)))
    val inserted = (0L until 1000L).map(_ * 7919L)
    inserted.foreach(BloomKernels.put(filter, _))
    assert(inserted.forall(BloomKernels.mightContain(filter, _)), "false negative")
    val probes = (0L until 10000L).map(i => i * 7919L + 3L) // disjoint from inserted
    val fp = probes.count(BloomKernels.mightContain(filter, _))
    assert(fp < 10000 * 0.05, s"false-positive rate too high: $fp / 10000")
  }

  test("kernel: merge is the union of the inputs") {
    val bits = BloomKernels.optimalNumBits(100, 0.01)
    val k = BloomKernels.optimalNumHashes(100, bits)
    val a = BloomKernels.create(bits, k)
    val b = BloomKernels.create(bits, k)
    (0L until 50L).foreach(i => BloomKernels.put(a, i))
    (50L until 100L).foreach(i => BloomKernels.put(b, i))
    val merged = BloomKernels.mergeInto(a, b)
    assert((0L until 100L).forall(BloomKernels.mightContain(merged, _)))
  }

  test("property: distributed bloom_build has no false negatives after merge") {
    GraftFunctions.register(spark)
    val bits = BloomKernels.optimalNumBits(64, 0.01)
    val k = BloomKernels.optimalNumHashes(64, bits)
    val p = Prop.forAll(Gen.listOfN(60, Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      hashes: List[Long] =>
        val built = hashes.toDF("h").repartition(5)
          .agg(GraftFunctions.bloomBuild(col("h"), bits, k))
          .head().getAs[Array[Byte]](0)
        hashes.forall(BloomKernels.mightContain(built, _))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, s"bloom_build: ${res.status}")
  }

  test("pruned join result equals the plain join exactly") {
    val fact = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val dim = spark.read.parquet(s"$Sf0001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val pruned = BloomJoin.prunedJoin(fact, "l_orderkey", dim, "o_orderkey",
        expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().sorted
    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().sorted
    assert(pruned.length === plain.length)
    assert(pruned === plain)
  }

  test("probe actually prunes: surviving fact fraction tracks the dim selectivity") {
    val fact = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    val dim = spark.read.parquet(s"$Sf0001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val total = fact.count()
    val surviving = BloomJoin.pruneFact(fact, "l_orderkey", dim, "o_orderkey",
      expectedItems = 10000L, fpp = 0.01).count()
    val exact = fact.join(dim, fact("l_orderkey") === dim("o_orderkey")).count()
    assert(surviving >= exact, "bloom must never drop a matching row")
    // ~1/5 of orders are URGENT; with fpp=0.01 the survivors must stay
    // well below half the fact table — i.e. the probe does real work.
    assert(surviving < total / 2,
      s"probe pruned nothing: $surviving of $total rows survived")
  }

  test("broadcast probe: identical verdicts to the literal probe, codegen-fused") {
    GraftFunctions.register(spark)
    val filter = BloomKernels.create(BloomKernels.optimalNumBits(500, 0.01),
      BloomKernels.optimalNumHashes(500, BloomKernels.optimalNumBits(500, 0.01)))
    (0L until 500L).foreach(i => BloomKernels.put(filter, i * 31L))
    val bc = spark.sparkContext.broadcast(filter)
    val tag = graft.functions.BloomBroadcastRegistry.register(bc)
    try {
      val hashes = spark.range(2000).select((col("id") * 7L).as("h"))
      val viaLit = hashes
        .filter(GraftFunctions.bloomMightContain(lit(filter), col("h")))
        .as[Long].collect().sorted
      val dfBc = hashes
        .filter(GraftFunctions.bloomProbeBroadcast(tag, col("h")))
      val viaBc = dfBc.as[Long].collect().sorted
      assert(viaBc === viaLit)
      // the filter BYTES must not appear in the plan (only the handle)
      val plan = dfBc.queryExecution.executedPlan
      val codegen = plan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
          w.collect { case f: org.apache.spark.sql.execution.FilterExec => f }
      }.flatten
      assert(codegen.nonEmpty, s"broadcast probe fell out of codegen:\n$plan")
      assert(!plan.toString.contains("0x"), "filter bytes leaked into the plan")
    } finally graft.functions.BloomBroadcastRegistry.deregister(tag)
  }

  test("unknown broadcast tag fails at plan time with a clear message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.range(1)
        .filter(GraftFunctions.bloomProbeBroadcast("no-such-tag", col("id")))
        .collect()
    }
    assert(e.getMessage.contains("no-such-tag") ||
      e.getCause != null && e.getCause.getMessage.contains("no-such-tag"), e)
  }

  test("probe stays inside WholeStageCodegen (no interpreted filter barrier)") {
    GraftFunctions.register(spark)
    val filter = BloomKernels.create(1024, 3)
    BloomKernels.put(filter, 42L)
    val df = spark.range(100)
      .filter(GraftFunctions.bloomMightContain(lit(filter), xxhash64(col("id"))))
    val codegenFilters = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.collect { case f: org.apache.spark.sql.execution.FilterExec => f }
    }.flatten
    assert(codegenFilters.nonEmpty,
      s"expected the bloom probe Filter inside WholeStageCodegen:\n${df.queryExecution.executedPlan}")
  }
}
