package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class BucketedStoreSpec extends SparkFunSuite {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    BucketedStore.writeBucketed(emb, "b_emb", "vec_id", numBuckets = 4)
    BucketedStore.writeBucketed(
      docs.withColumnRenamed("doc_id", "vec_id"), "b_docs", "vec_id", numBuckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_emb")
        .join(spark.table("b_docs"), "vec_id")
        .select("vec_id", "label", "lang")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(joined.count() === 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_emb")
      spark.sql("DROP TABLE IF EXISTS b_docs")
    }
  }

  test("groupBy on the bucket key is also shuffle-free") {
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    BucketedStore.writeBucketed(emb, "b_emb2", "vec_id", numBuckets = 4)
    try {
      val agg = spark.table("b_emb2").groupBy("vec_id").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(agg.count() === 500)
    } finally spark.sql("DROP TABLE IF EXISTS b_emb2")
  }
}
