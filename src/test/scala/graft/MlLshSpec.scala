package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Integration with Spark ML's MinHashLSH: the library's md5-banded
  * minhash (oracle-checkable, engine-independent) and spark.ml's
  * implementation (Vector-based, approx join API) agree on what a
  * near-duplicate is.
  */
class MlLshSpec extends SparkSpecBase {

  test("spark.ml MinHashLSH agrees with ngram_jaccard on near-dup pairs") {
    val d = Tables.load(spark, sf, "documents")
      .withColumn("t", split(lower(col("text")), " "))
      .withColumn("shingles", expr(
        """CASE WHEN size(t) >= 3
          |THEN transform(sequence(0, size(t) - 3),
          |               i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
          |ELSE array(lower(text)) END""".stripMargin))
      .select(col("doc_id"), array_distinct(col("shingles")).as("shingles"))

    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featurized = tf.transform(d)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(featurized)

    // jaccard >= 0.3 ⇔ jaccard distance <= 0.7
    val mlPairs = model.approxSimilarityJoin(featurized, featurized, 0.7, "dist")
      .select(col("datasetA.doc_id").as("a_id"),
        col("datasetB.doc_id").as("b_id"), col("dist"))
      .filter(col("a_id") < col("b_id"))
      .cache()

    val oraclePairs = Dedup.ngramJaccard(spark, sf).cache()

    // 1) distances agree: for pairs found by BOTH, ml dist == 1 - jaccard
    val joined = mlPairs.join(oraclePairs, Seq("a_id", "b_id"))
      .withColumn("err", abs(col("dist") - (lit(1.0) - col("jaccard"))))
    assert(joined.filter(col("err") > 1e-9).count() == 0,
      "spark.ml distance disagrees with exact jaccard")

    // 2) recall: with 8 hash tables, the 0.3+ pairs should mostly surface
    val truth = oraclePairs.count()
    if (truth > 0) {
      val found = joined.count()
      assert(found.toDouble / truth >= 0.5,
        s"ML LSH recall too low: $found of $truth known pairs")
    }
    mlPairs.unpersist(); oraclePairs.unpersist()
  }
}
