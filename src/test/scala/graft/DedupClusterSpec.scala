package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** dedup_clusters = connected components of the near-dup pair graph.
  * The oracle gate checks equality with the recursive-CTE formulation
  * on the corpus; this spec checks the GRAPH SEMANTICS on a seeded
  * corpus by recomputing components independently (driver-side
  * union-find over the collected pair list) and asserting the
  * distributed label propagation found exactly them — including
  * transitive chains A~B~C where A and C are NOT a near-dup pair
  * themselves.
  */
class DedupClusterSpec extends SparkSpecBase {

  test("clusters equal independently-computed components; canonical = min id") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 60).map(i => s"tok$i")
    def sentence(): Array[String] =
      Array.fill(30)(vocab(rnd.nextInt(vocab.length)))
    // chains: base doc, then successive 1-token mutations — adjacent
    // docs are near-dups, chain ends usually are not
    val docs = (0 until 12).flatMap { c =>
      var toks = sentence()
      (0 until 4).map { j =>
        if (j > 0) { toks = toks.clone(); toks(5 + j) = vocab(rnd.nextInt(vocab.length)) }
        ((c * 10 + j).toLong, toks.mkString(" "))
      }
    }.toDF("doc_id", "text")

    val pairs = Dedup.simhashWideNeardupOn(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val clusters = Dedup.dedupClustersOn(docs)
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Int)].collect()

    // independent union-find over the same pair list
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    clusters.foreach(c => find(c._1))
    pairs.foreach { case (a, b) => union(a, b) }
    val expected = clusters.map(c => c._1 -> find(c._1)).toMap

    // at least one chain must have merged transitively (A~C not a pair)
    val pairSet = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val transitive = expected.groupBy(_._2).values.exists { grp =>
      val ids = grp.keys.toSeq.sorted
      ids.length >= 3 && ids.combinations(2).exists(c => !pairSet((c(0), c(1))))
    }
    assert(transitive,
      "seed produced no transitive chain — the test would not exercise propagation")

    clusters.foreach { case (doc, cid, size, canon) =>
      assert(cid == expected(doc),
        s"doc $doc: cluster $cid != expected component ${expected(doc)}")
      assert(canon == (if (doc == cid) 1 else 0))
      assert(size == expected.count(_._2 == cid),
        s"cluster $cid: size $size != member count ${expected.count(_._2 == cid)}")
    }
  }

  test("a corpus with no near-dup pairs yields all singleton clusters") {
    import spark.implicits._
    // maximally-distinct docs: disjoint vocabularies, no shared shingles,
    // signatures far apart — the pair graph is empty
    val docs = (0 until 8).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    assume(Dedup.simhashWideNeardupOn(docs).count() == 0,
      "seed unexpectedly produced a near-dup pair")
    val clusters = Dedup.dedupClustersOn(docs)
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .as[(Long, Long, Long, Int)].collect()
    assert(clusters.length == 8)
    clusters.foreach { case (doc, cid, size, canon) =>
      assert(cid == doc && size == 1L && canon == 1,
        s"doc $doc: expected singleton, got cluster=$cid size=$size")
    }
  }
}
