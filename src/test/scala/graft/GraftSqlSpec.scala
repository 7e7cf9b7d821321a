package graft

class GraftSqlSpec extends SparkSpecBase {

  test("init exposes all tables as SQL views and graft_dot as a SQL function") {
    Graft.init(spark, sf)
    val joined = spark.sql(
      """SELECT r.r_name, count(*) AS n
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1""".stripMargin)
    assert(joined.count() == 5)

    val sims = spark.sql(
      """SELECT vec_id,
        |  graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |            CAST(embedding AS ARRAY<DOUBLE>)) AS self_dot
        |FROM embeddings LIMIT 10""".stripMargin)
    assert(sims.filter("self_dot <= 0").count() == 0)
  }

  test("init exposes graft_simhash and graft_minhash as SQL functions") {
    Graft.init(spark, sf)
    val sigs = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(lower(text)) AS sh,
        |  graft_minhash(lower(text)) AS mh
        |FROM documents LIMIT 20""".stripMargin)
    val rows = sigs.collect()
    assert(rows.length == 20)
    // 32-bit signature range; minhash struct carries 8 hex slots + count
    assert(rows.forall { r =>
      val sh = r.getLong(1)
      sh >= 0L && sh <= 0xFFFFFFFFL
    })
    val m = rows.head.getStruct(2)
    assert(m.length == 9 && m.getLong(8) >= 1,
      "graft_minhash must expose s0..s7 plus n_sh >= 1")
  }
}
