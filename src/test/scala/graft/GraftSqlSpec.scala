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
}
