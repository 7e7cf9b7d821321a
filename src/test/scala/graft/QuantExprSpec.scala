package graft

import org.apache.spark.sql.functions._

/** Bit-identity pins for the round-16 native quantized-distance
  * kernels (plans.QuantDist / QuantSub / QuantDistAt): each must equal
  * the interpreted HOF formulation of the same arithmetic — the shape
  * the exploded join+aggregate kernels computed — element for element,
  * including sign boundaries (dx exactly 0) and negative components.
  * The HOF references below ARE the old semantics: same per-element
  * doubles, same floor, same long sum.
  */
class QuantExprSpec extends SparkSpecBase {

  private def seeded(n: Int, dims: Int) = {
    import spark.implicits._
    graft.plans.VectorExprs.register(spark)
    // deterministic pseudo-random components in [-1, 1], plus exact
    // boundary rows: all-zero (dx == 0 at every pos against a zero
    // centroid) and sign flips around the centroid
    val rows = (0 until n).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(dims)(rnd.nextDouble() * 2 - 1))
    } :+ (n.toLong, Array.fill(dims)(0.0))
    rows.toDF("vec_id", "v")
      .withColumn("xqs",
        expr("transform(v, x -> CAST(floor(x * 1000000) AS BIGINT))"))
  }

  private val centExpr =
    "transform(sequence(1, 8), i -> CAST(i AS DOUBLE) / 10.0 - 0.45)"

  test("graft_qdist equals the HOF floor-quantized squared-distance sum") {
    val d = seeded(64, 8).withColumn("cs", expr(centExpr))
    val got = d.select(col("vec_id"),
      expr("graft_qdist(xqs, cs)").as("native"),
      expr("""aggregate(zip_with(xqs, cs, (x, c) ->
        CAST(floor((CAST(x AS DOUBLE) / 1000000.0D - c)
          * (CAST(x AS DOUBLE) / 1000000.0D - c) * 1.0e12) AS BIGINT)),
        0L, (acc, s) -> acc + s)""").as("hof")).collect()
    assert(got.nonEmpty && got.forall(r => r.getLong(1) == r.getLong(2)),
      s"native != HOF: ${got.find(r => r.getLong(1) != r.getLong(2))}")
  }

  test("graft_qsub equals the HOF residual-sign bit sum, incl. the >= 0 boundary") {
    // centroid equal to a row's own values makes every dx exactly 0 —
    // the >= comparison must set the bit, in both implementations
    val d = seeded(64, 8).withColumn("cs",
      expr("transform(xqs, x -> CAST(x AS DOUBLE) / 1000000.0)"))
    val both = d.select(col("vec_id"),
      expr("graft_qsub(xqs, cs, 3)").as("native"),
      expr("""aggregate(sequence(0, 2), 0L, (acc, p) ->
        acc + IF(CAST(element_at(xqs, p + 1) AS DOUBLE) / 1000000.0D
            - element_at(cs, p + 1) >= 0.0D,
          shiftleft(1L, p), 0L))""").as("hof")).collect()
    assert(both.forall(r => r.getLong(1) == r.getLong(2)))
    // dx == 0 everywhere -> all 3 bits set
    assert(both.forall(_.getLong(1) == 7L),
      "boundary (dx == 0) must count as >= 0 in the native kernel")
  }

  test("graft_qdist_at equals the HOF sparse-slice sum over (pos, c) entries") {
    val d = seeded(64, 8).withColumn("pcs",
      expr("array(struct(1 AS pos, 0.25D AS c), " +
        "struct(6 AS pos, -0.5D AS c), struct(3 AS pos, 0.0D AS c))"))
    val got = d.select(col("vec_id"),
      expr("graft_qdist_at(xqs, pcs)").as("native"),
      expr("""aggregate(pcs, 0L, (acc, e) ->
        acc + CAST(floor(
          (CAST(element_at(xqs, e.pos + 1) AS DOUBLE) / 1000000.0D - e.c)
          * (CAST(element_at(xqs, e.pos + 1) AS DOUBLE) / 1000000.0D - e.c)
          * 1.0e12) AS BIGINT))""").as("hof")).collect()
    assert(got.nonEmpty && got.forall(r => r.getLong(1) == r.getLong(2)),
      s"native != HOF: ${got.find(r => r.getLong(1) != r.getLong(2))}")
  }
}
