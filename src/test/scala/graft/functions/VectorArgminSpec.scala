package graft.functions

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** The round-16 native argmin kernels ([[PqArgminL2]],
  * [[IvfArgmaxCell]]) must select EXACTLY what the declarative
  * aggregate-fold forms they replaced selected — same sequential IEEE
  * fold, same strict-less (dist/negsim, id) tie-break, same NaN
  * sentinel — or the oracle's bit-exact Lloyd/assignment replicas
  * break. This spec pins kernel == declarative fold on random data,
  * exact ties, and the zero-norm NaN guard. */
class VectorArgminSpec extends GraftSparkSpec {

  private val rnd = new scala.util.Random(13)

  private def vec(dim: Int): Seq[Double] = Seq.fill(dim)(rnd.nextGaussian())

  test("pq_argmin == declarative aggregate fold on random codebooks") {
    import spark.implicits._
    val dim = 16
    val cws = (0L until 16L).map(c => (c, vec(dim)))
    val rows = (1 to 200).map(i => (i.toLong, vec(dim)))
    val df = rows.toDF("vec_id", "sv")
      .crossJoin(cws.toDF("code", "cw")
        .groupBy().agg(array_sort(collect_list(struct(col("code"), col("cw"))))
          .as("cws")))
    def l2sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, z) => acc + z)
    val declarative = aggregate(col("cws"),
      struct(lit(Double.MaxValue).as("dist"), lit(Long.MaxValue).as("code")),
      (acc, c) => {
        val cand = struct(l2sq(col("sv"), c.getField("cw")).as("dist"),
          c.getField("code").as("code"))
        when(cand < acc, cand).otherwise(acc)
      })
    val got = df.select(col("vec_id"),
      VectorKernels.pq_argmin(col("sv"), col("cws")).as("k"),
      declarative.as("d"))
      .select(col("vec_id"), col("k.dist"), col("k.code").as("kcode"),
        col("d.dist").as("ddist"), col("d.code").as("dcode"),
        col("k.cw"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(3), s"dist mismatch at ${r.getLong(0)}")
      assert(r.getLong(2) === r.getLong(4), s"code mismatch at ${r.getLong(0)}")
      assert(r.getSeq[Double](5).nonEmpty)
    }
  }

  test("pq_argmin exact-tie keeps the lower code (struct-MIN rule)") {
    import spark.implicits._
    val w = Seq(1.0, 2.0)
    // codes 5 and 2 carry IDENTICAL codewords -> identical dist; the
    // lexicographic (dist, code) min must pick code 2
    val df = Seq((Seq(0.0, 0.0), Seq((5L, w), (2L, w), (7L, Seq(9.0, 9.0)))))
      .toDF("sv", "cwsRaw")
      .select(col("sv"), array_sort(col("cwsRaw")).as("cws"))
      .select(VectorKernels.pq_argmin(col("sv"),
        transform(col("cws"), c =>
          struct(c.getField("_1").as("code"), c.getField("_2").as("cw"))))
        .getField("code"))
    assert(df.head().getLong(0) === 2L)
  }

  test("ivf_argmax == declarative fold incl. the NaN (zero-norm) sentinel") {
    import spark.implicits._
    val dim = 8
    val cents = (0 until 12).map(c => (c, vec(dim))) :+
      (12, Seq.fill(dim)(0.0)) // zero-norm centroid: cosine is NaN
    val rows = (1 to 200).map(i => (i.toLong, vec(dim))) :+
      (999L, Seq.fill(dim)(0.0)) // zero-norm point: ALL cosines NaN
    val df = rows.toDF("vec_id", "v")
      .crossJoin(cents.toDF("cell", "cv")
        .groupBy().agg(array_sort(collect_list(struct(col("cell"), col("cv"))))
          .as("cents")))
    val declarative = aggregate(col("cents"),
      struct(lit(3.0).as("negsim"), lit(-1).as("cell")),
      (acc, c) => {
        val cand = struct(
          (-nanvl(graft.operators.Similarity.cosineSeq(col("v"),
            c.getField("cv")), lit(-2.0))).as("negsim"),
          c.getField("cell").as("cell"))
        when(cand < acc, cand).otherwise(acc)
      }).getField("cell")
    val got = df.select(col("vec_id"),
      VectorKernels.ivf_argmax(col("v"), col("cents")).as("k"),
      declarative.as("d")).collect()
    got.foreach { r =>
      assert(r.getInt(1) === r.getInt(2), s"cell mismatch at ${r.getLong(0)}")
    }
    // the all-NaN row must fall back to the lowest cell id
    val allNaN = got.find(_.getLong(0) === 999L).get
    assert(allNaN.getInt(1) === 0)
  }
}
