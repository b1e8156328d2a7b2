package graft.queries

import graft.SparkSpec

/** Brute-force parity and matrix-property specs for the spectral
  * module (Gram matrix + power-iteration step).
  */
class SpectralSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def bruteVectors(): Array[Array[Long]] =
    graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .sortBy(_.getAs[Long]("vec_id"))
      .map(_.getAs[Seq[Float]]("embedding").toArray
        .map(x => math.round(x.toDouble * 256.0)))

  private def bruteGram(vs: Array[Array[Long]]): Array[Array[Long]] = {
    val d = 64
    val g = Array.ofDim[Long](d, d)
    for (v <- vs; i <- 0 until d; j <- 0 until d) g(i)(j) += v(i) * v(j)
    g
  }

  test("gram matrix equals the brute-force upper triangle and is PSD on probes") {
    val g = bruteGram(bruteVectors())
    val got = Spectral.qGramMatrix(spark, dir).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Long]("g")).toMap
    assert(got.size == 64 * 65 / 2)
    for (i <- 0 until 64; j <- i until 64)
      assert(got((i, j)) == g(i)(j), s"G[$i,$j]")
    // Xᵀ X is positive semidefinite: vᵀGv = |Xv|² ≥ 0 on any probe
    val probes = Seq(
      Array.fill(64)(1L),
      Array.tabulate(64)(k => if (k % 2 == 0) 1L else -1L),
      Array.tabulate(64)(k => (k % 7).toLong - 3L))
    probes.foreach { p =>
      var acc = BigInt(0)
      for (i <- 0 until 64; j <- 0 until 64) acc += BigInt(g(i)(j)) * p(i) * p(j)
      assert(acc >= 0, "probe quadratic form negative")
    }
  }

  test("3-round power iteration matches brute force; Rayleigh quotient grows") {
    val g = bruteGram(bruteVectors())
    def quant(v: Array[Long]): Array[Long] = {
      val vmax = math.max(v.map(math.abs).max, 1L)
      v.map(x => math.signum(x) * (math.abs(x) * 256L / vmax))
    }
    def matvec(q: Array[Long]): Array[Long] =
      Array.tabulate(64)(i =>
        (0 until 64).map(j => BigInt(g(i)(j)) * q(j)).sum.toLong)
    val q1 = quant(Array.tabulate(64)(i => g(i)(0)))
    val q2 = quant(matvec(q1))
    val q3 = quant(matvec(q2))
    def rayleighMilli(q: Array[Long]): Long = {
      var num = BigInt(0)
      for (i <- 0 until 64; j <- 0 until 64) num += BigInt(q(i)) * g(i)(j) * q(j)
      val den = q.map(x => BigInt(x) * x).sum
      ((num * 1000) / den).toLong
    }
    val got = Spectral.qPcaPower2(spark, dir).collect()
    assert(got.length == 64)
    got.foreach { r =>
      val i = r.getAs[Int]("i")
      assert(r.getAs[Long]("q1") == q1(i), s"q1[$i]")
      assert(r.getAs[Long]("q2") == q2(i), s"q2[$i]")
      assert(r.getAs[Long]("q3") == q3(i), s"q3[$i]")
      assert(r.getAs[Long]("rho_milli") == rayleighMilli(q3), "rho")
    }
    // convergence gauge: on a PSD matrix the Rayleigh quotient of the
    // power iterate is non-decreasing round over round
    assert(rayleighMilli(q1) <= rayleighMilli(q2))
    assert(rayleighMilli(q2) <= rayleighMilli(q3))
  }

  test("power step equals brute-force G·(G·e0)") {
    val g = bruteGram(bruteVectors())
    val v1 = Array.tabulate(64)(i => g(i)(0))
    val v2 = Array.tabulate(64)(i => (0 until 64).map(j => g(i)(j) * v1(j)).sum)
    val got = Spectral.qPcaPower(spark, dir).collect()
    assert(got.length == 64)
    got.foreach { r =>
      val i = r.getAs[Int]("i")
      assert(r.getAs[Long]("v1") == v1(i), s"v1[$i]")
      assert(r.getAs[Long]("v2") == v2(i), s"v2[$i]")
    }
  }
}
