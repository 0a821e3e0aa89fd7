package graft.laplace

/** In-test scalar reimplementation of the reference's sequential SOR loop
  * (semantics of `laplace-seq.c:184-209`, written fresh from SURVEY.md §2.1):
  * the differential-testing oracle for both Spark solvers. Per-cell
  * arithmetic order matches the C expression, so results are bit-exact.
  */
object ScalarOracle {
  final case class Result(grid: Array[Array[Double]], iterations: Int, finalDiff: Double)

  def solve(n: Int, maxIterations: Int = Int.MaxValue): Result = {
    val omega = Laplace.omega(n)
    val eps = Laplace.epsilon(n)
    val g = Array.tabulate(n, n)((i, j) => Laplace.initialValue(i, j, n))
    var iterations = 0
    var maxDiff = 0.0
    var continue = true
    while (continue && iterations < maxIterations) {
      maxDiff = 0.0
      var color = 0
      while (color < 2) {
        var i = 1
        while (i < n - 1) {
          var j = 1 + (if (i % 2 == color) 1 else 0)
          while (j < n - 1) {
            val tmp = (g(i - 1)(j) + g(i + 1)(j) + g(i)(j - 1) + g(i)(j + 1)) / 4.0
            val old = g(i)(j)
            g(i)(j) = (1.0 - omega) * old + omega * tmp
            val diff = math.abs(old - g(i)(j))
            if (diff > maxDiff) maxDiff = diff
            j += 2
          }
          i += 1
        }
        color += 1
      }
      iterations += 1
      continue = maxDiff > eps
    }
    Result(g, iterations, maxDiff)
  }
}
