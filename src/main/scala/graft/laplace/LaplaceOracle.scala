package graft.laplace

/** DuckDB oracle SQL for the red-black SOR solve: the full iteration is
  * unrolled as a recursive CTE over the flattened grid (one row per
  * iteration carrying the N*N cell values as a 1-based list), so the
  * driver's DuckDB compare can check the solver queries cell-by-cell,
  * bit-for-bit — the same "stop after the first iteration with
  * maxDiff <= epsilon" semantics as the reference loop
  * (`/root/reference/laplace-seq.c:184-209`).
  *
  * Bit-parity with the Spark solvers:
  *  - omega / epsilon / (1 - omega) are interpolated as string literals
  *    from the SAME `java.lang.Math`-computed doubles the solvers use
  *    (`Double.toString` round-trips; DuckDB `CAST(... AS DOUBLE)`
  *    parses correctly-rounded), never re-derived in SQL where libm
  *    could differ by an ulp;
  *  - the stencil is the same left-associated
  *    `(up + down + left + right) / 4.0`, and a half-sweep updates only
  *    cells of the active color while reading only the opposite color —
  *    so a whole-list `list_transform` (Jacobi within a color) IS the
  *    Gauss-Seidel red-black semantics;
  *  - per-iteration maxDiff = max over both half-sweeps of
  *    `abs(v_before - v_after)` per updated cell; inactive cells
  *    contribute 0 via identical before/after values, so the plain
  *    list-max over both deltas equals the reference's running max.
  */
object LaplaceOracle {

  private def dlit(x: Double): String = s"CAST('${x}' AS DOUBLE)"

  /** One red-black half-sweep of color `c` over list column `src`. */
  private def sweep(src: String, c: Int, n: Int, om: Double, om1m: Double): String =
    s"""list_transform($src, (x, k) ->
      CASE WHEN ((k-1)//$n) BETWEEN 1 AND ${n - 2} AND ((k-1)%$n) BETWEEN 1 AND ${n - 2}
                AND ((k-1)//$n + (k-1)%$n) % 2 = $c
           THEN ${dlit(om1m)} * x + ${dlit(om)} * (($src[k-$n] + $src[k+$n] + $src[k-1] + $src[k+1]) / 4.0)
           ELSE x END)"""

  /** The shared recursive-CTE prefix: `sor(it, g, d)` iterates full
    * red-black iterations until maxDiff <= epsilon (and optionally an
    * iteration cap, mirroring a `maxIterations` on the Spark side);
    * `final` is the converged state.
    */
  private def ctes(n: Int, maxIterations: Int = Int.MaxValue): String = {
    val om = Laplace.omega(n)
    val om1m = 1.0 - om
    val eps = Laplace.epsilon(n)
    val cap = if (maxIterations == Int.MaxValue) "" else s" AND it < $maxIterations"
    s"""sor(it, g, d) AS (
      SELECT 0,
             list_transform(range(0, ${n * n}), p ->
               CASE WHEN p//$n = 0 THEN ${dlit(Laplace.I0)}
                    WHEN p//$n = ${n - 1} THEN ${dlit(Laplace.IN)}
                    WHEN p%$n = 0 THEN ${dlit(Laplace.J0)}
                    WHEN p%$n = ${n - 1} THEN ${dlit(Laplace.JN)}
                    ELSE ${dlit(Laplace.XX)} END),
             CAST('inf' AS DOUBLE)
      UNION ALL
      SELECT it + 1, g2,
             greatest(
               list_max(list_transform(range(1, ${n * n + 1}), k -> abs(g[k] - g1[k]))),
               list_max(list_transform(range(1, ${n * n + 1}), k -> abs(g1[k] - g2[k]))))
      FROM (
        SELECT it, g, g1, ${sweep("g1", 1, n, om, om1m)} AS g2
        FROM (
          SELECT it, g, ${sweep("g", 0, n, om, om1m)} AS g1
          FROM sor WHERE d > ${dlit(eps)}$cap
        )
      )
    ),
    fin AS (SELECT it, g, d FROM sor ORDER BY it DESC LIMIT 1)"""
  }

  /** Oracle for a full-grid solve dump ordered by (i, j). */
  def gridSql(n: Int, maxIterations: Int = Int.MaxValue): String =
    s"""WITH RECURSIVE ${ctes(n, maxIterations)}
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, f.g[i*$n + j + 1] AS v
    FROM fin f CROSS JOIN range($n) t(i) CROSS JOIN range($n) s(j)
    ORDER BY i, j"""

  /** Oracle for the reference's `Statistics:` line (O15). */
  def statsSql(n: Int): String =
    s"""WITH RECURSIVE ${ctes(n)}
    SELECT CAST($n AS INT) AS n, CAST(it AS INT) AS num_iterations,
           d AS final_diff,
           ${dlit(Laplace.epsilon(n))} AS epsilon,
           ${dlit(Laplace.omega(n))} AS omega
    FROM fin"""

  /** Oracle for the per-iteration convergence history: the `d` column the
    * recursive CTE already carries, one row per full red-black iteration
    * (it = 0 is the initial state whose `d` is the +inf sentinel — excluded).
    */
  def convergenceSql(n: Int): String =
    s"""WITH RECURSIVE ${ctes(n)}
    SELECT CAST(it AS INT) AS iteration, d AS max_diff
    FROM sor WHERE it >= 1
    ORDER BY iteration"""
}
