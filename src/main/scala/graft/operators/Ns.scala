package graft.operators

/** Shared cross-engine primitives for the north-star (NS) LLM-pipeline
  * operators (SURVEY.md §2.3). The driver hash-compares Spark output
  * against DuckDB, so every hash / float recipe here is chosen to be
  * bit-reproducible in BOTH engines (and, on the Spark side, independent
  * of partitioning — i.e. stable from local[32] to a 1000-executor run):
  *
  *  - **Hashing**: `md5` hex strings are byte-identical across engines.
  *    Numeric hashes are derived by hex-casting a 15-hex-digit (60-bit)
  *    or 8-hex-digit (32-bit) prefix — Spark `conv(_,16,10)`, DuckDB
  *    `CAST('0x…' AS BIGINT)` — always non-negative, so `%`/`div`
  *    semantics agree.
  *  - **Vector math**: element-wise ops + a *sequential left fold*
  *    (Spark `aggregate`, DuckDB `list_reduce` with a prepended 0-init)
  *    make float dot products / norms bit-identical: same doubles, same
  *    operation order. No parallel reduction touches raw float sums.
  *  - **Comparisons / ranks on floats** go through `round(x, 6)` with a
  *    unique integer tie-break column, so ordering is engine-independent.
  */
object Ns {

  /** 60-bit non-negative hash of a string expression, Spark side. */
  def hash60(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 15), 16, 10) AS BIGINT)"

  /** Same 60-bit hash, DuckDB side. */
  def oHash60(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** 52-bit non-negative hash, Spark side — 13 hex digits = 52 bits
    * < 2^53, so the value (and any kth-min over it) converts to an IEEE
    * double EXACTLY; the uniform-[0,1) sketch math of q84 divides these
    * by 2^52 with zero representation error in either engine.
    */
  def hash52(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 13), 16, 10) AS BIGINT)"

  /** Same 52-bit hash, DuckDB side. */
  def oHash52(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 13) AS BIGINT)"

  /** 32-bit non-negative hash, Spark side. */
  def hash32(e: String): String =
    s"CAST(conv(substr(md5($e), 1, 8), 16, 10) AS BIGINT)"

  /** 32-bit non-negative hash, DuckDB side. */
  def oHash32(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  /** Sequential-fold dot product of two double-array columns, Spark:
    * the native codegen [[graft.functions.VecDot]] (call
    * [[registerFast]] on the session first). Bit-identical to [[hofDot]].
    */
  def dot(a: String, b: String): String = s"vec_dot($a, $b)"

  /** Squared L2 distance, native codegen ([[graft.functions.VecL2Sq]]). */
  def l2sq(a: String, b: String): String = s"vec_l2sq($a, $b)"

  /** The pure-built-in higher-order-function spelling of [[dot]] — kept
    * as the cross-check in VectorFunctionsSpec.
    */
  def hofDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"

  /** Idempotent registration of the native vector functions. */
  def registerFast(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.GraftFunctions.register(spark)

  /** Same fold order (0-init, left-to-right), DuckDB. */
  def oDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform($a, (x, i) -> x * $b[i])), (acc, x) -> acc + x)"

  /** Cast a float array to doubles, Spark / DuckDB. */
  def toDouble(a: String): String = s"transform($a, x -> CAST(x AS DOUBLE))"
  def oToDouble(a: String): String = s"list_transform($a, x -> CAST(x AS DOUBLE))"

  /** Fixed-COUNT deterministic sampling for exact oracle arms (g19's
    * recall pin, d05's near-dup ground truth): the K ids of smallest
    * md5 rank. An absolute count keeps the exact arm O(K·n) — linear —
    * at every scale; a fixed RATE (`id % 10 = 0`) keeps a quadratic
    * O(n²/rate) term. md5 hex is lowercase in both engines and string
    * order is plain byte order, so both pick the identical sample.
    */
  val SampleK = 64
  def sampleRank(idExpr: String): String = s"md5(CAST($idExpr AS STRING))"
  def oSampleRank(idExpr: String): String = s"md5(CAST($idExpr AS VARCHAR))"
}
