package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vec_moments(v)` over an `array<double>` column of dimension D:
  * returns `array<decimal(38,12)>` of length D + D*(D+1)/2 holding the
  * exact-decimal first moments (slots 1..D, the sums of
  * `CAST(v[i] AS DECIMAL(28,12))`) followed by the upper-triangle
  * second moments in row-major (i, j>=i) order (the sums of
  * `CAST(v[i]*v[j] AS DECIMAL(28,12))`).
  *
  * This is the distributed-PCA moments pass ([[graft.operators.Pca]])
  * as ONE aggregate instead of 153 independent `sum(CAST(...))`
  * expressions. The declarative spelling makes codegen materialize a
  * separate Decimal conversion + mutable Decimal buffer update per
  * moment per row (~289 `element_at` evaluations and a method-splitting
  * generated class); here one buffer object takes one tight JVM loop
  * per row. Shuffle shape is unchanged — partial aggregation still
  * reduces every partition to a single buffer, so one row per partition
  * crosses the wire regardless of input size.
  *
  * Bit-fidelity contract (what keeps the DuckDB oracle hash-identical):
  * each term is the double product `v[i]*v[j]` (same IEEE multiply as
  * the SQL spelling) pushed through Spark's own double->decimal cast
  * ([[Decimal]](d) + changePrecision(28,12), HALF_UP, null on
  * overflow), and the per-slot sums are exact java.math.BigDecimal
  * adds — decimal addition is associative/commutative in exact
  * arithmetic, so partial/merge order cannot change the value, exactly
  * like the built-in decimal `sum`. Null semantics mirror `sum` too:
  * null terms (null array, null element, cast overflow) are skipped,
  * and a slot with no non-null terms evaluates to NULL.
  */
case class DecimalMomentsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[java.math.BigDecimal]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DecimalType(38, 12), containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_moments"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_moments requires array<double> input, got $t")
    }

  // buffer sized lazily from the first row's dimension (empty = no rows yet)
  override def createAggregationBuffer(): Array[java.math.BigDecimal] =
    Array.empty[java.math.BigDecimal]

  /** Spark's Cast(double -> DECIMAL(28,12)) then exact add into slot k.
    * Non-finite terms are skipped: `CAST(double AS DECIMAL)` yields NULL
    * on NaN/Infinity in non-ANSI mode and `sum` skips nulls — whereas
    * `Decimal(x)` would throw NumberFormatException and kill the query.
    */
  private def addTerm(b: Array[java.math.BigDecimal], k: Int, x: Double): Unit = {
    if (!java.lang.Double.isFinite(x)) return
    val dec = Decimal(x)
    if (dec.changePrecision(28, 12)) {
      val j = dec.toJavaBigDecimal
      b(k) = if (b(k) == null) j else b(k).add(j)
    }
  }

  /** Invert len = d + d*(d+1)/2 = d*(d+3)/2 to recover the buffer's dim. */
  private def dimOf(len: Int): Int =
    ((Math.sqrt(9.0 + 8.0 * len) - 3.0) / 2.0).round.toInt

  override def update(
      buf: Array[java.math.BigDecimal], input: InternalRow): Array[java.math.BigDecimal] = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[ArrayData]
    val rowDim = arr.numElements()
    val b = if (buf.length > 0) buf
      else new Array[java.math.BigDecimal](rowDim + rowDim * (rowDim + 1) / 2)
    // Dimension contract: the first non-null row fixes the buffer layout.
    // Ragged rows degrade like the element_at spelling this replaces did:
    // indices past a short row evaluate to null terms (skipped), elements
    // past the buffer dim are ignored — never a per-row exception.
    val dim = dimOf(b.length)
    val md = math.min(rowDim, dim)
    var i = 0
    while (i < md) {
      if (!arr.isNullAt(i)) {
        val vi = arr.getDouble(i)
        addTerm(b, i, vi)
        var j = i
        while (j < md) {
          // triangle slot for (i, j>=i): dim first-moment slots, then
          // i*dim - i*(i-1)/2 full rows of the triangle, then (j - i)
          if (!arr.isNullAt(j))
            addTerm(b, dim + i * dim - i * (i - 1) / 2 + (j - i), vi * arr.getDouble(j))
          j += 1
        }
      }
      i += 1
    }
    b
  }

  override def merge(
      a: Array[java.math.BigDecimal], b: Array[java.math.BigDecimal]): Array[java.math.BigDecimal] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    // Partials sized from different first-row dims (possible only on
    // ragged input, where slot layouts already degrade per `update`):
    // fold the shorter into the longer rather than throwing mid-merge.
    val (base, other) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < other.length) {
      if (other(i) != null) base(i) = if (base(i) == null) other(i) else base(i).add(other(i))
      i += 1
    }
    base
  }

  override def eval(buf: Array[java.math.BigDecimal]): Any =
    if (buf.length == 0) null
    else new GenericArrayData(buf.map { bd =>
      if (bd == null) null
      else {
        val d = Decimal(scala.math.BigDecimal(bd))
        if (d.changePrecision(38, 12)) d else null // overflow -> null, like sum
      }
    }: Array[Any])

  override def serialize(buf: Array[java.math.BigDecimal]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { bd =>
      out.writeBoolean(bd != null)
      if (bd != null) out.writeUTF(bd.toString) // BigDecimal.toString round-trips exactly
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[java.math.BigDecimal] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[java.math.BigDecimal](n)
    var i = 0
    while (i < n) {
      if (in.readBoolean()) b(i) = new java.math.BigDecimal(in.readUTF())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DecimalMomentsAgg =
    copy(child = newChild)
}
