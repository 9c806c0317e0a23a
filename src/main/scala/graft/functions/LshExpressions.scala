package graft.functions

import java.util.SplittableRandom
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

object HyperplaneLsh {
  /** Deterministic random hyperplanes for (seed, nBits, dim), cached per
    * executor. Gaussian components via Box–Muller over a SplittableRandom
    * stream — same planes on every executor and every run. */
  private val cache = new ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  private def planes(seed: Long, nBits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, nBits, dim), { _ =>
      val r = new SplittableRandom(seed)
      Array.fill(nBits)(Array.fill(dim)(r.nextGaussian()))
    })

  def compute(v: ArrayData, seed: Long, nBits: Int): Int = {
    val dim = v.numElements()
    val ps = planes(seed, nBits, dim)
    var bucket = 0
    var b = 0
    while (b < nBits) {
      val p = ps(b)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += v.getFloat(i).toDouble * p(i)
        i += 1
      }
      if (dot > 0.0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }
}

/** Random-hyperplane LSH bucket (SimHash-for-cosine) of an `array<float>`
  * embedding: an `int` whose bits are the signs of `dot(v, plane_b)`.
  * Vectors with high cosine similarity land in the same or a
  * low-hamming-distance bucket, turning ANN search from an all-pairs join
  * into an equi-join on bucket — the 100 TB path for similarity search. */
case class HyperplaneLshBucket(child: Expression, seed: Long, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBits >= 1 && nBits <= 30)

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    HyperplaneLsh.compute(input.asInstanceOf[ArrayData], seed, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneLsh.compute($c, ${seed}L, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)
}
