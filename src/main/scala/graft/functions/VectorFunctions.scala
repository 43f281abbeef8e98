package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Embedding-vector column builders (similarity search, near-dup
  * detection) over `array<float>` embedding columns.
  *
  * The per-pair arithmetic is a tight Scala loop behind a UDF: Spark's
  * array higher-order functions evaluate interpreted (CodegenFallback),
  * which costs ~µs/element in pair joins — a plain double[] loop is two
  * orders faster and bit-identical (sequential left-to-right accumulation
  * in double, matching the `list_sum(list_transform(...))` DuckDB oracle).
  * At 100 TB the dominant cost is the pair-generating join, not this math;
  * what matters is that the math never forces an extra shuffle or breaks
  * the surrounding codegen stages.
  */
object VectorFunctions {

  /** array<float> → array<double>, once per row before any pair join. */
  val toDoubleUdf: UserDefinedFunction = udf((v: Seq[Float]) => TextCore.toDouble(v))

  val normUdf: UserDefinedFunction =
    udf((v: Seq[Double]) => TextCore.norm(v.toArray))

  val dotUdf: UserDefinedFunction =
    udf((a: Seq[Double], b: Seq[Double]) => TextCore.dot(a.toArray, b.toArray))

  /** Cosine from pre-cast double arrays + precomputed norms. */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dotUdf(a, b) / (na * nb)
}
