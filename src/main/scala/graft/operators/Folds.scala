package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's custom-aggregation extension point, Spark-natively:
  * any `Control.Foldl.Fold step begin done` (acowley/Frames usage
  * `test/UncurryFold.hs:18-20`, `test/UncurryFoldPartialData.hs:23-30`)
  * maps onto a typed [[Aggregator]] — with one DISTRIBUTION-imposed
  * addition the single-threaded reference never needed: an associative
  * `combine` for merging per-partition accumulators. Spark runs `step`
  * map-side (partial aggregation), shuffles only accumulators, and
  * combines them — the same contract every built-in aggregate follows,
  * so a custom fold costs one keyed shuffle of accumulator structs at
  * any scale.
  */
object Folds {

  private implicit val longDouble: Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
  private implicit val double: Encoder[Double] = Encoders.scalaDouble

  /** Build a typed fold: `fold(begin)(step)(combine)(done)`. */
  def fold[A, B: Encoder, O: Encoder](begin: B)(step: (B, A) => B)(
      combine: (B, B) => B)(done: B => O): TypedColumn[A, O] =
    new Aggregator[A, B, O] {
      override def zero: B = begin
      override def reduce(b: B, a: A): B = step(b, a)
      override def merge(l: B, r: B): B = combine(l, r)
      override def finish(b: B): O = done(b)
      override def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      override def outputEncoder: Encoder[O] = implicitly[Encoder[O]]
    }.toColumn

  /** The reference's `UncurryFold` golden shape: (count, sum) in one
    * pass (`test/UncurryFoldPartialData.hs:23-30` expects `(4, 3344.5)`
    * on prestige rows with missing income dropped). */
  def countAndSum: TypedColumn[Double, (Long, Double)] =
    fold[Double, (Long, Double), (Long, Double)]((0L, 0.0))(
      (b, a) => (b._1 + 1, b._2 + a))(
      (l, r) => (l._1 + r._1, l._2 + r._2))(
      identity)

  /** Geometric mean via the log-sum fold — a shape no built-in covers. */
  def geometricMean: TypedColumn[Double, Double] =
    fold[Double, (Long, Double), Double]((0L, 0.0))(
      (b, a) => (b._1 + 1, b._2 + math.log(a)))(
      (l, r) => (l._1 + r._1, l._2 + r._2))(
      b => if (b._1 == 0) 0.0 else math.exp(b._2 / b._1))
}
