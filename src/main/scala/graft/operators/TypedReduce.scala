package graft.operators

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed reduce-style API fidelity (SURVEY.md §2.4 A2 and §7 scorecard).
  *
  * The reference's windowed reduce
  * (`CassandraPojoSinkStreaming.java:68`: `reduce((a,b) -> Pojo(a.id+b.id))`)
  * folds records with a user-supplied associative binary function. Spark's
  * equivalent for a typed fold is `Aggregator[IN, BUF, OUT]` — usable as a
  * `TypedColumn` in `Dataset.select`, in `groupByKey(...).agg(...)`, and
  * registerable as a UDAF.
  *
  * Scale: Aggregators run as partial (map-side) + final (reduce-side)
  * aggregation like any built-in — `merge` IS the map-side combine, so a
  * reduce expressed this way shuffles one buffer per partition per key,
  * not the raw rows.
  */
object TypedReduce {

  /** Wrap an associative binary function + identity element as an
    * Aggregator — the Flink `reduce()` analog. `identity` must satisfy
    * `f(identity, x) == x`. */
  def reduceAggregator[T: Encoder](identity: T)(f: (T, T) => T): Aggregator[T, T, T] =
    new Aggregator[T, T, T] {
      override def zero: T = identity
      override def reduce(b: T, a: T): T = f(b, a)
      override def merge(b1: T, b2: T): T = f(b1, b2)
      override def finish(r: T): T = r
      override def bufferEncoder: Encoder[T] = implicitly[Encoder[T]]
      override def outputEncoder: Encoder[T] = implicitly[Encoder[T]]
    }

  def reduceColumn[T: Encoder](identity: T)(f: (T, T) => T): TypedColumn[T, T] =
    reduceAggregator(identity)(f).toColumn
}
