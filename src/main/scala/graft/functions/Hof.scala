package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Helpers for composing higher-order-function expressions safely.
  *
  * Spark evaluates HOF lambdas (`transform` / `filter` / `aggregate` /
  * `array_sort` comparators) interpreted, with no subexpression
  * elimination across the lambda boundary. A lambda body that references
  * a COMPUTED outer column — anything beyond an attribute, literal, or
  * lambda variable — re-evaluates that whole expression once per
  * ELEMENT, which silently turns linear scans quadratic: `ngrams` over
  * `tokens(text)` re-split the document at every window position
  * (measured 16 s instead of ~1 s for the DSIR bigram count at sf0.1),
  * and `normalize` re-computed the full norm per vector component.
  */
object Hof {

  /** Evaluate `c` exactly once per row and pass the result to `body` as
    * a lambda variable, so references inside nested HOF lambdas are
    * cheap per-element lookups. Implementation: a one-element `array`
    * wrapper, `transform` with `body` as the lambda, `element_at` to
    * unwrap — one extra single-element array allocation per row. Works
    * for any input/result type, and nested `bindOnce` calls compose
    * (inner bodies may close over outer lambda variables). */
  def bindOnce(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)
}
