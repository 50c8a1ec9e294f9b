package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Thin, discoverable facade over `DataFrame` mirroring the reference's
  * user surface (acowley/Frames; SURVEY §2.2, §2.5, §2.6). Every method is
  * a declarative plan transform — Catalyst still sees through it (column
  * pruning, predicate pushdown, join planning all apply).
  *
  * Row-order-sensitive operators (`takeRows`/`dropRows`/`zip`/`chunks`)
  * take explicit sort keys: the reference relies on file order, which a
  * distributed engine cannot assume (SURVEY §7.4). Passing the keys keeps
  * these operators deterministic on any cluster.
  */
final case class Frame(df: DataFrame) {
  import Frame._

  /** `rcast`/`select` — project a sub-record, reorder + subset
    * (Frames `src/Frames/Exploration.hs:47-48`). */
  def select(cols: String*): Frame = Frame(df.select(cols.map(col): _*))

  /** `rsubset`-style partial update: set some columns, keep the rest
    * (Frames `src/Frames/Exploration.hs:53-55`). */
  def withColumns(updates: Map[String, Column]): Frame =
    Frame(df.withColumns(updates))

  /** `rdel` — delete columns (Frames `src/Frames/RecF.hs:119-124`). */
  def drop(cols: String*): Frame = Frame(df.drop(cols: _*))

  /** `filterFrame` / pipeline `P.filter` (Frames `src/Frames/InCore.hs:222-224`). */
  def filter(cond: Column): Frame = Frame(df.filter(cond))

  /** `mapMono` — apply one expression to every column of a homogeneous
    * selection (Frames `src/Frames/RecF.hs:99-117`). */
  def mapMono(cols: Seq[String], f: Column => Column): Frame =
    Frame(df.withColumns(cols.map(c => c -> f(col(c))).toMap))

  /** Frame `<>` — vertical concat / UNION ALL by name
    * (Frames `src/Frames/Frame.hs:34-42`). */
  def concat(other: Frame): Frame = Frame(df.unionByName(other.df))

  /** Schema-evolution concat: UNION ALL by name where either side may
    * lack columns the other has — missing cells fill with null. The
    * shape every long-lived corpus needs when a new shard version adds
    * a column: old shards keep reading without a rewrite. Still a
    * zero-shuffle narrow union. */
  def concatEvolved(other: Frame): Frame =
    Frame(df.unionByName(other.df, allowMissingColumns = true))

  /** `takeRows` — deterministic prefix under the given ordering
    * (Frames `src/Frames/Exploration.hs:120-123`). */
  def takeRows(n: Int, order: Seq[Column]): Frame =
    Frame(df.orderBy(order: _*).limit(n))

  /** `dropRows` — deterministic offset under the given ordering
    * (Frames `src/Frames/Exploration.hs:124-126`). */
  def dropRows(n: Int, order: Seq[Column]): Frame =
    Frame(df.orderBy(order: _*).offset(n))

  /** `zipFrames` — horizontal concat by row index; result length = min of
    * the inputs (Frames `src/Frames/Frame.hs:64-70`). Each side must carry
    * its own explicit ordering; rows are matched by global index (computed
    * partition-parallel, see [[Frame.withRowIndex]]). The index join is a
    * shuffle on the synthetic key — unavoidable for index-zip semantics;
    * prefer a key join where a real key exists. */
  def zip(order: Seq[Column], other: Frame, otherOrder: Seq[Column]): Frame = {
    val l = withRowIndex(df, order, "__zip_idx")
    val r = withRowIndex(other.df, otherOrder, "__zip_idx")
    Frame(l.join(r, Seq("__zip_idx"), "inner").drop("__zip_idx"))
  }

  /** `frameChunks` — tag each row with a chunk id of `size` consecutive
    * rows under the given ordering (Frames `src/Frames/InCore.hs:256-260`).
    * Built on the partition-parallel global row index ([[Frame.withRowIndex]]);
    * for physical (partition-wise) chunking `df.repartitionByRange` also
    * works — this logical form matches the reference's test semantics
    * exactly. */
  def chunkIds(size: Int, order: Seq[Column], chunkCol: String = "chunk"): Frame = {
    val indexed = Frame.withRowIndex(df, order, "__chunk_idx")
    Frame(
      indexed
        .withColumn(chunkCol, (col("__chunk_idx") / size).cast("long"))
        .drop("__chunk_idx"))
  }

  /** Frame Monad `>>=` / `concatMap` — one output row per element of the
    * generator expression evaluated on each input row (Frames
    * `src/Frames/Frame.hs:58-62`). The reference's bind lets a row expand
    * into an arbitrary sub-frame; the declarative Spark form is a lateral
    * `Generate` over an array-valued expression (`array`, `sequence`,
    * `split`, `transform`, …) — codegen'd, shuffle-free, and Catalyst
    * still prunes/pushes through it. Rows whose generator is empty or
    * null produce no output, matching monadic bind (use
    * `explode_outer` semantics via [[concatMapOuter]] to keep them). */
  def concatMap(gen: Column, as: String): Frame =
    Frame(df.withColumn(as, org.apache.spark.sql.functions.explode(gen)))

  /** [[concatMap]] keeping empty/null-generator rows with a null element
    * (`explode_outer`). */
  def concatMapOuter(gen: Column, as: String): Frame =
    Frame(df.withColumn(as, explode_outer(gen)))

  /** [[concatMap]] with the element's 0-based position (`posexplode`). */
  def concatMapWithPosition(gen: Column, posAs: String, as: String): Frame =
    Frame(df.select(col("*"), posexplode(gen).as(Seq(posAs, as))))

  /** Default-fill of missing cells from per-column defaults
    * (Frames `demo/MissingData.hs:64-72`). */
  def fillNa(defaults: Map[String, Any]): Frame = Frame(df.na.fill(defaults))

  /** `recMaybe`-style all-or-nothing row: drop rows with any null
    * (Frames `src/Frames/Rec.hs:47-49`). */
  def dropNa(): Frame = Frame(df.na.drop("any"))

  /** `inCoreAoS` — materialize for reuse (Frames `src/Frames/InCore.hs:174-176`). */
  def inCore(): Frame = { df.cache(); this }

  /** `showFrame`-compatible rendering (Frames
    * `src/Frames/Exploration.hs:129-147`): header then one separator-joined
    * line per row. Driver-side by construction — only ever call on small /
    * limited frames. */
  def showFrame(sep: String = " | ", limit: Int = 20): String = {
    val header = df.columns.mkString(sep)
    val rows = df.limit(limit).collect().map { r =>
      (0 until r.length)
        .map(i => if (r.isNullAt(i)) "" else r.get(i).toString)
        .mkString(sep)
    }
    (header +: rows).mkString("\n")
  }
}

object Frame {
  import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, SortOrder}
  import org.apache.spark.sql.graftbridge.ColumnBridge
  import org.apache.spark.sql.types.LongType
  import graft.plans.{GraftPlans, RowIndexPlan}

  /** Attach a dense 0-based global row index under an explicit ordering —
    * partition-parallel via the custom [[graft.plans.RowIndexExec]]
    * operator (range-partitioned sort + per-partition offsets), NOT the
    * single-task `row_number() OVER (ORDER BY ...)` window. This keeps
    * the reference's order-sensitive operators (`zip`, `chunkIds`)
    * cluster-scalable. */
  private[graft] def withRowIndex(
      df: DataFrame,
      order: Seq[Column],
      name: String): DataFrame = {
    GraftPlans.register(df.sparkSession)
    val sortOrders = order.map(c =>
      ColumnBridge.convertedExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      })
    ColumnBridge.ofRows(
      df.sparkSession,
      RowIndexPlan(
        df.queryExecution.logical,
        AttributeReference(name, LongType, nullable = false)(),
        sortOrders))
  }

  /** Attach a dense global index AND the EXCLUSIVE running sum of a
    * long-valued weight under an explicit ordering — the distributed
    * prefix-sum primitive ([[graft.plans.PrefixSumExec]]): parallel
    * range-partitioned sort + per-partition (count, sum) offsets, never
    * a single-task window. Powers [[graft.operators.Packing]]. */
  private[graft] def withPrefixSum(
      df: DataFrame,
      order: Seq[Column],
      weight: Column,
      idxName: String,
      sumName: String): DataFrame = {
    GraftPlans.register(df.sparkSession)
    val sortOrders = order.map(c =>
      ColumnBridge.convertedExpression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      })
    ColumnBridge.ofRows(
      df.sparkSession,
      graft.plans.PrefixSumPlan(
        df.queryExecution.logical,
        AttributeReference(idxName, LongType, nullable = false)(),
        AttributeReference(sumName, LongType, nullable = false)(),
        ColumnBridge.convertedExpression(weight),
        sortOrders))
  }
}
