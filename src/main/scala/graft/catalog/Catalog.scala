package graft.catalog

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metadata-catalog relational primitives.
  *
  * The reference keeps pipeline metadata in Postgres via SQLAlchemy and
  * leans on a handful of relational operations: point lookups
  * (app/crud/base.py:26-27), offset/limit pagination (base.py:29-32),
  * conjunctive filters (app/crud/crud_hyperfile.py:37-44), FK relationship
  * joins (app/models/hyperfile.py:57-62), existence checks before create
  * (app/utils/onadata_utils.py:268-270), create-or-get upserts
  * (onadata_utils.py:265-292) and job dedup (app/jobs/scheduler.py:38-40).
  *
  * Re-expressed Spark-first. Scale posture: catalog tables are small
  * relative to extract data — joins against them should broadcast (callers
  * wrap with `broadcast(...)`); upsert/dedup are expressed as anti-joins /
  * window-rank so they shuffle once on the key and never collect.
  */
object Catalog {

  /** P1: point lookup by key — `filter(id == k).first()` shape. */
  def pointLookup(df: DataFrame, keyCol: String, key: Any): DataFrame =
    df.filter(col(keyCol) === lit(key))

  /** P2: deterministic offset/limit pagination. The reference pages with
    * `.offset(skip).limit(limit)` (defaults 0/100). A page is only
    * meaningful under a total order, so a sort key is required.
    */
  def paginate(df: DataFrame, sortCols: Seq[String], skip: Int, limit: Int): DataFrame =
    df.orderBy(sortCols.map(col): _*).offset(skip).limit(limit)

  /** J3: semi-join existence check — "already registered?". */
  def existing(candidates: DataFrame, registry: DataFrame, keys: Seq[String]): DataFrame =
    candidates.join(registry, keys, "left_semi")

  /** J4: upsert (MERGE) — incoming rows win on key collision, all other
    * existing rows survive. One shuffle on the key; no driver round-trip.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(incoming, keys, "left_anti").unionByName(incoming)

  /** [[upsert]] under schema drift: the sides may disagree on non-key
    * columns (source added or removed a field between syncs — the
    * reference absorbs this by re-inferring the schema and rebuilding
    * every tick, app/core/importer.py:54-74, 242-249; merging instead
    * must tolerate the drift). Fill policy: the output schema is the
    * UNION of both schemas, and a column absent from a row's side is
    * null — explicitly, additive evolution where old rows read null for
    * new fields and dropped fields stay readable on old rows.
    */
  def upsertEvolving(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    keys.foreach { k =>
      require(existing.columns.contains(k) && incoming.columns.contains(k),
        s"merge key '$k' must exist on both sides")
    }
    existing.join(incoming, keys, "left_anti")
      .unionByName(incoming, allowMissingColumns = true)
  }

  /** A3: keyed dedup keeping the first row per key under `orderCol` — the
    * deterministic form of `dropDuplicates` (which keeps an arbitrary row).
    * Implemented as a rank-1 window: single shuffle on the dedup key, and
    * at 100 TB the window's sort is per-key (no global sort).
    *
    * PRECONDITION: `orderCol` must be unique within each key group —
    * on ties the window ranks by partition-arrival order and the kept
    * row varies run to run, exactly the nondeterminism this operator
    * exists to remove. Callers here pass ids/timestamps that are unique
    * per key; append a unique column to `orderCol`'s role when yours
    * are not.
    */
  def dedupFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
