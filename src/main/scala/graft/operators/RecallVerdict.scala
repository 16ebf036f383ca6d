package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared tail of the recall-verdict pattern (`dedup_simhash`,
  * `embed_dedup`): given ground-truth pairs, the pairs a candidate
  * generator actually found, and the full entity frame, emit one row per
  * entity — `(id, recall_ok)` where recall_ok ⇔ every ground-truth pair
  * touching the entity was found (vacuously TRUE for entities in no pair).
  * The DuckDB oracle emits the deterministic id frame + literal TRUE, so
  * any recall loss in the generator flips rows red. Callers guarantee
  * found ⊆ bf (both sides exact-verify on the same data), so recall is the
  * only degree of freedom and precision cannot drift.
  */
object RecallVerdict {

  /** @param bf    ground-truth pairs `(aCol, bCol)` (brute force)
    * @param found generator's pairs, same column names
    * @param ids   one row per entity, column `idCol`
    */
  def perEntity(bf: DataFrame, found: DataFrame, ids: DataFrame,
      aCol: String, bCol: String, idCol: String): DataFrame = {
    val f = found.select(col(aCol).as("__f_a"), col(bCol).as("__f_b"))
    val perId = bf
      .join(f, col(aCol) === col("__f_a") && col(bCol) === col("__f_b"), "left")
      .select(explode(array(col(aCol), col(bCol))).as(idCol),
        col("__f_a").isNull.as("__missed"))
      .groupBy(idCol).agg(max(col("__missed")).as("__any_missed"))
    ids.select(idCol).join(perId, Seq(idCol), "left")
      .select(col(idCol), coalesce(!col("__any_missed"), lit(true)).as("recall_ok"))
      .orderBy(idCol)
  }
}
