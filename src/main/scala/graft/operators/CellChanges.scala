package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cell-level (multi-version) change rendering — the analog of the
 * reference's multi-version mode, which emits one output row per CELL
 * change `| pk | column_name | version | column_value | op_type |`
 * instead of one per row change (`otsstreamreader/.../core/
 * MultiVerModeRecordSender.java:11-28`, emission 40-133; op types at
 * the class header: U = upsert cell, DR = delete row).
 *
 * Spark-first shape: a row change explodes into an array of
 * (column_name, value) structs — one narrow projection + explode, no
 * UDF, fully codegen'd — so an upsert yields one `U` row per non-null
 * cell and a delete yields a single `DR` row with null cell fields.
 * The per-shard sequence id the reference threads through
 * (`%010d_%020d_%010d_%s`) is our `version` column (lsn — already a
 * total order per shard).
 *
 * The `DO`/`DA` (delete-one-version / delete-all-versions) op types
 * have no source in a row-keyed log — a row-level delete IS `DR`; they
 * would appear only with a cell-versioned upstream, which the
 * north-star pipeline does not model.
 *
 * Scale: output is input × (number of rendered columns) rows but each
 * row is tiny; the explode is pipelined inside the scan stage (no
 * shuffle introduced).
 */
object CellChanges {

  /** Render row changes as cell changes.
    *
    * @param df      row-change frame
    * @param pk      primary-key column
    * @param version change version / sequence column (lsn analog)
    * @param deletePred rows matching this are row deletes (`DR`)
    * @param cells   (column_name, string-valued expression) pairs to
    *                render as `U` cells (callers format numerics
    *                deterministically, e.g. `format_string("%.4f", c)`)
    * @return (pk, column_name, column_value, op_type, version)
    */
  def render(df: DataFrame, pk: Column, version: Column, deletePred: Column,
      cells: Seq[(String, Column)]): DataFrame = {
    val cellArr = array(cells.map { case (n, c) =>
      struct(lit(n).as("column_name"), c.cast("string").as("column_value"))
    }: _*)
    // a NULL predicate value must not drop the row from BOTH branches
    // (filter(p) and filter(!p) each exclude NULL): treat unknown as
    // not-a-delete, so the change still renders as an upsert
    val isDelete = coalesce(deletePred, lit(false))
    val upserts = df.filter(!isDelete)
      .select(pk.as("pk"), version.as("version"), explode(cellArr).as("cell"))
      .filter(col("cell.column_value").isNotNull)
      .select(col("pk"), col("cell.column_name").as("column_name"),
        col("cell.column_value").as("column_value"),
        lit("U").as("op_type"), col("version"))
    val deletes = df.filter(isDelete)
      .select(pk.as("pk"), lit(null).cast("string").as("column_name"),
        lit(null).cast("string").as("column_value"),
        lit("DR").as("op_type"), version.as("version"))
    upserts.unionByName(deletes)
  }
}
