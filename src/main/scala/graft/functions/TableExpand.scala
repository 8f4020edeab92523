package graft.functions

/**
 * Sharded-table expansion — config-layer parity with the reference's
 * `TableExpandUtil` (DataX `plugin-rdbms-util/.../util/TableExpandUtil.java:10-72`):
 * `schema.table[0-31]suffix` expands to 32 concrete table names. Used
 * when a job spec enumerates sharded inputs to read and union.
 */
object TableExpand {

  private val Pattern = """(\w+\.)?(\w+)\[(\d+)-(\d+)\](.*)""".r

  /** Expand one table expression; a name without a `[lo-hi]` range
    * passes through unchanged. */
  def expand(expr: String): Seq[String] = expr.trim match {
    case Pattern(schema, table, lo, hi, suffix) =>
      val s = Option(schema).getOrElse("")
      (lo.toInt to hi.toInt).map(i => s"$s$table$i$suffix")
    case other => Seq(other)
  }

  /** Expand a comma-separated list of table expressions. */
  def expandAll(exprs: String): Seq[String] =
    exprs.split(",").toSeq.map(_.trim).filter(_.nonEmpty).flatMap(expand)
}
