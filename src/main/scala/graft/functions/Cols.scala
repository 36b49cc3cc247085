package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Column-name helpers for user-provided names. CSV headers may contain
  * dots (`nation.name` dot notation) which `col()` would parse as struct
  * access — always backtick-quote dynamic names.
  */
object Cols {
  def qcol(name: String): Column =
    if (name.contains(".") || name.contains("`"))
      col("`" + name.replace("`", "``") + "`")
    else col(name)
}
