import org.apache.spark.sql.ColumnName

/** Session-free `$"col"` interpolator (same shape as
  * `SQLImplicits.StringToColumn`) so query definitions don't need a
  * `SparkSession` in scope. */
package object graft {
  implicit class StringToColumn(val sc: StringContext) extends AnyVal {
    def $(args: Any*): ColumnName = new ColumnName(sc.s(args: _*))
  }
}
