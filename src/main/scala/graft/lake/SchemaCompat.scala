package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/** Nullability-insensitive type compatibility. Spark's `cast` rejects
  * e.g. array<int> -> array<int> when only `containsNull` differs, so we
  * only insert a cast when the types differ structurally. */
object SchemaCompat {

  def sameIgnoreNullability(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ae, _), ArrayType(be, _)) => sameIgnoreNullability(ae, be)
    case (MapType(ak, av, _), MapType(bk, bv, _)) =>
      sameIgnoreNullability(ak, bk) && sameIgnoreNullability(av, bv)
    case (StructType(af), StructType(bf)) =>
      af.length == bf.length && af.zip(bf).forall { case (x, y) =>
        x.name == y.name && sameIgnoreNullability(x.dataType, y.dataType)
      }
    case _ => a == b
  }

  def castTo(c: Column, src: DataType, target: DataType): Column =
    if (sameIgnoreNullability(src, target)) c else c.cast(target)
}
