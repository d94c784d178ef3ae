package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.StringToColumn

/** Salted equi-join for skewed keys. AQE's skew-join handles most cases
  * at runtime; salting is the explicit, planner-independent fallback when
  * one key dominates (e.g. a null-ish default id owning 10% of 100 TB):
  *
  *  - every LEFT row gets a deterministic salt in [0, S) (spreading one
  *    hot key over S shuffle partitions);
  *  - every RIGHT row is replicated S times, once per salt;
  *  - the join key becomes (keys…, salt), so result = plain equi-join.
  *
  * Cost: right side ×S — use with a small-to-medium right side and S
  * sized to the observed skew (hot-key rows ÷ target partition rows).
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, (keys :+ "__salt").toSeq, joinType).drop("__salt")
  }
}
