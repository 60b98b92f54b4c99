package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * When one join key dominates (hot user, hot track — the reference's
  * dataset has exactly this shape in popularity), a plain hash join
  * sends the whole hot key to one task. Salting splits it: the big
  * (skewed) side gets a deterministic salt in [0, S) per row; the
  * small side is replicated S× with every salt value; the join key
  * becomes (key, salt). Throughput scales S× on the hot key at the
  * cost of replicating the small side.
  *
  * AQE's skew-join handles sort-merge cases automatically at runtime;
  * this explicit form covers broadcast-ineligible skews and makes the
  * technique testable/deterministic (salt = row-hash, no RNG).
  */
object Skew {

  def saltedJoin(bigSkewed: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    val allCols = bigSkewed.columns.map(col)
    val salted = bigSkewed.withColumn("_salt",
      pmod(xxhash64(allCols: _*), lit(salts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
