package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Load semantics: full vs batch/incremental, latest-wins upsert, report.
  *
  * Re-expresses the reference's `load_data_to_mysql` full/batch modes
  * (/root/reference/dags/de_spotify_to_bronze.py:166-199: full =
  * TRUNCATE+insert, batch = append) and `generate_load_report`
  * (:337-366) as Spark-native writes and aggregations.
  */
object Loader {

  /** Full load = overwrite; batch load = append. */
  def write(df: DataFrame, path: String, loadType: String): Unit = {
    val mode = loadType match {
      case "full"  => SaveMode.Overwrite
      case "batch" => SaveMode.Append
      case other   => throw new IllegalArgumentException(s"loadType $other")
    }
    df.write.mode(mode).parquet(path)
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative key columns: bit i of x lands at position 2i, bit i
    * of y at 2i+1. Rows close in the Z-curve are close in BOTH keys,
    * so clustering by this single value gives 2-D data skipping —
    * point/range predicates on either column prune files. One flat
    * codegen'd integer expression (no lambdas, no UDFs). */
  def zorderKey(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column, bits: Int = 16): org.apache.spark.sql.Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(org.apache.spark.sql.functions.lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftright(xl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
        .bitwiseOR(shiftright(yl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }
  }

  /** Z-order-clustered write: cluster files along the Morton curve of
    * two key columns — the 2-D generalization of [[writeSorted]].
    * Both keys are first normalized into the same `bits`-wide range
    * (one tiny min/max agg): raw interleaving of keys with different
    * magnitudes degenerates to a 1-D sort on the wider key, because
    * the narrow key's high interleaved bits are constant zero. */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
      xCol: String, yCol: String, bits: Int = 12): Unit = {
    val r = df.agg(min(xCol), max(xCol), min(yCol), max(yCol)).head()
    def lv(i: Int) = r.getAs[Number](i).longValue
    val (x0, x1, y0, y1) = (lv(0), lv(1), lv(2), lv(3))
    val scale = (1L << bits) - 1
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      ((c.cast("long") - lo) * scale / math.max(hi - lo, 1L)).cast("long")
    df.withColumn("_zkey",
        zorderKey(norm(col(xCol), x0, x1), norm(col(yCol), y0, y1), bits))
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Range-sorted write (z-order-lite): range-partition on `cols` and
    * sort within partitions, so every output file covers a disjoint
    * key range and its parquet footer min/max stats let point/range
    * scans skip whole files and row groups. At 100 TB this is the
    * difference between touching every file and touching one — the
    * write-side half of predicate pushdown. */
  def writeSorted(df: DataFrame, path: String, nFiles: Int, cols: String*): Unit =
    df.repartitionByRange(nFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC variant of [[write]] — same full/batch semantics, columnar
    * format interchange (ORC ships in Spark's classpath; both formats
    * carry min/max stats + predicate pushdown, so the scan-side scale
    * properties match parquet's). */
  def writeOrc(df: DataFrame, path: String, loadType: String): Unit = {
    val mode = loadType match {
      case "full"  => SaveMode.Overwrite
      case "batch" => SaveMode.Append
      case other   => throw new IllegalArgumentException(s"loadType $other")
    }
    df.write.mode(mode).orc(path)
  }

  def readOrc(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-evolution read: union the schemas of all files under
    * `path` (columns added by later batches come back null for earlier
    * files) — the contract an accreting bronze directory needs once
    * upstream adds fields. At scale prefer an explicit evolved schema:
    * mergeSchema pays a footer-read pre-pass over every file. */
  def readMerged(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** JDBC load with the reference's two modes
    * (/root/reference/dags/de_spotify_to_bronze.py:168-213
    * `load_data_to_mysql`): full = TRUNCATE + insert (here: overwrite
    * with `truncate=true`, which issues the dialect's TRUNCATE TABLE
    * and keeps the DDL/indexes, exactly like the reference's
    * `TRUNCATE TABLE` at :196), batch = append (the reference's
    * `insert_rows` without truncate). Writes go through Spark's
    * per-partition batched INSERTs — every executor loads its
    * partitions concurrently, `batchsize` rows per round trip, so the
    * load parallelism is the DataFrame's partitioning, not a single
    * driver-side cursor like the reference's pandas`→`MySqlHook path. */
  def writeJdbc(df: DataFrame, url: String, table: String, loadType: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
      batchSize: Int = 10000): Unit = {
    val mode = loadType match {
      case "full"  => SaveMode.Overwrite
      case "batch" => SaveMode.Append
      case other   => throw new IllegalArgumentException(s"loadType $other")
    }
    df.write.mode(mode)
      .option("driver", driver)
      .option("truncate", "true")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, new java.util.Properties)
  }

  /** Latest-record-wins upsert of `updates` into `base` by `keys`,
    * using `version` (e.g. batch sequence / ingestion ts) to pick the
    * winner. One partial-agg'd shuffle via max_by — no sort, no window.
    * Ties on `version` break toward the update (it carries the higher
    * `_src` marker in the max_by ordering struct). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             version: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      "base/updates schema mismatch")
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val all = struct(base.columns.map(col): _*)
    tagged.groupBy(keys.map(col): _*)
      .agg(max_by(all, struct(col(version), col("_src"))).as("_row"))
      .select(base.columns.map(c => col(s"_row.$c")): _*)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetMb`-sized files (the 100 TB operational hygiene op —
    * streaming/incremental sinks accrete small files that wreck scan
    * parallelism and NameNode/listing costs). Uses a temp-dir + swap so
    * the self-referencing read is safe. NOTE: the swap uses
    * java.io.File — local filesystems only; a cluster deployment swaps
    * via the Hadoop FileSystem API (rename is atomic on HDFS). */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetMb: Int = 128): Unit = {
    val src = new java.io.File(dir)
    val bytes = org.apache.commons.io.FileUtils.sizeOfDirectory(src)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetMb * 1024L * 1024L)).toInt)
    val tmp = dir + "_compact_tmp"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    org.apache.commons.io.FileUtils.deleteDirectory(src)
    new java.io.File(tmp).renameTo(src)
  }

  /** Hive-style partitioned write: one directory per partition value.
    * Readers filtering on the partition column scan only matching
    * directories (partition pruning — at 100 TB, date/tenant partitions
    * are the first-order scan reducer before any row-group pushdown). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted table write: co-locates future joins/aggs on
    * `keys` (joins between two tables bucketed the same way need NO
    * shuffle — the 100 TB answer to repeated fact⋈fact joins). Requires
    * a catalog table (bucketing metadata lives in the metastore). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** INSERT INTO an existing bucketed table, preserving its layout:
    * Spark hashes the new rows into the matching bucket files, so the
    * table stays joinable shuffle-free as it accretes daily batches.
    * (Spark validates the bucket spec against the catalog on append.) */
  def appendBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Count the data files of a catalog table (its physical location). */
  def dataFileCount(spark: org.apache.spark.sql.SparkSession, table: String): Int = {
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location
    val dir = new java.io.File(loc)
    if (!dir.exists) 0
    else dir.listFiles.count(f => f.isFile && f.getName.endsWith(".parquet"))
  }

  /** Bucket-preserving compaction of a bucketed catalog table
    * ([[writeBucketed]]/[[appendBucketed]] tables): every appended
    * batch adds one file per touched bucket, and the accreting small
    * files wreck scan parallelism and listing cost long before they
    * hurt correctness. When files/bucket exceeds `maxFilesPerBucket`,
    * rewrite the table at one file per bucket and swap it in under the
    * original name.
    *
    * The rewrite `repartition(numBuckets, keys)` first: Spark's task
    * partition id and its bucket id are the SAME murmur3-pmod
    * expression, so each task holds exactly one bucket's rows and the
    * bucketed write emits exactly `numBuckets` files — without the
    * repartition every task would re-emit one file per bucket it
    * happens to hold and the "compaction" could multiply files.
    *
    * The source is read as a PLAIN parquet path, not `spark.table`:
    * reading through the catalog, the bucketed scan advertises exactly
    * the hash distribution the repartition asks for, the optimizer
    * elides the "redundant" shuffle, and DisableUnnecessaryBucketedScan
    * then downgrades the scan to a plain multi-file read — leaving
    * mixed-bucket tasks that re-emit files×buckets (measured: a 4-bucket
    * rewrite produced 16 files). The path read carries no bucket
    * metadata, so the aligning shuffle survives planning.
    *
    * The swap is DROP + ALTER RENAME through the catalog so the bucket
    * spec (the zero-exchange join contract) survives — a path-level
    * rewrite like [[compact]] would silently drop bucketing metadata.
    *
    * Returns true when a rewrite happened. */
  def compactBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
      keys: Seq[String], numBuckets: Int, maxFilesPerBucket: Int = 4): Boolean = {
    val files = dataFileCount(spark, table)
    if (files <= numBuckets.toLong * maxFilesPerBucket) return false
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString
    val tmp = table + "_compact_tmp"
    val cols = keys.map(org.apache.spark.sql.functions.col)
    writeBucketed(spark.read.parquet(loc).repartition(numBuckets, cols: _*),
      tmp, keys, numBuckets)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    true
  }

  /** Per-batch load report: row counts + basic stats, grouped by the
    * lineage columns added at bronze ingest. */
  def report(df: DataFrame, groupCols: Seq[String], keyCol: String,
             tsCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("rows_loaded"),
        countDistinct(col(keyCol)).as("distinct_keys"),
        min(col(tsCol)).as("min_ts"),
        max(col(tsCol)).as("max_ts"))
      .orderBy(groupCols.map(col): _*)
}
