package graft.tools

import org.apache.spark.sql.functions._

/** Scratch triage probe for the r13 dedup_simhash redesign — NOT part
  * of the surface; prints stage-by-stage sizes and timings. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.build(s"local[$cpus]", "simhash-probe",
      dataDir = Some(dir), cores = cpus)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    val sigs = docs.select(col("doc_id"),
      graft.functions.native.simhash(
        graft.functions.native.token_poly_hashes(col("text")),
        graft.dedup.Dedup.SimBits).as("sig")).localCheckpoint(false)
    t("n docs")(sigs.count())
    t("distinct sigs")(sigs.select("sig").distinct().count())
    val dupMass = t("docs in multi-doc sigs")(
      sigs.groupBy("sig").agg(count(lit(1)).as("m"))
        .filter(col("m") > 1).agg(sum(col("m") * (col("m") - 1) / 2))
        .collect()(0).getDouble(0).toLong)
    println(s"PROBE within-sig pairs = $dupMass")
    import graft.dedup.{ChunkBlocking, Dedup}
    for (cap <- args.drop(1).map(_.toInt)) {
      val raw = ChunkBlocking.rawCandidates(sigs, Dedup.SimBits,
        Dedup.ChunkBits, Dedup.Chunks, 3, cap)
      val c = t(s"raw candidates cap=$cap")(raw.count())
      val filtered = raw
        .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)"))
        .filter(col("hamming") <= 3 &&
          col("chunk") === ChunkBlocking.firstMatchingCell(
            col("sig_a"), col("sig_b"), Dedup.Chunks, Dedup.ChunkBits))
      val f = t(s"+hamming+chunkpred cap=$cap")(filtered.count())
      val d = t(s"+distinct cap=$cap")(
        filtered.select("sig_a", "sig_b", "hamming").distinct().count())
      val p = t(s"full pairs cap=$cap")(
        Dedup.simhashPairs(docs, 3, cap).count())
      println(s"PROBE cap=$cap candidates=$c filtered=$f distinct=$d fullPairs=$p")
    }
    spark.stop()
  }
}
