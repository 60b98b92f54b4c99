package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl._
import graft.dq._

class EtlSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("bronze ingest adds lineage metadata") {
    val df = EtlQueries.bronzeIngest(spark, sf)
    assert(df.columns.takeRight(3).sameElements(
      Array("ingestion_timestamp", "source_identifier", "batch_identifier")))
    val r = df.select("source_identifier", "batch_identifier").distinct().collect()
    assert(r.length == 1 && r(0).getString(0) == "PARQUET")
  }

  test("bronze CSV roundtrip") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("graftcsv").toFile
    val p = new java.io.File(d, "in.csv")
    Files.writeString(p.toPath, "id,name\n1,a\n2,b\n")
    val df = Bronze.readCsvInferred(spark, p.getAbsolutePath)
    assert(df.count() == 2 && df.columns.sameElements(Array("id", "name")))
  }

  test("permissive CSV/JSON ingest quarantines corrupt rows") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("score", DoubleType)))
    val d = Files.createTempDirectory("graftquar").toFile
    val csv = new java.io.File(d, "in.csv")
    Files.writeString(csv.toPath, "id,score\n1,0.5\nnotanint,0.7\n3,0.9\n")
    val (okC, badC) = Bronze.quarantine(
      Bronze.readCsvPermissive(spark, csv.getAbsolutePath, schema))
    assert(okC.count() == 2 && badC.count() == 1)
    assert(badC.head().getAs[String](Bronze.CorruptCol).startsWith("notanint"))
    assert(!okC.columns.contains(Bronze.CorruptCol))
    val js = new java.io.File(d, "in.json")
    Files.writeString(js.toPath,
      """{"id":1,"score":0.5}""" + "\n" + """{"id":2 "score":""" + "\n" +
        """{"id":3,"score":0.9}""" + "\n")
    val (okJ, badJ) = Bronze.quarantine(
      Bronze.readJsonPermissive(spark, js.getAbsolutePath, schema))
    assert(okJ.count() == 2 && badJ.count() == 1)
    assert(badJ.head().getAs[String](Bronze.CorruptCol).contains("\"id\":2"))
  }

  test("drift monitor: random halves are stable, skewed split is not") {
    import spark.implicits._
    val rows = Drift.dqDrift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // shares are distributions
    assert(math.abs(rows.map(_.getAs[Double]("p_a")).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getAs[Double]("p_b")).sum - 1.0) < 1e-3)
    // even/odd orderkey halves are exchangeable -> PSI firmly "stable"
    val psi = rows.map(_.getAs[Double]("psi_term")).sum
    assert(psi >= 0 && psi < 0.1, s"psi=$psi")
  }

  test("expectations engine: one pass, correct verdicts") {
    import spark.implicits._
    val df = Seq((1, Some(10), "a"), (2, None, "b"), (2, Some(30), "zz"))
      .toDF("k", "v", "s")
    val m = Expectations.run(df, Seq(
      NotNull("v"), Unique("k"), Between("v", 0, 15),
      InSet("s", Seq("a", "b")), RowCountAtLeast(10)))
      .collect().map(r => (r.getString(0) + "/" + r.getString(1), r.getLong(2))).toMap
    assert(m("not_null/v") == 1)       // one null
    assert(m("unique/k") == 1)         // k=2 twice
    assert(m("between/v") == 1)        // 30 > 15
    assert(m("in_set/s") == 1)         // "zz"
    assert(m("row_count_at_least/*") == 1) // 3 < 10
  }

  test("expectations: failing-row samples (GX partial_unexpected_list)") {
    import spark.implicits._
    val df = Seq((1, Some(10), "a"), (2, None, "b"), (3, Some(30), "zz"),
      (4, Some(99), "zz"), (5, Some(50), "a"))
      .toDF("k", "v", "s")
    val rep = Expectations.run(df, Seq(
      NotNull("v"), Unique("k"), Between("v", 0, 15), InSet("s", Seq("a", "b"))),
      sampleKey = Some("k"), sampleN = 2)
      .collect()
      .map(r => (r.getString(0) + "/" + r.getString(1),
        r.getAs[String]("sample_keys"))).toMap
    assert(rep("not_null/v") == "2")       // the null row's key
    assert(rep("between/v") == "3,4")      // 30 and 99, sorted keys
    assert(rep("in_set/s") == "3,4")       // the two "zz" rows
    assert(rep("unique/k") == "")          // aggregate-level: no row samples
    // sampleN truncates deterministically: 3 violators, first 2 sorted keys
    val rep2 = Expectations.run(df, Seq(Between("v", 0, 15)),
      sampleKey = Some("k"), sampleN = 1).collect()
    assert(rep2.head.getAs[String]("sample_keys") == "3")
  }

  test("requireAllPassed gates on red reports and passes green ones") {
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "s")
    val green = Expectations.run(df, Seq(NotNull("k"), Unique("k")))
    // returns the report unchanged when all passed
    assert(Expectations.requireAllPassed(green).count() == 2)
    val red = Expectations.run(df, Seq(InSet("s", Seq("a"))))
    val e = intercept[IllegalStateException] {
      Expectations.requireAllPassed(red, "spec")
    }
    assert(e.getMessage.contains("in_set(s)=1"))
  }

  test("dedup keep-first is deterministic under ties") {
    import spark.implicits._
    val df = Seq((1, 1, "b"), (1, 1, "a"), (1, 2, "c"), (2, 5, "x"))
      .toDF("k", "ord", "v")
    val out = Silver.dedupKeepFirst(df, Seq("k"), Seq("ord", "v"))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).sameElements(Array("a", "x")))
  }

  test("impute + clamp") {
    import spark.implicits._
    val df = Seq((Some(5.0)), (None), (Some(99.0))).toDF("x")
    val out = Silver.impute(df, Map("x" -> 7.0))
      .select(Silver.clamp(col("x"), 0.0, 10.0).as("x"))
      .collect().map(_.getDouble(0)).sorted
    assert(out.sameElements(Array(5.0, 7.0, 10.0)))
  }

  test("upsert latest-wins by version") {
    import spark.implicits._
    val base = Seq((1, "old", 1), (2, "keep", 1)).toDF("k", "v", "_version")
    val upd  = Seq((1, "new", 2)).toDF("k", "v", "_version")
    val out = Loader.upsert(base, upd, Seq("k"), "_version")
      .orderBy("k").collect().map(_.getString(1))
    assert(out.sameElements(Array("new", "keep")))
  }

  test("approx-imputed silver pipeline agrees with the exact pipeline") {
    val exact = EtlQueries.silverPipeline(spark, sf)
    val approx = EtlQueries.silverPipelineApprox(spark, sf)
    // same rows in the same order (both sort by l_orderkey, dedup is
    // stats-independent); imputed numerics differ only by sketch error
    val joined = exact.alias("e").join(approx.alias("a"),
      col("e.l_orderkey") === col("a.l_orderkey") &&
        col("e.l_linenumber") === col("a.l_linenumber"))
    assert(joined.count() == exact.count())
    val bad = joined.filter(
      abs(col("e.l_quantity") - col("a.l_quantity")) >
        abs(col("e.l_quantity")) * 0.05 + 1e-9 ||
      col("e.l_returnflag") =!= col("a.l_returnflag")).count()
    assert(bad == 0, s"$bad rows diverge beyond sketch tolerance")
  }

  test("approx medians track exact medians on the corpus") {
    val li = Tables.lineitem(spark, sf)
    val cols = Seq("l_quantity", "l_extendedprice")
    val exact = Silver.medians(li, cols)
    val approx = Silver.mediansApprox(li, cols)
    cols.foreach { c =>
      val rel = math.abs(approx(c) - exact(c)) / math.max(math.abs(exact(c)), 1e-9)
      assert(rel < 0.05, s"$c: approx ${approx(c)} vs exact ${exact(c)}")
    }
  }

  test("medians and modes match known values") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    assert(Silver.medians(df, Seq("x"))("x") == 2.5)
    val s = Seq("b", "a", "b", "a", "c").toDF("s")
    assert(Silver.mode(s, "s") == "a") // tie a/b → min wins
  }
}
