package graft

import org.apache.spark.sql.functions._

/** Era-parity: each reference pipeline generation runs end-to-end on
  * reference-shaped users CSV data and reproduces its behavior
  * (counts, splits, cleaning, metrics, alerts, streaming loop).
  */
class PipelinesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeCsv(dir: String, name: String, rows: Seq[String]): String = {
    val f = new java.io.File(dir, name)
    val w = new java.io.PrintWriter(f)
    w.write(("name,age,email" +: rows).mkString("", "\n", "\n"))
    w.close()
    f.getPath
  }

  private val goodRows = Seq(
    "alice,30,alice@example.com",
    "bob,41,bob@example.com",
    "carol,25,carol@example.com")
  private val badRows = Seq(
    ",19,missing-name@example.com",   // blank name
    "dan,notanint,dan@example.com",   // unparseable age
    "erin,200,erin@example.com",      // age out of range
    "frank,33,no-at-sign")            // bad email

  test("2016: extract-transform-load uppercases and casts") {
    val in = writeCsv(tmp("p16"), "users.csv", goodRows)
    val out = tmp("p16o")
    assert(Pipelines.basic2016(spark, in, out) == 3)
    val names = spark.read.parquet(out).select("name")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(names == Seq("ALICE", "BOB", "CAROL"))
    assert(spark.read.parquet(out).schema("age").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("2018: validation splits valid rows from reasoned rejects") {
    val in = writeCsv(tmp("p18"), "users.csv", goodRows ++ badRows)
    val (out, rej) = (tmp("p18o"), tmp("p18r"))
    val r = Pipelines.validated2018(spark, in, out, rej)
    assert(r == Pipelines.ValidatedLoad(3, 4))
    val reasons = spark.read.parquet(rej).select("reason")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(reasons == Seq("invalid_age", "invalid_age", "invalid_email",
      "invalid_name"))
  }

  test("2020: glob union + observe metrics count both branches") {
    val dir = tmp("p20")
    writeCsv(dir, "input_1.csv", goodRows)
    writeCsv(dir, "input_2.csv", badRows)
    writeCsv(dir, "output.csv", Seq("x,1,x@y"))  // skipped by glob
    val metrics = Pipelines.parallel2020(spark, dir, tmp("p20o"))
    assert(metrics("n_rows") == 7L)
    assert(metrics("n_valid") == 3L)
    assert(metrics("n_invalid") == 4L)
  }

  test("2022: dedup + impute + report + alerts") {
    val in = writeCsv(tmp("p22"), "users.csv",
      goodRows ++ goodRows ++ badRows) // duplicates + rejects
    val r = Pipelines.quality2022(spark, in, tmp("p22o"))
    assert(r.loaded == 3, "duplicates must collapse")
    assert(r.report.totalRows == 10)
    assert(r.report.validRows == 6)
    assert(r.report.dupRows == 3)
    // 60% valid < 90% threshold -> alert fires
    assert(r.alerts.exists(_.startsWith("low_valid_rate")))
  }

  test("2025: streaming loop applies the same transform per micro-batch") {
    val (in, out, ck, arch) = (tmp("p25i"), tmp("p25o"), tmp("p25c"),
      tmp("p25a"))
    writeCsv(in, "batchfile.csv", goodRows ++ badRows)
    // file source reads CSV dirs of matching schema? fileStream is
    // parquet-based — feed it parquet like the driver's queue would
    val users = Pipelines.usersSchema
    spark.read.schema(users).option("header", "true")
      .csv(s"$in/batchfile.csv").write.mode("overwrite")
      .parquet(s"$in/stream")
    val q = Pipelines.streaming2025(spark, s"$in/stream", out, ck, arch)
      .start()
    q.processAllAvailable()
    q.stop()
    val loaded = spark.read.parquet(s"$out/batch_id=0")
    assert(loaded.count() == 3)
    assert(loaded.filter(col("name") === "ALICE").count() == 1)
  }

  test("2026: curation pipeline filters monotonically and packs the train set") {
    val out = java.nio.file.Files.createTempDirectory("graft-cur").toString
    val run = Pipelines.curation2026(spark, sf, out)
    // each stage can only remove documents
    assert(run.input >= run.afterExactDedup)
    assert(run.afterExactDedup >= run.afterNearDedup)
    assert(run.afterNearDedup >= run.afterDecontamination)
    assert(run.afterDecontamination >= run.afterQuality)
    assert(run.afterQuality >= run.trainDocs)
    assert(run.trainDocs > 0 && run.bins > 0)
    val packed = spark.read.parquet(out)
    // the held-out split never leaks into the packed train set
    assert(packed.filter(
      graft.ops.Sampling.hexNibble(col("doc_id")) >= "c").count() == 0)
    // no unmasked long digit runs survive the scrub
    assert(packed.filter(col("text").rlike("[0-9]{4,}")).count() == 0)
    // deterministic: a second run reproduces the same stage counts
    val out2 = java.nio.file.Files.createTempDirectory("graft-cur2").toString
    assert(Pipelines.curation2026(spark, sf, out2) == run)
  }

  test("2026: quality survivor policy keeps each cluster's longest doc") {
    import graft.ops.{NearDup, Sources}
    val docs = Sources.table(spark, sf, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft-curq").toString
    val run = Pipelines.curationOver(spark, docs, None, out,
      survivorPolicy = "quality")
    // recompute the expected survivor set independently
    val cc = NearDup.connectedComponents(
      NearDup.dedupNgram(spark, docs, 3, 20, 0.2).select("doc_a", "doc_b"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")),
        "doc_id")
      .collect().groupBy(_.getLong(1))
    assert(cc.nonEmpty, "fixture must have near-dup clusters")
    val expectedDrops = cc.values.flatMap { rows =>
      val keep = rows.map(r => (r.getInt(2), -r.getLong(0)))
        .max
      rows.map(_.getLong(0)).filterNot(_ == -keep._2)
    }.toSet
    // the quality run must differ from min-id exactly by the clusters
    // whose longest member is not the min id
    val minIdDrops = cc.values.flatMap { rows =>
      val m = rows.map(_.getLong(0)).min
      rows.map(_.getLong(0)).filterNot(_ == m)
    }.toSet
    assert(expectedDrops != minIdDrops,
      "fixture must exercise the policy difference (longest != min-id " +
        "in at least one cluster), else this test is vacuous")
    val outMin = java.nio.file.Files.createTempDirectory("graft-curm")
      .toString
    val runMin = Pipelines.curationOver(spark, docs, None, outMin)
    assert(run.afterNearDedup == runMin.afterNearDedup,
      "both policies drop the same COUNT (one survivor per cluster)")
    val idsQ = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(expectedDrops.intersect(idsQ).isEmpty,
      "no quality-dropped cluster member may reach the packed train set")
    // min-id-dropped docs that the quality policy KEEPS are exactly
    // the policy difference; none of the quality policy's own drops
    // may leak in either run
    val idsM = spark.read.parquet(outMin).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(minIdDrops.intersect(idsM).isEmpty)
  }

  test("2026: spanScrub stage applies exactly scrubSpansText to the " +
    "train split") {
    import graft.ops.{NearDup, Sources}
    val docs = Sources.table(spark, sf, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft-curs").toString
    val run = Pipelines.curationOver(spark, docs, None, out,
      spanScrub = Some(8))
    assert(run.trainDocs > 0)
    val baseline = java.nio.file.Files.createTempDirectory("graft-curb")
      .toString
    val runB = Pipelines.curationOver(spark, docs, None, baseline)
    // stage counts BEFORE the scrub are untouched by it
    assert((run.input, run.afterExactDedup, run.afterNearDedup,
      run.afterDecontamination, run.afterQuality) ==
      (runB.input, runB.afterExactDedup, runB.afterNearDedup,
        runB.afterDecontamination, runB.afterQuality))
    // mechanism: the packed text must BE scrubSpansText over the same
    // train universe (the baseline run's packed ids), with the digit
    // mask applied after — doc for doc. (Whether the tiny sf0.001
    // train set actually holds duplicated spans is the fixture's
    // business; scrub non-vacuity is pinned on crafted corpora in
    // Round13Spec. Empty-scrub drops would surface as a missing id.)
    val trainIds = spark.read.parquet(baseline).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected = NearDup.scrubSpansText(spark,
        docs.filter(col("doc_id").isInCollection(trainIds))
          .select("doc_id", "text"), 8)
      .select(col("doc_id"),
        regexp_replace(col("scrubbed_text"), "[0-9]{4,}", "<ID>")
          .as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val actual = spark.read.parquet(out).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(actual.keySet ==
      expected.filter(_._2.trim.nonEmpty).keySet)
    actual.foreach { case (id, text) =>
      assert(text == expected(id), s"doc $id text diverges from scrub")
    }
  }
}
