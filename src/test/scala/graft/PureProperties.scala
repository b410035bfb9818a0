package graft

import graft.ops.Multimodal
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the engine's pure (driver-side) logic —
  * no SparkSession needed, so these run fast over many generated
  * cases. The Spark-side invariants (partition of valid/invalid,
  * dedup idempotence, session monotonicity) live in the ScalaTest
  * suites over real testdata.
  */
object PureProperties extends Properties("graft.pure") {

  // ---- Multimodal.decodeFeatures (the decoder contract) -------------

  private val bytesGen: Gen[Array[Byte]] =
    Gen.chooseNum(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  private val formatGen: Gen[String] =
    Gen.oneOf("png", "jpeg", "wav", "mp4", "bin")

  // random bytes are almost never a valid PNG/JPEG/WAV, so these also
  // exercise the corrupt-payload fallback path under every format tag
  property("decodeFeatures is 8-wide with values in [0,1]") =
    Prop.forAll(formatGen, bytesGen) { (fmt, media) =>
      val f = Multimodal.decodeFeatures(fmt, media)
      f.length == 8 && f.forall(x => x >= 0f && x <= 1f)
    }

  property("decodeFeatures is deterministic") =
    Prop.forAll(formatGen, bytesGen) { (fmt, media) =>
      Multimodal.decodeFeatures(fmt, media).toSeq ==
        Multimodal.decodeFeatures(fmt, media).toSeq
    }

  property("decodeFeatures handles null and empty payloads") = Prop {
    Multimodal.decodeFeatures("png", null).toSeq == Seq.fill(8)(0f) &&
    Multimodal.decodeFeatures("wav", Array.empty[Byte]).toSeq == Seq.fill(8)(0f)
  }

  property("real encoded payloads decode to real features") =
    Prop.forAll(Gen.chooseNum(0L, 100000L)) { id =>
      // encoded-image features carry the true 8x8 dims in f0/f1, which
      // the byte-slice fallback could only hit by coincidence
      val f = Multimodal.decodeFeatures("png", Multimodal.encodeImage(id, "png"))
      val w = Multimodal.decodeFeatures("wav", Multimodal.encodeWav(id, 64))
      f(0) == 8f / 256f && f(1) == 8f / 256f &&
        w(0) == 64f / 4096f && w(5) == 8000f / 48000f
    }

  // ---- Winnow (rolling-hash fingerprints, evaluated directly) -------

  private def winnowOf(s: String, k: Int = 6, w: Int = 3): Seq[Long] = {
    val out = graft.functions.Winnow(
      org.apache.spark.sql.catalyst.expressions.Literal(s), k, w)
      .eval(null)
    out.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  property("winnow is deterministic and empty below k") =
    Prop.forAll(textGen) { s =>
      val a = winnowOf(s)
      a == winnowOf(s) && (s.length >= 6 || a.isEmpty)
    }

  property("winnow fingerprint count is bounded by window count") =
    Prop.forAll(textGen) { s =>
      val a = winnowOf(s)
      val m = s.getBytes("UTF-8").length - 6 + 1
      a.size <= math.max(m, 0)
    }

  property("a shared long substring always shares a fingerprint") =
    Prop.forAll(Gen.listOfN(30, Gen.alphaChar).map(_.mkString),
      textGen, textGen) { (shared, p, q) =>
      // shared spans ≥ k+w−1 bytes → winnowing guarantees a common pick
      val a = winnowOf(p + shared + q).toSet
      val b = winnowOf(q + shared + p).toSet
      (a intersect b).nonEmpty
    }

  // ---- Quality.alerts (threshold logic, etl_2022.py:111-121) --------

  private val reportGen: Gen[Quality.QualityReport] = for {
    total <- Gen.chooseNum(1L, 1000000L)
    valid <- Gen.chooseNum(0L, total)
    nulls <- Gen.chooseNum(0L, 1000L)
    dups <- Gen.chooseNum(0L, 200L)
    outliers <- Gen.chooseNum(0L, 50L)
  } yield Quality.QualityReport(total, Map("c" -> nulls), dups, outliers,
    valid)

  property("alerts fire exactly when a threshold is crossed") =
    Prop.forAll(reportGen) { r =>
      val t = Quality.Thresholds()
      val a = Quality.alerts(r, t)
      val expectLow = r.validRate < t.minValidRate
      val expectNulls = r.nullCounts.values.sum > t.maxNulls
      val expectDups = r.dupRows > t.maxDups
      val expectOut = r.outlierRows > t.maxOutliers
      (a.exists(_.startsWith("low_valid_rate")) == expectLow) &&
      (a.exists(_.startsWith("high_null_count")) == expectNulls) &&
      (a.exists(_.startsWith("high_dup_count")) == expectDups) &&
      (a.exists(_.startsWith("high_outlier_count")) == expectOut) &&
      (a.size == Seq(expectLow, expectNulls, expectDups, expectOut)
        .count(identity))
    }

  property("validRate is within [0,1] and consistent with counts") =
    Prop.forAll(reportGen) { r =>
      r.validRate >= 0.0 && r.validRate <= 1.0 &&
      r.invalidRows == r.totalRows - r.validRows
    }

  // ---- ShingleHash (pure expression eval, no session) ----------------

  /** Small vocabulary on purpose: windows repeat, so the equality
    * structure (equal windows ⇔ equal hashes) is actually exercised,
    * including the token-boundary case ("ab","c") vs ("a","bc").
    */
  private val tokGen: Gen[List[String]] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "bc", "x")))

  private def shingleEval(toks: List[String], n: Int): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val e = graft.functions.ShingleHash(
      Literal.create(toks, ArrayType(StringType)), n)
    e.eval().asInstanceOf[ArrayData].toLongArray().toSeq
  }

  property("shingle hash count is max(0, m - n + 1)") =
    Prop.forAll(tokGen, Gen.chooseNum(1, 5)) { (toks, n) =>
      shingleEval(toks, n).length == math.max(0, toks.length - n + 1)
    }

  property("shingle hash equality mirrors token-window equality") =
    Prop.forAll(tokGen) { toks =>
      val n = 3
      val hs = shingleEval(toks, n)
      val ws = toks.sliding(n).filter(_.length == n).toVector
      hs.indices.forall(i => hs.indices.forall(j =>
        (hs(i) == hs(j)) == (ws(i) == ws(j))))
    }
}
