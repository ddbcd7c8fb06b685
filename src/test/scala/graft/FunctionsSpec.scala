package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Lifecycle}

/** Scalar-function parity specs: crc32 vs the JDK, log₂ binning boundary
  * exactness, ETag-of-ETags shape. */
class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("crc32Of matches java.util.zip.CRC32 bit-for-bit") {
    val inputs = Seq("", "a", "hello world", "warehouse/N/1/1.dat",
      "the quick brown fox", "éü中文")
    val got = inputs.toDF("s")
      .select(col("s"), Lifecycle.crc32Of(col("s")).as("c"))
      .as[(String, Long)].collect().toMap
    inputs.foreach { s =>
      val j = new java.util.zip.CRC32
      j.update(s.getBytes("UTF-8"))
      assert(got(s) === j.getValue, s"crc32('$s')")
    }
  }

  test("pow2Bin is exact on power-of-two boundaries (incl. the float-log2 trap at 2^29)") {
    val cases = Seq(
      0L -> 1024L, 1L -> 1024L, 1023L -> 1024L, 1024L -> 1024L,
      1025L -> 2048L, 2048L -> 2048L, 2049L -> 4096L,
      (1L << 29) -> (1L << 29), (1L << 29) + 1 -> (1L << 30),
      (1L << 40) -> (1L << 40), (1L << 40) + 1 -> (1L << 41))
    val got = cases.map(_._1).toDF("data_size")
      .select(col("data_size"), Aggregates.pow2Bin("data_size", 1024L).as("bin"))
      .as[(Long, Long)].collect().toMap
    cases.foreach { case (in, want) => assert(got(in) === want, s"bin($in)") }
  }

  test("parquet round-trip preserves the driver-gate rendering edges") {
    // Retired q_dbg_bigint_sum / q_dbg_render_edges (r9 driver-gate
    // rendering pins) live on here: the oracle-TYPE class is guarded by
    // tools/oracle_check.py's TYPELINT; this spec pins the Spark side —
    // the exact value classes the gate canonicalizes (booleans incl.
    // NULL, negative/zero/Long.MaxValue bigints, empty-vs-NULL string)
    // must survive a parquet round-trip bit-for-bit and type-for-type.
    val df = spark.sql("""SELECT * FROM VALUES
      (1L, true,  CAST(-5 AS BIGINT), ''),
      (2L, false, CAST(0 AS BIGINT), 'a;b'),
      (3L, CAST(NULL AS BOOLEAN), 9223372036854775807L,
       CAST(NULL AS STRING))
      AS t(id, flag, n, s) ORDER BY id""")
    val out = graft.core.TempDirs.create("graft_renderpin_")
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).orderBy("id")
    assert(back.schema.map(f => (f.name, f.dataType.sql)) ===
      Seq("id" -> "BIGINT", "flag" -> "BOOLEAN", "n" -> "BIGINT",
        "s" -> "STRING"))
    val r = rows(back)
    assert(r === Seq(
      Seq(1L, true, -5L, ""),
      Seq(2L, false, 0L, "a;b"),
      Seq(3L, null, Long.MaxValue, null)))
    // empty string and NULL remain DISTINCT values after the round-trip
    assert(r(0)(3) != r(2)(3))
    // the cast-sum pin: a grouped long sum stays BIGINT-exact
    val sums = spark.range(100).selectExpr("id % 5 AS grp", "id AS r")
      .groupBy("grp").agg(sum(col("r")).as("s")).orderBy("grp")
    assert(rows(sums) === (0L to 4L).map(g =>
      Seq(g, (0L until 100L).filter(_ % 5 == g).sum)))
  }

  test("multipart ETag-of-ETags is md5(concat(part etags)) || '-' || n") {
    val parts = Seq(
      ("u1", 1L, 1, "aaa", 5L), ("u1", 1L, 2, "bbb", 6L),
      ("u2", 2L, 1, "ccc", 7L))
      .toDF("upload_id", "order_key", "part_number", "etag", "size")
    val got = rows(Lifecycle.multipartEtag(parts))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got === Seq(
      Seq("u1", md5hex("aaabbb") + "-2"),
      Seq("u2", md5hex("ccc") + "-1")))
  }

  test("multipart validation flags gaps and counts parts") {
    val parts = Seq(
      ("u1", 1L, 1, "a", 5L), ("u1", 1L, 2, "b", 6L), // valid
      ("u2", 2L, 1, "c", 7L), ("u2", 2L, 3, "d", 8L)) // gap: part 2 missing
      .toDF("upload_id", "order_key", "part_number", "etag", "size")
    val r = rows(Lifecycle.multipartValidate(parts)
      .select("upload_id", "num_parts", "is_valid"))
    assert(r === Seq(Seq("u1", 2L, true), Seq("u2", 2L, false)))
  }

  test("graft_dot_long matches the HOF dual incl. NULL/length semantics") {
    import org.apache.spark.sql.functions.expr
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),      // 4+10+18 = 32
      (2L, Seq(-7L, 0L), Seq(3L, 9L)),             // -21
      (3L, Seq(1L, 2L), Seq(1L, 2L, 3L)),          // length mismatch -> NULL
      (4L, Seq.empty[Long], Seq.empty[Long]))      // empty -> 0
      .toDF("id", "a", "b")
    val both = df.select(
      expr("graft_dot_long(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), " +
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("hof"))
      .collect()
    for (r <- both) assert(r.get(0) === r.get(1))
    assert(both.map(_.get(0)).toSeq === Seq(32L, -21L, null, 0L))
    // null element and null array both yield NULL (matching zip_with pad)
    val nulls = df.sparkSession.sql(
      """SELECT graft_dot_long(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS e,
        |       graft_dot_long(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n""".stripMargin)
      .collect().head
    assert(nulls.get(0) === null && nulls.get(1) === null)
    // interpreted path (no codegen) agrees with the codegen'd one
    val interp = graft.functions.ArrayDotLong(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 2L, 3L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4L, 5L, 6L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      .eval(null)
    assert(interp === 32L)
  }

  test("graft_hmac reproduces the RFC 4231 HMAC-SHA256 test vectors") {
    import org.apache.spark.sql.functions.{expr, lit, lower, hex}
    // RFC 4231 case 1: key = 0x0b x20, data = "Hi There"
    val df = Seq(1).toDF("x")
      .withColumn("k", expr(s"unhex('${"0b" * 20}')"))
      .withColumn("sig", lower(hex(expr("graft_hmac(k, 'Hi There')"))))
    assert(df.select("sig").head.getString(0) ===
      "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7")
    // RFC 4231 case 2: key = "Jefe", data = "what do ya want for nothing?"
    val c2 = Seq(1).toDF("x")
      .withColumn("sig", lower(hex(expr(
        "graft_hmac(cast('Jefe' AS BINARY), 'what do ya want for nothing?')"))))
    assert(c2.select("sig").head.getString(0) ===
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
    // NULL propagation
    val n = spark.sql("SELECT graft_hmac(CAST(NULL AS BINARY), 'x') AS a, " +
      "graft_hmac(cast('k' AS BINARY), CAST(NULL AS STRING)) AS b")
      .head
    assert(n.get(0) === null && n.get(1) === null)
  }

  test("sigv4Verify verdicts: valid, corrupted, unknown access id") {
    import graft.operators.S3Ops
    val secrets = Seq(("id1", "topsecret")).toDF("access_id", "secret")
    val sts = "AWS4-HMAC-SHA256\n20240101T000000Z\n" +
      "20240101/us-east-1/s3/aws4_request\nabc123"
    // independent signer: plain javax.crypto, no engine code
    def hmac(key: Array[Byte], msg: String): Array[Byte] = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      mac.doFinal(msg.getBytes("UTF-8"))
    }
    val kSigning = hmac(hmac(hmac(hmac("AWS4topsecret".getBytes("UTF-8"),
      "20240101"), "us-east-1"), "s3"), "aws4_request")
    val good = hmac(kSigning, sts).map("%02x".format(_)).mkString
    val reqs = Seq(("id1", sts, good), ("id1", sts, "deadbeef"),
      ("ghost", sts, good)).toDF("access_id", "str_to_sign", "signature")
    val got = S3Ops.sigv4Verify(reqs, secrets)
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("ghost", "NO_SECRET"), ("id1", "MATCH"),
      ("id1", "MISMATCH")))
  }

  test("quota admission: bytes precede namespace; -1 disables a check") {
    import spark.implicits._
    val buckets = Seq(
      // (bytes quota, used, ns quota, used ns)
      ("v", "roomy", 1000L, 100L, 10L, 3L),
      ("v", "tightb", 1000L, 950L, 10L, 3L),
      ("v", "tightn", 1000L, 100L, 10L, 10L),
      ("v", "both", 1000L, 950L, 10L, 10L),
      ("v", "nolimit", -1L, 999999L, -1L, 999999L))
      .toDF("volume", "bucket", "quota_bytes", "used_bytes",
        "quota_namespace", "used_namespace")
    val reqs = Seq(("v", "roomy", "k", 100L), ("v", "tightb", "k", 100L),
      ("v", "tightn", "k", 100L), ("v", "both", "k", 100L),
      ("v", "nolimit", "k", 100L), ("v", "tightb", "fits", 50L))
      .toDF("volume", "bucket", "key", "allocate_bytes")
    val got = graft.operators.Aggregates.quotaEnforce(reqs, buckets)
      .collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getAs[String]("decision"))
      .toMap
    assert(got(("roomy", "k")) === "ALLOWED")
    assert(got(("tightb", "k")) === "QUOTA_BYTES_EXCEEDED")
    assert(got(("tightb", "fits")) === "ALLOWED")
    assert(got(("tightn", "k")) === "QUOTA_NAMESPACE_EXCEEDED")
    // bytes check fires first when both would reject
    assert(got(("both", "k")) === "QUOTA_BYTES_EXCEEDED")
    // QUOTA_RESET (-1) disables both checks regardless of usage
    assert(got(("nolimit", "k")) === "ALLOWED")
  }

  test("Crc32Combine.combine == JDK CRC32 of concatenation over 300 " +
    "random splits") {
    import graft.functions.Crc32Combine
    def jdk(bytes: Array[Byte]): Long = {
      val c = new java.util.zip.CRC32(); c.update(bytes); c.getValue
    }
    val rnd = new scala.util.Random(424242)
    for (_ <- 0 until 300) {
      val whole = Array.fill(1 + rnd.nextInt(500))(rnd.nextInt.toByte)
      // split into 1..6 ordered chunks at random cut points
      val cuts = (Seq(0, whole.length) ++
        Seq.fill(rnd.nextInt(5))(rnd.nextInt(whole.length + 1)))
        .distinct.sorted
      val chunks = cuts.zip(cuts.tail).map { case (a, b) =>
        whole.slice(a, b) }
      val composed = Crc32Combine.compose(
        chunks.map(c => (jdk(c), c.length.toLong)))
      assert(composed === jdk(whole), s"len ${whole.length} cuts $cuts")
    }
    // empty-suffix identity and zero-length guard
    assert(Crc32Combine.combine(123456789L, 0L, 0L) === 123456789L)
  }

  test("graft_hash60 == CAST(conv(substring(md5(x),1,15),16,10) AS " +
    "BIGINT) bit-for-bit") {
    // the native expression replaces the hex-prefix SQL chain on the
    // engine side; the DuckDB oracles keep the SQL form — this pin is
    // what makes that split safe. Inputs cover the hash's live domains:
    // shingles, paragraphs, normalized docs, cast ids, unicode, empty,
    // long strings, and 2000 random ASCII/unicode draws.
    val rnd = new scala.util.Random(60)
    val fixed = Seq("", "a", "warehouse/N/1/1.dat", "the quick brown fox",
      "éü中文 — emoji 😀", "rep0 rep1 rep2", " leading space",
      "x" * 5000, "\t\n mixed nul")
    val random = (1 to 2000).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => (if (rnd.nextBoolean()) rnd.nextPrintableChar()
        else (0x4e00 + rnd.nextInt(100)).toChar)).mkString
    }
    val df = (fixed ++ random).toDF("s").select(col("s"),
      expr("graft_hash60(s)").as("native"),
      expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)")
        .as("sql"))
    assert(df.filter(col("native") =!= col("sql")).isEmpty)
    // all values are non-negative 60-bit (the conv parse is unsigned)
    assert(df.filter(col("native") < 0 ||
      col("native") >= (1L << 60)).isEmpty)
    // the object path (interpreted eval) agrees with an INDEPENDENT
    // JVM derivation: md5 → hex string → parse 15 chars — the literal
    // reading of the SQL chain, no Spark involved
    fixed.foreach { s =>
      val viaObj = graft.functions.Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(15)
      assert(viaObj === java.lang.Long.parseLong(hex, 16), s"input '$s'")
    }
    // NULL in → NULL out, same as the SQL chain
    assert(Seq[Option[String]](None).toDF("s")
      .selectExpr("graft_hash60(s)").head.isNullAt(0))
  }

  test("graft_isect_sorted == size(array_intersect(a,b)) on sorted " +
    "distinct arrays, 500 random draws + edges") {
    // the native sorted-merge count replaces size(array_intersect) in
    // the jaccard verification; inputs there are array_sort(collect_set)
    // products — sorted, distinct, non-null. The arrays are sorted by
    // SPARK's order (array_sort) inside the query, not by JVM String
    // order, so the pin exercises exactly the production byte ordering
    // (they differ above U+D7FF).
    val rnd = new scala.util.Random(1014)
    def tok() = {
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => (if (rnd.nextBoolean()) rnd.nextPrintableChar()
        else (0x4e00 + rnd.nextInt(80)).toChar)).mkString
    }
    val rows = (1 to 500).map { i =>
      val pool = (1 to 30).map(_ => tok()).distinct
      val a = rnd.shuffle(pool).take(rnd.nextInt(pool.size + 1))
      val b = rnd.shuffle(pool).take(rnd.nextInt(pool.size + 1))
      (i, a, b)
    } ++ Seq(
      (1001, Seq.empty[String], Seq.empty[String]),      // empty -> 0
      (1002, Seq("x"), Seq.empty[String]),               // one empty -> 0
      (1003, Seq("a", "b"), Seq("c", "d")),              // disjoint -> 0
      (1004, Seq("a", "b", "c"), Seq("a", "b", "c")),    // identical
      (1005, Seq("b"), Seq("a", "b", "c")))              // subset
    val df = rows.toDF("id", "ra", "rb")
      .select(col("id"),
        expr("array_sort(array_distinct(ra))").as("a"),
        expr("array_sort(array_distinct(rb))").as("b"))
      .select(
        expr("graft_isect_sorted(a, b)").as("native"),
        expr("CAST(size(array_intersect(a, b)) AS BIGINT)").as("builtin"))
    // null-safe inequality: a kernel regression that wrongly yields NULL
    // must FAIL this gate, not slip through a null-swallowing =!=
    assert(df.filter(!(col("native") <=> col("builtin"))).isEmpty)
    // NULL array -> NULL; a NULL element ENCOUNTERED by the merge ->
    // NULL (defensive — engine sets never carry one); a trailing NULL
    // past the shorter side's exhaustion is never inspected
    val nulls = spark.sql(
      """SELECT graft_isect_sorted(CAST(NULL AS ARRAY<STRING>),
        |         array('a')) AS na,
        |       graft_isect_sorted(array('a', CAST(NULL AS STRING)),
        |         array('b')) AS ne,
        |       graft_isect_sorted(array('a', CAST(NULL AS STRING)),
        |         array('a')) AS nt""".stripMargin).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    assert(nulls.getLong(2) === 1L) // tail NULL unreached by design
    // interpreted path (no codegen) agrees
    val at = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType)
    val interp = graft.functions.IntersectCountSorted(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "b", "d"), at),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("b", "c", "d", "e"), at)).eval(null)
    assert(interp === 2L)
  }

  test("graft_isect_sorted ARRAY<BIGINT> form (the dict-encoded " +
    "verification shape) == size(array_intersect), 500 random draws") {
    // ngramJaccardPairs runs the kernel over dictionary term-id arrays;
    // ids from monotonically_increasing_id are sparse 64-bit values, so
    // draws cover full-range longs incl. negatives and Long.MinValue
    val rnd = new scala.util.Random(2027)
    val rows = (1 to 500).map { i =>
      val pool = (1 to 40).map(_ => rnd.nextLong() >> rnd.nextInt(48))
        .distinct
      val a = rnd.shuffle(pool).take(rnd.nextInt(pool.size + 1))
      val b = rnd.shuffle(pool).take(rnd.nextInt(pool.size + 1))
      (i, a, b)
    } ++ Seq(
      (1001, Seq.empty[Long], Seq(1L, 2L)),
      (1002, Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue)))
    val df = rows.toDF("id", "ra", "rb")
      .select(col("id"),
        expr("array_sort(array_distinct(ra))").as("a"),
        expr("array_sort(array_distinct(rb))").as("b"))
      .select(
        expr("graft_isect_sorted(a, b)").as("native"),
        expr("CAST(size(array_intersect(a, b)) AS BIGINT)").as("builtin"))
    assert(df.filter(!(col("native") <=> col("builtin"))).isEmpty)
    // interpreted path
    val at = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType)
    val interp = graft.functions.IntersectCountSorted(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(-5L, 1L, 7L), at),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(-5L, 2L, 7L, 9L), at)).eval(null)
    assert(interp === 2L)
    // mixed element types refuse analysis
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_isect_sorted(array(1L), array('a'))")
        .collect()
    }
    assert(err.getMessage.contains("graft_isect_sorted"))
  }

  test("graft_minhash16 == the explode + 16 min() SQL form bit-for-bit " +
    "over random word arrays") {
    // the native one-pass signature replaces the per-shingle explode on
    // the engine side; the DuckDB oracles keep the SQL form — this pin
    // is what makes that split safe. Inputs: random word arrays with
    // heavy repeats (min over duplicate shingles must be idempotent),
    // unicode words, 2-word minimum, long docs.
    import graft.functions.TextFns.{P, permA, permB}
    val rnd = new scala.util.Random(1616)
    val vocab = Vector("alpha", "beta", "gamma", "δέλτα", "中文词",
      "x", "longertoken999", "a b", "", "UPPER")
    val rows = (1 to 300).map { i =>
      val n = 2 + rnd.nextInt(60)
      (i, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("doc_id", "ws")
    val sqlMins = (0 until 16).map(i =>
      s"min((${permA(i)} * hmod + ${permB(i)}) % $P) AS mh$i").mkString(", ")
    df.selectExpr("doc_id",
        "explode(transform(sequence(0, size(ws) - 2), " +
          "i -> array_join(slice(ws, i + 1, 2), ' '))) AS s")
      .selectExpr("doc_id",
        s"CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % $P " +
          "AS hmod")
      .createOrReplaceTempView("sh")
    val sqlSig = spark.sql(s"SELECT doc_id, $sqlMins FROM sh GROUP BY 1")
    val nativeSig = df.selectExpr("doc_id" +: (0 until 16).map(i =>
      s"element_at(graft_minhash16(ws), ${i + 1}) AS mh$i"): _*)
    val joined = nativeSig.as("n").join(sqlSig.as("q"), "doc_id")
    val mismatched = (0 until 16).map(i =>
      joined.filter(!(col(s"n.mh$i") <=> col(s"q.mh$i"))).count()).sum
    assert(mismatched === 0L)
    // <2 words -> NULL (engine filters size >= 2 first; pinned anyway),
    // NULL array -> NULL, NULL element -> NULL
    val edge = spark.sql(
      """SELECT graft_minhash16(array('solo')) AS one,
        |       graft_minhash16(CAST(NULL AS ARRAY<STRING>)) AS na,
        |       graft_minhash16(array('a', CAST(NULL AS STRING))) AS ne
        |""".stripMargin).collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    // interpreted path agrees with the codegen'd one on a known doc
    val viaObj = graft.functions.MinHash16.sig(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(org.apache.spark.unsafe.types.UTF8String.fromString("the"),
          org.apache.spark.unsafe.types.UTF8String.fromString("quick"),
          org.apache.spark.unsafe.types.UTF8String.fromString("fox"))))
    val viaDf = Seq((1, Seq("the", "quick", "fox"))).toDF("id", "ws")
      .selectExpr("graft_minhash16(ws) AS mh").head.getSeq[Long](0)
    assert(viaObj.toLongArray().toSeq === viaDf)
  }

  test("graft_simhash == the explode + 60 signed-sum SQL form " +
    "bit-for-bit over random word arrays") {
    // the native one-pass signature replaces the per-token explode on
    // the engine side; the DuckDB oracles keep the SQL form. Bit rule:
    // strictly-positive count sets the bit, a TIE clears it — even-length
    // docs (planted below) exercise ties.
    val rnd = new scala.util.Random(6060)
    val vocab = Vector("alpha", "beta", "gamma", "中文", "", "x", "UPPER")
    val rows = (1 to 200).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i, (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))))
    } :+ ((201, Seq("a", "b"))) // guaranteed even-length tie candidate
    val df = rows.toDF("doc_id", "ws")
    df.selectExpr("doc_id", "explode(ws) AS t")
      .selectExpr("doc_id",
        "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS h")
      .createOrReplaceTempView("simtoks")
    val sums = (0 until 60).map(j =>
      s"sum(CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END) " +
        s"AS s$j").mkString(", ")
    val bits = (0 until 60).map(j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    val viaSql = spark.sql(
      s"SELECT doc_id, CAST($bits AS BIGINT) AS sh FROM " +
        s"(SELECT doc_id, $sums FROM simtoks GROUP BY 1)")
    val viaNative = df.selectExpr("doc_id", "graft_simhash(ws) AS sh")
    assert(viaNative.as("n").join(viaSql.as("q"), "doc_id")
      .filter(!(col("n.sh") <=> col("q.sh"))).isEmpty)
    // empty array -> NULL (explode form emits no row), NULL array ->
    // NULL, NULL element -> NULL
    val edge = spark.sql(
      """SELECT graft_simhash(CAST(array() AS ARRAY<STRING>)) AS e,
        |       graft_simhash(CAST(NULL AS ARRAY<STRING>)) AS na,
        |       graft_simhash(array('a', CAST(NULL AS STRING))) AS ne
        |""".stripMargin).collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    // interpreted path agrees with codegen
    val viaObj = graft.functions.SimHash60.sig(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(org.apache.spark.unsafe.types.UTF8String.fromString("the"),
          org.apache.spark.unsafe.types.UTF8String.fromString("quick"))))
    val viaDf = Seq((1, Seq("the", "quick"))).toDF("id", "ws")
      .selectExpr("graft_simhash(ws) AS sh").head.getLong(0)
    assert(viaObj.longValue() === viaDf)
  }
}
