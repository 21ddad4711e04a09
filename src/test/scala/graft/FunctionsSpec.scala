package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Custom codegen expressions: cosine_similarity + text_fingerprint,
  * through both the Column API (GraftBridge path) and SQL registration. */
class FunctionsSpec extends AnyFunSuite {

  private def vecDf = {
    val spark = TestSpark.spark
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    spark.createDataFrame(
      java.util.List.of(
        Row(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal -> 0
        Row(Seq(1.0f, 2.0f), Seq(2.0f, 4.0f)),   // parallel -> 1
        Row(Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)),  // opposite -> -1
        Row(Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)),   // zero norm -> null
        Row(Seq(1.0f), Seq(1.0f, 1.0f)),         // length mismatch -> null
        Row(null, Seq(1.0f))),                   // null input -> null
      schema)
  }

  test("cosine_similarity: known geometries via the Column API") {
    val got = vecDf
      .select(round(GraftFunctions.cosine_similarity(col("a"), col("b")), 6).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(0.0), Some(1.0), Some(-1.0), None, None, None))
  }

  test("cosine_similarity: interpreted eval agrees with codegen") {
    val spark = TestSpark.spark
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val got = vecDf
        .select(round(GraftFunctions.cosine_similarity(col("a"), col("b")), 6).as("c"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
      assert(got == Seq(Some(0.0), Some(1.0), Some(-1.0), None, None, None))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("text_fingerprint: deterministic, matches the reference rolling hash") {
    val spark = TestSpark.spark
    import spark.implicits._
    def manual(s: String): Long = {
      var h = 1125899906842597L
      s.getBytes("UTF-8").foreach(b => h = 31L * h + b)
      h
    }
    val got = Seq("hello world", "", "hello world", "héllo")
      .toDF("t").select(GraftFunctions.text_fingerprint(col("t"))).as[Long].collect()
    assert(got(0) == manual("hello world"))
    assert(got(1) == manual(""))
    assert(got(2) == got(0))
    assert(got(3) == manual("héllo"))
  }

  test("bloom_might_contain: no false negatives vs stat.bloomFilter, codegen == interpreted") {
    val spark = TestSpark.spark
    import spark.implicits._
    val members = (0 until 2000).map(i => s"gram-$i word-$i")
    val bloom = members.toDF("g").stat.bloomFilter("g", members.size.toLong, 0.01)
    val probes = (members ++ (0 until 2000).map(i => s"absent-$i")).toDF("g")
    def run() = probes
      .select(col("g"), GraftFunctions.bloom_might_contain(col("g"), bloom).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val codegen = run()
    // the hard contract: every inserted member MUST probe true (a hashing
    // mismatch between putBinary at build and mightContainBinary at probe
    // would show up here as a false negative)
    members.foreach(m => assert(codegen(m), s"false negative for inserted member '$m'"))
    // fpp sanity: absent keys should mostly miss (1% fpp, 2000 draws)
    val fp = (0 until 2000).count(i => codegen(s"absent-$i"))
    assert(fp < 100, s"false-positive rate implausibly high: $fp/2000 at fpp=0.01")
    // the TRUE interpreted leg: disabling whole-stage codegen still
    // compiles non-whole-stage projections, so call nullSafeEval directly
    // through Expression.eval on literal inputs — this is the path a
    // fallback (codegen-failed / interpreted-mode) projection takes
    val interpreted = (members ++ (0 until 2000).map(i => s"absent-$i")).map { g =>
      val e = graft.functions.BloomContains(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(g),
          org.apache.spark.sql.types.StringType), bloom)
      g -> e.eval(null).asInstanceOf[Boolean]
    }.toMap
    assert(interpreted == codegen, "Expression.eval must agree with codegen")
    // and null in → null out on the interpreted path
    assert(graft.functions.BloomContains(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.StringType), bloom).eval(null) == null)
  }

  test("pq_encode: packs L2-nearest subspace codes; codegen == interpreted; null contract") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 2 subspaces × 2 dims, hand-placed codewords: subspace 0 has codes
    // at (0,0),(10,0),(0,10); subspace 1 at (1,1),(-1,-1)
    val codebooks: Array[Array[Array[Float]]] = Array(
      Array(Array(0f, 0f), Array(10f, 0f), Array(0f, 10f)),
      Array(Array(1f, 1f), Array(-1f, -1f)))
    // (9,1 | -2,-2): sub0 nearest = code 1 (10,0); sub1 nearest = code 1
    // → packed = 1 | 1<<4 = 17. (0,9 | 2,2): sub0 → 2, sub1 → 0 → 2.
    val rows = Seq(
      Some(Seq(9f, 1f, -2f, -2f)), Some(Seq(0f, 9f, 2f, 2f)),
      Some(Seq(1f, 1f, 1f)), // wrong dim → null
      None)
    val got = rows.toDF("v")
      .select(GraftFunctions.pq_encode(col("v"), codebooks).as("pq"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got == Seq(Some(17), Some(2), None, None))
    // interpreted leg: Expression.eval on literals agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    def evalOf(v: Seq[Float]): Any = graft.functions.PqEncode(
      Literal(ArrayData.toArrayData(v.toArray), ArrayType(FloatType)),
      codebooks).eval(null)
    assert(evalOf(Seq(9f, 1f, -2f, -2f)) == 17)
    assert(evalOf(Seq(0f, 9f, 2f, 2f)) == 2)
    assert(evalOf(Seq(1f, 1f, 1f)) == null)
  }

  test("GraftExtensions installer registers the functions a session builder would see") {
    // spark.sql.extensions is a STATIC conf (applied when the
    // SparkContext starts), so a sibling test session can't exercise it;
    // drive the same hook the session-state builder uses instead
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val spark = TestSpark.spark
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val registry = spark.sessionState.functionRegistry.clone()
    org.apache.spark.sql.GraftBridge.applyExtensionFunctions(ext, registry)
    assert(registry.functionExists(FunctionIdentifier("cosine_similarity")))
    assert(registry.functionExists(FunctionIdentifier("text_fingerprint")))
    // the registered builder produces a working expression
    val expr = registry.lookupFunction(FunctionIdentifier("text_fingerprint"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal("abc")))
    val got = expr.eval(null).asInstanceOf[Long]
    var h = 1125899906842597L
    "abc".getBytes("UTF-8").foreach(b => h = 31L * h + b)
    assert(got == h)
  }

  test("Misra-Gries sketch: heavy term survives adversarial skew at tiny capacity") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 400 occurrences of the heavy term buried in 600 singleton terms;
    // capacity 8 << 601 distinct terms forces constant collapses
    val terms = Seq.fill(400)("heavy") ++ (0 until 600).map(i => s"rare_$i")
    // deterministic interleave so the heavy term isn't one contiguous run
    val stream = terms.zipWithIndex.sortBy { case (t, i) => (i * 7919) % 1000 }.map(_._1)
    val sk = stream.toDF("term")
      .repartition(4) // exercise partial sketches + merge, not one reduce
      .agg(graft.functions.MisraGries.sketch(col("term"), 8).as("sk"))
      .as[Map[String, Long]].head()
    // guarantee: any term with cf > N/(m+1) = 1000/9 ≈ 111 must survive
    assert(sk.contains("heavy"), s"guaranteed heavy hitter evicted: $sk")
    assert(sk.size <= 8, s"sketch exceeded capacity: ${sk.size}")
    // reported count is a lower bound within N/(m+1) of the truth
    val c = sk("heavy")
    assert(c <= 400 && c >= 400 - 1000 / 9, s"count bound violated: $c")
  }

  test("shingle generator matches the relational explode+substr formulation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq((1L, "abcdefg"), (2L, "abc"), (3L, null.asInstanceOf[String]), (4L, "xxxxx"))
      .toDF("doc_id", "text")
    val viaGenerator = docs
      .select(col("doc_id"), GraftFunctions.shingles(col("text"), 5).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaExplode = docs
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("i"), col("text"))
      .select(col("doc_id"), col("text").substr(col("i"), lit(5)).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(viaGenerator.nonEmpty)
    assert(viaGenerator == viaExplode,
      s"generator and relational paths drifted:\n$viaGenerator\n$viaExplode")
    // short and null inputs generate zero rows
    assert(!viaGenerator.exists(t => t._1 == 2L || t._1 == 3L))
  }

  test("dedup shingle generator equals explode+substr+distinct (the r16 shuffle-free shape)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // repeats inside a row ("ababab…") exercise the per-row dedup;
    // multiple rows sharing shingles pin that dedup stays PER ROW
    val docs = Seq((1L, "abababababab"), (2L, "abababab"), (3L, "abcdefgh"),
      (4L, null.asInstanceOf[String]), (5L, "abc"), (6L, "xxxxx"))
      .toDF("doc_id", "text")
    val viaGenerator = docs
      .select(col("doc_id"), GraftFunctions.shingles_distinct(col("text"), 5).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaDistinct = docs
      .filter(length(col("text")) >= 5)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - 4)).as("i"), col("text"))
      .select(col("doc_id"), col("text").substr(col("i"), lit(5)).as("g"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(viaGenerator.nonEmpty)
    assert(viaGenerator == viaDistinct,
      s"dedup generator and distinct paths drifted:\n$viaGenerator\n$viaDistinct")
  }

  test("word-gram generator equals explode+slice+array_join+distinct") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b"),          // repeated grams within the row
      (2L, "one two three"),            // shorter than n → zero rows
      (3L, "w x  y z double  space q"), // consecutive spaces → empty tokens
      (4L, null.asInstanceOf[String]),
      (5L, (1 to 12).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val n = 4
    val viaGenerator = docs
      .select(col("doc_id"), GraftFunctions.word_grams_distinct(col("text"), n).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaDistinct = docs
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= n)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("l")) - (n - 1))).as("i"), col("l"))
      .select(col("doc_id"), array_join(slice(col("l"), col("i"), lit(n)), " ").as("g"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(viaGenerator.nonEmpty)
    assert(viaGenerator == viaDistinct,
      s"word-gram generator and relational paths drifted:\n$viaGenerator\n$viaDistinct")
  }

  test("SQL registration: both functions callable from spark.sql") {
    val spark = TestSpark.spark
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c,
        |       text_fingerprint('abc') AS f""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(r.getLong(1) != 0L)
  }
}
