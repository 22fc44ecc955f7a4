package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the bench harness's round-11 meta-machinery: artifact
  * round ordering (what `definition_changed_since_best_prior` compares),
  * the bench_defs.json round trip, and the plan-fingerprint normalizer's
  * stability across scratch/testdata path churn. Pure JVM logic — the
  * fresh-JVM fork itself is exercised end-to-end by the bench runs. */
class BenchDefsSpec extends AnyFunSuite {

  test("roundNum orders artifacts: BENCH_r*, bench_out, bare labels, unknowns") {
    assert(Bench.roundNum("BENCH_r07.json", 10) == 7)
    assert(Bench.roundNum("BENCH_r10.json", 10) == 10)
    // bench_out.json is the latest committed round's full line
    assert(Bench.roundNum("bench_out.json", 10) == 10)
    assert(Bench.roundNum("r11", 10) == 11)
    assert(Bench.roundNum("r0", 10) == 0)   // pre-tracking sentinel
    assert(Bench.roundNum("garbage", 10) == 0)
    // the defChanged comparison this feeds: a change recorded in r11
    // postdates a best prior from r9, but not one from a current r11 run
    assert(Bench.roundNum("r11", 10) > Bench.roundNum("BENCH_r09.json", 10))
  }

  test("maxBenchRound finds the highest committed artifact") {
    val d = java.nio.file.Files.createTempDirectory("graft_benchdefs_").toString
    assert(Bench.maxBenchRound(d) == 0)
    for (n <- Seq("BENCH_r01.json", "BENCH_r10.json", "bench_out.json",
        "BENCH_r3.json", "notes.md"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, n), "{}")
    assert(Bench.maxBenchRound(d) == 10)
  }

  test("bench_defs round trip preserves fingerprints and since labels") {
    val p = java.nio.file.Files.createTempFile("graft_defs_", ".json")
    val defs = Map(
      "q_a" -> ("abc123", "r0"),
      "q_b" -> ("", "r10"),      // seeded: empty fp, back-recorded change
      "q_c" -> ("def456", "r11"))
    Bench.saveDefs(p, "r11", defs)
    assert(Bench.loadDefs(p) == defs)
    // a missing file is an empty baseline, not an error
    assert(Bench.loadDefs(java.nio.file.Paths.get("/nonexistent.json")).isEmpty)
  }

  test("plan fingerprint is stable across scratch paths, sensitive to plan changes") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    def viaScratch(prefix: String): org.apache.spark.sql.DataFrame = {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").parquet(d)
      spark.read.parquet(d)
    }
    val fp1 = Bench.planFingerprint(viaScratch("graft_fp_one_"))
    val fp2 = Bench.planFingerprint(viaScratch("graft_fp_two_"))
    assert(fp1.isDefined && fp1 == fp2,
      "same logical read through different /tmp dirs must fingerprint equal")
    val changed = Bench.planFingerprint(
      viaScratch("graft_fp_three_").filter($"id" > 1))
    assert(changed.isDefined && changed != fp1,
      "a plan change must change the fingerprint")
  }

  test("plan fingerprint ignores aggregate-instance identity hashes") {
    // TypedImperativeAggregate instances print with their JVM object hash
    // (graft.functions.TopKAgg@18b88f7) — two constructions of the SAME
    // aggregation must fingerprint equal (the r11 drift that mislabeled
    // 21 unchanged queries as definition-changed between bench runs)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    def agg() = Seq((1L, 0.5), (2L, 0.9)).toDF("id", "s")
      .groupBy($"id")
      .agg(graft.functions.TopK.topK(3)($"s", $"id").as("tk"))
    val a = Bench.planFingerprint(agg())
    val b = Bench.planFingerprint(agg())
    assert(a.isDefined && a == b,
      "identical aggregations must fingerprint equal across instances")
  }

  test("invalidCause classifies unvalidatable adjudication entries") {
    // ambient load trumps everything — the rerun window itself was dirty
    assert(Bench.invalidCause(0.5, 3.0, "fresh_jvm") == "ambient_load_at_rerun")
    // short query on a quiet host: the fork measured JVM warmup
    assert(Bench.invalidCause(0.5, 0.0, "fresh_jvm") == "fresh_jvm_warmup_floor")
    assert(Bench.invalidCause(1.9, 0.0, "fresh_jvm") == "fresh_jvm_warmup_floor")
    // long query, quiet host, in-session mode: the aged-JVM inflation
    assert(Bench.invalidCause(5.0, 0.0, "in_session") == "session_jvm_aging")
    // long query, quiet host, fresh JVM still slower: genuinely unexplained
    assert(Bench.invalidCause(5.0, 0.0, "fresh_jvm") == "unexplained_inversion")
  }

  test("normalization blanks LambdaVariable ids and sorts multicommutativeop operands (the two named toggle mechanisms)") {
    // (1) MapObjects deserializer ids: a JVM-global counter — 2 in a
    // fresh JVM, 2987 mid-suite (the r16 fp_drift catch for
    // x_multimodal_features) — must normalize to the same string
    val fresh = "mapobjects(lambdavariable(MapObject, ObjectType(class " +
      "java.lang.Object), true, 2), invoke(lambdavariable(MapObject, " +
      "ObjectType(class java.lang.Object), true, 2)), x, None)"
    val suite = fresh.replace(", 2)", ", 2987)")
    def lv(s: String) = Bench.rewriteCalls(s, "lambdavariable") { args =>
      if (args.nonEmpty && args.last.nonEmpty && args.last.forall(_.isDigit))
        args.init :+ "<lv>"
      else args
    }
    assert(lv(fresh) == lv(suite), s"${lv(fresh)} vs ${lv(suite)}")
    assert(lv(fresh).contains("<lv>"))
    // (2) commutative operand order: flips with the JVM identity hash of
    // the embedded Class ref (the x_text_stats catch) — both orders must
    // normalize identically; the trailing opClass + evalContext stay put
    val a = "multicommutativeop((0.2 * x), (0.3 * y), class Op, Some(Ctx))"
    val b = "multicommutativeop((0.3 * y), (0.2 * x), class Op, Some(Ctx))"
    def mc(s: String) = Bench.rewriteCalls(s, "multicommutativeop") { args =>
      if (args.length > 2) args.dropRight(2).sorted ++ args.takeRight(2)
      else args
    }
    assert(mc(a) == mc(b))
    assert(mc(a).endsWith("class Op, Some(Ctx))"))
    // nested calls normalize too
    val nested = s"f(${b}, $a)"
    assert(mc(nested) == s"f(${mc(b)}, ${mc(a)})")
  }
}
