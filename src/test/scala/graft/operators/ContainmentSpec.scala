package graft.operators

import graft.SparkSpec

/** Containment invariants: directionality, identical-doc symmetry, and
  * the df-cap's effect on the kept shingle space. */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], maxDf: Int = Int.MaxValue) =
    Containment.pairs(rows.toDF("doc_id", "text"), shingleLen = 8,
        num = 4, den = 5, maxDf = maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))

  test("a prefix copy is contained in the full doc, not vice versa") {
    val a = "alpha beta gamma delta epsilon zeta"
    val b = a + " eta theta iota kappa lambda mu nu xi omicron pi rho sigma"
    val got = run(Seq((1L, a), (2L, b)))
    assert(got.length == 1)
    val (contained, container, bp) = got.head
    assert(contained == 1L && container == 2L)
    assert(bp == 10000L) // every shingle of the prefix appears in b
  }

  test("identical docs contain each other (both directions emitted)") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val got = run(Seq((1L, t), (2L, t))).toSet
    assert(got == Set((1L, 2L, 10000L), (2L, 1L, 10000L)))
  }

  test("unrelated docs emit nothing") {
    assert(run(Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (2L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss"))).isEmpty)
  }

  test("maxDf drops ubiquitous shingles from both intersection and sizes") {
    // Three docs share one 8-char boilerplate token; docs 1 and 2 are
    // otherwise disjoint. Uncapped, the shared boilerplate alone is a
    // small intersection (below threshold). With maxDf = 2 the
    // boilerplate shingles (df = 3) drop out entirely, so the 1-2
    // intersection becomes empty — and doc 3 (boilerplate + doc 1's
    // unique tail) is still contained in doc 1 over the KEPT space.
    val boiler = "BOILERPLA"
    val d1 = s"$boiler unique_one_alpha unique_one_beta unique_one_gamma"
    val d2 = s"$boiler other_two_alpha other_two_beta other_two_gamma"
    val d3 = s"$boiler unique_one_alpha"
    val capped = run(Seq((1L, d1), (2L, d2), (3L, d3)), maxDf = 2)
    assert(capped.forall { case (c, k, _) => Set((3L, 1L))((c, k)) },
      s"unexpected pairs: ${capped.mkString(",")}")
  }

  test("fused capped shape equals the join shape when the cap never binds") {
    // same corpus through both physical paths: maxDf = Int.MaxValue
    // takes the self-join, any finite cap takes the fused
    // collect_list + map-side pair generator — with a cap above every
    // df the kept shingle space is identical, so outputs must be
    // row-for-row equal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(run(docs, maxDf = Int.MaxValue - 1).sorted.toSeq ==
      run(docs).sorted.toSeq)
  }

  test("pairsAuto routes exact under budget and emits the identical result") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    var route = ""
    val auto = Containment.pairsAuto(docs, shingleLen = 8, num = 4, den = 5,
        maxDf = 200, onRoute = route = _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(route.contains("route=exact"), route)
    val exact = Containment.pairs(docs, shingleLen = 8, num = 4, den = 5,
        maxDf = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(auto.sorted.toSeq == exact.sorted.toSeq)
  }

  test("pairsAuto Route.ExactOrFail fails fast over budget, exact-identical under it") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // over budget: the pinned-exact route must THROW with the estimate,
    // never silently flip to banding-curve recall
    val ex = intercept[IllegalStateException] {
      Containment.pairsAuto(docs, shingleLen = 8, num = 4, den = 5,
        maxDf = 200, candidateBudget = 1L, onRoute = _ => (),
        route = Containment.Route.ExactOrFail).collect()
    }
    assert(ex.getMessage.contains("exceeds budget"), ex.getMessage)
    // under budget: identical rows to pairs()
    val strict = Containment.pairsAuto(docs, shingleLen = 8, num = 4, den = 5,
        maxDf = 200, onRoute = _ => (), route = Containment.Route.ExactOrFail)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exact = Containment.pairs(docs, shingleLen = 8, num = 4, den = 5, maxDf = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(strict.sorted.toSeq == exact.sorted.toSeq)
  }

  test("pairsAuto above budget takes the LSH route: precision 1.0, full recall on the mirror corpus") {
    // planted structure mirrors the rehearsal's: sources wrapped whole
    // in small boilerplate (high-Jaccard containments the banding
    // curve must catch); a forced 1-row budget exercises the routed
    // plan end-to-end at test scale
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    var route = ""
    val lsh = Containment.pairsAuto(docs, shingleLen = 8, num = 4, den = 5,
        maxDf = 200, candidateBudget = 1L, onRoute = route = _)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(route.contains("route=lsh"), route)
    val exact = Containment.pairs(docs, shingleLen = 8, num = 4, den = 5,
        maxDf = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exactSet = exact.toSet
    assert(lsh.forall(exactSet), // every routed pair verifies exactly
      s"false positives: ${lsh.filterNot(exactSet).take(3).mkString(",")}")
    // recall: the routed plan must find every exact pair here (testdata
    // containments are near-verbatim copies -> Jaccard well above the
    // banding knee)
    val lshSet = lsh.toSet
    assert(exact.forall(lshSet),
      s"missed: ${exact.filterNot(lshSet).take(5).mkString(",")}")
  }

  test("estimateCandidateRows equals the closed-form sum over the df histogram") {
    // 3 docs sharing one boilerplate token (df=3 -> C(3,2)=3 per
    // boilerplate shingle) plus doc-unique shingles (df=1 -> 0)
    val boiler = "BOILERPLA"
    val est = Containment.estimateCandidateRows(Seq(
        (1L, s"$boiler aaaa1111"), (2L, s"$boiler bbbb2222"),
        (3L, s"$boiler cccc3333")).toDF("doc_id", "text"),
      shingleLen = 8)
    // shingles of "BOILERPLA " prefix shared by all 3 docs: the first
    // 3 windows of each text are identical ("BOILERPL", "OILERPLA",
    // "ILERPLA ") -> 3 shingles at df=3 -> 9 candidate rows
    assert(est == 9L, s"got $est")
    // capping at maxDf=2 drops them all
    assert(Containment.estimateCandidateRows(Seq(
        (1L, s"$boiler aaaa1111"), (2L, s"$boiler bbbb2222"),
        (3L, s"$boiler cccc3333")).toDF("doc_id", "text"),
      shingleLen = 8, maxDf = 2) == 0L)
  }

  test("heavyShingles (two-phase pigeonhole) equals the full-histogram heavy set") {
    import org.apache.spark.sql.functions.{col, count, explode, lit}
    import graft.functions.TextFunctions
    // synthetic corpus with a genuinely heavy run: 300 docs share one
    // 12-char boilerplate (its shingles hit df=300 > caps below),
    // background shingles stay unique-ish. Also exercised on the real
    // documents table.
    val boiler = "HEAVYRUN9012"
    val synth = (1 to 300).map(i => (i.toLong, s"$boiler unique_tail_number_$i")) ++
      (301 to 340).map(i => (i.toLong, s"plain_text_body_$i with no shared run"))
    val corpora = Seq(
      synth.toDF("doc_id", "text"),
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text"))
    for (docs <- corpora; cap <- Seq(100, 200)) {
      val exploded = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          explode(TextFunctions.charShingleHashes(col("text"), 8)).as("s"))
      val expected = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > cap).select(col("s"))
        .collect().map(_.getLong(0)).toSet
      val got = Containment.heavyShingles(exploded, cap)
        .collect().map(_.getLong(0)).toSet
      assert(got == expected, s"cap=$cap: two-phase ${got.size} vs full ${expected.size}")
    }
    // small caps route to the histogram internally — still exact
    val small = synth.toDF("doc_id", "text")
    val ex = small.select(col("doc_id"),
      explode(TextFunctions.charShingleHashes(col("text"), 8)).as("s"))
    val expSmall = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 10).select(col("s")).collect().map(_.getLong(0)).toSet
    assert(Containment.heavyShingles(ex, 10)
      .collect().map(_.getLong(0)).toSet == expSmall)
  }

  test("matches brute-force set containment on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] =
      (if (t.length <= 8) Seq(t.take(8)) // greatest(len-7, 1) lower bound
       else (0 to t.length - 8).map(i => t.substring(i, i + 8))).toSet
    val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      inter = (sa & sb).size if inter * 5 >= sa.size * 4
    } yield (a, b, inter * 10000L / sa.size)).toSet
    val got = run(docs.toSeq).toSet
    assert(got == expected)
  }
}
