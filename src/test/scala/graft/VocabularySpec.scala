package graft

import graft.text.Vocabulary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BPE merge-application equivalence spec the Vocabulary scaladoc
  * cites: the Column left-fold ([[Vocabulary.mergeApply]]), the oracle's
  * chain-parity formulation (occurrence chains, keep odd members), and a
  * plain greedy left-to-right scan must agree on adversarial run cases —
  * plus the batched-selection disjointness rules that keep
  * [[Vocabulary.batchMergeApply]] chain-free.
  */
class VocabularySpec extends AnyFunSuite with SparkTestBase {

  /** Reference 1: canonical greedy left-to-right scan, non-overlapping. */
  private def greedyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Reference 2: the oracle's chain-parity formulation — mark occurrence
    * positions, group consecutive occurrences into chains, select the odd
    * members of each chain, emit merged symbols at selected positions and
    * drop the position after each selection.
    */
  private def chainParity(syms: Seq[String], a: String, b: String): Seq[String] = {
    val occ = syms.indices.map(i =>
      i + 1 < syms.length && syms(i) == a && syms(i + 1) == b)
    val sel = Array.fill(syms.length)(false)
    var i = 0
    while (i < syms.length) {
      if (occ(i)) {
        var j = i
        var k = 0
        while (j < syms.length && occ(j)) {
          if (k % 2 == 0) sel(j) = true
          j += 1; k += 1
        }
        i = j
      } else i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var prevSel = false
    for (p <- syms.indices) {
      if (!prevSel) out += (if (sel(p)) a + b else syms(p))
      prevSel = sel(p)
    }
    out.toSeq
  }

  private def foldApply(syms: Seq[String], a: String, b: String): Seq[String] = {
    import spark.implicits._
    Seq(syms).toDF("syms")
      .select(Vocabulary.mergeApply(col("syms"), a, b).as("m"))
      .collect().head.getSeq[String](0)
  }

  test("fold == chain-parity == greedy on adversarial run cases") {
    val cases: Seq[(Seq[String], String, String)] = Seq(
      (Seq("a", "a", "a", "a"), "a", "a"),            // even run: aa aa
      (Seq("a", "a", "a"), "a", "a"),                 // odd run: aa a
      (Seq("a", "a", "a", "a", "a"), "a", "a"),       // aa aa a
      (Seq("x", "a", "a", "a", "y", "a", "a"), "a", "a"), // interior runs
      (Seq("a", "b", "a", "b", "a", "b"), "a", "b"),  // disjoint occurrences
      (Seq("a", "b", "a"), "a", "b"),                 // tail survivor
      (Seq("b", "a", "b", "b", "a"), "a", "b"),       // occurrence mid-word
      (Seq("a"), "a", "a"),                           // too short to merge
      (Seq.empty[String], "a", "b"))                  // empty
    cases.foreach { case (syms, a, b) =>
      val g = greedyMerge(syms, a, b)
      val c = chainParity(syms, a, b)
      val f = foldApply(syms, a, b)
      assert(g == c, s"greedy vs chain-parity on $syms ($a,$b): $g vs $c")
      assert(g == f, s"greedy vs fold on $syms ($a,$b): $g vs $f")
    }
  }

  test("batchMergeApply chains when a kept pair's merge equals another's symbol") {
    import spark.implicits._
    // The adversarial case the selection rules exist for: pairs
    // ('ab','cd') and ('abcd','e') — the first merge PRODUCES 'abcd',
    // which immediately matches the second pair in the same fold pass.
    // This documents the hazard; selectDisjointPairs must never keep
    // this combination.
    val chained = Seq(Seq("ab", "cd", "e")).toDF("syms")
      .select(Vocabulary.batchMergeApply(col("syms"),
        Seq(("ab", "cd"), ("abcd", "e"))).as("m"))
      .collect().head.getSeq[String](0)
    assert(chained == Seq("abcde"),
      s"expected the fold to chain (the hazard under test), got $chained")
  }

  test("selectDisjointPairs excludes symbol AND merged-string collisions") {
    import spark.implicits._
    // ('abcd','e') collides with kept ('ab','cd') via its merged string;
    // ('x','y') is clean and must be picked instead.
    val pc1 = Seq(("ab", "cd", 100L), ("abcd", "e", 90L), ("x", "y", 80L))
      .toDF("a", "b", "cnt")
    val kept1 = Vocabulary.selectDisjointPairs(pc1, batchSize = 3)
    assert(kept1 == Vector(("ab", "cd", 100L), ("x", "y", 80L)),
      s"got $kept1")
    // the reverse direction: a candidate whose SYMBOL equals an earlier
    // pick's merged string (('ab','z') after ('a','b')) is also excluded
    val pc2 = Seq(("a", "b", 100L), ("ab", "z", 90L), ("q", "r", 10L))
      .toDF("a", "b", "cnt")
    val kept2 = Vocabulary.selectDisjointPairs(pc2, batchSize = 3)
    assert(kept2 == Vector(("a", "b", 100L), ("q", "r", 10L)),
      s"got $kept2")
    // and a candidate whose MERGE equals an earlier pick's merge
    // (('a','bc') vs ('ab','c')) cannot both apply in one pass
    val pc3 = Seq(("ab", "c", 100L), ("a", "bc", 90L), ("s", "t", 5L))
      .toDF("a", "b", "cnt")
    val kept3 = Vocabulary.selectDisjointPairs(pc3, batchSize = 3)
    assert(kept3 == Vector(("ab", "c", 100L), ("s", "t", 5L)),
      s"got $kept3")
  }

  test("encodeJoined renders the id sequence as a space-joined scalar") {
    import spark.implicits._
    val docs = Seq((1L, "b a b c"), (2L, "zz a")).toDF("doc_id", "text")
    val vocab = Vocabulary.buildVocab(docs, "text", size = 2)
    // freq: b=2, a=2, c=1, zz=1 -> vocab (a,0),(b,1) by (freq desc, token)
    val enc = Vocabulary.encodeJoined(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc(1L) == "1 0 1 -1", s"got ${enc(1L)}")
    assert(enc(2L) == "-1 0", s"got ${enc(2L)}")
  }

  test("encodeInRow == encode (embedded-vocab expression vs relational " +
      "join+reassembly), incl. OOV and on the documents corpus") {
    import spark.implicits._
    val tiny = Seq((1L, "b a b c"), (2L, "zz a")).toDF("doc_id", "text")
    val vt = Vocabulary.buildVocab(tiny, "text", size = 2)
    val inrow = Vocabulary.encodeInRowJoined(tiny, "doc_id", "text", vt)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(inrow(1L) == "1 0 1 -1" && inrow(2L) == "-1 0", s"got $inrow")
    // NULL-text row-presence semantics match encode's: the doc is
    // ABSENT from both outputs, not present with a NULL encoding
    // (r14 ADVICE)
    val withNull = Seq((1L, "b a"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val encIds = Vocabulary.encode(withNull, "doc_id", "text", vt)
      .collect().map(_.getLong(0)).toSet
    val inrowIds = Vocabulary.encodeInRow(withNull, "doc_id", "text", vt)
      .collect().map(_.getLong(0)).toSet
    assert(encIds == Set(1L) && inrowIds == Set(1L),
      s"null-text doc must be absent from both: enc=$encIds inrow=$inrowIds")
    // corpus check: bit-identical to the relational form
    val docs = DerivedModel.table(spark, "/root/testdata/sf0.001", "documents")
    val vocab = Vocabulary.buildVocab(docs, "text", size = 200, minCount = 2L)
      .persist()
    val a = Vocabulary.encodeJoined(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Vocabulary.encodeInRowJoined(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    vocab.unpersist()
    assert(a == b, s"forms diverge on ${a.keySet.filter(k => a(k) != b(k)).take(3)}")
    // the in-row form is a pure scan: no exchange anywhere in its plan
    val plan = Vocabulary.encodeInRow(docs, "doc_id", "text",
      Vocabulary.buildVocab(docs, "text", size = 200, minCount = 2L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"encodeInRow must not shuffle:\n$plan")
  }

  test("surprisalBuckets: exact thirds land head/middle/tail by " +
    "common/mid/rare vocabulary") {
    import spark.implicits._
    // 21 tokens: 'c' x12 (3 docs), m1-m3 x2 each (3 docs), r1-r3 x1 (3
    // docs) -> three clearly separated mean-surprisal levels, 3 docs each
    val docs = Seq(
      (1L, "c c c c"), (2L, "c c c c"), (3L, "c c c c"),
      (4L, "m1 m1"), (5L, "m2 m2"), (6L, "m3 m3"),
      (7L, "r1"), (8L, "r2"), (9L, "r3")).toDF("doc_id", "text")
    val got = Vocabulary.surprisalBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    Persisted.unpersistAll()
    assert((1L to 3L).forall(got(_) == "head"), s"got $got")
    assert((4L to 6L).forall(got(_) == "middle"), s"got $got")
    assert((7L to 9L).forall(got(_) == "tail"), s"got $got")
  }

  test("bigramSurprisal: seen-bigram, pruned-backoff, and first-token " +
    "paths each match the driver-side fixed-point replica") {
    import spark.implicits._
    // counts: a=3, b=2, c=1, d=1, TOTAL=7; bigrams (a,b)x2, (a,c)x1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d"))
      .toDF("doc_id", "text")
    def fp(num: Long, den: Long) = Vocabulary.log2Fixed(num, den)
    // topN=1 keeps only (a,b): doc3's (a,c) is PRUNED -> stupid backoff
    val got1 = Vocabulary.bigramSurprisal(docs, "doc_id", "text", topN = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Persisted.unpersistAll()
    assert(got1(1L) == (2L, fp(7, 3) + fp(3, 2)), s"got ${got1(1L)}")
    assert(got1(3L) == (2L, fp(7, 3) + fp(5 * 7, 2 * 1)), s"got ${got1(3L)}")
    assert(got1(4L) == (1L, fp(7, 1)), s"got ${got1(4L)}")
    // topN large keeps (a,c) too: its position scores the bigram ratio
    val got2 = Vocabulary.bigramSurprisal(docs, "doc_id", "text", topN = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    Persisted.unpersistAll()
    assert(got2(3L) == fp(7, 3) + fp(3, 1), s"got ${got2(3L)}")
    // predictable continuation scores BELOW the backoff of a rare token
    assert(got1(1L)._2 < got1(3L)._2)
  }

  /** Driver-side replica of [[Vocabulary.knSurprisal]]'s Q40 floor +
    * 20-bit-mantissa log chain (identical integer op sequence). */
  private def knFp(pnum: Long, pden: Long): Long = {
    val q = 1L << 40
    val pfp = math.max(1L, (BigInt(pnum) * q / pden).toLong)
    var e = 0
    while (e < 40 && (pfp << (e + 1)) <= q) e += 1
    var m = (q << 20) / (pfp << e)
    var frac = 0L
    for (_ <- 1 to 20) {
      val msq = (m * m) >> 20
      frac = frac * 2 + (if (msq >= (2L << 20)) 1L else 0L)
      m = if (msq >= (2L << 20)) msq >> 1 else msq
    }
    (e.toLong << 20) + frac
  }

  test("knSurprisal: interpolated KN probabilities (discount mass " +
    "redistributed via continuation counts) match the fixed-point replica") {
    import spark.implicits._
    // counts: a=3,b=2,c=1,d=1, TOTAL=7; bigram types (a,b):2, (a,c):1
    // -> c(a)=3, N1+(a.)=2, N1+(.b)=N1+(.c)=1, Ntypes=2
    // P(b|a) = (2-3/4)/3 + (3/4)(2/3)(1/2) = 16/24; P(c|a) = 8/24
    // (sums to 1 over the seen continuations: mass exactly conserved)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d"))
      .toDF("doc_id", "text")
    val got = Vocabulary.knSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Persisted.unpersistAll()
    assert(got(1L) == (2L, knFp(3, 7) + knFp(16, 24)), s"got ${got(1L)}")
    assert(got(3L) == (2L, knFp(3, 7) + knFp(8, 24)), s"got ${got(3L)}")
    assert(got(4L) == (1L, knFp(1, 7)), s"got ${got(4L)}")
    // the frequent continuation is less surprising than the rare one
    assert(got(1L)._2 < got(3L)._2)
  }

  // -------------------------------------------------------------- DSIR

  /** Driver-side replica of the per-bucket DSIR log ratio (same add-one
    * smoothing over the full bucket universe, same rescale, same
    * fixed-point log) for a feature multiset pair.
    */
  private def expectedLogRatio(ct: Long, cr: Long, totT: Long,
      totR: Long): Long = {
    val b = Vocabulary.DsirBuckets
    val num0 = (ct + 1) * (totR + b)
    val den0 = (cr + 1) * (totT + b)
    val pos = num0 >= den0
    val (big, small) = if (pos) (num0, den0) else (den0, num0)
    val sh = math.max(0, java.lang.Long.toBinaryString(big).length - 33)
    val s = Vocabulary.log2Fixed(big >> sh, math.max(small >> sh, 1L))
    if (pos) s else -s
  }

  test("dsirBucketWeights carries the full universe and matches the " +
    "driver-side fixed-point ratio on disjoint corpora") {
    import spark.implicits._
    // disjoint single-token vocabularies; 1-token docs have no bigrams,
    // so features == tokens and the bucket counts are knowable
    val target = Seq("aa", "aa", "bb").toDF("text")
    val raw = Seq("cc", "cc", "cc", "dd").toDF("text")
    val w = Vocabulary.dsirBucketWeights(target, raw, "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(w.size == Vocabulary.DsirBuckets,
      s"universe must be complete, got ${w.size}")
    def bkt(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(3)
    val (totT, totR) = (3L, 4L)
    // target-only token: positive ratio; raw-only: negative; unseen: the
    // smoothed default log2((totR+B)/(totT+B)) — tiny but positive here
    assert(w(bkt("aa")) == ((2L, 0L, expectedLogRatio(2, 0, totT, totR))))
    assert(w(bkt("cc")) == ((0L, 3L, expectedLogRatio(0, 3, totT, totR))))
    val unseen = w.filterNot(kv =>
      Set(bkt("aa"), bkt("bb"), bkt("cc"), bkt("dd")).contains(kv._1))
    assert(unseen.values.forall(_ == ((0L, 0L,
      expectedLogRatio(0, 0, totT, totR)))))
  }

  test("dsirSelect ranks the target-like raw doc first and scores " +
    "bigram structure, not just unigram bags") {
    import spark.implicits._
    val target = Seq("spark shuffle join", "spark shuffle agg")
      .toDF("text")
    val raw = Seq(
      (1L, "spark shuffle join plan"), // target-like
      (2L, "goat cheese recipe herbs"), // off-domain
      (3L, "join shuffle spark plan")   // same unigrams as 1, different bigrams
    ).toDF("doc_id", "text")
    val top = Vocabulary.dsirSelect(target, raw, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(top.head._1 == 1L, s"expected doc 1 first, got ${top.toSeq}")
    assert(top.last._1 == 2L, s"expected doc 2 last, got ${top.toSeq}")
    // doc 3 shares doc 1's unigrams but not its bigrams ("spark shuffle",
    // "shuffle join" appear in target; doc 3 has "join shuffle" etc.) —
    // the bigram features must separate them
    val byId = top.toMap
    assert(byId(1L) > byId(3L),
      s"bigram features must rank 1 above 3: $byId")
  }

  test("dsirScores is total: docs whose buckets appear in neither " +
    "corpus still score (smoothed default), never drop") {
    import spark.implicits._
    val target = Seq("aa").toDF("text")
    val rawModel = Seq((1L, "bb")).toDF("doc_id", "text")
    val weights = Vocabulary.dsirBucketWeights(target, rawModel, "text")
    val fresh = Seq((9L, "zz qq")).toDF("doc_id", "text")
    val got = Vocabulary.dsirScores(fresh, "doc_id", "text", weights)
      .collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L, // 2 unigrams + 1 bigram
      s"got ${got.toSeq}")
  }

  test("invertedIndex: block rows bounded by blockSize, postings equal a " +
    "direct filter, incremental append touches only the newest block") {
    import spark.implicits._
    val docs = (0L until 230L).map(i => (i, s"w${i % 7} w${i % 3} shared"))
      .toDF("doc_id", "text")
    val idx = Vocabulary.invertedIndex(docs, "doc_id", "text", blockSize = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getSeq[Long](3))).toMap
    // every block row bounded; 'shared' appears in all docs -> 3 blocks
    assert(idx.values.forall { case (df, ps) => df <= 100 && ps.size == df })
    assert(idx(("shared", 0L))._1 == 100 && idx(("shared", 2L))._1 == 30)
    // postings == direct filter, sorted
    val direct = (0L until 230L).filter(i => i % 7 == 4 && i / 100 == 1)
    assert(idx(("w4", 1L))._2 == direct)
    // appending docs 230..259 only creates/changes block 2 rows
    val more = (0L until 260L).map(i => (i, s"w${i % 7} w${i % 3} shared"))
      .toDF("doc_id", "text")
    val idx2 = Vocabulary.invertedIndex(more, "doc_id", "text", blockSize = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getSeq[Long](3))).toMap
    assert(idx2.filter(_._1._2 < 2L) == idx.filter(_._1._2 < 2L),
      "older blocks must be untouched by appends")
  }

  test("skipgramCounts equals hand counts on a tiny corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a"), (2L, "b b")).toDF("doc_id", "text")
    val got = Vocabulary.skipgramCounts(docs, "doc_id", "text",
        window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1 pairs within 2: (a,b),(a,c),(b,c),(b,a),(c,a) -> ab=2 ac=2 bc=1
    // doc2: (b,b)=1
    assert(got == Map(("a","b") -> 2L, ("a","c") -> 2L, ("b","c") -> 1L,
      ("b","b") -> 1L), got.toString)
  }
}
