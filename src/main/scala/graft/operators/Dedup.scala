package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QueryDef

/** Block C — deduplication operators for LLM-training corpora
  * (SURVEY.md §2.C). All candidate generation is blocked/bucketed so no
  * step is O(n²) in the corpus: exact dedup is one hash aggregate;
  * MinHash/SimHash generate candidates via a shuffle join on bucket
  * keys (LSH banding); n-gram jaccard verifies only within blocks.
  * Signatures are computed with built-in higher-order functions over
  * token arrays — pure projections, no explode-shuffle, no UDFs.
  */
object Dedup {

  /** documents ∪ re-inserted copies (doc_id % 7 == 0, id + 1_000_000) —
    * the corpus for exact dedup (the base table has no byte-identical
    * rows; re-inserts are how exact dups arise in practice).
    */
  def corpusWithExactDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** C1: exact dedup — single hash aggregate over md5(text); keeper is
    * the minimum id (deterministic). Scale shape: one shuffle on the
    * 128-bit content hash, map-side partial agg.
    */
  def dExact(s: SparkSession, d: String): DataFrame =
    corpusWithExactDups(s, d)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("cnt"))

  val dExactSql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper, COUNT(*) AS cnt
      |FROM (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
      |) GROUP BY 1""".stripMargin

  // ---- MinHash + LSH ----

  private val NumPerm = 32
  private val Bands = 8 // × 4 rows per band

  /** word 3-gram shingle hash set (distinct xxhash64 values).
    *
    * Written as ONE fold over the word array. The tempting
    * `transform(indices, i -> hash(words[i], words[i+1], words[i+2]))`
    * re-evaluates the `words` EXPRESSION per lambda element once the
    * optimizer inlines it — O(n²) splits of the text per row (measured:
    * 100× slowdown). A fold's input is evaluated exactly once; the
    * sliding window lives in the accumulator.
    */
  private def shingleHashes(textCol: String): Column = expr(
    s"""array_sort(array_distinct(aggregate(
       |  filter(split($textCol, '\\\\s+'), w -> w != ''),
       |  struct(CAST('' AS STRING) AS w1, CAST('' AS STRING) AS w2,
       |         CAST(array() AS ARRAY<BIGINT>) AS hs, 0 AS n),
       |  (acc, w) -> struct(w AS w1, acc.w1 AS w2,
       |    CASE WHEN acc.n >= 2
       |         THEN array_append(acc.hs, xxhash64(concat_ws(' ', acc.w2, acc.w1, w)))
       |         ELSE acc.hs END AS hs,
       |    acc.n + 1 AS n),
       |  acc -> acc.hs)))""".stripMargin)

  /** 32-wide MinHash signature over the shingle-hash array: permutation
    * family is xxhash64(shingleHash, permIndex) — independent 64-bit
    * mixes with no overflow under ANSI mode. Also a single fold (input
    * evaluated once, 32 running minima in the accumulator) — a pure
    * projection, no shuffle.
    */
  private def minhashSig(hashes: Column): Column =
    aggregate(
      hashes,
      array_repeat(lit(Long.MaxValue), NumPerm),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(NumPerm - 1)),
        (m, j) => least(m, xxhash64(h, j))))

  /** Exchange barrier after signature projections: materializes the
    * projection once per row (the alternative — inline expressions —
    * gets re-inlined into every downstream reference and re-evaluated
    * per lambda/Generate element; d_minhash_lsh measured 538s vs 2.9s
    * at sf0.1). Where join-null-filter pushdown still substitutes the
    * expression below this exchange, use graft.Stage.barrier instead
    * (hard boundary, at the price of a row ser/deser).
    */
  private def materialized(df: DataFrame): DataFrame =
    df.repartition(col(df.columns.head))

  /** (doc_id, band, bucket) rows — Bands rows per doc (constant factor,
    * not a join explosion). Bucket key mixes the band's 4 signature rows.
    */
  private def bandBuckets(s: SparkSession, d: String): DataFrame = {
    val docs = materialized(Tables.documents(s, d)
      .select(col("doc_id"), minhashSig(shingleHashes("text")).as("sig")))
    def sigAt(i: Column): Column = element_at(col("sig"), i + 1)
    docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(Bands - 1)), b => {
          val base = b * 4
          xxhash64(sigAt(base), sigAt(base + 1), sigAt(base + 2), sigAt(base + 3))
        })))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** C2: MinHash-LSH near-dup pairs: band-bucket join for candidates
    * (shuffle on (band, bucket) — never all-pairs), then exact shingle
    * jaccard ≥ 0.5 verification within candidates only.
    */
  def dMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val buckets = bandBuckets(s, d)
    val candidates = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), shingleHashes("text").as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      // shingle sets are sorted+distinct: linear-merge intersection,
      // |A∪B| = |A|+|B|-|A∩B| (no per-pair hash set allocs)
      .withColumn("inter",
        graft.functions.sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        round(col("inter").cast("double")
          / (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 3))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash ----

  /** 64-bit word-level SimHash as a pure fold over the token-hash array:
    * per-bit ±1 counters (aggregate + zip_with over a bit-index array),
    * then sign → bit. No shuffle, no UDF, stays in codegen. Expressed as
    * a SQL lambda because shiftright with a non-literal distance is only
    * exposed in SQL.
    */
  def simhashExpr(textCol: String): Column = expr(
    s"""aggregate(
       |  transform(filter(split($textCol, '\\\\s+'), w -> w != ''), w -> xxhash64(w)),
       |  array_repeat(CAST(0 AS BIGINT), 64),
       |  (acc, h) -> zip_with(acc, sequence(0, 63),
       |    (v, i) -> v + CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1 ELSE -1 END),
       |  counters -> aggregate(
       |    zip_with(counters, sequence(0, 63),
       |      (c, i) -> CASE WHEN c > 0 THEN shiftleft(CAST(1 AS BIGINT), i)
       |                ELSE CAST(0 AS BIGINT) END),
       |    CAST(0 AS BIGINT), (a, x) -> a + x))""".stripMargin)

  /** C3: SimHash near-dup pairs: 8 bands × 8 bits for candidates
    * (bucket join — a pair surfaces iff some byte of the signature
    * matches exactly, near-certain at hamming ≤ 8), verify
    * hamming ≤ 8 via bit_count(xor). Band width is the recall/candidate
    * -volume dial: a billion-doc corpus would widen bands (16 bits) and
    * multi-probe instead of paying 8× bucket rows this coarse.
    */
  def dSimhash(s: SparkSession, d: String): DataFrame = {
    val sh = graft.Stage.barrier(Tables.documents(s, d)
      .select(col("doc_id"), simhashExpr("text").as("simhash")))
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), 8 * b).bitwiseAND(lit(0xFFL)).as("bucket"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bucket"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
  }

  // ---- n-gram jaccard ----

  /** char 5-gram hash set over a materialized codepoint array.
    * `substring(text, i, 5)` is O(i) on UTF8 strings (codepoint scan
    * from the start — no ASCII shortcut with zh docs in the corpus), so
    * sliding it is O(len²) per doc. Splitting to a chars array once and
    * indexing with element_at is O(len).
    */
  private def charGramHashes(chars: Column): Column =
    array_sort(array_distinct(
      transform(sequence(lit(0), greatest(size(chars) - 5, lit(0))),
        i => xxhash64(concat(
          element_at(chars, i + 1), element_at(chars, i + 2),
          element_at(chars, i + 3), element_at(chars, i + 4),
          element_at(chars, i + 5))))))

  /** C4: n-gram jaccard within (lang, source) blocks — block join keeps
    * candidate generation off the full cross product; at corpus scale the
    * blocking key would be an LSH bucket (C2) instead of metadata.
    */
  def dNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = materialized(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          split(col("text"), "").as("chars")))
      .select(col("doc_id"), col("lang"), col("source"),
        charGramHashes(col("chars")).as("grams"))
      .withColumn("ng", size(col("grams")))
    docs.as("x")
      .join(docs.as("y"),
        col("x.lang") === col("y.lang") && col("x.source") === col("y.source")
          && col("x.doc_id") < col("y.doc_id")
          // size prefilter: jaccard ≥ t needs |A|/|B| ≥ t — prunes most
          // pairs before the expensive set intersection
          && least(col("x.ng"), col("y.ng")).cast("double")
            / greatest(col("x.ng"), col("y.ng")) >= 0.6)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        graft.functions.sorted_intersect_count(col("x.grams"), col("y.grams"))
          .as("inter"),
        col("x.ng").as("ng_a"), col("y.ng").as("ng_b"))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double")
          / (col("ng_a") + col("ng_b") - col("inter")), 3).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
  }

  // ---- embedding cosine ----

  /** embeddings ∪ perturbed copies (vec_id % 11 == 0, id + 1_000_000,
    * first component nudged) — the corpus for cosine near-dup (the base
    * table is isotropic noise, max pair cosine ≈ 0.5).
    */
  def corpusWithNearVectors(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("label"))
    emb.unionByName(
      emb.filter(col("vec_id") % 11 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L)
        .withColumn("v", zip_with(col("v"), sequence(lit(0), size(col("v")) - 1),
          (x, i) => when(i === 0, x + lit(0.05)).otherwise(x))))
  }

  /** C5: embedding-cosine near-dup pairs, label-blocked (the shuffle key
    * is the block; an unblocked corpus would use s_ann_lsh buckets).
    * Cosine is the fused codegen'd expression (graft.functions
    * .vec_cosine) — one allocation-free pass per pair.
    */
  def dEmbedCos(s: SparkSession, d: String): DataFrame = {
    val emb = corpusWithNearVectors(s, d)
    emb.as("x")
      .join(emb.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        round(graft.functions.vec_cosine(col("x.v"), col("y.v")), 4).as("cos"))
      .filter(col("cos") >= 0.95)
  }

  /** C1b: the APPLICATION of exact dedup — the surviving corpus (keeper
    * row per content group), i.e. what a training pipeline feeds
    * downstream. Left-semi join of the corpus against the keeper set.
    */
  def dExactKeep(s: SparkSession, d: String): DataFrame = {
    val corpus = corpusWithExactDups(s, d)
    val keepers = corpus
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    corpus.join(keepers, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "source", "n_chars")
  }

  val dExactKeepSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, lang, source, n_chars
      |  FROM documents WHERE doc_id % 7 = 0
      |)
      |SELECT doc_id, lang, source, n_chars FROM corpus
      |WHERE doc_id IN (SELECT MIN(doc_id) FROM corpus GROUP BY md5(text))""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("d_exact", dExact, Some(dExactSql)),
    QueryDef("d_exact_keep", dExactKeep, Some(dExactKeepSql)),
    QueryDef("d_minhash_lsh", dMinhashLsh, None),
    QueryDef("d_simhash", dSimhash, None),
    QueryDef("d_ngram_jaccard", dNgramJaccard, None),
    QueryDef("d_embed_cos", dEmbedCos, None),
  )
}
