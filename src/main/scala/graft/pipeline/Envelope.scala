package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.{aes_ctr_encrypt => encryptCol}

/** The Kafka message envelope the reference ingests: one JSON object per
  * line, `{"message": {"_id", "db", "collection", "dbObject" (encrypted),
  * "encryption": {...}, "_lastModifiedDateTime"}}`
  * (reference: steps/ingesters.py:30,109; steps/data.py:63-96).
  *
  * `parse` turns a one-column DataFrame of envelope lines into typed
  * columns with from_json — a single codegen'd pass, no RDD map chain.
  * `_id` is extracted raw (get_json_object) because it can be any JSON
  * shape (object or scalar); the typed schema can't commit to one.
  *
  * `synthesize*` build deterministic encrypted fixtures from the
  * `documents` table (SURVEY §3: envelope data is synthesized with
  * deterministic keys/IVs — all derivable in plain SQL so DuckDB oracles
  * can reconstruct every derived value).
  */
object Envelope {

  /** Typed part of the envelope. `_id` handled separately (shape varies). */
  val schema: StructType = StructType(Seq(
    StructField("message", StructType(Seq(
      StructField("db", StringType),
      StructField("collection", StringType),
      StructField("dbObject", StringType),
      StructField("encryption", StructType(Seq(
        StructField("encryptionKeyId", StringType),
        StructField("encryptedEncryptionKey", StringType),
        StructField("initialisationVector", StringType),
        StructField("keyEncryptionKeyId", StringType)))),
      StructField("_lastModifiedDateTime", StringType))))))

  /** Envelope lines → typed columns. Column `value` must hold the JSONL.
    * Lines that don't parse to an envelope (or lack the fields the
    * decrypt needs) are flagged `malformed` rather than nulled through
    * the pipeline — the reference fails the whole task on the first bad
    * line (json.loads in UCMessage.__init__); at corpus scale the right
    * contract is quarantine-and-continue, so callers filter or count on
    * the flag (Ingest.pipeline drops them; Ingest.malformedLines
    * quarantines them).
    */
  def parse(lines: DataFrame): DataFrame = {
    // sessions built without GraftExtensions still get the nested
    // from_json pruning rule (metadata consumers must not pay a
    // dbObject parse) — idempotent runtime install
    graft.plans.PruneJsonPaths.ensureInstalled(lines.sparkSession)
    lines
      .withColumn("m", from_json(col("value"), schema).getField("message"))
      .select(
        get_json_object(col("value"), "$.message._id").as("raw_id"),
        col("m.db").as("db"),
        col("m.collection").as("collection"),
        col("m.dbObject").as("db_object"),
        col("m.encryption.encryptedEncryptionKey").as("key_enc"),
        col("m.encryption.initialisationVector").as("iv"),
        col("m._lastModifiedDateTime").as("envelope_lm"),
        (col("m").isNull || col("m.dbObject").isNull
          || col("m.encryption.encryptedEncryptionKey").isNull
          || col("m.encryption.initialisationVector").isNull).as("malformed"),
        col("value"))
  }

  // ---- deterministic fixture synthesis (all SQL-reconstructible) ----

  /** 16-byte base64 data key, 5 distinct keys: to_base64(md5("key"+id%5)). */
  def keyCol(docId: Column): Column =
    base64(unhex(md5(concat(lit("key"), (docId % 5).cast("string")))))

  /** 16-byte base64 IV, unique per doc: to_base64(md5("iv"+id)). */
  def ivCol(docId: Column): Column =
    base64(unhex(md5(concat(lit("iv"), docId.cast("string")))))

  /** Deterministic per-doc incoming-format timestamp (+0000 offset). */
  def lmCol(docId: Column): Column =
    format_string("2021-%02d-%02dT%02d:%02d:%02d.%03d+0000",
      docId % 12 + 1, docId % 28 + 1, docId % 24, docId % 60,
      (docId * 7) % 60, docId % 1000)

  /** The plaintext dbObject for a document row: a UC-style record. Docs
    * with doc_id % 10 == 0 carry _removedDateTime (→ DELETE).
    */
  def recordCol: Column = {
    val docId = col("doc_id")
    to_json(struct(
      struct(docId.cast("string").as("id")).as("_id"),
      lmCol(docId).as("_lastModifiedDateTime"),
      when(docId % 10 === 0, lmCol(docId)).as("_removedDateTime"),
      col("text").as("text"),
      col("lang").as("lang"),
      col("source").as("source"),
      col("n_chars").as("n_chars")))
  }

  /** documents → one envelope JSONL line per doc, dbObject AES-CTR
    * encrypted under the deterministic key/IV.
    */
  def synthesize(s: SparkSession, dir: String): DataFrame = {
    val docId = col("doc_id")
    Tables.documents(s, dir)
      .select(to_json(struct(struct(
        struct(docId.cast("string").as("id")).as("_id"),
        lit("corp").as("db"),
        lit("documents").as("collection"),
        encryptCol(recordCol, keyCol(docId), ivCol(docId)).as("dbObject"),
        struct(
          lit("").as("encryptionKeyId"),
          keyCol(docId).as("encryptedEncryptionKey"),
          ivCol(docId).as("initialisationVector"),
          lit("kek").as("keyEncryptionKeyId")).as("encryption"),
        lmCol(docId).as("_lastModifiedDateTime")).as("message"))).as("value"))
  }

  /** Materialized fixture: the synthesized envelopes written ONCE per
    * scale dir as gzip JSONL — the reference's actual input format
    * (`*.jsonl.gz` under the corporate_storage prefix,
    * ingesters.py:109) — then read back as text. Queries that consume
    * envelopes measure the PIPELINE (parse→decrypt→normalize), not the
    * fixture synthesis; and reading gz JSONL exercises the production
    * read path. `_SUCCESS` gates against a half-written cache.
    */
  def synthesizeCached(s: SparkSession, dir: String): DataFrame =
    cachedLines(s, dir, "main")(synthesize)

  def synthesizeAuditCached(s: SparkSession, dir: String): DataFrame =
    cachedLines(s, dir, "audit")(synthesizeAudit)

  private def cachedLines(s: SparkSession, dir: String, tag: String)(
      f: (SparkSession, String) => DataFrame): DataFrame = {
    val path = s"/tmp/graft_envelope_${tag}_${graft.Stage.sourceFingerprint(dir, "documents")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      f(s, dir).write.mode("overwrite")
        .option("compression", "gzip").text(path)
    s.read.text(path)
  }

  /** documents → data:businessAudit envelopes: the dbObject is an audit
    * record `{"context": {"AUDIT_ID": <doc_id>}, "auditType": <source>}`
    * (reference: steps/tests.py TestUCMessageTransform).
    */
  def synthesizeAudit(s: SparkSession, dir: String): DataFrame = {
    val docId = col("doc_id")
    val auditRecord = to_json(struct(
      struct(docId.cast("string").as("AUDIT_ID")).as("context"),
      col("source").as("auditType")))
    Tables.documents(s, dir)
      .select(to_json(struct(struct(
        struct(docId.cast("string").as("id")).as("_id"),
        lit("data").as("db"),
        lit("businessAudit").as("collection"),
        encryptCol(auditRecord, keyCol(docId), ivCol(docId)).as("dbObject"),
        struct(
          lit("").as("encryptionKeyId"),
          keyCol(docId).as("encryptedEncryptionKey"),
          ivCol(docId).as("initialisationVector"),
          lit("kek").as("keyEncryptionKeyId")).as("encryption"),
        lmCol(docId).as("_lastModifiedDateTime")).as("message"))).as("value"))
  }
}
