package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-key resolution.
  *
  * The reference calls an external key service per record with a
  * per-executor dict cache (reference: steps/dks.py:96-134 — HTTP decrypt
  * of `encryptedEncryptionKey`, cache keyed on the encrypted key). The
  * Spark-first re-expression exploits that distinct data keys are few
  * (hundreds, not billions): resolve the DISTINCT encrypted keys once on
  * the driver, then broadcast-join the tiny plaintext map onto the
  * stream. One bounded collect, zero per-record RPC, no mutable executor
  * state, and the join stays in whole-stage codegen.
  *
  * `resolve` is pluggable (the real deployment would call its KMS; tests
  * mirror the reference's "no datakey encryption" and "-decrypted" mocks,
  * steps/tests.py:64-76).
  */
final class KeyService(resolve: String => String) extends Serializable {

  /** Number of distinct keys resolved by the last resolveKeys call (spec
    * hook mirroring the reference's hit/miss accumulators).
    */
  @volatile var lastResolvedCount: Int = 0

  /** parsed envelope (column `key_enc`) → same rows + `data_key` column. */
  def withDataKeys(parsed: DataFrame): DataFrame = {
    val spark = parsed.sparkSession
    import spark.implicits._
    // bounded driver-side collect: distinct encrypted keys only
    val distinctKeys = parsed.select("key_enc").distinct()
      .as[String].collect().toSeq
    lastResolvedCount = distinctKeys.length
    val keyMap = distinctKeys.map(k => k -> resolve(k)).toDF("key_enc", "data_key")
    parsed.join(broadcast(keyMap), Seq("key_enc"))
  }
}

object KeyService {
  /** The reference test fixture's "no datakey encryption" service:
    * decrypted key == encrypted key (steps/tests.py:64-76).
    */
  val identity: KeyService = new KeyService(k => k)

  /** Retry wrapper for the resolver — the reference's RetryConfig
    * (dks.py:23-40: bounded retries with backoff on the DKS call).
    * Because resolution is a bounded driver-side pass over DISTINCT
    * keys, retrying is per-key and cheap — no per-record retry storms.
    */
  def withRetry(maxRetries: Int, backoffMs: Long = 50)(resolve: String => String): String => String =
    key => {
      var attempt = 0
      var result: Option[String] = None
      var last: Throwable = null
      while (result.isEmpty && attempt <= maxRetries) {
        try result = Some(resolve(key))
        catch {
          case e: Throwable =>
            last = e
            attempt += 1
            if (attempt <= maxRetries) Thread.sleep(backoffMs * attempt)
        }
      }
      result.getOrElse(throw new RuntimeException(
        s"key resolution failed after ${maxRetries + 1} attempts", last))
    }
}
