package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Service-backed [[StatusStore]] — the network shape of the
  * reference's DynamoDBHelper (steps/dynamodb.py:32-60: a table client
  * whose conditional update carries a ConditionExpression the SERVICE
  * adjudicates). No AWS SDK exists in this sandbox, so the client
  * speaks the same contract over plain HTTP+JSON to any
  * conditional-put KV endpoint:
  *
  *  - `GET  <base>/status/<correlationId>/<dataProduct>` →
  *    200 `{"status":…,"exportDate":…,"extra":{…}}` | 404
  *  - `POST` same path, body
  *    `{"expected":"IN_PROGRESS"|null, "conditional":bool,
  *      "status":…, "exportDate":…, "extra":{…}}` →
  *    200 (this caller's write landed) | 412 (condition failed —
  *    exactly DynamoDB's ConditionalCheckFailedException, mapped to
  *    `false` like the reference's except-branch)
  *
  * The CONDITION IS ADJUDICATED SERVER-SIDE in one atomic step — the
  * property the whole cross-driver guard rests on; the client never
  * read-then-writes. Swapping in the real DynamoDB SDK at deploy time
  * is implementing this same trait with `PutItem(ConditionExpression=
  * attribute_not_exists)` / `UpdateItem(ConditionExpression=#s = :v)`
  * — the Runner and every spec in StatusStoreSpec's contract harness
  * are unchanged.
  *
  * Transient transport failures retry with linear backoff (the
  * reference mounts urllib3 Retry on its session); a 412 is a VALID
  * adjudication, never retried — retrying a lost CAS would turn
  * "another driver owns this row" into a spin.
  */
final class HttpStatusStore(base: String, timeoutMs: Long = 2000,
    maxRetries: Int = 2) extends StatusStore {

  private val om = new ObjectMapper()
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  private def uri(correlationId: String, dataProduct: String): java.net.URI =
    java.net.URI.create(s"$base/status/${enc(correlationId)}/${enc(dataProduct)}")

  private def send(req: java.net.http.HttpRequest): java.net.http.HttpResponse[String] = {
    var attempt = 0
    while (true) {
      try return client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          attempt += 1
          if (attempt > maxRetries)
            throw new java.io.IOException(
              s"status service unreachable after ${maxRetries + 1} attempts", e)
          Thread.sleep(25L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def get(correlationId: String, dataProduct: String): Option[ObjectNode] = {
    val resp = send(java.net.http.HttpRequest.newBuilder()
      .uri(uri(correlationId, dataProduct))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build())
    resp.statusCode() match {
      case 200 => Some(om.readTree(resp.body()).asInstanceOf[ObjectNode])
      case 404 => None
      case c => throw new java.io.IOException(s"status GET returned $c")
    }
  }

  private def post(correlationId: String, dataProduct: String,
      conditional: Boolean, expected: Option[String], status: String,
      exportDate: String, extra: Map[String, String]): Boolean = {
    val body = om.createObjectNode()
    body.put("conditional", conditional)
    expected match {
      case Some(s) => body.put("expected", s)
      case None => body.putNull("expected")
    }
    body.put("status", status)
    body.put("exportDate", exportDate)
    val ex = body.putObject("extra")
    extra.foreach { case (k, v) => ex.put(k, v) }
    val resp = send(java.net.http.HttpRequest.newBuilder()
      .uri(uri(correlationId, dataProduct))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(om.writeValueAsString(body)))
      .build())
    resp.statusCode() match {
      case 200 => true
      case 412 => false // condition failed — the other driver's row stands
      case c => throw new java.io.IOException(s"status POST returned $c")
    }
  }

  override def getStatus(correlationId: String, dataProduct: String): Option[String] =
    get(correlationId, dataProduct)
      .flatMap(n => Option(n.get("status")).map(_.asText()))
      .filter(Set(StatusStore.InProgress, StatusStore.Completed, StatusStore.Failed))

  override def updateStatus(correlationId: String, dataProduct: String,
      status: String, exportDate: String,
      extra: Map[String, String] = Map.empty): Unit = {
    post(correlationId, dataProduct, conditional = false, None,
      status, exportDate, extra)
    ()
  }

  override def getExtras(correlationId: String, dataProduct: String): Map[String, String] =
    get(correlationId, dataProduct).map { n =>
      Option(n.get("extra")) match {
        case Some(e: ObjectNode) =>
          var m = Map.empty[String, String]
          e.properties().forEach(kv => m += kv.getKey -> kv.getValue.asText())
          m
        case _ => Map.empty[String, String]
      }
    }.getOrElse(Map.empty)

  override def compareAndSetStatus(correlationId: String, dataProduct: String,
      expected: Option[String], status: String, exportDate: String,
      extra: Map[String, String] = Map.empty): Boolean =
    post(correlationId, dataProduct, conditional = true, expected,
      status, exportDate, extra)
}
