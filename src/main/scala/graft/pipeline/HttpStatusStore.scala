package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Service-backed [[StatusStore]] speaking the REAL DynamoDB HTTP API
  * — the network shape of the reference's DynamoDBHelper
  * (steps/dynamodb.py:32-60: table `data_pipeline_metadata`, key
  * attributes Correlation_Id + DataProduct, Status/Date item
  * attributes). No AWS SDK exists in this sandbox, so this client
  * encodes the wire itself — `POST /` with
  * `X-Amz-Target: DynamoDB_20120810.<Op>`, `application/x-amz-json-1.0`
  * bodies, `{"S": ...}` attribute values — against any
  * DynamoDB-compatible endpoint ([[DynamoGateway]] in-sandbox,
  * DynamoDB Local or the real service at deploy time):
  *
  *  - `getStatus`/`getExtras` → GetItem (ConsistentRead).
  *  - `updateStatus` → UpdateItem
  *    `SET #s = :s, #d = if_not_exists(#d, :d), <extras>` — existing
  *    rows keep their original Date and merge extras, exactly the
  *    reference's update path.
  *  - `compareAndSetStatus(None, …)` → PutItem with
  *    `ConditionExpression: attribute_not_exists(Correlation_Id)` —
  *    DynamoDB's first-writer-wins row creation.
  *  - `compareAndSetStatus(Some(s), …)` → UpdateItem with
  *    `ConditionExpression: #s = :expected`.
  *
  * A condition the SERVICE rejects arrives as HTTP 400 with
  * `__type …#ConditionalCheckFailedException` and maps to `false` —
  * the reference's except-branch. The condition is adjudicated
  * server-side in one atomic step; the client never read-then-writes.
  *
  * Transient transport failures retry with linear backoff (the
  * reference mounts urllib3 Retry on its session). Every retry of one
  * logical call carries the SAME `amz-sdk-invocation-id` (the real
  * SDK's retry header). Against [[DynamoGateway]] — and ONLY there —
  * that id is also a replay key: the gateway caches each invocation's
  * response inside the write's critical section, so a conditional
  * write whose 200 was lost in transit is re-answered 200. The REAL
  * service treats the header as telemetry and does NOT deduplicate,
  * so a CAS retried after a lost 200 can see
  * ConditionalCheckFailedException for its own landed write; this
  * client disambiguates that case (round 16): a CCF received on a
  * RETRY attempt triggers a consistent read-back, and if the row now
  * carries exactly this caller's Status + extras the CAS reports
  * true — the write landed, the 200 was lost. A CCF on the FIRST
  * attempt is always a genuine lost race (no prior send exists whose
  * response could have been dropped).
  */
final class HttpStatusStore(base: String,
    table: String = "data_pipeline_metadata",
    timeoutMs: Long = 2000, maxRetries: Int = 2) extends StatusStore {

  private val om = new ObjectMapper()
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  private val CcfMarker = "#ConditionalCheckFailedException"

  private def s(n: ObjectNode, field: String, v: String): Unit = {
    n.putObject(field).put("S", v); ()
  }

  private def keyNode(body: ObjectNode, correlationId: String,
      dataProduct: String): Unit = {
    val k = body.putObject("Key")
    s(k, "Correlation_Id", correlationId)
    s(k, "DataProduct", dataProduct)
  }

  /** One DynamoDB operation: POSTs the x-amz-json-1.0 body under the
    * op's X-Amz-Target, retrying transport failures with a constant
    * amz-sdk-invocation-id. Returns (statusCode, parsedBody,
    * attemptsUsed) — attemptsUsed > 0 means the answer arrived on a
    * RETRY, which conditional-write callers must treat specially (a
    * CCF there can be the echo of this caller's own landed write
    * whose 200 was lost; see the class doc).
    */
  private def call(op: String, body: ObjectNode): (Int, JsonNode, Int) = {
    val invocationId = java.util.UUID.randomUUID.toString
    val payload = om.writeValueAsString(body)
    var attempt = 0
    while (true) {
      try {
        val req = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(base + "/"))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("Content-Type", "application/x-amz-json-1.0")
          .header("X-Amz-Target", s"DynamoDB_20120810.$op")
          .header("amz-sdk-invocation-id", invocationId)
          .header("amz-sdk-request", s"attempt=${attempt + 1}; max=${maxRetries + 1}")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(payload))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        // 5xx is DynamoDB's RETRYABLE shape (InternalFailure /
        // throttling) — every AWS SDK and the reference's urllib3
        // Retry absorb it; the constant invocation-id makes the
        // replay safe even for conditional writes
        if (resp.statusCode() / 100 == 5 && attempt < maxRetries) {
          attempt += 1
          Thread.sleep(25L * attempt)
        } else {
          val node = if (resp.body() == null || resp.body().isEmpty)
            om.createObjectNode() else om.readTree(resp.body())
          return (resp.statusCode(), node, attempt)
        }
      } catch {
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

  private def isCcf(code: Int, body: JsonNode): Boolean =
    code == 400 && Option(body.get("__type")).exists(_.asText().endsWith(CcfMarker))

  private def getItem(correlationId: String, dataProduct: String)
      : Option[Map[String, String]] = {
    val body = om.createObjectNode()
    body.put("TableName", table)
    keyNode(body, correlationId, dataProduct)
    body.put("ConsistentRead", true)
    val (code, resp, _) = call("GetItem", body)
    if (code != 200)
      throw new java.io.IOException(s"GetItem returned $code: $resp")
    Option(resp.get("Item")).map { item =>
      var m = Map.empty[String, String]
      item.properties().forEach { e =>
        Option(e.getValue.get("S")).foreach(v => m += e.getKey -> v.asText())
      }
      m
    }
  }

  override def getStatus(correlationId: String, dataProduct: String): Option[String] =
    getItem(correlationId, dataProduct)
      .flatMap(_.get("Status"))
      .filter(Set(StatusStore.InProgress, StatusStore.Completed, StatusStore.Failed))

  override def getExtras(correlationId: String, dataProduct: String): Map[String, String] =
    getItem(correlationId, dataProduct)
      .map(_ -- Seq("Correlation_Id", "DataProduct", "Status", "Date"))
      .getOrElse(Map.empty)

  /** UpdateItem body: SET Status, Date (if absent) and the extras;
    * optional equality condition on the current Status.
    */
  private def updateItem(correlationId: String, dataProduct: String,
      status: String, exportDate: String, extra: Map[String, String],
      expected: Option[String]): (Int, JsonNode, Int) = {
    val body = om.createObjectNode()
    body.put("TableName", table)
    keyNode(body, correlationId, dataProduct)
    val names = body.putObject("ExpressionAttributeNames")
    names.put("#s", "Status")
    names.put("#d", "Date")
    val values = body.putObject("ExpressionAttributeValues")
    s(values, ":s", status)
    s(values, ":d", exportDate)
    val sets = scala.collection.mutable.ListBuffer(
      "#s = :s", "#d = if_not_exists(#d, :d)")
    extra.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((k, v), i) =>
      names.put(s"#e$i", k)
      s(values, s":e$i", v)
      sets += s"#e$i = :e$i"
    }
    body.put("UpdateExpression", "SET " + sets.mkString(", "))
    expected.foreach { exp =>
      s(values, ":exp", exp)
      body.put("ConditionExpression", "#s = :exp")
    }
    call("UpdateItem", body)
  }

  override def updateStatus(correlationId: String, dataProduct: String,
      status: String, exportDate: String,
      extra: Map[String, String] = Map.empty): Unit = {
    val (code, resp, _) = updateItem(correlationId, dataProduct,
      status, exportDate, extra, expected = None)
    if (code != 200)
      throw new java.io.IOException(s"UpdateItem returned $code: $resp")
  }

  /** A CCF that arrived on a RETRY can be the service rejecting the
    * re-send of a conditional write that already LANDED (the real
    * service does not deduplicate on amz-sdk-invocation-id — the 200
    * was lost, the row changed, the condition no longer holds).
    * Disambiguate by consistent read-back: the CAS succeeded iff the
    * row now carries exactly this caller's Status and extras. A
    * same-valued write by a RACING caller is indistinguishable here —
    * and equivalent: the row holds the value this caller was
    * installing, so reporting true preserves the CAS contract
    * (callers key ownership on value transitions, and both the
    * Runner's and Relauncher's transitions are value-distinct per
    * owner: the retry-count extra differs per sweep).
    */
  private def ccfWasOwnWrite(correlationId: String, dataProduct: String,
      status: String, extra: Map[String, String]): Boolean =
    getItem(correlationId, dataProduct).exists { row =>
      row.get("Status").contains(status) &&
        extra.forall { case (k, v) => row.get(k).contains(v) }
    }

  override def compareAndSetStatus(correlationId: String, dataProduct: String,
      expected: Option[String], status: String, exportDate: String,
      extra: Map[String, String] = Map.empty): Boolean = expected match {
    case None =>
      // first-writer-wins row CREATION: PutItem + attribute_not_exists
      val body = om.createObjectNode()
      body.put("TableName", table)
      val item = body.putObject("Item")
      s(item, "Correlation_Id", correlationId)
      s(item, "DataProduct", dataProduct)
      s(item, "Status", status)
      s(item, "Date", exportDate)
      extra.foreach { case (k, v) => s(item, k, v) }
      body.put("ConditionExpression", "attribute_not_exists(Correlation_Id)")
      val (code, resp, attempts) = call("PutItem", body)
      if (code == 200) true
      else if (isCcf(code, resp))
        attempts > 0 && ccfWasOwnWrite(correlationId, dataProduct, status, extra)
      else throw new java.io.IOException(s"PutItem returned $code: $resp")
    case Some(_) =>
      val (code, resp, attempts) = updateItem(correlationId, dataProduct,
        status, exportDate, extra, expected)
      if (code == 200) true
      else if (isCcf(code, resp))
        attempts > 0 && ccfWasOwnWrite(correlationId, dataProduct, status, extra)
      else throw new java.io.IOException(s"UpdateItem returned $code: $resp")
  }

  /** Relauncher scan: DynamoDB `Scan` with a server-side
    * `FilterExpression #s = :s` (the documented grammar subset the
    * status contract emits — filters evaluate after the read, so the
    * wire cost is the table, which is metadata-sized here).
    */
  override def scanByStatus(status: String): Seq[StatusStore.ScanRow] = {
    val body = om.createObjectNode()
    body.put("TableName", table)
    body.put("ConsistentRead", true)
    body.put("FilterExpression", "#s = :s")
    body.putObject("ExpressionAttributeNames").put("#s", "Status")
    s(body.putObject("ExpressionAttributeValues"), ":s", status)
    val (code, resp, _) = call("Scan", body)
    if (code != 200)
      throw new java.io.IOException(s"Scan returned $code: $resp")
    val items = Option(resp.get("Items")).toSeq.flatMap { arr =>
      (0 until arr.size()).map(arr.get)
    }
    items.flatMap { item =>
      var m = Map.empty[String, String]
      item.properties().forEach { e =>
        Option(e.getValue.get("S")).foreach(v => m += e.getKey -> v.asText())
      }
      for (cid <- m.get("Correlation_Id"); dp <- m.get("DataProduct"))
        yield StatusStore.ScanRow(cid, dp, status, m.getOrElse("Date", ""),
          m -- Seq("Correlation_Id", "DataProduct", "Status", "Date"))
    }
  }
}
