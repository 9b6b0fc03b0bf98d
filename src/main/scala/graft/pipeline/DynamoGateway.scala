package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Loopback endpoint speaking the REAL DynamoDB HTTP API — the server
  * half of the reference's status table (steps/dynamodb.py:32-60,
  * table `data_pipeline_metadata`), so [[HttpStatusStore]] is a
  * drop-in wire client: `POST /` with
  * `X-Amz-Target: DynamoDB_20120810.{GetItem,PutItem,UpdateItem,Scan}` and
  * `application/x-amz-json-1.0` bodies, attribute values in the
  * `{"S": "..."}` encoding, `ConditionExpression` adjudicated
  * ATOMICALLY under the row monitor (DynamoDB's server-side
  * conditional write), and a failed condition answered exactly as
  * DynamoDB answers it:
  *
  *   400 `{"__type":"com.amazonaws.dynamodb.v20120810#
  *        ConditionalCheckFailedException", "message":...}`
  *
  * The expression grammar implemented is the documented subset the
  * status contract emits — `attribute_not_exists(attr)` conditions,
  * `#name = :value` equality conditions, and `SET` updates whose
  * right-hand sides are `:value` or `if_not_exists(path, :value)` —
  * parsed for real (names/values resolved through
  * ExpressionAttributeNames/Values), not pattern-matched against
  * known strings.
  *
  * Idempotent replay (the lost-response CAS hazard): AWS SDKs send
  * `amz-sdk-invocation-id` (constant across retries of one logical
  * call) exactly so a server/proxy can de-duplicate; this gateway
  * caches each invocation-id's response inside the SAME critical
  * section as the write, so a winner whose 200 was lost in transit
  * gets its 200 replayed — never a manufactured
  * ConditionalCheckFailed. (Without this, a retried conditional
  * write that landed server-side would tell the actual winner
  * `false`, orphaning its IN_PROGRESS row.)
  */
final class DynamoGateway {
  private val om = new ObjectMapper()
  // (Correlation_Id, DataProduct) -> attrName -> S-value
  // (Correlation_Id, DataProduct) -> attrName -> (typeTag, value) —
  // the type tag is PRESERVED so a {"N": ...} attribute reads back as
  // N, not silently re-encoded as S (the drop-in wire contract)
  private val rows =
    scala.collection.mutable.Map.empty[(String, String), Map[String, (String, String)]]
  // bounded invocation-id -> (status, body) replay cache
  private val replays =
    new java.util.LinkedHashMap[String, (Int, String)](64, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Int, String)]): Boolean = size > 4096
    }
  @volatile private var server: HttpServer = null

  private val CcfType =
    "com.amazonaws.dynamodb.v20120810#ConditionalCheckFailedException"

  def start(): String = synchronized {
    if (server == null) {
      val s = HttpServer.create(new java.net.InetSocketAddress(
        java.net.InetAddress.getLoopbackAddress, 0), 0)
      s.createContext("/", (ex: HttpExchange) => {
        try handle(ex)
        catch {
          case e: Throwable =>
            try respond(ex, 500,
              s"""{"__type":"InternalFailure","message":"${e.getMessage}"}""")
            catch { case _: java.io.IOException => () }
        } finally ex.close()
      })
      // daemon pool + daemon-started dispatcher: the gateway must never
      // keep a finished JVM alive (the S3Gateway lesson)
      s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
        (r: Runnable) => {
          val t = new Thread(r, "dynamogw-worker"); t.setDaemon(true); t
        }))
      val starter = new Thread(() => s.start(), "dynamogw-starter")
      starter.setDaemon(true)
      starter.start()
      starter.join()
      server = s
    }
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.0")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) {
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }

  /** (typeTag, value) of an attribute-value node — S and N supported. */
  private def avOf(n: JsonNode): (String, String) =
    Option(n.get("S")).map("S" -> _.asText())
      .orElse(Option(n.get("N")).map("N" -> _.asText()))
      .getOrElse(throw new IllegalArgumentException("unsupported attribute type"))

  private def attrMap(item: JsonNode): Map[String, (String, String)] = {
    var m = Map.empty[String, (String, String)]
    item.properties().forEach(e => m += e.getKey -> avOf(e.getValue))
    m
  }

  private def keyOf(body: JsonNode, field: String): (String, String) = {
    val k = body.get(field)
    (avOf(k.get("Correlation_Id"))._2, avOf(k.get("DataProduct"))._2)
  }

  private def itemJson(attrs: Map[String, (String, String)]): String = {
    val n = om.createObjectNode()
    val item = n.putObject("Item")
    attrs.toSeq.sortBy(_._1).foreach { case (k, (tag, v)) =>
      item.putObject(k).put(tag, v)
    }
    om.writeValueAsString(n)
  }

  /** Resolve `#name` placeholders (ExpressionAttributeNames) or pass
    * literal attribute names through.
    */
  private def name(tok: String, names: JsonNode): String =
    if (tok.startsWith("#"))
      Option(names).flatMap(n => Option(n.get(tok))).map(_.asText())
        .getOrElse(throw new IllegalArgumentException(s"unresolved name $tok"))
    else tok

  private def value(tok: String, values: JsonNode): (String, String) = {
    require(tok.startsWith(":"), s"expected a :value token, got $tok")
    Option(values).flatMap(v => Option(v.get(tok))).map(avOf)
      .getOrElse(throw new IllegalArgumentException(s"unresolved value $tok"))
  }

  /** Evaluate the condition subset: `attribute_not_exists(attr)` or
    * `#name = :value` (conjunction not needed by the contract).
    */
  private def condHolds(expr: String, row: Option[Map[String, (String, String)]],
      names: JsonNode, values: JsonNode): Boolean = {
    val e = expr.trim
    val fn = "attribute_not_exists\\(([^)]+)\\)".r
    e match {
      case fn(attr) =>
        // attribute_not_exists on any attribute of a MISSING item is
        // true; on a present item, true iff the attribute is absent
        row.forall(r => !r.contains(name(attr.trim, names)))
      case _ =>
        val parts = e.split("=").map(_.trim)
        require(parts.length == 2, s"unsupported ConditionExpression: $expr")
        row.exists(r => r.get(name(parts(0), names))
          .contains(value(parts(1), values)))
    }
  }

  /** Apply the `SET a = :v, b = if_not_exists(b, :v2)` subset. */
  private def applySet(expr: String, row: Map[String, (String, String)],
      names: JsonNode, values: JsonNode): Map[String, (String, String)] = {
    val e = expr.trim
    require(e.toUpperCase.startsWith("SET "), s"unsupported UpdateExpression: $expr")
    // split assignments on commas at paren depth 0 only — a comma
    // inside if_not_exists(path, :v) is part of the assignment
    val assigns = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      e.drop(4).foreach {
        case '(' => depth += 1; cur.append('(')
        case ')' => depth -= 1; cur.append(')')
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur.append(c)
      }
      if (cur.nonEmpty) out += cur.toString
      out.toList
    }
    assigns.map(_.trim).foldLeft(row) { (acc, assign) =>
      val i = assign.indexOf('=')
      require(i > 0, s"malformed assignment: $assign")
      val target = name(assign.take(i).trim, names)
      val rhs = assign.drop(i + 1).trim
      val ine = "if_not_exists\\(([^,]+),([^)]+)\\)".r
      val v = rhs match {
        case ine(path, tok) =>
          acc.getOrElse(name(path.trim, names), value(tok.trim, values))
        case tok => value(tok, values)
      }
      acc + (target -> v)
    }
  }

  private def handle(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "POST") { respond(ex, 405, ""); return }
    val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
    if (!target.startsWith("DynamoDB_20120810.")) {
      respond(ex, 400, """{"__type":"UnknownOperationException"}"""); return
    }
    val op = target.stripPrefix("DynamoDB_20120810.")
    val body = om.readTree(ex.getRequestBody.readAllBytes())
    val invId = Option(ex.getRequestHeaders.getFirst("amz-sdk-invocation-id"))
    // ONE critical section: replay lookup, condition check, write and
    // response caching are atomic — the linearization point of the CAS
    val (code, resp) = rows.synchronized {
      invId.flatMap(id => Option(replays.get(id))) match {
        case Some(cached) => cached
        case None =>
          val result = op match {
            case "GetItem" =>
              rows.get(keyOf(body, "Key")) match {
                case Some(attrs) => (200, itemJson(attrs))
                case None => (200, "{}")
              }
            case "PutItem" =>
              val item = attrMap(body.get("Item"))
              val key = (item("Correlation_Id")._2, item("DataProduct")._2)
              val cond = Option(body.get("ConditionExpression")).map(_.asText())
              if (cond.exists(c => !condHolds(c, rows.get(key),
                  body.get("ExpressionAttributeNames"),
                  body.get("ExpressionAttributeValues"))))
                (400, s"""{"__type":"$CcfType","message":"The conditional request failed"}""")
              else { rows(key) = item; (200, "{}") }
            case "UpdateItem" =>
              val key = keyOf(body, "Key")
              val cond = Option(body.get("ConditionExpression")).map(_.asText())
              val names = body.get("ExpressionAttributeNames")
              val values = body.get("ExpressionAttributeValues")
              if (cond.exists(c => !condHolds(c, rows.get(key), names, values)))
                (400, s"""{"__type":"$CcfType","message":"The conditional request failed"}""")
              else {
                val base = rows.getOrElse(key, Map(
                  "Correlation_Id" -> ("S" -> key._1),
                  "DataProduct" -> ("S" -> key._2)))
                rows(key) = applySet(
                  body.get("UpdateExpression").asText(), base, names, values)
                (200, "{}")
              }
            case "Scan" =>
              // the relauncher's sweep: full-table scan with the
              // documented FilterExpression subset (same grammar as
              // ConditionExpression — filters evaluate per item,
              // server-side, after the read)
              val filterExpr = Option(body.get("FilterExpression")).map(_.asText())
              val names = body.get("ExpressionAttributeNames")
              val values = body.get("ExpressionAttributeValues")
              val matched = rows.toSeq.sortBy(_._1)
                .map(_._2)
                .filter(attrs => filterExpr.forall(
                  f => condHolds(f, Some(attrs), names, values)))
              val n = om.createObjectNode()
              val items = n.putArray("Items")
              matched.foreach { attrs =>
                val it = items.addObject()
                attrs.toSeq.sortBy(_._1).foreach { case (k, (tag, v)) =>
                  it.putObject(k).put(tag, v)
                }
              }
              n.put("Count", matched.size)
              n.put("ScannedCount", rows.size)
              (200, om.writeValueAsString(n))
            case other =>
              (400, s"""{"__type":"UnknownOperationException","message":"$other"}""")
          }
          invId.foreach(id => replays.put(id, result))
          result
      }
    }
    respond(ex, code, resp)
  }

  /** Test hook: the raw row map size (bounded reads only). */
  def rowCount: Int = rows.synchronized(rows.size)
}
