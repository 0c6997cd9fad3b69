package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** CIP-25 metadata navigation (SURVEY.md §2.7 S3).
  *
  * Replicates `tm.json -> policy_id -> asset_name ->> 'image'` /
  * `-> asset_name` / `-> 'files'` (`/root/reference/app/db/postgres.py:384-386`)
  * where both keys are *column values* (the hex policy id and the
  * escape-encoded asset name), which rules out Spark's literal-path JSON
  * functions. A Jackson UDF (Jackson ships on Spark's classpath) navigates
  * two dynamic keys and re-serializes objects canonically.
  *
  * Canonical form mirrors Postgres jsonb text output: object keys sorted by
  * (length, byte order) — jsonb's storage order — with `", "`/`": "`
  * separators. The reference round-trips metadata through jsonb, so its
  * stored values are jsonb-canonical too.
  */
object CipJson {

  private val mapper = new ObjectMapper()

  /** jsonb-style canonical serialization. */
  def canonical(node: JsonNode): String = {
    val sb = new StringBuilder
    write(node, sb)
    sb.toString
  }

  private def write(node: JsonNode, sb: StringBuilder): Unit = {
    if (node.isObject) {
      val names = {
        val it = node.fieldNames()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) buf += it.next()
        buf.sortInPlace()(Ordering.by((s: String) => (s.getBytes("UTF-8").length, s)))
      }
      sb.append('{')
      var first = true
      for (n <- names) {
        if (!first) sb.append(", ")
        first = false
        sb.append(mapper.writeValueAsString(mapper.getNodeFactory.textNode(n)))
        sb.append(": ")
        write(node.get(n), sb)
      }
      sb.append('}')
    } else if (node.isArray) {
      sb.append('[')
      var i = 0
      while (i < node.size()) {
        if (i > 0) sb.append(", ")
        write(node.get(i), sb)
        i += 1
      }
      sb.append(']')
    } else sb.append(mapper.writeValueAsString(node))
  }

  /** json[k1][k2] ->> 'image', json[k1][k2] (object), json[k1][k2] -> 'files'.
    * Returns (image, metadata, files), each null when the path is absent or
    * the input is not valid JSON.
    */
  def navigate(json: String, k1: String, k2: String): (String, String, String) = {
    if (json == null || k1 == null || k2 == null) return (null, null, null)
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return (null, null, null) }
    val lvl1 = root.get(k1)
    if (lvl1 == null) return (null, null, null)
    val obj = lvl1.get(k2)
    if (obj == null) return (null, null, null)
    val image = obj.get("image") match {
      case null => null
      case n if n.isTextual => n.asText()      // ->> unquotes strings
      case n if n.isNull => null
      case n => canonical(n)                   // ->> on non-string: JSON text
    }
    val files = obj.get("files") match {
      case null => null
      case n if n.isNull => null
      case n => canonical(n)
    }
    (image, canonical(obj), files)
  }

  private val navigateUdf = udf(navigate _)

  /** struct(image, metadata, files) column. */
  def cip25(json: Column, policyId: Column, assetName: Column): Column =
    navigateUdf(json, policyId, assetName)
}
