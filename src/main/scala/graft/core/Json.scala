package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Minimal Jackson-tree JSON helpers for the metadata layer.
  *
  * The metadata files (schema / snapshot / manifest) are small JSON documents;
  * a hand-rolled tree mapping keeps us independent of any serialization
  * framework and makes the on-disk format explicit.
  */
object Json {
  val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()

  def parse(s: String): JsonNode = mapper.readTree(s)
  def write(n: JsonNode): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(n)

  def fields(n: JsonNode): Seq[(String, JsonNode)] =
    n.properties().asScala.map(e => e.getKey -> e.getValue).toSeq
  def elems(n: JsonNode): Seq[JsonNode] = n.elements().asScala.toSeq

  def optStr(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(!_.isNull).map(_.asText())
  def optLong(n: JsonNode, k: String): Option[Long] =
    Option(n.get(k)).filter(!_.isNull).map(_.asLong())
}
