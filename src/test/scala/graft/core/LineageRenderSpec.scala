package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral port of the reference lineage rendering specs
  * (`/root/reference/etl4s/test/src/Etl4sSpec.scala:630-1148` lineage parts;
  * upstream-inference motif `/root/reference/README.md:340-354`).
  */
class LineageRenderSpec extends AnyFunSuite {

  private def pipes = {
    val a = Node[Int, Int](identity).lineage(
      name = "ingest", inputs = List("s1"), outputs = List("s3"))
    val b = Node[Int, Int](identity).lineage(
      name = "enrich", inputs = List("s3"), outputs = List("s4", "s5"),
      schedule = "0 3 * * *")
    (a, b)
  }

  test("toJson renders pipelines, datasources, and inferred upstreams") {
    val (a, b) = pipes
    val json = Seq(a, b).toJson
    assert(json.contains("\"name\":\"ingest\""))
    assert(json.contains("\"name\":\"enrich\""))
    assert(json.contains("\"upstream_pipelines\":[\"ingest\"]"))
    assert(json.contains("\"name\":\"s1\""))
    assert(json.contains("\"schedule\":\"0 3 * * *\""))
  }

  test("toDot renders boxes, ellipses, and dependency edges") {
    val (a, b) = pipes
    val dot = Seq(a, b).toDot
    assert(dot.startsWith("digraph G {"))
    assert(dot.contains("\"ingest\" [shape=box"))
    assert(dot.contains("\"s1\" [shape=ellipse"))
    assert(dot.contains("\"s1\" -> \"ingest\""))
    assert(dot.contains("\"ingest\" -> \"enrich\""))
  }

  test("toMermaid renders graph with styled classes and dashed dependencies") {
    val (a, b) = pipes
    val mer = Seq(a, b).toMermaid
    assert(mer.startsWith("graph LR"))
    assert(mer.contains("ingest[\"ingest\"]"))
    assert(mer.contains("enrich[\"enrich<br/>(0 3 * * *)\"]"))
    assert(mer.contains("s1([\"s1\"])"))
    assert(mer.contains("ingest -.-> enrich"))
    assert(mer.contains("class ingest pipeline"))
  }

  test("duplicate pipeline names are rejected") {
    val a = Node[Int, Int](identity).lineageName("same")
    val b = Node[Int, Int](identity).lineageName("same")
    intercept[IllegalArgumentException](Seq(a, b).toJson)
  }

  test("items without lineage render as empty graph") {
    assert(Seq(Node[Int, Int](identity)).toJson == """{"pipelines":[]}""")
    assert(Seq(Node[Int, Int](identity)).toDot.contains("EmptyGraph"))
  }

  test("single node renders directly") {
    val n = Node[Int, Int](identity).lineage(
      name = "solo", inputs = List("in"), outputs = List("out"))
    assert(n.toJson.contains("\"name\":\"solo\""))
    assert(n.toMermaid.contains("solo"))
  }

  test("composition merges lineage, then renders the combined pipeline") {
    val read = Node[Int, Int](identity)
      .lineageName("read").lineageInputs("raw")
    val write = Node[Int, Int](identity)
      .lineageName("write").lineageOutputs("curated")
    val p = read ~> write
    val json = p.toJson
    assert(json.contains("\"name\":\"read_write\""))
    assert(json.contains("\"input_sources\":[\"raw\"]"))
    assert(json.contains("\"output_sources\":[\"curated\"]"))
  }
}
