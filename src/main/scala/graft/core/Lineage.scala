package graft.core

/** Pipeline lineage metadata, merged automatically on composition.
  *
  * Behavior parity with mattlianje/etl4s `etl4s/src/Lineage.scala:20-66`:
  * `chain` (sequential `~>`) and `combine` (parallel `&`/`&>`, sequencing
  * `>>`) both union inputs/outputs/upstreams/tags, concatenate names with a
  * separator, and keep the first non-empty scalar field.
  */
final case class Lineage(
    name: String,
    inputs: List[String] = Nil,
    outputs: List[String] = Nil,
    upstreams: List[Any] = Nil, // Node, Reader, or String
    schedule: String = "",
    cluster: String = "",
    description: String = "",
    group: String = "",
    tags: List[String] = Nil,
    links: Map[String, String] = Map.empty
) {

  private def merged(other: Lineage, separator: String): Lineage =
    Lineage(
      name = name + separator + other.name,
      inputs = (inputs ++ other.inputs).distinct,
      outputs = (outputs ++ other.outputs).distinct,
      upstreams = (upstreams ++ other.upstreams).distinct,
      schedule = if (schedule.nonEmpty) schedule else other.schedule,
      cluster = if (cluster.nonEmpty) cluster else other.cluster,
      description = if (description.nonEmpty) description else other.description,
      group = if (group.nonEmpty) group else other.group,
      tags = (tags ++ other.tags).distinct,
      links = links ++ other.links
    )

  /** Sequential (`~>`) lineage merge. */
  def chain(other: Lineage, separator: String = "_"): Lineage =
    merged(other, separator)

  /** Parallel / side-effect (`&`, `&>`, `>>`) lineage merge. */
  def combine(other: Lineage, separator: String = "_"): Lineage =
    merged(other, separator)
}

/** A rendered pipeline node in the lineage graph (pipeviz JSON spec). */
final case class LineageNode(
    name: String,
    input_sources: List[String],
    output_sources: List[String],
    upstream_pipelines: List[String],
    schedule: String,
    cluster: String,
    description: String = "",
    group: String = "",
    tags: List[String] = Nil,
    links: Map[String, String] = Map.empty
)

/** A directed edge between pipelines and/or data sources. */
final case class LineageEdge(from: String, to: String, isDependency: Boolean = false)

/** A visual grouping of pipelines. */
final case class LineageCluster(name: String, description: String = "", parent: String = "")

/** The full renderable lineage graph. */
final case class LineageGraph(
    pipelines: List[LineageNode],
    datasources: List[String],
    clusters: List[LineageCluster] = Nil,
    edges: List[LineageEdge] = Nil
)
