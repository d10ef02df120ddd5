package graft.core

/** Renders the lineage of pipelines to pipeviz JSON, Graphviz DOT, and
  * Mermaid. Graph semantics (reference parity,
  * `etl4s/src-2/Etl4s.scala:2521-2870`):
  *   - duplicate pipeline names are an error;
  *   - upstreams are auto-inferred where one pipeline's output source
  *     matches another's input source;
  *   - edges: input→pipeline and pipeline→output data edges, plus
  *     dependency edges (inferred and explicit upstreams).
  */
object LineageRender {

  private[core] def lineageOf(item: Any): Option[Lineage] = item match {
    case n: Node[_, _] => n.getLineage
    case r: Reader[_, _] => r.getLineage
    case l: Lineage => Some(l)
    case _ => None
  }

  private def upstreamName(obj: Any): Option[String] = obj match {
    case n: Node[_, _] => n.getLineage.map(_.name)
    case r: Reader[_, _] => r.getLineage.map(_.name)
    case s: String => Some(s)
    case _ => None
  }

  private def upstreamGroup(obj: Any): Option[String] = obj match {
    case n: Node[_, _] => n.getLineage.map(_.group).filter(_.nonEmpty)
    case r: Reader[_, _] => r.getLineage.map(_.group).filter(_.nonEmpty)
    case _ => None
  }

  /** Assemble the graph from any mix of nodes/readers/lineages. */
  def graphOf(items: Seq[Any]): LineageGraph = {
    val lineages = items.flatMap(lineageOf)
    val dupes = lineages.groupBy(_.name).collect { case (n, ls) if ls.size > 1 => n }
    if (dupes.nonEmpty)
      throw new IllegalArgumentException(
        s"Duplicate pipeline names: ${dupes.mkString(", ")}")

    val carriers = items.filter(i => lineageOf(i).isDefined)
    val enriched = lineages.map { lin =>
      val inferred = carriers.filter(c =>
        lineageOf(c).exists(up =>
          up.name != lin.name && up.outputs.exists(lin.inputs.contains)))
      lin.copy(upstreams = (lin.upstreams ++ inferred).distinct)
    }

    val nodes = enriched.map { l =>
      LineageNode(
        name = l.name,
        input_sources = l.inputs,
        output_sources = l.outputs,
        upstream_pipelines =
          (l.upstreams.flatMap(upstreamName) ++ l.upstreams.flatMap(upstreamGroup)).distinct,
        schedule = l.schedule,
        cluster = l.cluster,
        description = l.description,
        group = l.group,
        tags = l.tags,
        links = l.links
      )
    }

    val outputsByPipeline = enriched.map(l => l.name -> l.outputs).toMap
    val dataEdges = enriched.flatMap(l =>
      l.inputs.map(LineageEdge(_, l.name)) ++ l.outputs.map(LineageEdge(l.name, _)))
    val inferredEdges = enriched.flatMap(l =>
      l.inputs.flatMap(in =>
        outputsByPipeline.collectFirst {
          case (name, outs) if outs.contains(in) =>
            LineageEdge(name, l.name, isDependency = true)
        }))
    val explicitEdges = enriched.flatMap(l =>
      l.upstreams.flatMap(upstreamName).map(LineageEdge(_, l.name, isDependency = true)))

    LineageGraph(
      pipelines = nodes.toList,
      datasources =
        (enriched.flatMap(_.inputs) ++ enriched.flatMap(_.outputs)).distinct.toList,
      clusters = enriched.map(_.cluster).filter(_.nonEmpty).distinct.toList
        .map(LineageCluster(_)),
      edges = (dataEdges ++ inferredEdges ++ explicitEdges).distinct.toList
    )
  }

  // ------------------------------------------------------------------ JSON

  private def jq(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jarr(xs: Seq[String]): String = xs.mkString("[", ",", "]")

  private def nodeJson(p: LineageNode): String = {
    val fields = Seq(
      Some(s"""\"name\":${jq(p.name)}"""),
      Option.when(p.description.nonEmpty)(s"""\"description\":${jq(p.description)}"""),
      Option.when(p.input_sources.nonEmpty)(
        s"""\"input_sources\":${jarr(p.input_sources.map(jq))}"""),
      Option.when(p.output_sources.nonEmpty)(
        s"""\"output_sources\":${jarr(p.output_sources.map(jq))}"""),
      Option.when(p.upstream_pipelines.nonEmpty)(
        s"""\"upstream_pipelines\":${jarr(p.upstream_pipelines.map(jq))}"""),
      Option.when(p.cluster.nonEmpty)(s"""\"cluster\":${jq(p.cluster)}"""),
      Option.when(p.group.nonEmpty)(s"""\"group\":${jq(p.group)}"""),
      Option.when(p.schedule.nonEmpty)(s"""\"schedule\":${jq(p.schedule)}"""),
      Option.when(p.tags.nonEmpty)(s"""\"tags\":${jarr(p.tags.map(jq))}"""),
      Option.when(p.links.nonEmpty)(
        s"""\"links\":${p.links.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
          .mkString("{", ",", "}")}""")
    ).flatten
    fields.mkString("{", ",", "}")
  }

  def toJson(items: Seq[Any]): String = {
    if (items.flatMap(lineageOf).isEmpty) return """{"pipelines":[]}"""
    val g = graphOf(items)
    val pipelines = jarr(g.pipelines.map(nodeJson))
    val datasources = jarr(g.datasources.map(d => s"""{"name":${jq(d)}}"""))
    val clusters = jarr(g.clusters.map { c =>
      (Seq(s"""\"name\":${jq(c.name)}""") ++
        Option.when(c.description.nonEmpty)(s"""\"description\":${jq(c.description)}""") ++
        Option.when(c.parent.nonEmpty)(s"""\"parent\":${jq(c.parent)}"""))
        .mkString("{", ",", "}")
    })
    s"""{"pipelines":$pipelines,"datasources":$datasources,"clusters":$clusters}"""
  }

  // ------------------------------------------------------------------- DOT

  def toDot(items: Seq[Any]): String = {
    if (items.flatMap(lineageOf).isEmpty)
      return "digraph EmptyGraph {\n  label=\"No lineage information found\";\n}"
    val g = graphOf(items)
    val sb = new StringBuilder
    sb.append("digraph G {\n")
    sb.append("    rankdir=LR; bgcolor=\"transparent\";\n")
    sb.append("    node [fontsize=12, fontname=\"Arial\"];\n")
    sb.append("    edge [fontsize=10, arrowsize=0.8];\n\n")

    val (clustered, floating) = g.pipelines.partition(_.cluster.nonEmpty)
    clustered.groupBy(_.cluster).foreach { case (cluster, ps) =>
      val cid = cluster.replaceAll("[^a-zA-Z0-9_]", "_")
      sb.append(s"    subgraph cluster_$cid {\n")
      sb.append(s"""        label="$cluster"; style="dotted"; color="#666666"; fontsize=11;\n""")
      ps.foreach { p =>
        dotPipeline(sb, p, "        ")
        (p.input_sources ++ p.output_sources).distinct
          .foreach(ds => dotSource(sb, ds, "        "))
      }
      sb.append("    }\n\n")
    }
    floating.foreach(dotPipeline(sb, _, "    "))
    val clusteredSources =
      clustered.flatMap(p => p.input_sources ++ p.output_sources).toSet
    g.datasources.filterNot(clusteredSources).foreach(dotSource(sb, _, "    "))
    sb.append("\n")
    g.edges.foreach { e =>
      val style =
        if (e.isDependency) """[color="#ff6b35", style="solid"]""" else """[color="#666"]"""
      sb.append(s"""    "${e.from}" -> "${e.to}" $style;\n""")
    }
    sb.append("\n    overlap=false; splines=true;\n}\n")
    sb.toString
  }

  private def dotPipeline(sb: StringBuilder, p: LineageNode, ind: String): Unit = {
    val sched =
      if (p.schedule.nonEmpty)
        "<BR/><FONT POINT-SIZE=\"9\" COLOR=\"#d63384\"><I>" + p.schedule + "</I></FONT>"
      else ""
    sb.append(s"""$ind"${p.name}" [shape=box, style="filled,rounded",\n""")
    sb.append(s"""$ind    fillcolor="#e3f2fd", color="#1976d2", fontname="Arial Bold",\n""")
    sb.append(s"$ind    label=<${p.name}$sched>];\n")
  }

  private def dotSource(sb: StringBuilder, name: String, ind: String): Unit = {
    sb.append(s"""$ind"$name" [shape=ellipse, style=filled,\n""")
    sb.append(s"""$ind    fillcolor="#f3e5f5", color="#7b1fa2", fontsize=10];\n""")
  }

  // --------------------------------------------------------------- Mermaid

  private def mid(name: String): String = name.replaceAll("[^a-zA-Z0-9]", "_")

  def toMermaid(items: Seq[Any]): String = {
    if (items.flatMap(lineageOf).isEmpty)
      return "graph LR\n    EmptyGraph[\"No lineage information found\"]"
    val g = graphOf(items)
    val sb = new StringBuilder
    sb.append("graph LR\n")
    sb.append("    classDef pipeline fill:#e1f5fe,stroke:#01579b,stroke-width:2px,color:#000\n")
    sb.append("    classDef dataSource fill:#f3e5f5,stroke:#4a148c,stroke-width:2px,color:#000\n")
    sb.append("    classDef cluster fill:#e8f5e8,stroke:#2e7d32,stroke-width:2px,color:#000\n\n")

    val (clustered, floating) = g.pipelines.partition(_.cluster.nonEmpty)
    clustered.groupBy(_.cluster).foreach { case (cluster, ps) =>
      sb.append(s"""    subgraph ${mid(cluster)} ["$cluster"]\n""")
      ps.foreach(p => sb.append(s"""        ${mid(p.name)}["${mermaidLabel(p)}"]\n"""))
      sb.append("    end\n\n")
    }
    floating.foreach(p => sb.append(s"""    ${mid(p.name)}["${mermaidLabel(p)}"]\n"""))
    g.datasources.foreach(ds => sb.append(s"""    ${mid(ds)}(["$ds"])\n"""))
    sb.append("\n")
    g.edges.zipWithIndex.foreach { case (e, i) =>
      if (e.isDependency) {
        sb.append(s"    ${mid(e.from)} -.-> ${mid(e.to)}\n")
        sb.append(s"    linkStyle $i stroke:#ff6b35,stroke-width:2px\n")
      } else sb.append(s"    ${mid(e.from)} --> ${mid(e.to)}\n")
    }
    sb.append("\n")
    g.pipelines.foreach(p => sb.append(s"    class ${mid(p.name)} pipeline\n"))
    g.datasources.foreach(ds => sb.append(s"    class ${mid(ds)} dataSource\n"))
    sb.toString
  }

  private def mermaidLabel(p: LineageNode): String =
    if (p.schedule.nonEmpty) s"${p.name}<br/>(${p.schedule})" else p.name
}
