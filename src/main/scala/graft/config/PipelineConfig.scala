package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types.{DataType, Metadata, MetadataBuilder, StructField, StructType}

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** One column of a pipeline's declared data object.
  *
  * Mirrors the reference's config schema entries `{name, type, comment}`
  * (reference: pipelines/tableA/config.json:19-23), which are materialized
  * as Glue Catalog columns (reference: templates/cds_view_template.py:28-33).
  * `tpe` is a Hive/Glue type string; we parse it with [[DataType.fromDDL]],
  * which gives the full Spark type system (decimal, timestamp, array, map,
  * nested struct) for free.
  */
final case class ColumnSpec(name: String, tpe: String, comment: String) {
  def toStructField: StructField = {
    val md: Metadata =
      if (comment.isEmpty) Metadata.empty
      else new MetadataBuilder().putString("comment", comment).build()
    StructField(name, DataType.fromDDL(tpe), nullable = true, md)
  }
}

/** Declarative maintenance layout for a pipeline's prepared prefix:
  * which columns queries range-filter on, and whether to cluster them
  * lexicographically ([[graft.jobs.LayoutJob.clusterBy]] — skipping on
  * the leading column) or Z-ordered ([[graft.jobs.LayoutJob.zorderBy]] —
  * skipping on every column independently). Declared in the config
  * because the hot predicate columns are a property of the pipeline's
  * query workload, not of any single run — the orchestrator applies the
  * policy whenever maintenance fires, with no operator in the loop. */
/** Declarative incrementally-maintained rollup over the log-backed
  * prepared table: after every ledger drain the orchestration refreshes
  * `derived == prepared.groupBy(key).agg(aggs)` by folding ONLY the
  * change feed since the last refresh ([[graft.table.DerivedAggregate]]
  * — O(new data), exactly-once via the derived table's own txns
  * watermark). Declared in config because the rollup is a property of
  * the pipeline's serving workload, not of any single run; the
  * aggregates are [[graft.table.AggCol]]'s decomposable set
  * (count/sum/min/max/approx_distinct/approx_median). Note that
  * min/max and the sketch aggregates (approx_distinct/approx_median)
  * are not subtractable — a row-REMOVING base commit folds them via
  * the targeted-recompute path (re-aggregate just the touched keys),
  * while a count/sum-only rollup folds removals purely algebraically. */
final case class RollupSpec(name: String, key: String,
    aggs: Seq[graft.table.AggCol]) {
  require(name.matches("[A-Za-z0-9_]+"),
    s"rollup name must be [A-Za-z0-9_]+: '$name'")
  require(aggs.nonEmpty, "a rollup needs at least one aggregate")
  // fail at CONFIG time, not at the first drain's refresh: every
  // aggregate except count reads an input column
  aggs.filter(a => a.fn != "count" && a.in.isEmpty).foreach(a =>
    throw new IllegalArgumentException(
      s"rollup aggregate '${a.out}' (${a.fn}) needs an \"in\" column"))
}

/** A config-declared CHECK constraint on the prepared table
  * ([[graft.table.SnapshotLog.addConstraint]]): every promoted run must
  * satisfy `check` on every row or the WHOLE promotion aborts before
  * publish — the pipeline's data-quality gate declared beside the
  * schema, enforced on the same Observation pass that counts rows
  * (zero extra jobs per drain). Declared in config because the gate is
  * pipeline POLICY like the rollup, not a property of a run. */
final case class CheckSpec(name: String, check: String) {
  // the SAME name grammar addConstraint enforces — one definition, so a
  // config that validates here cannot crash the drain on the name
  require(graft.table.SnapshotLog.TagNameRe.matches(name),
    s"constraint name must be [A-Za-z0-9][A-Za-z0-9._-]*: '$name'")
  require(check.trim.nonEmpty, s"constraint '$name' needs a CHECK expression")
}

final case class LayoutPolicy(columns: Seq[String], zorder: Boolean = false) {
  require(columns.nonEmpty, "layout policy needs at least one column")
  require(!zorder || columns.size >= 2,
    "zorder layout needs at least two columns (use lexicographic for one)")
}

/** Declarative spec of one pipeline, parsed from a `config.json`.
  *
  * Field-for-field equivalent of the reference's pipeline declaration
  * (reference: pipelines/tableA/config.json:1-25), with local/URI roots in
  * place of bare S3 bucket names so the same config drives local-FS tests
  * and real object stores. The reference resolves configs driver-side from
  * S3 (reference: glue src/raw_layer_job.py:38-46); we resolve from any
  * java.nio path.
  *
  * Divergence from the reference (documented per SURVEY §2.1): the ledger
  * table name is honored (the reference hardcodes 'pipeline_table' at
  * glue src/raw_layer_job.py:195) and no credentials live in configs
  * (reference hardcodes them at glue src/raw_layer_job.py:117-119) —
  * JDBC credentials come from the environment at source-construction time.
  */
final case class PipelineConfig(
    template: String,
    project: String,
    subject: String,
    jobSrc: String,
    ledgerName: String,
    rawRoot: String,
    rawFolder: String,
    cdsView: String,
    preparedRoot: String,
    tableName: String,
    schema: Seq[ColumnSpec],
    dedupColumn: Option[String] = None,
    layout: Option[LayoutPolicy] = None,
    tableFormat: String = PipelineConfig.FormatDir,
    layoutAdvised: Boolean = false,
    bloomColumns: Seq[String] = Nil,
    partitionBy: Seq[graft.table.PartitionField] = Nil,
    sortBy: Seq[String] = Nil,
    changeFeed: Boolean = false,
    rollup: Option[RollupSpec] = None,
    constraints: Seq[CheckSpec] = Nil
) {
  require(!(layoutAdvised && layout.isDefined),
    "layout_mode 'advised' means NO declared cluster_by — a declared policy always wins")
  require(template == PipelineConfig.CdsViewTemplate,
    s"unknown template '$template' (only '${PipelineConfig.CdsViewTemplate}' is supported)")
  require(tableFormat == PipelineConfig.FormatDir ||
      tableFormat == PipelineConfig.FormatLog,
    s"unknown table_format '$tableFormat' (${PipelineConfig.FormatDir}|${PipelineConfig.FormatLog})")
  layout.foreach { p =>
    val known = schema.map(_.name).toSet + "ETL_PART_KEY"
    val unknown = p.columns.filterNot(known)
    require(unknown.isEmpty,
      s"layout columns not in the declared schema: ${unknown.mkString(", ")}")
  }
  locally {
    val known = schema.map(_.name).toSet + "ETL_PART_KEY"
    val unknown = bloomColumns.filterNot(known)
    require(unknown.isEmpty,
      s"bloom columns not in the declared schema: ${unknown.mkString(", ")}")
    val badPart = partitionBy.map(_.source).filterNot(known)
    require(badPart.isEmpty,
      s"partition_by sources not in the declared schema: ${badPart.mkString(", ")}")
    val badSort = sortBy.filterNot(known)
    require(badSort.isEmpty,
      s"sort_by columns not in the declared schema: ${badSort.mkString(", ")}")
    require(useLog || (partitionBy.isEmpty && sortBy.isEmpty),
      "partition_by / sort_by need table_format 'log' (the bare directory " +
        "layer has no partition-tuple or write-order contract)")
    require(useLog || !changeFeed,
      "change_feed needs table_format 'log' (row-level CDC images live " +
        "in the transaction log's manifests)")
    require(useLog || rollup.isEmpty,
      "rollup needs table_format 'log' (it folds the log's change feed)")
    require(useLog || constraints.isEmpty,
      "constraints need table_format 'log' (enforcement rides the " +
        "log's transactional staging — the bare directory has no " +
        "abort-before-publish point)")
    require(constraints.map(_.name).distinct.size == constraints.size,
      s"duplicate constraint names: ${constraints.map(_.name).mkString(", ")}")
    rollup.foreach { r =>
      require(known(r.key), s"rollup key '${r.key}' not in the declared schema")
      val badIn = r.aggs.filter(a => a.in.nonEmpty && !known(a.in))
      require(badIn.isEmpty,
        s"rollup agg inputs not in the declared schema: ${badIn.map(_.in).mkString(", ")}")
    }
    require(partitionBy.isEmpty || (layout.isEmpty && !layoutAdvised),
      "partition_by excludes cluster_by/layout_mode: a partitioned stage " +
        "re-routes rows by tuple, undoing a global range/curve layout — " +
        "declare sort_by for within-partition clustering instead")
  }

  /** Spark schema declared for the cataloged data object. */
  def structType: StructType = StructType(schema.map(_.toStructField))

  /** Stable raw-layer prefix; runs land under Hive-style
    * `ETL_PART_KEY=<runId>` partitions (upgrade over the reference's
    * opaque run-suffixed paths at glue src/raw_layer_job.py:160 —
    * Catalyst gets partition pruning on the audit key, SURVEY §4). */
  def rawTablePath: String = s"$rawRoot/$rawFolder"

  /** One ingestion run's partition directory. */
  def rawRunPath(runId: String): String = s"$rawTablePath/ETL_PART_KEY=$runId"

  /** Stable prepared-layer prefix successive runs append into
    * (reference: glue src/prepared_layer_job.py:127). */
  def preparedPath: String = s"$preparedRoot/$rawFolder"

  /** Persisted fingerprint index for cross-run incremental dedup (only
    * used when [[dedupColumn]] is set): one 8-byte `fp` per distinct
    * admitted value, appended to at each promotion. Lives BESIDE the
    * prepared data prefix — never under it — so the cataloged table's
    * file listing stays pure data. */
  def fingerprintIndexPath: String = s"$preparedRoot/${rawFolder}__fpindex"

  /** True when the prepared layer is a [[graft.table.SnapshotLog]]-backed
    * table (config `prepared.table_format: "log"`) rather than the
    * reference's bare append directory: promotion commits each run
    * through the log (exactly-once via the run-id txn watermark),
    * planning is listing-free, and maintenance is a swap-window-free
    * `replace` commit. */
  def useLog: Boolean = tableFormat == PipelineConfig.FormatLog

  /** Stats columns the log-backed table records per-file [min, max] for
    * in its manifests: the declared layout columns (the columns queries
    * range-filter on — exactly what clustering makes disjoint and
    * manifest pruning then skips by). */
  def statsColumns: Seq[String] = layout.map(_.columns).getOrElse(Nil)

  /** The declared rollup's derived table, beside the prepared prefix
    * like the fingerprint index — never under it, so the cataloged
    * table's file listing stays pure data. */
  def rollupPath(name: String): String =
    s"$preparedRoot/${rawFolder}__rollup_$name"

  /** Persisted near-dup cluster labels for leakage-safe splitting
    * ([[graft.ops.Sampling.splitFromLabels]]): `(doc_id, cluster_rep)`
    * computed once per corpus build, joined at split time instead of
    * re-running the connected-components closure. Beside the prepared
    * prefix, like the fingerprint index. */
  def clusterLabelsPath: String = s"$preparedRoot/${rawFolder}__labels"

  /** Stack-style display name (reference: app.py:24). */
  def displayName: String = s"$project-$subject-$jobSrc"
}

object PipelineConfig {
  val CdsViewTemplate = "cds_view"
  /** Prepared layer is a bare append directory (the reference's shape,
    * glue src/prepared_layer_job.py:116-130) — the default. */
  val FormatDir = "dir"
  /** Prepared layer is a transaction-log table ([[graft.table.SnapshotLog]]). */
  val FormatLog = "log"

  private val mapper = new ObjectMapper()

  /** Parse a single config.json (reference shape: pipelines/tableA/config.json). */
  def parse(json: String): PipelineConfig = {
    val root = mapper.readTree(json)
    def req(node: JsonNode, field: String): JsonNode = {
      val n = node.get(field)
      require(n != null, s"config missing required field '$field'")
      n
    }
    val cfg = req(root, "config")
    val raw = req(root, "raw")
    val prepared = req(root, "prepared")
    val dataObject = req(root, "data_object")
    val cols = req(dataObject, "schema").elements().asScala.map { c =>
      ColumnSpec(
        req(c, "name").asText(),
        req(c, "type").asText(),
        Option(c.get("comment")).map(_.asText()).getOrElse(""))
    }.toSeq
    PipelineConfig(
      template = req(root, "template").asText(),
      project = req(root, "project").asText(),
      subject = req(root, "subject").asText(),
      jobSrc = req(cfg, "job_src").asText(),
      ledgerName = req(cfg, "dynamoTable").asText(),
      rawRoot = req(raw, "rawBucket").asText(),
      rawFolder = req(raw, "rawS3Folder").asText(),
      cdsView = req(raw, "CDSView").asText(),
      preparedRoot = req(prepared, "preparedBucket").asText(),
      tableName = req(dataObject, "name").asText(),
      schema = cols,
      // optional: enables cross-run incremental dedup at promotion time
      // (an extension — the reference's prepared layer appends blindly)
      dedupColumn = Option(prepared.get("dedup_column")).map(_.asText()),
      // optional: maintenance clusters the prepared prefix on these
      // columns; "layout_mode": "zorder" selects the Morton layout
      layout = Option(prepared.get("cluster_by")).map { n =>
        LayoutPolicy(
          n.asText().split(",").toSeq.map(_.trim).filter(_.nonEmpty),
          zorder = Option(prepared.get("layout_mode")).map(_.asText()) match {
            case None | Some("cluster") => false
            case Some("zorder") => true
            case Some(other) =>
              throw new IllegalArgumentException(
                s"unknown layout_mode '$other' (cluster|zorder)")
          })
      },
      // optional: "log" switches the prepared layer to the
      // transaction-log table format (default: the reference's bare
      // append directory)
      tableFormat = Option(prepared.get("table_format")).map(_.asText())
        .getOrElse(FormatDir),
      // optional: layout_mode "advised" WITHOUT a cluster_by lets the
      // orchestrator adopt the LayoutAdvisor's recommendation when
      // maintenance fires; any declared cluster_by always wins (and
      // combining it with "advised" is rejected in the layout parse)
      layoutAdvised = prepared.get("cluster_by") == null &&
        Option(prepared.get("layout_mode")).map(_.asText()).contains("advised"),
      // optional: log-backed tables keep a per-file key bloom on these
      // columns — point-lookup file skipping (graft.table.FileBlooms)
      bloomColumns = Option(prepared.get("bloom_columns")).map(
        _.asText().split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil),
      // optional: hidden partitioning for the log-backed prepared layer
      // — "partition_by": "day(ts), bucket[8](user_id), region" (bare
      // column = identity transform); "sort_by" declares write-time
      // clustering (graft.table.SnapshotLog sortBy)
      partitionBy = Option(prepared.get("partition_by")).map(n =>
        parsePartitionSpec(n.asText())).getOrElse(Nil),
      sortBy = Option(prepared.get("sort_by")).map(
        _.asText().split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Nil),
      // optional: row-level CDC on the log-backed prepared table —
      // delete/merge commits record change images, downstream mirrors
      // and rollups fold removals instead of resyncing
      changeFeed = Option(prepared.get("change_feed")).exists(_.asBoolean()),
      // optional: a declared rollup the drain keeps incrementally fresh
      // — {"name":…, "key":…, "aggs":[{"out":…, "fn":…, "in":…}]}
      rollup = Option(prepared.get("rollup")).map { rn =>
        val aggs = req(rn, "aggs")
        RollupSpec(req(rn, "name").asText(), req(rn, "key").asText(),
          (0 until aggs.size()).map { i =>
            val a = aggs.get(i)
            graft.table.AggCol(req(a, "out").asText(), req(a, "fn").asText(),
              Option(a.get("in")).map(_.asText()).getOrElse(""))
          }.toSeq)
      },
      // optional: declared CHECK constraints — the drain attaches them
      // before promoting, every promotion enforces them or aborts whole
      // — [{"name":…, "check":…}]
      constraints = Option(prepared.get("constraints")).map { cn =>
        (0 until cn.size()).map { i =>
          val c = cn.get(i)
          CheckSpec(req(c, "name").asText(), req(c, "check").asText())
        }.toSeq
      }.getOrElse(Nil)
    )
  }

  private val TransformRe = """^(\w+(?:\[\d+\])?)\((\w+)\)$""".r
  private val BareColRe = """^(\w+)$""".r

  /** Parse `"day(ts), bucket[8](user_id), region"` into the hidden
    * partition spec ([[graft.table.PartitionField]]); a bare column
    * name is the identity transform. Transform validity (name, positive
    * widths) is enforced by PartitionField's own constructor. */
  private[config] def parsePartitionSpec(s: String): Seq[graft.table.PartitionField] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map {
      case TransformRe(t, col) => graft.table.PartitionField(col, t)
      case BareColRe(col)      => graft.table.PartitionField(col, "identity")
      case other => throw new IllegalArgumentException(
        s"cannot parse partition_by entry '$other' " +
          "(expect transform(column) or a bare column name)")
    }

  def load(path: Path): PipelineConfig = parse(Files.readString(path))

  /** Walk a pipelines/ directory and load every {pipeline}/config.json,
    * dispatching on template (reference: app.py:17-25). Unknown templates
    * fail fast rather than being silently skipped. */
  def loadAll(pipelinesDir: Path): Seq[PipelineConfig] = {
    if (!Files.isDirectory(pipelinesDir)) return Seq.empty
    val listing = Files.list(pipelinesDir)
    val subs =
      try listing.iterator().asScala.toSeq.sortBy(_.toString)
      finally listing.close() // Files.list holds an fd until closed
    subs.flatMap { sub =>
      val cfg = sub.resolve("config.json")
      if (Files.isRegularFile(cfg)) Some(load(cfg)) else None
    }
  }

  /** Render back to the reference's JSON shape (for tests / round-trips). */
  def render(c: PipelineConfig): String = {
    val node = mapper.createObjectNode()
    node.put("template", c.template).put("project", c.project).put("subject", c.subject)
    node.putObject("config").put("job_src", c.jobSrc).put("dynamoTable", c.ledgerName)
    node.putObject("raw").put("rawBucket", c.rawRoot)
      .put("rawS3Folder", c.rawFolder).put("CDSView", c.cdsView)
    val prep = node.putObject("prepared").put("preparedBucket", c.preparedRoot)
    if (c.tableFormat != FormatDir) prep.put("table_format", c.tableFormat)
    c.dedupColumn.foreach(prep.put("dedup_column", _))
    c.layout.foreach { p =>
      prep.put("cluster_by", p.columns.mkString(","))
      if (p.zorder) prep.put("layout_mode", "zorder")
    }
    if (c.layoutAdvised) prep.put("layout_mode", "advised")
    if (c.bloomColumns.nonEmpty)
      prep.put("bloom_columns", c.bloomColumns.mkString(","))
    if (c.partitionBy.nonEmpty)
      prep.put("partition_by", c.partitionBy.map(f =>
        if (f.transform == "identity") f.source
        else s"${f.transform}(${f.source})").mkString(", "))
    if (c.sortBy.nonEmpty) prep.put("sort_by", c.sortBy.mkString(","))
    if (c.changeFeed) prep.put("change_feed", true)
    c.rollup.foreach { r =>
      val rn = prep.putObject("rollup")
      rn.put("name", r.name).put("key", r.key)
      val aa = rn.putArray("aggs")
      r.aggs.foreach { a =>
        val an = aa.addObject()
        an.put("out", a.out).put("fn", a.fn)
        if (a.in.nonEmpty) an.put("in", a.in)
      }
    }
    if (c.constraints.nonEmpty) {
      val ca = prep.putArray("constraints")
      c.constraints.foreach(k =>
        ca.addObject().put("name", k.name).put("check", k.check))
    }
    val d = node.putObject("data_object")
    d.put("name", c.tableName)
    val arr = d.putArray("schema")
    c.schema.foreach { col =>
      arr.addObject().put("name", col.name).put("type", col.tpe).put("comment", col.comment)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }
}
