package graft.tables

/** Per-column manifest metrics modes — the Iceberg table properties
  * `write.metadata.metrics.default`, `write.metadata.metrics.column.<name>`
  * and `write.metadata.metrics.max-inferred-column-defaults`.
  *
  * The reference harvests full stats unconditionally
  * (icelake/src/io/parquet/write.rs builds `DataFileBuilder` from every
  * footer column); at 100 TB the manifests themselves become a scan
  * bottleneck — a wide table tracked `full` stores two bound values per
  * column per file, so a 1000-column table at 10M files carries ~20B
  * bound entries. Metrics modes are how Iceberg bounds manifest size:
  *
  *   - `none`      — only the column's on-disk size is kept;
  *   - `counts`    — value/null/NaN counts, no bounds;
  *   - `truncate(N)` — counts plus bounds, string/binary bounds cut to N
  *     code points / bytes (upper bounds rounded UP so pruning stays
  *     sound);
  *   - `full`      — counts plus untruncated bounds.
  *
  * The engine default matches Iceberg's: `truncate(16)`.
  */
sealed trait MetricsMode extends Serializable

object MetricsMode {
  /** only column sizes */
  case object NoMetrics extends MetricsMode
  /** counts, no bounds */
  case object Counts extends MetricsMode
  /** counts + bounds truncated at `len` code points (string) / bytes (binary) */
  final case class Truncate(len: Int) extends MetricsMode
  /** counts + untruncated bounds */
  case object Full extends MetricsMode

  private val TruncRe = """truncate\((\d+)\)""".r

  def parse(s: String): MetricsMode = s.trim.toLowerCase match {
    case "none" => NoMetrics
    case "counts" => Counts
    case "full" => Full
    case TruncRe(n) if n.toInt > 0 => Truncate(n.toInt)
    case other => sys.error(s"invalid metrics mode: '$other' " +
      "(expected none | counts | truncate(N) | full)")
  }
}

/** Modes resolved per field id on the driver; ships to executors with the
  * stats harvest. Fields absent from the map (e.g. the internal row-lineage
  * columns, position-delete path/pos) use the engine default. */
final case class MetricsConfig(modes: Map[Int, MetricsMode]) extends Serializable {

  def mode(id: Int): MetricsMode = modes.getOrElse(id, MetricsConfig.DefaultMode)

  /** value/null/NaN counts kept for this column? */
  def keepCounts(id: Int): Boolean = mode(id) != MetricsMode.NoMetrics

  /** bounds policy: `None` = no bounds; `Some(None)` = full bounds;
    * `Some(Some(n))` = bounds truncated at n */
  def boundsTrunc(id: Int): Option[Option[Int]] = mode(id) match {
    case MetricsMode.NoMetrics | MetricsMode.Counts => None
    case MetricsMode.Truncate(n) => Some(Some(n))
    case MetricsMode.Full => Some(None)
  }
}

object MetricsConfig {
  val DefaultMode: MetricsMode = MetricsMode.Truncate(16)

  /** Iceberg's default cap on how many columns get inferred (non-explicit)
    * metrics — columns past it keep only sizes unless explicitly configured. */
  val DefaultMaxInferred = 100

  val default: MetricsConfig = MetricsConfig(Map.empty)

  /** Resolve the table's metrics properties against its current schema.
    * Explicit `write.metadata.metrics.column.<name>` wins; otherwise the
    * table default applies to the first `max-inferred-column-defaults`
    * fields and everything past the cap collects no metrics. */
  def fromProperties(props: Map[String, String], schema: IceSchema): MetricsConfig = {
    val defMode = props.get("write.metadata.metrics.default")
      .map(MetricsMode.parse).getOrElse(DefaultMode)
    val maxInferred = props.get("write.metadata.metrics.max-inferred-column-defaults")
      .map(_.toInt).getOrElse(DefaultMaxInferred)
    val modes = schema.fields.zipWithIndex.map { case (f, idx) =>
      val m = props.get(s"write.metadata.metrics.column.${f.name}")
        .map(MetricsMode.parse)
        .getOrElse(if (idx < maxInferred) defMode else MetricsMode.NoMetrics)
      f.id -> m
    }.toMap
    MetricsConfig(modes)
  }
}
