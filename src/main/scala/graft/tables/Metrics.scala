package graft.tables

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Engine metrics (the Spark-side analogue of the reference's prometheus
  * decorator layers, icelake/src/metrics.rs): process-wide counters for
  * writes, commits, and scans. On a cluster these surface per-driver;
  * task-side counts arrive through the collected DataFile descriptors, so
  * no executor instrumentation is needed. */
object Metrics {

  private val counters = new ConcurrentHashMap[String, LongAdder]()

  def inc(name: String, delta: Long = 1L): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder()).add(delta)

  def get(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  def snapshot(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) => k -> v.sum() }.toMap
  }

  def reset(): Unit = counters.clear()

  // canonical counter names
  val CommitsTotal = "commits_total"
  val CommitConflicts = "commit_conflicts_total"
  val DataFilesWritten = "data_files_written_total"
  val DeleteFilesWritten = "delete_files_written_total"
  val RecordsWritten = "records_written_total"
  val BytesWritten = "bytes_written_total"
  val ScansPlanned = "scans_planned_total"
  val PlanFilesCalls = "plan_files_calls_total"
  val DistributedPlans = "distributed_plans_total"
  val ManifestsMerged = "manifests_merged_total"
  val EqDeleteFilesSkipped = "eq_delete_files_skipped_total"
  val FilesPruned = "files_pruned_total"
  val FilesScanned = "files_scanned_total"
  val ChangelogDataFilesRead = "changelog_data_files_read_total"
  val ZOrderRangeScans = "zorder_range_scans_total"
  val ManifestCacheHits = "manifest_cache_hits_total"
  val ManifestCacheMisses = "manifest_cache_misses_total"
  val MaintenanceFilesDeleted = "maintenance_files_deleted_total"
  val MetadataOnlyDeletedFiles = "metadata_only_deleted_files_total"
  val MaintenanceExecutorDeletes = "maintenance_executor_deletes_total"
}
