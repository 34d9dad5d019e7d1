package graft.index

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import Schema.LineageRecord

/** Per-(stage, group) checkpoint/lineage markers (north rule: resumable
  * builds with lineage). A marker is a small JSON file created atomically
  * (write temp + rename) through the Hadoop FileSystem API, so the same code
  * works on local FS, HDFS and object stores with HDFS semantics. A stage
  * group is re-run iff its marker is absent; stage outputs live at
  * deterministic paths keyed by (stage, group), so re-runs are idempotent
  * overwrites.
  */
final class Checkpoint(spark: SparkSession, indexDir: String, buildId: String) {

  private def fs: FileSystem =
    new Path(indexDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(stage: String, group: Int): Path =
    new Path(s"$indexDir/_lineage/$buildId/${stage}__$group.json")

  def done(stage: String, group: Int = -1): Boolean =
    fs.exists(markerPath(stage, group))

  def mark(stage: String, group: Int, rows: Long, wallMs: Long): Unit = {
    val p = markerPath(stage, group)
    fs.mkdirs(p.getParent)
    val json =
      s"""{"buildId":"$buildId","stage":"$stage","group":$group,""" +
        s""""status":"done","rows":$rows,"wallMs":$wallMs}"""
    // the shared atomic writer, NOT delete-then-rename: the local FS Spark
    // installs refuses overwriting renames, and a discarded rename result
    // would silently lose the marker (stage re-runs on every resume)
    DeltaLog.writeAtomicString(fs, p.toString, json)
  }

  /** Runs `body` unless the (stage, group) marker exists; records rows and
    * wall time on completion. Returns rows (from marker if skipped).
    */
  def stage(stageName: String, group: Int = -1)(body: => Long): Long = {
    if (done(stageName, group)) {
      readMarker(stageName, group).map(_.rows).getOrElse(0L)
    } else {
      val t0 = System.nanoTime()
      val rows = body
      mark(stageName, group, rows, (System.nanoTime() - t0) / 1000000L)
      rows
    }
  }

  def readMarker(stage: String, group: Int): Option[LineageRecord] = {
    val p = markerPath(stage, group)
    if (!fs.exists(p)) return None
    val s = new String(DeltaLog.readSmallBytes(fs, p),
      StandardCharsets.UTF_8)
    def field(name: String): String = {
      val i = s.indexOf("\"" + name + "\":") + name.length + 3
      val end = s.indexWhere(c => c == ',' || c == '}', i)
      s.substring(i, end).stripPrefix("\"").stripSuffix("\"")
    }
    Some(LineageRecord(
      field("buildId"), field("stage").stripPrefix("\"").stripSuffix("\""),
      field("group").toInt, "done", field("rows").toLong,
      field("wallMs").toLong))
  }

  /** All lineage records of this build (for the `lineage` table view). */
  def readAll(): Seq[LineageRecord] = {
    val dir = new Path(s"$indexDir/_lineage/$buildId")
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .filter(st => st.getPath.getName.endsWith(".json"))
      .flatMap { st =>
        val name = st.getPath.getName.stripSuffix(".json")
        val idx = name.lastIndexOf("__")
        readMarker(name.substring(0, idx), name.substring(idx + 2).toInt)
      }
  }
}
