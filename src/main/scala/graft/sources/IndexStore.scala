package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Persistence for the search index state — the Spark restatement of the
  * reference's durability story (index written only in a shutdown hook,
  * `main.py:168-173`, loaded-or-inited at startup, `main.py:55-63`; a crash
  * between SQLite commit and FAISS insert loses vectors, `main.py:132-134`).
  *
  * Here both halves of the state (id mapping + vector table) are written by
  * the same job, each dataset commits atomically via the Parquet committer
  * (`_SUCCESS` marker), and readers see either the old or the new snapshot
  * of a dataset — no shutdown-hook durability. All existence/metadata
  * checks go through the Hadoop [[FileSystem]] API, so the same pattern
  * works unchanged when the store root is an `hdfs://`/`s3a://` URI in a
  * cluster deployment (a `java.io.File` check would silently report "not
  * committed" there and rebuild on every query).
  */
object IndexStore {

  /** Session Hadoop conf (spark.hadoop.* properties — credentials,
    * endpoints, defaultFS), cached PER SESSION: committed() sits on every
    * persisted-index query path and newHadoopConf() copies the full
    * property set per call, but caching the first resolution for the JVM
    * lifetime would silently serve a stale conf to a later session with
    * different spark.hadoop.* settings (multi-session tests, relaunched
    * sessions). The cache keys on session identity and re-resolves when
    * the active session changes; with NO active session the bare
    * Configuration is returned uncached so it can never mask a later
    * session's properties. Shared package-wide so every FileSystem lookup
    * (e.g. [[graft.streaming.StreamingIndex]]) resolves against the SAME
    * configuration as the committed() checks.
    */
  @transient @volatile
  private var cachedConf: (SparkSession, Configuration) = _
  private[graft] def hadoopConf: Configuration =
    // getActiveSession is THREAD-local (None on e.g. a streaming
    // micro-batch worker thread) — fall back to the JVM-wide default
    // session before surrendering to a bare spark.hadoop.*-less conf
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        val c = cachedConf
        if (c != null && (c._1 eq s)) c._2
        else {
          val conf = s.sessionState.newHadoopConf()
          cachedConf = (s, conf)
          conf
        }
      case None => new Configuration()
    }

  /** One committed parquet dataset of any derived index artifact (band
    * keys, signatures, centroids…). Readers gate on [[committed]], so a
    * crashed write is indistinguishable from "never built".
    */
  def saveDataset(df: DataFrame, path: String): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    schemaCache.remove(path)
  }

  /** Per-JVM parquet schema cache (path → inferred StructType) behind
    * [[readCached]]. Schema inference reads footers on the DRIVER on
    * every `spark.read.parquet` call — measured ~0.1 s per call at
    * fixture scale, paid by every query × table × rep across the bench.
    * Fixture tables and index artifacts are schema-stable for a path's
    * lifetime (new data lands in NEW fingerprinted/seq-numbered paths),
    * so the first inference holds; writes through [[saveDataset]]/
    * [[save]] invalidate their path. This caches METADATA only — the
    * data files are re-listed and re-read on every call as before.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** [[SparkSession.read.parquet]] with the per-path schema cache — THE
    * read seam for schema-stable parquet paths (fixture tables, index
    * artifacts, manifest segments). Inference failures propagate
    * uncached (e.g. the TIMESTAMP(NANOS) refusal [[graft.Tables]]
    * branches on).
    */
  def readCached(spark: SparkSession, path: String): DataFrame = {
    ensureWriteInvalidator(spark)
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }

  // Structural closure of the cache's write seam (r18): ~60 artifact
  // writes go through raw `.write.parquet` into fresh committed-guarded
  // version dirs — safe by the immutable-dir convention, but only by
  // convention. A per-session QueryExecutionListener invalidates the
  // cached schema of EVERY parquet path this session writes, so a future
  // in-place overwrite cannot serve a stale schema. (Listener delivery is
  // async — the convention stays the primary guarantee; this removes the
  // correctness dependence on it for any read that follows the write by
  // more than a listener-bus beat.)
  private val invalidatorSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  private def ensureWriteInvalidator(spark: SparkSession): Unit = {
    if (invalidatorSessions.contains(spark)) return
    invalidatorSessions.synchronized {
      if (invalidatorSessions.contains(spark)) return
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          private def invalidate(
              qe: org.apache.spark.sql.execution.QueryExecution): Unit =
            qe.analyzed.foreach {
              case c: org.apache.spark.sql.execution.datasources
                  .InsertIntoHadoopFsRelationCommand =>
                schemaCache.remove(c.outputPath.toString)
                // writers pass the path string; outputPath may carry a
                // `file:` scheme — drop it so both spellings invalidate
                schemaCache.remove(c.outputPath.toUri.getPath)
              case _ => ()
            }
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = invalidate(qe)
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = invalidate(qe)
        })
      invalidatorSessions.add(spark)
    }
  }

  private[graft] def invalidateSchema(path: String): Unit =
    schemaCache.remove(path)

  def committed(path: String): Boolean = {
    val p = new Path(path, "_SUCCESS")
    p.getFileSystem(hadoopConf).exists(p)
  }

  /** Per-(fixture, index-name) directory under the JVM temp root — the
    * stand-in for the index's durable location (HDFS/object store in a
    * cluster deployment; swap the root for a `hdfs://`/`s3a://` URI and
    * the FileSystem-based checks keep working). The key embeds a
    * fingerprint of the SOURCE table's file (size + mtime), so a
    * regenerated fixture at the same path gets a fresh index instead of
    * silently serving a stale one; builders additionally version their
    * `name` (e.g. "dedup-v2") so a builder-code change invalidates too.
    * Rebuild/read races are out of scope: one driver process owns an
    * index dir (the cluster analog is a build job + readers of committed
    * snapshots).
    */
  def indexDir(sfDir: String, name: String, sourceTable: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_index_" + sfDir.replaceAll("[^A-Za-z0-9]", "_"),
      s"$name-${sourceFingerprint(sfDir, sourceTable)}").toString

  /** The SOURCE table's (size + mtime) fingerprint as a hex token — what
    * [[indexDir]] embeds in every index path, exposed so in-JVM caches of
    * source-DERIVED values (e.g. predicate selectivities) can key on data
    * identity and never serve a regenerated fixture a stale figure.
    */
  private[graft] def sourceFingerprint(sfDir: String,
                                       sourceTable: String): String = {
    val src = new Path(sfDir, s"$sourceTable.parquet")
    val fs = src.getFileSystem(hadoopConf)
    java.lang.Long.toHexString(fingerprint(fs, fs.getFileStatus(src)))
  }

  /** Recursive (name, size, mtime) digest — handles both single-file and
    * directory-shaped parquet datasets (a directory's own length/mtime say
    * nothing about part-file rewrites). Children are folded in sorted
    * order so listing order can't change the value. An in-place rewrite
    * within one mtime millisecond AND identical sizes still collides —
    * the usual mtime-check caveat, accepted here.
    */
  private def fingerprint(fs: FileSystem, st: FileStatus): Long = {
    val own = st.getPath.getName.hashCode.toLong ^ st.getLen ^
      java.lang.Long.rotateLeft(st.getModificationTime, 21)
    if (!st.isDirectory) own
    else fs.listStatus(st.getPath).sortBy(_.getPath.getName)
      .foldLeft(own) { (acc, c) =>
        java.lang.Long.rotateLeft(acc, 7) ^ fingerprint(fs, c)
      }
  }

  /** Manifest-based version layout — the snapshot pattern of log-structured
    * table formats (Iceberg/Delta, public knowledge): a version is a TINY
    * committed parquet dataset at `versionDir/manifest` whose rows name the
    * version's IMMUTABLE data segments, `(artifact, path, seq)`. An append
    * writes ONLY the batch's new segments plus one new manifest that
    * re-references the predecessor's rows — no corpus data is ever copied
    * or rewritten per version, so version I/O is O(batch) like the
    * reference's `index.add_with_ids` (`main.py:134`), not O(corpus).
    * The manifest is written LAST: its `_SUCCESS` is the whole-version
    * commit marker (a crash after the segments but before the manifest
    * reads as "version never existed", and a checkpointed replay rewrites
    * the same segments deterministically).
    */
  /** Compaction policy shared by every manifested store (flat upsert
    * store and IVF chain): when writing a version would push one
    * artifact's segment list PAST this bound, the writer folds the whole
    * resolved artifact into a single fresh segment instead of appending a
    * delta — the level-0 file cap of log-structured tables. The bound is
    * what turns merge-on-read from "grows forever" into a constant
    * read-amplification factor: reads union at most `DefaultMaxSegments`
    * segment scans, and the compaction's O(corpus) rewrite is amortized
    * over the `DefaultMaxSegments − 1` O(batch) appends it re-arms. The
    * policy is derived purely from the PREDECESSOR's manifest, so a
    * checkpointed replay of a batch makes the same decision and rewrites
    * the same version deterministically.
    */
  val DefaultMaxSegments: Int = 8

  def writeManifest(spark: SparkSession, versionDir: String,
                    entries: Seq[(String, String, Long)]): Unit = {
    import spark.implicits._
    saveDataset(entries.toDF("artifact", "path", "seq")
      .coalesce(1), s"$versionDir/manifest")
  }

  /** The version's `(artifact, path, seq)` rows, ordered by (artifact,
    * seq). The row count is the number of segments ever appended — at most
    * versions-retained × artifacts — so the collect is control-plane
    * metadata, never data.
    *
    * COMMITTED manifests are cached per JVM (plain Scala rows — no
    * session or DataFrame pinned): the commit protocol makes a committed
    * manifest immutable (written LAST, exactly once — replay
    * short-circuits on the commit marker, version dirs are never
    * reused), so re-reading it is a pure re-fetch of identical bytes.
    * Without the cache every manifested read path (layout resolution,
    * tombstone lookup, segment load) pays one Spark job per manifest
    * per call — a K-shard scatter-gather over version chains was
    * spending more jobs on manifest re-reads than on the searches
    * (round 17, `search_asof_sharded`). An UNCOMMITTED path skips the
    * cache entirely and keeps its read-fails-loudly behavior; a
    * retention-vacuumed dir stays refused by its callers'
    * `committed(...)` requires, which check the filesystem, not this
    * cache.
    */
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, String, Long)]]()

  def readManifest(spark: SparkSession,
                   versionDir: String): Seq[(String, String, Long)] = {
    def load() = spark.read.parquet(s"$versionDir/manifest")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._1, e._3)).toSeq
    if (!committed(s"$versionDir/manifest")) load()
    else manifestCache.computeIfAbsent(versionDir, _ => load())
  }

  /** seq-ordered segment paths of one artifact. */
  def manifestSegments(entries: Seq[(String, String, Long)],
                       artifact: String): Seq[String] =
    entries.filter(_._1 == artifact).sortBy(_._3).map(_._2)

  /** One artifact of a manifested version as the union of its immutable
    * segments — the reader for INSERT-ONLY artifacts (signature tables,
    * vector tables). Artifacts needing row resolution (LWW mappings)
    * layer their merge on top (e.g.
    * [[graft.streaming.StreamingIndex.loadMappingAt]]).
    */
  /** Union-read a list of immutable segment paths — THE one
    * segment-resolution seam ([[loadSegments]], the streaming store's
    * schema-pinned reader and the IVF layout reader all delegate here,
    * so empty-segment/ordering/schema-merge behavior cannot drift
    * between the three stores).
    */
  def readUnion(spark: SparkSession, paths: Seq[String],
                schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    paths
      .map(p => schema.fold(readCached(spark, p))(s =>
        spark.read.schema(s).parquet(p)))
      .reduce(_ unionByName _)

  def loadSegments(spark: SparkSession, versionDir: String,
                   artifact: String): DataFrame =
    readUnion(spark,
      manifestSegments(readManifest(spark, versionDir), artifact))

  def save(mapping: DataFrame, vectors: DataFrame, dir: String): Unit = {
    saveDataset(mapping, s"$dir/mapping")
    saveDataset(vectors, s"$dir/vectors")
  }

  /** Load a dataset if a committed copy exists, else an empty DataFrame
    * with the expected schema (the reference's load-or-init,
    * `main.py:55-63`).
    */
  def loadOrInit(spark: SparkSession, path: String,
                 schema: StructType): DataFrame =
    if (committed(path)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def loadMapping(spark: SparkSession, dir: String,
                  schema: StructType): DataFrame =
    loadOrInit(spark, s"$dir/mapping", schema)

  def loadVectors(spark: SparkSession, dir: String,
                  schema: StructType): DataFrame =
    loadOrInit(spark, s"$dir/vectors", schema)
}
