package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table over plain parquet — the table format the
  * north rule's "Iceberg table of interleaved documents" reduces to with
  * the jars available offline (no Iceberg runtime; the layout mirrors its
  * metadata tree 1:1 so a real catalog can adopt the same shape):
  *
  *   <root>/data/<uuid>-N.parquet        immutable data files
  *   <root>/manifests/m-<uuid>.parquet   per-commit file list + stats
  *                                       (rows, bbox, order_key interval)
  *   <root>/snapshots/v<N>.json          manifest list + parent pointer
  *   <root>/VERSION                      current-version pointer (atomic
  *                                       rename commit)
  *
  * Commit protocol (crash-safe, optimistic):
  *   1. stage data files, move them under data/ (new names, never reused)
  *   2. write the manifest parquet (per-file stats read from the staged
  *      files' parquet FOOTERS — metadata-only, no second data scan)
  *   3. allocate the next version with an EXCLUSIVE create of
  *      snapshots/v<N>.json — two racing committers cannot both win N;
  *      the loser re-reads the head and retries on the parent it lost to
  *   4. flip VERSION via atomic temp-write + rename
  * A crash before (3) leaves orphan data/manifest files that no snapshot
  * references — invisible to readers, never a corrupt table.
  *
  * Reads resolve a snapshot (head or explicit time-travel version), union
  * its manifests, prune FILES by bbox/rows stats against the predicate,
  * and scan only survivors — manifest-level pruning one level below
  * CellStore's partition-value pruning (EptReader.cpp:200-269 page walk).
  * Manifests are parquet: at 10^12-doc scale the file list is itself a
  * distributed table; only surviving paths are collected (as Iceberg's
  * planner does).
  */
object GraftTable {

  /** `schema` is the path of the committed DataFrame's schema json —
    * the snapshot PINS its schema (Iceberg semantics): a head read
    * applies the latest commit's schema to every data file, so files
    * from before a column was added surface it as nulls, and time
    * travel reads with the schema of its era. Absent in pre-evolution
    * tables: those fall back to parquet inference. */
  case class Snapshot(version: Int, parent: Int, manifests: Seq[String],
      schema: Option[String] = None)

  private def versionFile(root: String) = Paths.get(root, "VERSION")

  /** NIO directory streams must be closed — unclosed ones leak a file
    * descriptor per call until finalization (streaming sinks commit once
    * per microbatch, so the leak compounds fast). */
  private def withStream[S <: java.util.stream.BaseStream[_, _], R](s: S)(f: S => R): R =
    try f(s) finally s.close()

  /** Current head version, or 0 when the table is empty/new. */
  def currentVersion(root: String): Int = {
    val vf = versionFile(root)
    if (Files.exists(vf)) new String(Files.readAllBytes(vf), "UTF-8").trim.toInt
    else 0
  }

  def snapshot(root: String, version: Int): Snapshot = {
    val f = Paths.get(root, "snapshots", s"v$version.json")
    require(Files.exists(f), s"graft table $root has no snapshot v$version")
    val txt = new String(Files.readAllBytes(f), "UTF-8")
    // flat, self-written JSON — parse with the same tiny scanner style the
    // pipeline dialect uses rather than a full parser dependency
    val parent = "\"parent\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).get.group(1).toInt
    val ms = "\"manifests\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(txt).get.group(1)
    val paths = "\"([^\"]+)\"".r.findAllMatchIn(ms).map(_.group(1)).toSeq
    val schema = "\"schema\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(txt).map(_.group(1))
    Snapshot(version, parent, paths, schema)
  }

  /** Append `df` as a new snapshot (overwrite = drop parent manifests).
    * Returns the committed version.
    *
    * Appends EVOLVE the pinned schema, never narrow it: the snapshot pins
    * parent-schema ∪ df-schema (a df missing a base column must not make
    * that column vanish from head reads; its own files just read it as
    * nulls), re-merged inside the CAS loop against the parent actually
    * committed on, so racing committers adding different columns each
    * merge against the true head. A shared column name with a different
    * type fails loudly before the CAS — staged files stay invisible
    * orphans. Overwrite pins df's schema exactly (a replace defines the
    * table anew). */
  /** A snapshot accumulating more manifests than this triggers an inline
    * metadata-only manifest merge at commit time: every append adds a
    * manifest, so after 10^4 small appends a head read would union 10^4
    * tiny manifest parquets and read planning degrades to manifest-file
    * I/O. Iceberg bounds this with rewrite_manifests; the same merge
    * here runs automatically past the threshold (and on demand via
    * rewriteManifests). Data files are never touched. */
  val autoMergeManifestsAbove = 64

  def commit(df: DataFrame, root: String, overwrite: Boolean = false,
      tag: Option[String] = None,
      mergeAbove: Int = autoMergeManifestsAbove): Int = {
    require(mergeAbove >= 1, s"mergeAbove must be >= 1 (got $mergeAbove)")
    val commitId = UUID.randomUUID().toString.take(8)
    val (manifest, schemaPath) = stageCommit(df, root, commitId)
    allocate(root, commitId, schemaPath, tag, parent => {
      if (overwrite || parent == 0) Seq(manifest)
      else {
        val snap = snapshot(root, parent)
        snap.schema.filter(p => Files.exists(Paths.get(p))).foreach { pp =>
          val merged = mergeSchema(
            new String(Files.readAllBytes(Paths.get(pp)), "UTF-8"), df.schema)
          Files.write(Paths.get(schemaPath), merged.json.getBytes("UTF-8"))
        }
        val all = snap.manifests :+ manifest
        // parent-suffixed path: a CAS retry merges against a DIFFERENT
        // head's manifest list and must not overwrite the losing attempt
        // (which stays an invisible orphan until vacuum)
        if (all.size > mergeAbove)
          Seq(mergeManifestFiles(df.sparkSession, root, all,
            s"$commitId-p$parent"))
        else all
      }
    })
  }

  /** Metadata-only manifest maintenance (Iceberg's rewrite_manifests):
    * coalesce the head snapshot's manifest list into ONE manifest parquet
    * WITHOUT touching any data file, committed as a new snapshot that
    * carries the head's pinned schema forward. History stays intact —
    * prior snapshots keep referencing the old manifests until
    * expireSnapshots drops them. Returns the committed version (the
    * unchanged head when there is nothing to merge). */
  def rewriteManifests(spark: SparkSession, root: String): Int = {
    val base = currentVersion(root)
    require(base > 0, s"graft table $root is empty (no committed snapshot)")
    val snap = snapshot(root, base)
    if (snap.manifests.size <= 1) return base
    val commitId = UUID.randomUUID().toString.take(8)
    val merged = mergeManifestFiles(spark, root, snap.manifests, commitId)
    allocate(root, commitId, snap.schema.getOrElse(""), None, parent => {
      if (parent != base) throw new java.util.ConcurrentModificationException(
        s"graft table $root advanced v$base -> v$parent during " +
        "rewriteManifests; retry on the new head")
      Seq(merged)
    })
  }

  private def mergeManifestFiles(spark: SparkSession, root: String,
      manifests: Seq[String], commitId: String): String = {
    val merged = s"$root/manifests/m-$commitId-merged.parquet"
    readManifests(spark, manifests).repartition(1)
      .write.mode("overwrite").parquet(merged)
    merged
  }

  /** Parent ∪ append schema: parent fields keep their positions, new
    * fields append in df order; a shared name whose type differs (up to
    * nullability) is a real conflict and fails loudly. */
  private def mergeSchema(parentJson: String,
      df: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val parent = org.apache.spark.sql.types.DataType.fromJson(parentJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    df.fields.foreach { f =>
      parent.fields.find(_.name == f.name).foreach { pf =>
        // simpleString renders the type without nullability flags, which
        // is exactly the "same type up to nullability" comparison wanted
        // (DataType.sameType is private[sql])
        require(pf.dataType.simpleString == f.dataType.simpleString,
          s"append column '${f.name}' has type ${f.dataType.simpleString} " +
          s"but the table pins ${pf.dataType.simpleString} — schema " +
          "evolution is by column addition, not type change")
      }
    }
    val newFields = df.fields.filterNot(f => parent.fieldNames.contains(f.name))
    org.apache.spark.sql.types.StructType(parent.fields ++ newFields)
  }

  /** Steps 1+2 of the commit protocol: stage `df`'s rows as immutable
    * data files, derive their manifest from parquet footers, and write
    * the pinned-schema json. Returns (manifestPath, schemaPath). Until
    * a snapshot references them, everything written here is invisible
    * orphan data — crash-safe by construction. */
  private def stageCommit(df: DataFrame, root: String, commitId: String)
      : (String, String) = {
    val spark = df.sparkSession
    Files.createDirectories(Paths.get(root, "data"))
    Files.createDirectories(Paths.get(root, "manifests"))
    Files.createDirectories(Paths.get(root, "snapshots"))

    // 1. stage + adopt data files under never-reused names
    val staging = s"$root/.staging-$commitId"
    df.write.mode("overwrite").parquet(staging)
    val parts = withStream(Files.list(Paths.get(staging)))(
      _.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq.sortBy(_.toString))
    val adopted = parts.zipWithIndex.map { case (p, i) =>
      val dst = Paths.get(root, "data", s"$commitId-$i.parquet")
      Files.move(p, dst, StandardCopyOption.ATOMIC_MOVE)
      dst.toString
    }
    withStream(Files.walk(Paths.get(staging)))(
      _.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p)))

    // 2. per-file stats come from the parquet FOOTERS of the staged
    //    files (row-group min/max/count cover exactly what the manifest
    //    needs) — a distributed metadata-only pass, no second scan of
    //    the data just written. This is what Iceberg's writer-side stat
    //    collection reduces to after the fact.
    import spark.implicits._
    // the session's Hadoop conf rides along as serializable (key, value)
    // pairs — a bare `new Configuration()` on the executor would miss
    // spark.hadoop.* filesystem settings (s3a credentials, endpoints)
    // and break stats collection on any non-default filesystem
    val confProps: Array[(String, String)] = {
      val hc = spark.sessionState.newHadoopConf()
      val it = hc.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val statsDf = spark.createDataset(spark.sparkContext
        .parallelize(adopted, 1 max (adopted.size min 64))
        .map(FooterStats(confProps)))
      .toDF("path", "rows", "min_x", "max_x", "min_y", "max_y",
        "min_key", "max_key", "nulls_xy")
    val manifest = s"$root/manifests/m-$commitId.parquet"
    statsDf.repartition(1).write.mode("overwrite").parquet(manifest)
    // the committed schema rides in its own file (schema json contains
    // quotes; the snapshot json stays regex-parsable by referencing it)
    val schemaPath = s"$root/manifests/m-$commitId.schema.json"
    Files.write(Paths.get(schemaPath), df.schema.json.getBytes("UTF-8"))
    (manifest, schemaPath)
  }

  /** Steps 3+4: optimistic snapshot allocation + pointer flip.
    * `manifestsFor(parent)` yields the new snapshot's manifest list given
    * the parent it will be committed on — re-evaluated on every CAS
    * retry so losers rebuild against the head they actually lost to
    * (and can throw if their work is invalid on the new head). */
  private def allocate(root: String, commitId: String, schemaPath: String,
      tag: Option[String], manifestsFor: Int => Seq[String]): Int = {
    // the tag is interpolated into regex-parsed JSON: quotes or brackets
    // would corrupt the snapshot's manifests parse SILENTLY (the [^\]]*
    // manifest regex would match the tag's bracket), so reject anything
    // outside a safe charset up front
    tag.foreach(t => require(
      t.nonEmpty && t.forall(c => c > ' ' && "\"[]\\{}".indexOf(c) < 0),
      s"commit tag must be non-empty printable text without " +
        s"quotes/brackets/backslashes (got '$t')"))
    var committed = -1
    while (committed < 0) {
      val parent = currentVersion(root)
      val next = parent + 1
      val manifests = manifestsFor(parent)
      val tagField = tag.map(t => s""", "tag": "$t"""").getOrElse("")
      val json =
        s"""{"version": $next, "parent": $parent$tagField, "schema": "$schemaPath", "manifests": [${
          manifests.map("\"" + _ + "\"").mkString(", ")}]}"""
      val snapPath = Paths.get(root, "snapshots", s"v$next.json")
      try {
        // CREATE_NEW is the CAS: exactly one committer owns version `next`
        Files.write(snapPath, json.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        val tmp = Paths.get(root, s".VERSION-$commitId")
        Files.write(tmp, next.toString.getBytes("UTF-8"))
        Files.move(tmp, versionFile(root), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        committed = next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => // lost the race
          // the winner's VERSION flip may still be in flight; wait for the
          // pointer to reach (or pass) the contested version before
          // retrying — but BOUNDED: a winner that died between snapshot
          // allocation and pointer flip must not livelock every later
          // committer. Recovery is a manual roll-forward (validate
          // snapshots/v<next>.json, then write VERSION), never automatic:
          // the orphan json may be a partial write.
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (currentVersion(root) < next) {
            if (System.nanoTime() > deadline)
              throw new IllegalStateException(
                s"graft table $root: snapshot v$next exists but VERSION " +
                s"never advanced (committer died mid-flip?) — validate " +
                s"snapshots/v$next.json and roll VERSION forward manually")
            Thread.sleep(1)
          }
      }
    }
    committed
  }

  /** Manifest stats for one data file, read from its parquet footer.
    * Column absent -> None (a bbox can PRUNE such files exactly: the
    * commit had no such column, so no row can match). Column present
    * but a chunk lacks usable stats (e.g. doubles with NaNs — parquet
    * omits min/max) -> the infinite interval, which intersects every
    * box: such files are always read, never wrongly pruned.
    *
    * A NAMED case class, not a lambda: streaming microbatch threads
    * (foreachBatch -> commit) run under a classloader where
    * ClosureCleaner cannot always load lambda class bytes
    * ("capturingClassReader is null"); named classes skip cleaning. */
  private case class FooterStats(confProps: Array[(String, String)])
      extends (String =>
      (String, Long, Option[Double], Option[Double], Option[Double],
       Option[Double], Option[Long], Option[Long], Option[Long])) with Serializable {
    def apply(path: String) = footerStats(path, confProps)
  }

  private def footerStats(path: String, confProps: Array[(String, String)])
      : (String, Long, Option[Double], Option[Double], Option[Double],
         Option[Double], Option[Long], Option[Long], Option[Long]) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // Number-valued so long stats stay exact (no double round trip for
      // keys past 2^53); ±Inf narrows to Long.Min/MaxValue per the JLS,
      // which is exactly the always-read sentinel a long range wants
      def range(name: String): Option[(Number, Number)] = {
        val chunks = blocks.flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == name)
        if (chunks.isEmpty) None // column absent from the file
        else {
          val ss = chunks.map(_.getStatistics)
          val nums = scala.util.Try {
            require(ss.forall(s => s != null && s.hasNonNullValue))
            (ss.map(_.genericGetMin.asInstanceOf[Number]), // CCE if non-numeric
             ss.map(_.genericGetMax.asInstanceOf[Number]))
          }.toOption
          nums match {
            case Some((mins, maxs)) if mins.head.isInstanceOf[java.lang.Long] =>
              Some((mins.map(_.longValue).min: java.lang.Long,
                    maxs.map(_.longValue).max: java.lang.Long))
            case Some((mins, maxs)) =>
              Some((mins.map(_.doubleValue).min: java.lang.Double,
                    maxs.map(_.doubleValue).max: java.lang.Double))
            case None => // NaN-suppressed or non-numeric stats: never prune
              Some((Double.NegativeInfinity: java.lang.Double,
                    Double.PositiveInfinity: java.lang.Double))
          }
        }
      }
      // combined x/y null count, used by the countBox metadata fast path:
      // a file counts from its manifest `rows` alone only when PROVABLY
      // free of null coordinates (a null-x row fails the bbox residual a
      // scan would apply, so counting it via metadata would overcount).
      // Column absent -> 0 nulls of it can exist among zero values, but
      // such files have None ranges and never take the fast path anyway;
      // any chunk without a null count -> unknown (None) -> scan path.
      def nullsOf(name: String): Option[Long] = {
        val chunks = blocks.flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == name)
        if (chunks.isEmpty) Some(0L)
        else {
          val ss = chunks.map(_.getStatistics)
          if (ss.forall(s => s != null && s.isNumNullsSet))
            Some(ss.map(_.getNumNulls).sum)
          else None
        }
      }
      val (x, y, k) = (range("x"), range("y"), range("order_key"))
      val nxy = for (a <- nullsOf("x"); b <- nullsOf("y")) yield a + b
      (path, rows,
        x.map(_._1.doubleValue), x.map(_._2.doubleValue),
        y.map(_._1.doubleValue), y.map(_._2.doubleValue),
        k.map(_._1.longValue), k.map(_._2.longValue), nxy)
    } finally r.close()
  }

  /** The manifest file schema, pinned EXPLICITLY on every manifest read:
    * the format grew a 9th column (nulls_xy), and tables written by the
    * previous revision carry 8-column manifests forward in later
    * snapshots. Schema inference over the mixed set resolves from an
    * arbitrary file — 'nulls_xy' would nondeterministically fail
    * analysis. With the pinned schema a missing column surfaces as null,
    * which every consumer already routes to the exact scan path. */
  private val manifestSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("path", StringType), StructField("rows", LongType),
      StructField("min_x", DoubleType), StructField("max_x", DoubleType),
      StructField("min_y", DoubleType), StructField("max_y", DoubleType),
      StructField("min_key", LongType), StructField("max_key", LongType),
      StructField("nulls_xy", LongType)))
  }

  private def readManifests(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.schema(manifestSchema).parquet(paths: _*)

  /** The manifest table of a snapshot (default: head). */
  def manifests(spark: SparkSession, root: String,
      asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(root))
    require(v > 0, s"graft table $root is empty (no committed snapshot)")
    readManifests(spark, snapshot(root, v).manifests)
  }

  /** Reader with the snapshot's pinned schema applied (files predating
    * a column addition surface it as nulls; time travel reads with the
    * schema of its era). Pre-evolution snapshots fall back to parquet
    * schema inference. */
  private def readerFor(spark: SparkSession, root: String,
      asOf: Option[Int]): org.apache.spark.sql.DataFrameReader = {
    val v = asOf.getOrElse(currentVersion(root))
    require(v > 0, s"graft table $root is empty (no committed snapshot)")
    snapshot(root, v).schema match {
      case Some(p) if Files.exists(Paths.get(p)) =>
        spark.read.schema(org.apache.spark.sql.types.DataType
          .fromJson(new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      case _ => spark.read
    }
  }

  /** Empty frame carrying the snapshot's pinned schema, or None for a
    * pre-evolution snapshot (no schema json). */
  private def pinnedEmpty(spark: SparkSession, root: String, v: Int)
      : Option[DataFrame] =
    snapshot(root, v).schema.filter(p => Files.exists(Paths.get(p))).map { p =>
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.DataType
          .fromJson(new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
    }

  /** Snapshot schema as a StructType without building a DataFrame: the
    * pinned schema json when the snapshot carries one, otherwise parquet
    * inference over the snapshot's files (pre-evolution tables). Used by
    * the DataSource V2 surface's inferSchema. */
  def tableSchema(spark: SparkSession, root: String,
      asOf: Option[Int] = None): org.apache.spark.sql.types.StructType = {
    val v = asOf.getOrElse(currentVersion(root))
    require(v > 0, s"graft table $root is empty (no committed snapshot)")
    snapshot(root, v).schema match {
      case Some(p) if Files.exists(Paths.get(p)) =>
        org.apache.spark.sql.types.DataType
          .fromJson(new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      case _ => read(spark, root, asOf).schema
    }
  }

  /** Read an explicit file subset of a snapshot with the snapshot's
    * pinned schema (the V2 scan path's entry: manifest pruning picks the
    * files, this opens them). */
  private[sources] def readFiles(spark: SparkSession, root: String,
      asOf: Option[Int], files: Seq[String]): DataFrame = {
    val v = asOf.getOrElse(currentVersion(root))
    if (files.isEmpty)
      pinnedEmpty(spark, root, v).getOrElse(
        read(spark, root, asOf).filter(lit(false)))
    else readerFor(spark, root, asOf).parquet(files: _*)
  }

  /** Full-table read of a snapshot. A snapshot referencing zero data
    * files (e.g. an empty first streaming microbatch was committed) is a
    * valid empty table, not a schema-inference error. */
  def read(spark: SparkSession, root: String, asOf: Option[Int] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(root))
    val files = manifests(spark, root, asOf).select("path")
      .collect().map(_.getString(0)).toIndexedSeq
    if (files.isEmpty)
      pinnedEmpty(spark, root, v).getOrElse(throw new IllegalStateException(
        s"graft table $root v$v references no data files and pins no " +
        "schema (pre-evolution empty table) — nothing to infer a schema from"))
    else readerFor(spark, root, asOf).parquet(files: _*)
  }

  /** Incremental read: exactly the rows APPENDED after `fromVersion`, up
    * to and including `toVersion` (default: head) — Iceberg's incremental
    * scan. At 10^12 rows this is what downstream consumers actually run:
    * process the delta since the last checkpointed version, never a full
    * re-read. Append commits carry the parent's manifests forward, so the
    * delta is precisely the manifest-set difference; when a metadata-only
    * manifest merge broke that identity, the DATA-file-set difference is
    * still exact (merges never touch data files) and the delta falls back
    * to it. Only a history that dropped or rewrote data files in
    * (from, to] (overwrite / compaction / deleteBox / upsert) FAILS
    * LOUDLY instead of returning rows that were merely reshuffled between
    * files — resolve such boundaries with a full read of the target
    * snapshot. fromVersion = 0 reads everything up to `toVersion`. */
  def readIncremental(spark: SparkSession, root: String, fromVersion: Int,
      toVersion: Int = -1): DataFrame = {
    val to = if (toVersion < 0) currentVersion(root) else toVersion
    require(to > 0, s"graft table $root is empty (no committed snapshot)")
    require(fromVersion >= 0 && fromVersion <= to,
      s"incremental range v$fromVersion -> v$to is not a forward range")
    val fromM: Set[String] =
      if (fromVersion == 0) Set.empty
      else snapshot(root, fromVersion).manifests.toSet
    val toS = snapshot(root, to)
    val missing = fromM -- toS.manifests.toSet
    if (missing.nonEmpty) {
      // the manifest-set identity broke — but a metadata-only manifest
      // merge (rewriteManifests / commit auto-merge) carries every DATA
      // file forward, so the append delta is still exactly the file-set
      // difference. Only a history that DROPPED data files (overwrite,
      // compaction, deleteBox, upsert — all rewrite rows between files)
      // makes the incremental read undefined, and that stays loud.
      val fromFiles = readManifests(spark, snapshot(root, fromVersion).manifests)
        .select("path").collect().map(_.getString(0)).toSet
      val toFiles = readManifests(spark, toS.manifests)
        .select("path").collect().map(_.getString(0)).toSet
      val dropped = fromFiles -- toFiles
      if (dropped.nonEmpty) throw new IllegalStateException(
        s"graft table $root: history v$fromVersion -> v$to is not append-only " +
        s"(${dropped.size} data file(s) of v$fromVersion were dropped/rewritten " +
        "by an overwrite, compaction, delete or upsert) — incremental read " +
        "is undefined across that boundary; full-read the target snapshot")
      val deltaFiles = (toFiles -- fromFiles).toIndexedSeq.sorted
      return if (deltaFiles.isEmpty)
        pinnedEmpty(spark, root, to)
          .getOrElse(read(spark, root, Some(to)).filter(lit(false)))
      else readerFor(spark, root, Some(to)).parquet(deltaFiles: _*)
    }
    val delta = toS.manifests.filterNot(fromM)
    // same-version range (the steady-state "no new data" poll): build the
    // empty frame from the pinned schema without collecting the live file
    // list; pre-evolution tables fall back to a lazy filter(false) read
    if (delta.isEmpty) return pinnedEmpty(spark, root, to)
      .getOrElse(read(spark, root, Some(to)).filter(lit(false)))
    val files = readManifests(spark, delta).select("path")
      .collect().map(_.getString(0)).toIndexedSeq
    if (files.isEmpty) // appended manifests may list zero files (empty commit)
      return pinnedEmpty(spark, root, to)
        .getOrElse(read(spark, root, Some(to)).filter(lit(false)))
    readerFor(spark, root, Some(to)).parquet(files: _*)
  }

  /** Checkpointed incremental consumption — the table-level resume loop a
    * downstream pipeline runs forever: read the append delta since the
    * version recorded in `checkpointFile`, hand it to `f(delta, fromV,
    * toV)`, and advance the checkpoint (atomic temp+rename) only after
    * `f` returns. A crash inside `f` or before the flip replays the SAME
    * delta next call — at-least-once for arbitrary side effects,
    * exactly-once when `f`'s sink is idempotent on (fromV, toV] (e.g.
    * commitIfAbsent tagged with the version range). Returns (fromV, toV);
    * fromV == toV means no new data and `f` was not called. */
  def processDelta(spark: SparkSession, root: String, checkpointFile: String)
      (f: (DataFrame, Int, Int) => Unit): (Int, Int) = {
    val cp = Paths.get(checkpointFile)
    val from =
      if (Files.exists(cp)) new String(Files.readAllBytes(cp), "UTF-8").trim.toInt
      else 0
    val to = currentVersion(root)
    require(to >= from,
      s"checkpoint $checkpointFile is at v$from but $root's head is v$to — " +
      "the checkpoint belongs to a different (or rolled-back) table")
    if (to > from) {
      f(readIncremental(spark, root, from, to), from, to)
      val tmp = Paths.get(checkpointFile + ".tmp")
      if (cp.getParent != null) Files.createDirectories(cp.getParent)
      Files.write(tmp, to.toString.getBytes("UTF-8"))
      Files.move(tmp, cp, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    (from, to)
  }

  /** Idempotent commit keyed by `tag` (e.g. a streaming batch id): if a
    * snapshot already carries the tag, return its version without
    * writing — the exactly-once hook for foreachBatch sinks, where a
    * failed microbatch is replayed with the same batchId. Retries are
    * serial per sink by Structured Streaming's contract; concurrent
    * DISTINCT-tag committers stay safe via the usual CAS. */
  def commitIfAbsent(df: DataFrame, root: String, tag: String): Int = {
    require(!tag.contains('"'), s"tag must not contain quotes: $tag")
    taggedVersion(root, tag).getOrElse(commit(df, root, tag = Some(tag)))
  }

  /** Linear scan over snapshot jsons — fine for the microbatch cadence
    * this backs (hundreds of versions); a tag->version index file would
    * amortize it if commit volume ever grows past that. */
  private def taggedVersion(root: String, tag: String): Option[Int] = {
    val dir = Paths.get(root, "snapshots")
    if (!Files.exists(dir)) return None
    val needle = s""""tag": "$tag""""
    withStream(Files.list(dir))(_.iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json"))
      .find(p => new String(Files.readAllBytes(p), "UTF-8").contains(needle))
      .map(_.getFileName.toString.stripPrefix("v").stripSuffix(".json").toInt))
  }

  /** Compaction: rewrite the head snapshot's rows into `numFiles` data
    * files and commit the result as a NEW snapshot (overwrite manifests,
    * rows identical). History is preserved — prior versions still
    * time-travel until expireSnapshots drops them. */
  def compact(spark: SparkSession, root: String, numFiles: Int = 1): Int =
    commit(read(spark, root).repartition(numFiles), root, overwrite = true)

  /** Commit with Z-order clustering: rows are range-partitioned and
    * sorted on the Morton code of their (x, y) cell, so each data file
    * covers a spatially tight range and its FOOTER bbox becomes a sharp
    * pruning predicate. This is the Iceberg write pattern a 100-TB
    * spatial table needs — without it, every file's bbox is the whole
    * extent and readBox degenerates to a full scan. One extra range
    * shuffle (sampled bounds) per commit; the Morton key is the
    * codegen'd CellIdExpr, never a UDF. */
  def commitClustered(df: DataFrame, root: String, cellSize: Double,
      numFiles: Int, tag: Option[String] = None): Int = {
    require(cellSize > 0 && numFiles >= 1,
      s"commitClustered needs cellSize > 0 and numFiles >= 1")
    val key = graft.functions.F.cellId(col("x"), col("y"), 0.0, 0.0,
      cellSize, morton = true)
    commit(df.repartitionByRange(numFiles, key).sortWithinPartitions(key),
      root, tag = tag)
  }

  /** Copy-on-write row-level delete: remove every row inside the closed
    * box and commit the result as a new snapshot. Only files whose
    * manifest stats INTERSECT the box are rewritten; untouched files
    * carry their manifest rows forward verbatim (data files are
    * immutable, so their stats stay exact — no footer re-read, no data
    * re-scan). Null-stat files (their commit had no x/y columns) cannot
    * hold a row inside the box and are kept as-is. At 10^12 rows this
    * is the difference between rewriting a handful of files and
    * rewriting the table. Serializable isolation: if another commit
    * lands between planning and the CAS, the delete aborts with
    * ConcurrentModificationException rather than silently dropping the
    * concurrent append's files — the caller retries on the new head.
    * Returns (version, filesRewritten, filesTotal); a delete touching
    * nothing returns the head unchanged with filesRewritten = 0. */
  def deleteBox(spark: SparkSession, root: String, minx: Double,
      miny: Double, maxx: Double, maxy: Double): (Int, Long, Long) = {
    val base = currentVersion(root)
    require(base > 0, s"graft table $root is empty (no committed snapshot)")
    val m = readManifests(spark, snapshot(root, base).manifests)
    val total = m.count()
    val touch = col("min_x") <= maxx && col("max_x") >= minx &&
      col("min_y") <= maxy && col("max_y") >= miny
    val touched = m.filter(touch).select("path")
      .collect().map(_.getString(0)).toIndexedSeq
    if (touched.isEmpty) return (base, 0L, total)
    val commitId = UUID.randomUUID().toString.take(8)
    val keepManifest = s"$root/manifests/m-$commitId-keep.parquet"
    m.filter(not(coalesce(touch, lit(false)))).repartition(1)
      .write.mode("overwrite").parquet(keepManifest)
    // survivors of the touched files; rows with null x/y cannot be
    // inside the box, so a null predicate keeps them (coalesce false)
    val inside = col("x") >= minx && col("x") <= maxx &&
      col("y") >= miny && col("y") <= maxy
    val survivors = readerFor(spark, root, Some(base)).parquet(touched: _*)
      .filter(not(coalesce(inside, lit(false))))
    val (newManifest, schemaPath) = stageCommit(survivors, root, commitId)
    val v = allocate(root, commitId, schemaPath, None, parent => {
      if (parent != base) throw new java.util.ConcurrentModificationException(
        s"graft table $root advanced v$base -> v$parent during deleteBox; " +
        "retry the delete on the new head")
      Seq(keepManifest, newManifest)
    })
    (v, touched.size.toLong, total)
  }

  /** Copy-on-write upsert by key — the CDC write path that completes the
    * DML triple (append / deleteBox / upsert): rows of `updates` REPLACE
    * existing rows with the same `keyCol` value; keys not present insert.
    * Only data files that provably may hold an updated key are rewritten:
    * the manifest's (min_key, max_key) interval is range-joined against
    * the DISTINCT update keys (manifests broadcast — the small side of a
    * theta join), so on a key-banded layout the rewrite set is the files
    * the delta actually touches, not the table. Manifest key stats exist
    * for order_key only, so the prune applies ONLY when keyCol is
    * order_key; any other key rewrites all files (degraded, never
    * wrong). Pruning is conservative and exact: a file is untouched only
    * when NO update key falls in its key interval, and null-key rows
    * inside touched files survive the equality anti-join (SQL null
    * semantics), so they are never lost. Files whose commit lacked the
    * key column cannot match and are kept; the all-null-stats sentinel
    * widens to [Long.Min, Long.Max] and forces a rewrite. Duplicate or
    * null keys inside `updates` are rejected loudly (last-wins would be
    * write-order nondeterminism; null keys cannot merge by key). A delta
    * column whose type conflicts with the pinned base schema fails
    * loudly (same guard as append). Same serializable isolation as
    * deleteBox: a
    * concurrent commit aborts the upsert rather than losing its files.
    * A `tag` makes the merge idempotent for replay (the CDC consumer
    * crash path, like commitIfAbsent): a tag already in history returns
    * its version immediately — (version, 0, 0), nothing re-merged.
    * Returns (version, filesRewritten, filesTotal). */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
      keyCol: String = "order_key", tag: Option[String] = None)
      : (Int, Long, Long) = {
    tag.flatMap(taggedVersion(root, _)) match {
      case Some(v) => return (v, 0L, 0L) // replayed: already committed
      case None =>
    }
    val base = currentVersion(root)
    require(base > 0, s"graft table $root is empty (no committed snapshot)")
    // type-conflict guard, same check the append path runs in
    // mergeSchema: the union below applies Spark's set-operation type
    // coercion, so a delta whose shared column differs in type (int vs
    // double, numeric vs string) would otherwise silently widen and
    // re-pin the table's column type
    val baseSchemaJson = snapshot(root, base).schema
      .filter(p => Files.exists(Paths.get(p)))
      .map(p => new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
      .getOrElse(read(spark, root, Some(base)).schema.json)
    mergeSchema(baseSchemaJson, updates.schema)
    // three downstream actions read the key set (null/distinctness gate,
    // file prune join, survivor anti-join) — persist so an expensive
    // update source computes once; unpersisted before returning
    val keys = updates.select(col(keyCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val (nTotal, nKeys, nDistinct) = {
      val r = keys.agg(count(lit(1)), count(col(keyCol)),
        count_distinct(col(keyCol))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // null keys would bypass the one-row-per-key contract entirely: a
    // null never equality-matches in the anti-join, so repeated upserts
    // of the same delta would accumulate duplicate null-key rows
    require(nTotal == nKeys,
      s"upsert updates carry ${nTotal - nKeys} null $keyCol value(s) — " +
      "null-key rows cannot merge by key; assign keys or append them " +
      "with commit()")
    require(nKeys == nDistinct,
      s"upsert updates carry duplicate $keyCol values ($nKeys rows, " +
      s"$nDistinct distinct) — resolve to one row per key first")
    val m = readManifests(spark, snapshot(root, base).manifests)
    val total = m.count()
    // distributed file-level prune: one broadcast theta join of the tiny
    // manifest table against the delta's keys, never a key collect.
    // Manifest min_key/max_key are ORDER_KEY footer stats (footerStats
    // stats x/y/order_key only), so interval pruning is sound ONLY for
    // keyCol == order_key — any other key column falls back to rewriting
    // every file, because pruning on the wrong column's interval could
    // skip files holding stale versions of updated keys and silently
    // leave duplicate rows. Degraded, never wrong.
    val touched =
      if (keyCol == "order_key")
        keys.join(
            broadcast(m.select(col("path"), col("min_key"), col("max_key"))),
            col(keyCol) >= col("min_key") && col(keyCol) <= col("max_key"))
          .select("path").distinct().collect().map(_.getString(0)).toIndexedSeq
      else m.select("path").collect().map(_.getString(0)).toIndexedSeq
    val commitId = UUID.randomUUID().toString.take(8)
    val keepManifest = s"$root/manifests/m-$commitId-keep.parquet"
    // anti-join, not an In-list literal: a wide delta can touch tens of
    // thousands of files and O(literals) plan construction doesn't scale
    import spark.implicits._
    m.join(broadcast(touched.toDF("path")), Seq("path"), "left_anti")
      .repartition(1).write.mode("overwrite").parquet(keepManifest)
    // survivors always union against the BASE schema (via the touched
    // files, or an empty base read when nothing is touched): the new
    // snapshot's pinned schema must be base ∪ delta — a pure-insert
    // delta missing a base column must not narrow the table's schema
    // (columns evolve by addition, never silent drop)
    val survivors =
      (if (touched.isEmpty)
         read(spark, root, Some(base)).filter(lit(false))
       else readerFor(spark, root, Some(base)).parquet(touched: _*)
         .join(keys, Seq(keyCol), "left_anti"))
        .unionByName(updates, allowMissingColumns = true)
    val (newManifest, schemaPath) = stageCommit(survivors, root, commitId)
    val v = allocate(root, commitId, schemaPath, tag, parent => {
      if (parent != base) throw new java.util.ConcurrentModificationException(
        s"graft table $root advanced v$base -> v$parent during upsert; " +
        "retry on the new head")
      Seq(keepManifest, newManifest)
    })
    (v, touched.size.toLong, total)
    } finally keys.unpersist(false)
  }

  /** Expire all snapshots older than the newest `keepLast`, then delete
    * every data/manifest file no surviving snapshot references (Iceberg's
    * expire_snapshots + remove_orphan_files). Returns the number of
    * physical files deleted. Crash-safe in the same way as commit:
    * snapshot jsons are deleted first, so a crash mid-vacuum leaves only
    * unreferenced-but-present files — invisible to readers. */
  def expireSnapshots(spark: SparkSession, root: String, keepLast: Int = 1,
      orphanGraceMs: Long = 3600L * 1000): Int = {
    require(keepLast >= 1, "must keep at least the head snapshot")
    val head = currentVersion(root)
    // keep only versions whose snapshot STILL EXISTS: an earlier expiry
    // may have dropped part of the nominal keep window, and calling
    // snapshot() on a dropped version would throw (vacuum must never be
    // wedged by its own past runs)
    val keep = (((head - keepLast + 1) max 1) to head).filter(v =>
      Files.exists(Paths.get(root, "snapshots", s"v$v.json")))
    val snapDir = Paths.get(root, "snapshots")
    withStream(Files.list(snapDir))(_.iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.json"))
      .filter(p => !keep.contains(
        p.getFileName.toString.stripPrefix("v").stripSuffix(".json").toInt))
      .toSeq).foreach(Files.delete(_))
    // live set = every manifest of every surviving snapshot + every data
    // path those manifests list (one distributed read, not a driver loop)
    def canon(s: String): String = {
      // manifest `path` values are input_file_name() URIs; snapshot
      // manifest entries are plain paths — normalize both to one form
      val raw = if (s.startsWith("file:")) new java.net.URI(s).getPath else s
      Paths.get(raw).toAbsolutePath.normalize.toString
    }
    val keptSnaps = keep.map(v => snapshot(root, v))
    val liveManifestSeq = keptSnaps.flatMap(_.manifests)
    // schema jsons live under manifests/ too — referenced ones are live
    val liveManifests =
      (liveManifestSeq ++ keptSnaps.flatMap(_.schema)).map(canon).toSet
    val liveData: Set[String] =
      if (liveManifestSeq.isEmpty) Set.empty
      else readManifests(spark, liveManifestSeq)
        .select("path").collect().map(r => canon(r.getString(0))).toSet
    var deleted = 0
    // orphanGraceMs: a file younger than the grace window is NEVER swept
    // even when unreferenced — it may belong to a commit that has staged
    // its data (steps 1-2) but not yet won the snapshot CAS (step 3);
    // deleting it would corrupt that commit the moment its CAS lands.
    // Iceberg's remove_orphan_files has the same older-than guard. Tests
    // pass 0 to observe immediate deletion in a quiesced table.
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    def oldEnough(p: Path): Boolean =
      scala.util.Try(Files.getLastModifiedTime(p).toMillis <= cutoff)
        .getOrElse(false)
    def sweep(dir: Path, live: Set[String]): Unit =
      if (Files.exists(dir)) withStream(Files.list(dir))(_.iterator().asScala
        .filterNot(p => live.contains(canon(p.toString)))
        .filter(oldEnough).toSeq).foreach { p =>
          if (Files.isDirectory(p))
            withStream(Files.walk(p))(_.sorted(java.util.Comparator.reverseOrder())
              .forEach(q => { Files.deleteIfExists(q); deleted += 1 }))
          else { Files.delete(p); deleted += 1 }
        }
    sweep(Paths.get(root, "data"), liveData)
    sweep(Paths.get(root, "manifests"), liveManifests)
    deleted
  }

  /** Bbox read with manifest-level FILE pruning: only files whose stats
    * rectangle intersects the box are opened; the exact predicate stays
    * as a residual. Returns (df, filesRead, filesTotal) so callers can
    * assert the pruning actually happened. */
  def readBox(spark: SparkSession, root: String, minx: Double, miny: Double,
      maxx: Double, maxy: Double, asOf: Option[Int] = None)
      : (DataFrame, Long, Long) = {
    val m = manifests(spark, root, asOf)
    val total = m.count()
    // NULL stats only arise when that commit HAD no x/y columns (stats
    // are computed from the committed rows themselves), so none of its
    // rows could pass the bbox residual — pruning them is exact, not a
    // guess. A null-failing predicate is therefore the wanted behavior.
    val hits = m.filter(col("min_x") <= maxx && col("max_x") >= minx &&
        col("min_y") <= maxy && col("max_y") >= miny)
      .select("path").collect().map(_.getString(0)).toIndexedSeq
    val df =
      if (hits.isEmpty) read(spark, root, asOf).filter(lit(false))
      else readerFor(spark, root, asOf).parquet(hits: _*)
        .filter(col("x") >= minx && col("x") <= maxx &&
          col("y") >= miny && col("y") <= maxy)
    (df, hits.length.toLong, total)
  }

  /** Metadata-only exact row count: the sum of manifest `rows` — O(manifest
    * files) of I/O, zero data files opened. Manifest rows come from parquet
    * footers at commit time and data files are immutable, so this is exact,
    * not an estimate; at 10^12 rows it answers count(*) from kilobytes of
    * metadata (Iceberg answers the same query from its manifest stats). */
  def countRows(spark: SparkSession, root: String,
      asOf: Option[Int] = None): Long =
    manifests(spark, root, asOf)
      .agg(coalesce(sum("rows"), lit(0L))).head.getLong(0)

  /** Exact count of rows inside the closed box, scanning only the files
    * the manifest cannot decide: files fully CONTAINED in the box (and
    * provably free of null coordinates — nulls_xy == 0) count from their
    * manifest `rows` with no I/O; files DISJOINT from the box contribute
    * zero; only boundary-straddling files are read, with the exact
    * predicate as residual. On a z-order-clustered table the boundary set
    * is O(perimeter/cellSize) of the files, so a 100-TB table answers a
    * box count from metadata plus a thin shell of data. Files whose
    * commit lacked x/y (null stats) hold no matching row and prune
    * exactly, like readBox; the NaN-suppressed infinite sentinel is
    * never "contained", so such files fall to the scan path — degraded,
    * never wrong. Returns (count, filesScanned, filesTotal). */
  def countBox(spark: SparkSession, root: String, minx: Double, miny: Double,
      maxx: Double, maxy: Double, asOf: Option[Int] = None)
      : (Long, Long, Long) = {
    val m = manifests(spark, root, asOf)
    val total = m.count()
    val intersects = col("min_x") <= maxx && col("max_x") >= minx &&
      col("min_y") <= maxy && col("max_y") >= miny
    val contained = col("min_x") >= minx && col("max_x") <= maxx &&
      col("min_y") >= miny && col("max_y") <= maxy && col("nulls_xy") === 0L
    // null-safe: unknown null counts or null stats make `contained` null,
    // never true — coalesce routes those files to the (exact) scan path
    val metaRows = m.filter(coalesce(contained, lit(false)))
      .agg(coalesce(sum("rows"), lit(0L))).head.getLong(0)
    val boundary = m.filter(coalesce(intersects, lit(false)) &&
        not(coalesce(contained, lit(false))))
      .select("path").collect().map(_.getString(0)).toIndexedSeq
    val scanned =
      if (boundary.isEmpty) 0L
      else readerFor(spark, root, asOf).parquet(boundary: _*)
        .filter(col("x") >= minx && col("x") <= maxx &&
          col("y") >= miny && col("y") <= maxy).count()
    (metaRows + scanned, boundary.length.toLong, total)
  }

  /** Metadata-only exact spatial extent (min/max over non-null x/y — SQL
    * aggregate semantics). Footer min/max are exact for NaN-free doubles,
    * so the union of manifest bboxes IS the extent; a table carrying the
    * NaN-suppressed infinite sentinel cannot answer from metadata and
    * FAILS LOUDLY (compute the extent with a scan there) rather than
    * reporting an infinite bound as data. */
  def extent(spark: SparkSession, root: String,
      asOf: Option[Int] = None): (Double, Double, Double, Double) = {
    val r = manifests(spark, root, asOf)
      .agg(min("min_x"), max("max_x"), min("min_y"), max("max_y")).head
    require(!r.anyNull,
      s"graft table $root has no x/y stats in any file — no spatial extent")
    // parquet-mr normalizes a zero double min to -0.0 (IEEE-safe ordering
    // sentinel); +0.0 is what SQL min/max over the data reports, and
    // -0.0 == 0.0 for every comparison, so fold the sign out
    def z(v: Double): Double = v + 0.0
    val (a, b, c, d) =
      (z(r.getDouble(0)), z(r.getDouble(1)), z(r.getDouble(2)), z(r.getDouble(3)))
    require(!a.isInfinite && !b.isInfinite && !c.isInfinite && !d.isInfinite,
      s"graft table $root carries NaN-suppressed footer stats — the exact " +
      "extent requires a data scan, refusing to report an infinite bound")
    (a, b, c, d)
  }
}
