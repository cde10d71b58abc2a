package graft.ingest

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Table sinks (K1/K2/K4 in SURVEY.md §2.1) plus the reference's progress
  * counters (A3) as `observe()` metrics.
  *
  * The reference drops + re-creates its target collection, bulk-inserts in
  * batches of 100, and recovers from duplicate keys row-by-row. Here the
  * merge happens *before* the write (A4), so the sink is a plain
  * overwrite-mode parquet write: batching, buffering, and atomicity are the
  * writer's job; `_id` uniqueness holds by construction.
  */
object Sinks {

  case class WriteReport(rows: Long, badRows: Long, path: String)

  /** K1+K2: overwrite the `fast` table, partitioned by `type` — at scale
    * the 8 type partitions give partition-pruned reads for the dominant
    * "lookup by type" access path. Returns observed counters (A3): rows
    * written and bad rows dropped (P5 guard).
    */
  def writeFast(docs: DataFrame, path: String): WriteReport = {
    val obs = Observation("fast_write")
    val good = docs.where(col("fast").isNotNull)
      .observe(obs, count(lit(1)).as("rows"),
        count(when(col("prefLabel").isNull, 1)).as("missing_pref"))
    good.write.mode("overwrite").partitionBy("type").parquet(path)
    WriteReport(obs.get("rows").asInstanceOf[Long], 0L, path)
  }

  /** K4: overwrite the updated viaf table. */
  def writeViaf(viaf: DataFrame, path: String): WriteReport = {
    val obs = Observation("viaf_write")
    val observed = viaf.observe(obs, count(lit(1)).as("rows"))
    observed.write.mode("overwrite").parquet(path)
    WriteReport(obs.get("rows").asInstanceOf[Long], 0L, path)
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed + sorted managed table: joins between two tables bucketed on
    * the same key with the same bucket count run WITHOUT a shuffle on
    * either side (co-located sort-merge join) — the pre-partitioning story
    * for repeated large-table joins at 100 TB. Requires `saveAsTable`
    * (bucketing metadata lives in the session catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Default bucket count for [[mergeInto]] tables — same sizing rule as
    * [[graft.streaming.StreamingIngest.DefaultBuckets]]: at deploy pick
    * ~table_size / target_partition_size; merge cost scales with touched
    * buckets, so more buckets = finer-grained rewrites.
    */
  val MergeBuckets = 64

  /** Generic MERGE INTO over a manifest-committed hash-bucket parquet
    * layout — the deploy-shaped upsert API for the reference's
    * lookup-update path (`lib/ingest.js:134-165` recovers from
    * duplicate-key inserts row-by-row; here the merge is declarative and
    * partition-bounded). Semantics are SQL MERGE with whole-row actions:
    *
    *   - `WHEN MATCHED THEN UPDATE SET *`   (update row replaces stored)
    *   - `WHEN NOT MATCHED THEN INSERT *`
    *   - `WHEN MATCHED AND <deleteCol> THEN DELETE`   (when given)
    *
    * Rows live under `data/<version>/_bucket=<b>/` with
    * `_bucket = pmod(xxhash64(key), numBuckets)` — a pure function of
    * the merge key, so a row can never move between buckets and a batch
    * touches ONLY the buckets its keys hash into. Which version holds
    * each bucket's current files is recorded in a MANIFEST
    * (`_manifest-<N>.json`, bucket → version dir): a batch stages its
    * output as a brand-new version directory (never touching a live
    * file), then commits by writing manifest N+1 — one atomic
    * rename-to-fresh-name — and only then deletes the files the new
    * manifest no longer references. Readers resolve the highest
    * manifest, so EVERY crash window is safe: before the commit they
    * see table version N intact (the staged dir is unreferenced
    * garbage, removed by the next successful commit's sweep); after it
    * they see N+1 complete — an emptied bucket simply has no manifest
    * entry, so deleted keys can never transiently resurrect the way a
    * listing-based dynamic overwrite allowed between its commit and its
    * empty-dir cleanup (the round-13 crash window, closed here).
    * SinksSpec injects failures at both phases via `onPhase`.
    *
    * Per-batch work is O(batch + touched buckets), not O(table): the
    * stored side reads only the touched buckets' directories (manifest
    * pruning — stronger than scan-time partition pruning), untouched
    * buckets keep their exact files (byte-identical, asserted), and the
    * manifest itself is O(numBuckets) — a layout constant.
    * Replay-idempotent: re-merging an already-applied batch reproduces
    * the same table content, so an at-least-once upstream (a streaming
    * foreachBatch retry) converges.
    *
    * On a lakehouse deploy this call maps 1:1 onto Delta/Iceberg
    * `MERGE INTO target USING updates ON target.key = updates.key ...` —
    * the manifest is exactly their transaction-log commit, minus
    * multi-writer CAS (single-writer here, as documented; the immediate
    * post-commit sweep likewise assumes no concurrent reader mid-scan —
    * a deploy with concurrent readers delays it, Delta's VACUUM
    * retention). The atomic step is a same-directory rename to a name
    * that does not yet exist — atomic on HDFS and POSIX; an object
    * store deploy would swap it for a conditional put.
    *
    * `updates` must carry at most one row per key (pre-aggregate
    * conflicts upstream — [[graft.streaming.StreamingIngest.mergeBatch]]
    * shows the domain-specific fold); `numBuckets` must match the value
    * the table was created with.
    */
  def mergeInto(spark: SparkSession, targetPath: String, updates: DataFrame,
                keyCol: String, numBuckets: Int = MergeBuckets,
                deleteCol: Option[String] = None,
                onPhase: String => Unit = _ => ()): Unit = {
    val bucket = pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int")
    val upserts0 = deleteCol.fold(updates)(d => updates.where(!coalesce(col(d), lit(false))))
    val upserts = deleteCol.fold(upserts0)(d => upserts0.drop(d))
      .withColumn("_bucket", bucket)
    val allKeys = updates.select(col(keyCol)).withColumn("_bucket", bucket)
    // The touched-bucket list drives the stored-side manifest prune and
    // the commit, so it is brought to the driver ONCE, through an
    // observe() metric on a one-column pass over the batch — the list is
    // bounded by `numBuckets` (a layout constant, 64 by default), never
    // by data size, so this is a counters-class driver value, not a data
    // collect.
    val touchedBuckets: Seq[Int] = {
      val obs = Observation()
      allKeys.select("_bucket")
        .observe(obs, collect_set(col("_bucket")).as("bs"))
        .foreach(_ => ())
      obs.get("bs").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Int]).toSeq.sorted
    }
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // explicit manifest resolution, NOT a catch-all around the read: an
    // EXISTING table whose manifest is unreadable must fail the merge
    // loudly — treating it as "new" would overwrite the table with just
    // this batch. A root holding only data/ + crashed manifest temps is
    // a crashed FIRST commit (never referenced ⇒ legitimately new); a
    // root holding ANYTHING else without a manifest is some other
    // table's data (e.g. the pre-manifest bucket layout) and silently
    // shadowing it with this batch is exactly the failure the check
    // exists to prevent.
    val current = latestManifest(fs, root)
    if (current.isEmpty && fs.exists(root)) {
      val foreign = fs.listStatus(root).map(_.getPath.getName).filterNot {
        n => n == "data" || ManifestTmpRe.matches(n)
      }
      require(foreign.isEmpty,
        s"mergeInto: $targetPath exists without a manifest but holds " +
          s"non-staging entries ${foreign.mkString(", ")} — refusing to " +
          "shadow a foreign table with this batch")
    }
    val prevMap: Map[Int, String] =
      current.map { case (_, p) => parseManifest(fs, p) }.getOrElse(Map.empty)
    val stored = {
      val touched = prevMap.view.filterKeys(touchedBuckets.contains).toSeq
      touched.groupBy(_._2).map { case (ver, entries) =>
        spark.read
          .option("basePath", new org.apache.hadoop.fs.Path(root, ver).toString)
          .parquet(entries.map { case (b, _) =>
            new org.apache.hadoop.fs.Path(root, s"$ver/_bucket=$b").toString }: _*)
      }.reduceOption(_ unionByName _)
    }
    val merged = stored match {
      case Some(prev) =>
        // stored rows of touched buckets only, minus every matched key
        // (updated keys re-enter from the batch side; deleted keys don't)
        prev.join(allKeys.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(upserts)
      case None => upserts
    }
    // stage the batch as a fresh version dir; the materializing action
    // also completes the present-bucket observation (an emptied bucket —
    // every stored row deleted, no upsert hashed there — is absent from
    // `present` and simply gets no manifest entry)
    val version = "data/v-" + java.util.UUID.randomUUID().toString
    val presentObs = Observation()
    val m = graft.ops.Iterate.materialize(
      merged.observe(presentObs, collect_set(col("_bucket")).as("bs")))
    try {
      m.df.write.mode("overwrite").partitionBy("_bucket")
        .parquet(new org.apache.hadoop.fs.Path(root, version).toString)
      val present = presentObs.get("bs").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Int]).toSet
      onPhase("staged") // crash here ⇒ readers still see version N intact
      val nextMap = (prevMap -- touchedBuckets) ++
        present.toSeq.sorted.map(_ -> version)
      val nextN = current.map(_._1 + 1).getOrElse(0L)
      writeManifest(fs, root, nextN, nextMap) // THE commit
      onPhase("committed") // crash here ⇒ readers see N+1; sweep deferred
      sweep(fs, root, nextN, nextMap)
    } finally m.release()
  }

  private val ManifestRe = "_manifest-([0-9]+)\\.json".r
  private val ManifestTmpRe = "_manifest-[0-9]+\\.json\\.tmp-.*".r

  private def latestManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case ManifestRe(n) => Some((n.toLong, st.getPath))
          case _ => None
        }
      }
      .maxByOption(_._1)

  /** Manifest body:
    * `{"v":N,"n":<bucket count>,"buckets":{"<bucket>":"<ver dir>",...},"eof":1}`
    * — written and parsed by this object only (no JSON library on the
    * classpath; the writer controls the exact shape). `n` and the `eof`
    * sentinel are INTEGRITY checks: a manifest truncated by an OS-level
    * crash (rename visible, page cache lost) would otherwise regex-parse
    * to a PARTIAL bucket map and [[readMerged]] would silently serve a
    * table missing buckets — the opposite of the fail-loudly contract.
    * parseManifest throws on a count mismatch or a missing sentinel.
    * A LEGACY manifest (pre-integrity format: `buckets` present but no
    * `"n":` key) gets a DISTINCT format-version error rather than the
    * corruption diagnosis (advice r15) — the operator fix is "rewrite
    * via writeManifest", not crash forensics.
    */
  private def parseManifest(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Map[Int, String] = {
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val declared = "\"n\":([0-9]+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    val entries = "\"([0-9]+)\":\"([^\"]+)\"".r.findAllMatchIn(txt)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    if (declared.isEmpty && txt.contains("\"buckets\""))
      throw new java.io.IOException(
        s"manifest $p uses the pre-integrity format (no \"n\" count / " +
          "\"eof\" sentinel) — too old for this reader; regenerate it by " +
          "re-writing the table (writeManifest) before trusting this build")
    if (!txt.trim.endsWith(""","eof":1}""") || !declared.contains(entries.size))
      throw new java.io.IOException(
        s"manifest $p is truncated or corrupt: declared n=$declared, " +
          s"parsed ${entries.size} bucket entries, " +
          s"eof sentinel ${if (txt.trim.endsWith(""","eof":1}""")) "present"
            else "MISSING"} — refusing to serve a partial bucket map")
    entries
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, n: Long, buckets: Map[Int, String]): Unit = {
    val body = buckets.toSeq.sorted
      .map { case (b, v) => s""""$b":"$v"""" }.mkString(",")
    val txt = s"""{"v":$n,"n":${buckets.size},"buckets":{$body},"eof":1}"""
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"_manifest-$n.json.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try {
      out.write(txt.getBytes("UTF-8"))
      // best-effort durability before the rename-commit; LocalFileSystem
      // may not support hsync — the n/eof validation catches truncation
      // either way
      try out.hsync() catch { case _: UnsupportedOperationException => out.hflush() }
    } finally out.close()
    val dst = new org.apache.hadoop.fs.Path(root, s"_manifest-$n.json")
    // rename to a fresh name in the same directory: atomic on HDFS and
    // POSIX; its visibility IS the commit
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"manifest commit failed: $dst")
  }

  /** Post-commit sweep: drop superseded manifests and every
    * (version dir, bucket) subtree the current manifest no longer
    * references — including leftovers of crashed stagings. Bounded by
    * versions × buckets directory entries; purely garbage collection
    * (a crash that skips it costs disk, never correctness).
    */
  private def sweep(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, currentN: Long,
      buckets: Map[Int, String]): Unit = {
    fs.listStatus(root).foreach { st =>
      st.getPath.getName match {
        case ManifestRe(n) if n.toLong < currentN => fs.delete(st.getPath, false)
        // a temp from a CRASHED commit (our own temp was already renamed
        // away before sweep runs) — plain garbage
        case n if ManifestTmpRe.matches(n) => fs.delete(st.getPath, false)
        case _ => ()
      }
    }
    val live: Set[String] = buckets.map { case (b, v) => s"$v/_bucket=$b" }.toSet
    val liveVers: Set[String] = buckets.values.toSet
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { ver =>
      val verRel = "data/" + ver.getPath.getName
      if (!liveVers.contains(verRel)) fs.delete(ver.getPath, true)
      else fs.listStatus(ver.getPath).foreach { sub =>
        val name = sub.getPath.getName
        if (name.startsWith("_bucket=") &&
            !live.contains(s"$verRel/$name"))
          fs.delete(sub.getPath, true)
      }
    }
  }

  /** Read back a [[mergeInto]] table through its latest manifest,
    * without the layout column. Manifest-level bucket resolution means
    * a reader never lists data directories — staged-but-uncommitted
    * versions are invisible by construction. Limitation: a table whose
    * every row has been deleted has no files left to carry the schema,
    * so the read degenerates to a zero-column empty frame (a lakehouse
    * log would persist the schema in the manifest; this layout keeps
    * the manifest to bucket → version entries).
    */
  def readMerged(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = latestManifest(fs, root).getOrElse(
      throw new java.io.FileNotFoundException(s"no manifest under $path"))
    val buckets = parseManifest(fs, manifest._2)
    buckets.toSeq.groupBy(_._2).map { case (ver, entries) =>
      spark.read
        .option("basePath", new org.apache.hadoop.fs.Path(root, ver).toString)
        .parquet(entries.map { case (b, _) =>
          new org.apache.hadoop.fs.Path(root, s"$ver/_bucket=$b").toString }: _*)
    }.reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)
      .drop("_bucket")
  }
}
