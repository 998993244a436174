package graft.tables

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Per-file column statistics — the engine's analog of Hudi's
  * column-stats metadata index (reference:
  * `hoodie.metadata.index.column.stats.enable` + the metadata table,
  * AirflowHudiLabs/Lab2/jobs/python/create_hudi_tables.py:176-183).
  *
  * Every commit dir with declared [[KeyedTable.statsColumns]] carries a
  * `_stats` parquet sidecar: one row per data FILE with
  * `min_<col> / max_<col> / nulls_<col>` for each declared column.
  * `TableOps.snapshotWhere` evaluates a scan predicate against those
  * rows and hands Spark only the files that can possibly match.
  *
  * Why this matters at 100 TB: parquet row-group stats give the same
  * skipping, but only AFTER the scan has listed every file and opened
  * every footer — millions of object-store GETs for a selective query.
  * A manifest-level index prunes from kilobyte-scale metadata before
  * any data file is touched (the Delta/Iceberg/Hudi design). Pair it
  * with a clustered write (`sortBy` on the stats column) so per-file
  * ranges are disjoint and a range predicate isolates a handful of
  * files.
  *
  * Collection cost: one column-pruned scan of the JUST-WRITTEN commit
  * dir (only the declared columns are read — proportional to the
  * increment, never the table). The sidecar is immutable alongside its
  * commit dir: the cleaner collects both together, and no merge step
  * exists — each manifest's parts map decides which dirs (and hence
  * which sidecars) are live.
  *
  * Pruning is CONSERVATIVE by construction: predicate nodes with no
  * stats translation keep every file, and the caller re-applies the
  * full predicate to the surviving rows — a missed pruning opportunity
  * costs I/O, never correctness.
  */
object ColumnStats {

  /** Sidecar location: `{table}/.commits/stats/{commitTs}` — beside
    * the manifests, NOT inside the commit data dir (Spark's hidden-path
    * filter refuses to read an underscore/dot-prefixed dir even when
    * addressed explicitly, and an unprefixed dir inside the commit dir
    * would be picked up as data by unpartitioned whole-dir reads).
    * Same immutability story as the data dirs: written once before the
    * manifest publishes, collected by clean() when no retained manifest
    * references the commit.
    */
  private[graft] def statsPath(t: KeyedTable, ver: String): String =
    s"${t.commitsPath}/stats/$ver"

  /** Collect + write the sidecar for a freshly-written commit dir.
    * Call AFTER the data write and BEFORE the manifest publish (a crash
    * in between leaves an orphan dir, never a published commit whose
    * sidecar is missing — readers may therefore treat a missing sidecar
    * as "legacy commit, no pruning" rather than a protocol error).
    */
  def write(spark: SparkSession, t: KeyedTable, ver: String,
      schema: Option[StructType]): Unit = {
    val destDir = s"${t.dataPath}/$ver"
    val readBack = schema.foldLeft(spark.read)((r, s) => r.schema(s))
      .option("basePath", destDir).parquet(destDir)
    val present = readBack.columns.toSet
    val tracked = trackedColumns(t).filter(present)
    // `rows` always rides along: Σ rows over live files is an exact
    // metadata-only table count (see [[rowCount]])
    val aggs = count(lit(1L)).as("rows") +: tracked.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    val stats = readBack.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // one row per file — a driver-metadata-sized frame; one part file
    stats.coalesce(1).write.mode("overwrite").parquet(statsPath(t, ver))
  }

  /** Stats are always kept for `_commit_ts` (a COW rewrite carries old
    * rows forward, so per-file commit-ts ranges let an INCREMENTAL
    * read prune untouched files from metadata — the timeline-side
    * file-slice pruning Hudi gets from its timeline server) and for
    * the partition columns (constant per file — free rows that give
    * `snapshotWhere` partition pruning without declaration).
    */
  private[graft] def trackedColumns(t: KeyedTable): Seq[String] =
    (t.statsColumns ++ t.partitionBy :+ KeyedTable.CommitCol).distinct

  /** The live data files of one commit dir (the rels `parts` assigns to
    * `ver`), as FS-qualified paths. The same listing Spark's own file
    * index performs — driver-side, metadata-sized.
    */
  private def liveFiles(fs: FileSystem, t: KeyedTable, ver: String,
      rels: Seq[String]): Seq[Path] = {
    val dirs =
      if (rels == Seq("")) Seq(new Path(s"${t.dataPath}/$ver"))
      else rels.map(rel => new Path(s"${t.dataPath}/$ver/$rel"))
    dirs.flatMap { d =>
      // a LIVE dir (the current manifest references it) that is gone
      // is corruption — fail like the plain scan would, don't silently
      // return fewer files (an undercount or a partial read)
      if (!fs.exists(d))
        throw new java.io.FileNotFoundException(
          s"table ${t.name}: live partition dir $d is missing " +
            "(manifest references it; out-of-band deletion?)")
      fs.listStatus(d).toSeq
        .filter(st => st.isFile && {
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        })
        .map(st => fs.makeQualified(st.getPath))
    }
  }

  /** `input_file_name()` returns a URI string; decode it to the same
    * qualified-path form `liveFiles` produces. `new URI(...).getPath`
    * is the correct inverse (percent-decodes, leaves '+' alone —
    * `URLDecoder` would corrupt it; ADVICE r3).
    */
  private def qualifiedOf(fs: FileSystem, uri: String): Path =
    fs.makeQualified(new Path(new java.net.URI(uri)))

  /** Read the table state of `parts`, pruning files via the `_stats`
    * sidecars. Commit dirs without a sidecar (legacy, or no declared
    * stats columns at write time) are read in full. Returns None when
    * every file was pruned (no possible match anywhere). The caller
    * must still apply `pred` to the result.
    */
  private[graft] def prunedRead(spark: SparkSession, t: KeyedTable,
      parts: Map[String, String], sch: Option[StructType],
      pred: Column): Option[DataFrame] = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // resolve the predicate through Spark's analyzer (Columns carry a
    // connect-style node tree, not catalyst expressions) — without a
    // manifest schema there is nothing to resolve against: no pruning
    val resolved = sch.map(s => analyzedPredicate(spark, s, pred))
    // rename lineage: the surviving-file scan must read each ver's
    // files under their PHYSICAL column names (TableOps.readVer), or a
    // renamed non-stats column reads NULL from pre-rename files
    val rens = CommitLog(t, spark).renames()
    val frames = parts.groupBy(_._2).toSeq.sortBy(_._1).flatMap {
      case (ver, m) =>
        val rels = m.keys.toSeq.sorted
        val verDir = s"${t.dataPath}/$ver"
        if (resolved.isEmpty || !fs.exists(new Path(statsPath(t, ver)))) {
          // no sidecar — delegate to the canonical per-version read so
          // legacy-commit reads can never drift from snapshot() reads
          Some(graft.ops.TableOps.readParts(spark, t, m, sch))
        } else {
          val statsDf = spark.read.parquet(statsPath(t, ver))
          val keepCol =
            translate(resolved.get, trackedColumns(t).toSet, statsDf)
          // (file, keep) — keep=null means "no value can match": prune
          val verdicts = statsDf
            .select(col("file"), coalesce(keepCol, lit(false)).as("keep"))
            .collect()
            .map(r => qualifiedOf(fs, r.getString(0)).toString
              -> r.getBoolean(1))
            .toMap
          // a live file absent from the sidecar survives (conservative)
          val surviving = liveFiles(fs, t, ver, rels)
            .filter(p => verdicts.getOrElse(p.toString, true))
          if (surviving.isEmpty) None
          else Some(graft.ops.TableOps.readVer(spark, sch, rens, ver,
            verDir, surviving.map(_.toString)))
        }
    }
    frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  /** The stats sidecars of the CURRENT table state as one DataFrame —
    * the read side of [[write]] exposed for inspection (Hudi metadata
    * `col_stats` index / CLI `stats show` analog): one row per live
    * data file with `rows` and the tracked columns' `min_/max_/nulls_`
    * triples, tagged with its owning `commit_ts` and `role`
    * (`base`/`delta`). Files a sidecar records but the manifest no
    * longer assigns (a partition re-owned by a later commit) are
    * filtered out, so the view sums to the exact live table. Versions
    * without a sidecar (legacy commits) contribute nothing — same
    * contract as the pruning reads. Driver-side metadata work only
    * (the per-file liveness filter walks the same kilobyte listings as
    * [[prunedRead]]); None when no version carries a sidecar.
    */
  private[graft] def statsView(spark: SparkSession, t: KeyedTable,
      parts: Map[String, String], deltas: Seq[String]): Option[DataFrame] = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a delta dir owns ALL its files (no partition re-ownership can
    // strip a live delta), but a partitioned delta nests hive subdirs
    // — walk recursively instead of the rel-scoped base listing
    def deltaFiles(ver: String): Seq[Path] = {
      def walk(p: Path): Seq[Path] =
        fs.listStatus(p).toSeq.flatMap { st =>
          val n = st.getPath.getName
          if (n.startsWith("_") || n.startsWith(".")) Nil
          else if (st.isDirectory) walk(st.getPath)
          else Seq(fs.makeQualified(st.getPath))
        }
      walk(new Path(s"${t.dataPath}/$ver"))
    }
    def frameOf(ver: String, live: => Seq[Path],
        role: String): Option[DataFrame] = {
      if (!fs.exists(new Path(statsPath(t, ver)))) return None
      val liveSet = live.map(_.toString).toSet
      val df = spark.read.parquet(statsPath(t, ver))
      val keep = df.select("file").collect().map(_.getString(0))
        .filter(u => liveSet.contains(qualifiedOf(fs, u).toString)).toSeq
      Some(df.filter(col("file").isin(keep: _*))
        .withColumn("commit_ts", lit(ver))
        .withColumn("role", lit(role)))
    }
    val frames =
      parts.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (ver, m) =>
        frameOf(ver, liveFiles(fs, t, ver, m.keys.toSeq.sorted), "base")
      } ++ deltas.sorted.flatMap(v => frameOf(v, deltaFiles(v), "delta"))
    frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  /** Split a MOR base read into (safe, risky) frames by the live
    * deltas' record-key ranges — the refinement that restores file
    * skipping under MERGE_ON_READ state (Hudi's file-slice idea
    * recovered from kilobyte sidecars):
    *
    *   - a file whose min/max range on ANY record-key column is
    *     disjoint from the deltas' [lo, hi] on that column cannot hold
    *     a row any delta supersedes — it is SAFE: it skips the merge
    *     entirely AND the scan predicate prunes it like a pure-COW
    *     read;
    *   - every other file is RISKY: its rows must flow through the
    *     merge unfiltered (a pre-merge row filter could resurrect a
    *     superseded version), so `pred` does NOT prune it.
    *
    * `deltaRanges` carries (keyCol, lo, hi) with non-null bounds; files
    * with null-count > 0 on a key column stay risky only when the
    * caller says deltas carry null keys (it bails to the full merge in
    * that case), so here a missing/indeterminate verdict is simply
    * risky. Commit dirs without a sidecar are wholly risky. Either
    * side is None when it has no files.
    */
  private[graft] def morSplitRead(spark: SparkSession, t: KeyedTable,
      parts: Map[String, String], sch: StructType, pred: Column,
      deltaRanges: Seq[(String, Any, Any)])
      : (Option[DataFrame], Option[DataFrame]) = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val resolved = analyzedPredicate(spark, sch, pred)
    var safes = List.empty[DataFrame]
    var riskys = List.empty[DataFrame]
    // same rename-lineage mapping as prunedRead: both file-list scans
    // below must read pre-rename files under their physical names
    val rens = CommitLog(t, spark).renames()
    parts.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (ver, m) =>
      val verDir = s"${t.dataPath}/$ver"
      def readFiles(files: Seq[Path]): DataFrame =
        graft.ops.TableOps.readVer(spark, Some(sch), rens, ver, verDir,
          files.map(_.toString))
      val haveSidecar = fs.exists(new Path(statsPath(t, ver)))
      lazy val statsDf = spark.read.parquet(statsPath(t, ver))
      // a sidecar written before the key columns were stats-tracked
      // (descriptor re-declared to enable MOR skipping) has no
      // min_/max_ columns to reason with — the whole commit is risky,
      // same conservative posture as a missing sidecar (prunedRead
      // guards per-column the same way)
      if (!haveSidecar || deltaRanges.exists { case (k, _, _) =>
            !statsDf.columns.contains(s"min_$k") ||
              !statsDf.columns.contains(s"max_$k") }) {
        riskys ::= graft.ops.TableOps.readParts(spark, t, m, Some(sch))
      } else {
        // intersects on EVERY key column ⇒ the file may hold a delta
        // key; null stats (all-null or absent column) ⇒ indeterminate
        // ⇒ risky
        val intersects = deltaRanges.map { case (k, lo, hi) =>
          col(s"min_$k") <= lit(hi) && col(s"max_$k") >= lit(lo)
        }.reduce(_ && _)
        val keepCol = translate(resolved, trackedColumns(t).toSet, statsDf)
        val verdicts = statsDf.select(col("file"),
            coalesce(intersects, lit(true)).as("risky"),
            coalesce(keepCol, lit(false)).as("keep"))
          .collect()
          .map(r => qualifiedOf(fs, r.getString(0)).toString
            -> (r.getBoolean(1), r.getBoolean(2)))
          .toMap
        val (riskyF, restF) = liveFiles(fs, t, ver, m.keys.toSeq.sorted)
          .partition(p => verdicts.get(p.toString).forall(_._1))
        val safeF = restF.filter(p => verdicts(p.toString)._2)
        if (riskyF.nonEmpty) riskys ::= readFiles(riskyF)
        if (safeF.nonEmpty) safes ::= readFiles(safeF)
      }
    }
    (safes.reduceOption(_.unionByName(_, allowMissingColumns = true)),
      riskys.reduceOption(_.unionByName(_, allowMissingColumns = true)))
  }

  /** Global (lo, hi) double-embedded ranges of `cols`, folded from the
    * sidecars of the table's CURRENT commit dirs — the kilobyte
    * metadata path for z-order range discovery. Empty when any live
    * commit lacks a sidecar or a column isn't tracked (caller falls
    * back to a data agg). Sidecar rows of dead rels may widen a range
    * slightly; clamping makes that a clustering-quality nuance, never
    * a correctness issue.
    */
  private[graft] def columnRanges(spark: SparkSession, t: KeyedTable,
      parts: Map[String, String], cols: Seq[String])
      : Map[String, (Double, Double)] = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vers = parts.values.toSeq.distinct.sorted
    if (vers.exists(v => !fs.exists(new Path(statsPath(t, v))))) return Map.empty
    val all = vers.map(v => spark.read.parquet(statsPath(t, v)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    if (cols.exists(c => !all.columns.contains(s"min_$c"))) return Map.empty
    def emb(src: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.DateType =>
          unix_date(src).cast("double")
        case org.apache.spark.sql.types.TimestampType =>
          unix_micros(src).cast("double")
        case _ => src.cast("double")
      }
    val row = all.agg(
      struct(cols.flatMap(c => Seq(
        min(emb(col(s"min_$c"), all.schema(s"min_$c").dataType)).as(s"lo_$c"),
        max(emb(col(s"max_$c"), all.schema(s"max_$c").dataType)).as(s"hi_$c"))): _*)
        .as("s")).select("s.*").head()
    cols.flatMap { c =>
      (Option(row.getAs[Any](s"lo_$c")), Option(row.getAs[Any](s"hi_$c"))) match {
        case (Some(lo: java.lang.Double), Some(hi: java.lang.Double)) =>
          Some(c -> (lo.doubleValue, hi.doubleValue))
        case _ => None
      }
    }.toMap
  }

  /** Row count of ONE commit dir from its sidecar alone (None when the
    * sidecar is absent or predates the `rows` column) — powers the
    * `rows_written` field in commit manifests at zero extra job cost.
    */
  private[graft] def commitRows(spark: SparkSession, t: KeyedTable,
      ver: String): Option[Long] = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(statsPath(t, ver)))) return None
    val df = spark.read.parquet(statsPath(t, ver))
    if (!df.columns.contains("rows")) None
    else Option(df.agg(sum("rows")).head().get(0))
      .map(_.asInstanceOf[Long])
  }

  /** Exact table row count from metadata alone — the Σ of per-file
    * `rows` over the LIVE files of every current commit dir (the
    * Delta-style count-from-stats optimization: at 100 TB a `count()`
    * scan job over millions of files becomes a kilobyte sidecar read).
    * None when any live commit lacks a sidecar (or predates the `rows`
    * column) — the caller falls back to a real count.
    */
  private[graft] def rowCount(spark: SparkSession, t: KeyedTable,
      parts: Map[String, String]): Option[Long] = {
    val fs = new Path(t.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var total = 0L
    for ((ver, m) <- parts.groupBy(_._2)) {
      if (!fs.exists(new Path(statsPath(t, ver)))) return None
      val statsDf = spark.read.parquet(statsPath(t, ver))
      if (!statsDf.columns.contains("rows")) return None
      val counts = statsDf.select("file", "rows").collect()
        .map(r => qualifiedOf(fs, r.getString(0)).toString -> r.getLong(1))
        .toMap
      for (p <- liveFiles(fs, t, ver, m.keys.toSeq.sorted))
        counts.get(p.toString) match {
          case Some(n) => total += n
          case None => return None // file unknown to the sidecar
        }
    }
    Some(total)
  }

  // ——————————————————————————— predicate → file-survives translation

  /** The predicate as a resolved catalyst tree: run the analyzer over a
    * `filter` of an empty frame with the table schema and take the
    * Filter's condition — attributes become [[AttributeReference]]s,
    * literals are type-coerced exactly as the real scan will coerce
    * them. (The optimizer is NOT run: it would collapse the empty
    * relation and drop the Filter.)
    */
  private def analyzedPredicate(spark: SparkSession, schema: StructType,
      pred: Column): Expression = {
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    empty.filter(pred).queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition
    }.getOrElse(ColumnBridge.expression(lit(true)))
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** A comparison operand that folds to a constant (a literal, or a
    * coercion cast the analyzer wrapped around one). ANSI eval of a
    * malformed cast throws — treat as untranslatable, not an error.
    */
  private def litOf(e: Expression): Option[Column] =
    if (!e.foldable) None
    else try Some(ColumnBridge.column(Literal(e.eval(null), e.dataType)))
    catch { case _: Exception => None }

  /** Translate a resolved row predicate into a "this file may contain a
    * matching row" predicate over the sidecar's min/max/nulls columns.
    * Nodes with no translation become `lit(true)` (keep the file). A
    * comparison whose min/max stat is NULL (an all-null file) yields
    * NULL — the caller coalesces that to false, which is exact: no
    * non-null value exists to satisfy the comparison.
    */
  private def translate(pred: Expression, tracked: Set[String],
      statsDf: DataFrame): Column = {
    def minC(c: String) = statsDf(s"min_$c")
    def maxC(c: String) = statsDf(s"max_$c")
    def nullsC(c: String) = statsDf(s"nulls_$c")
    def has(c: String) =
      tracked(c) && statsDf.columns.contains(s"min_$c")

    /** Attr-vs-constant comparison in either orientation: `direct` for
      * `attr OP const`, `flipped` for `const OP attr` (≡ attr FLIP(OP)
      * const).
      */
    def cmp(l: Expression, r: Expression)(
        direct: (String, Column) => Column,
        flipped: (String, Column) => Column): Column =
      (attrName(l).filter(has), litOf(r),
        attrName(r).filter(has), litOf(l)) match {
        case (Some(c), Some(v), _, _) => direct(c, v)
        case (_, _, Some(c), Some(v)) => flipped(c, v)
        case _ => lit(true)
      }

    def pointHit(c: String, v: Column): Column =
      minC(c) <= v && maxC(c) >= v

    def go(e: Expression): Column = e match {
      case And(l, r) => go(l) && go(r)
      case Or(l, r)  => go(l) || go(r)
      case EqualTo(l, r) => cmp(l, r)(pointHit, pointHit)
      case EqualNullSafe(l, r) =>
        (attrName(l).filter(has), attrName(r).filter(has)) match {
          case (Some(c), _) if r.foldable && r.eval(null) == null =>
            nullsC(c) > 0
          case (_, Some(c)) if l.foldable && l.eval(null) == null =>
            nullsC(c) > 0
          case _ => cmp(l, r)(pointHit, pointHit)
        }
      case GreaterThan(l, r) =>
        cmp(l, r)((c, v) => maxC(c) > v, (c, v) => minC(c) < v)
      case GreaterThanOrEqual(l, r) =>
        cmp(l, r)((c, v) => maxC(c) >= v, (c, v) => minC(c) <= v)
      case LessThan(l, r) =>
        cmp(l, r)((c, v) => minC(c) < v, (c, v) => maxC(c) > v)
      case LessThanOrEqual(l, r) =>
        cmp(l, r)((c, v) => minC(c) <= v, (c, v) => maxC(c) >= v)
      case In(a, list) if attrName(a).exists(has) =>
        val hits = list.map(litOf)
        if (hits.exists(_.isEmpty)) lit(true)
        else {
          // CONSTANT-depth translation: an OR chain per list value
          // built a Column tree one level deep per key and overflowed
          // the converter stack at ~1500 probes (a key-index lookup at
          // sf0.1) — one literal array + `exists` evaluates the same
          // any-value-in-[min,max] test per stats row at depth O(1)
          val c = attrName(a).get
          if (hits.isEmpty) lit(false)
          else exists(array(hits.flatten: _*),
            v => minC(c) <= v && maxC(c) >= v)
        }
      case IsNull(a) if attrName(a).exists(has) =>
        nullsC(attrName(a).get) > 0
      case IsNotNull(a) if attrName(a).exists(has) =>
        // some non-null value exists ⇔ the min stat is populated
        minC(attrName(a).get).isNotNull
      case _ => lit(true)
    }
    go(pred)
  }
}
