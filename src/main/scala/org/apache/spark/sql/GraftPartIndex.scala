package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** The file index of a hive-PARTITIONED catalog table (the Delta
  * TahoeFileIndex idea, sized to this lake): Spark's own partition
  * discovery refuses MULTIPLE table roots outright
  * (CONFLICTING_DIRECTORY_STRUCTURES — `parsePartitions` requires one
  * common base), but a lake table's reader window IS many roots: one
  * `v=N` version dir per commit, each holding its own `col=val` hive
  * layout. So the catalog parses each version root SEPARATELY with
  * Spark's own parser (one base path per call — no conflict, declared
  * types govern the value casts) and merges the per-root specs into
  * one [[PartitionSpec]] handed to [[InMemoryFileIndex]] via its
  * `userSpecifiedPartitionSpec` seam — after which partition pruning,
  * listing, and the vectorized parquet scan behave exactly as on a
  * single-root hive table. Driver-side cost is one recursive listing
  * per version dir — the same listing any scan pays. */
object GraftPartIndex {

  /** Build the merged-spec file index over the window's version data
    * dirs. Each root must carry the table's full partition layout
    * (`partCols` in order) — a root with bare files (an unpartitioned
    * publish into a partitioned table) fails loudly rather than
    * serving rows with silently-null partition values. */
  def apply(spark: SparkSession, roots: Seq[String],
      fullSchema: StructType, partCols: Seq[String]): InMemoryFileIndex = {
    val hconf = spark.sessionState.newHadoopConf()
    val paths = roots.map(new Path(_))
    val qualified = paths.map(p => p.getFileSystem(hconf).makeQualified(p))
    val conf = spark.sessionState.conf
    val specs = qualified.map { root =>
      val fs = root.getFileSystem(hconf)
      // leaf dirs = exactly partCols.length levels below the root
      // (multi-column layouts nest); underscore/dot entries are
      // metadata (commit markers, _SUCCESS) and never partitions
      def leaves(dir: Path, depth: Int): Seq[Path] =
        if (depth == 0) Seq(dir)
        else fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory && isDataName(st.getPath.getName))
          .flatMap(st => leaves(st.getPath, depth - 1))
      val leafDirs = leaves(root, partCols.length)
        .filter(d => fs.listStatus(d).exists(st =>
          st.isFile && isDataName(st.getPath.getName)))
      // bare data files at a shallower level = a layout violation
      def shallowFiles(dir: Path, depth: Int): Boolean =
        depth > 0 && (fs.listStatus(dir).exists(st =>
          st.isFile && isDataName(st.getPath.getName)) ||
          fs.listStatus(dir).exists(st => st.isDirectory &&
            isDataName(st.getPath.getName) &&
            shallowFiles(st.getPath, depth - 1)))
      require(!shallowFiles(root, partCols.length),
        s"$root: data files above the ${partCols.mkString("/")} " +
          "partition depth — this version was published without the " +
          "table's partition layout (publish with partitionBy, or " +
          "drop the PARTITIONED BY declaration)")
      val spec =
        if (leafDirs.isEmpty) PartitionSpec(StructType(Nil), Nil)
        else PartitioningUtils.parsePartitions(
          leafDirs,
          typeInference = false,
          basePaths = Set(root),
          userSpecifiedSchema = Some(fullSchema),
          caseSensitive = conf.caseSensitiveAnalysis,
          validatePartitionColumns = conf.validatePartitionColumns,
          conf.sessionLocalTimeZone,
          ignoreInvalidPartitionPaths = false)
      if (spec.partitions.nonEmpty)
        require(spec.partitionColumns.fieldNames.toSeq
            .map(_.toLowerCase) == partCols.map(_.toLowerCase),
          s"$root: partition layout " +
            s"${spec.partitionColumns.fieldNames.mkString("/")} does " +
            s"not match the declared ${partCols.mkString("/")}")
      spec
    }
    val partSchema = StructType(partCols.map(c =>
      fullSchema(fullSchema.fieldNames
        .indexWhere(_.equalsIgnoreCase(c)))))
    val merged = PartitionSpec(partSchema, specs.flatMap(_.partitions))
    new InMemoryFileIndex(spark, qualified, Map.empty[String, String],
      Some(fullSchema), FileStatusCache.getOrCreate(spark),
      Some(merged), None)
  }

  private def isDataName(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")
}
