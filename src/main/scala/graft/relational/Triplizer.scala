package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.QuadStore

/** Maps the driver's TPC-H-ish parquet tables to RDF quads so the SPARQL
  * engine can be exercised (and DuckDB-oracle-verified) over relational
  * test data (FIXTURES.md §A usage mapping).
  *
  * Conventions:
  *  - subject: `<table>/<key>` (lineitem uses `l_orderkey-l_linenumber`)
  *  - predicate: `<table>#<column>`
  *  - graph: `graph/<table>` (one named graph per table, so GRAPH / FROM /
  *    FROM NAMED semantics are testable on real data); callers who want
  *    everything in the default graph pass `defaultGraph = true`
  *  - foreign keys become IRIs of the referenced entity (`nation/5`)
  *  - lexical forms: numbers via CAST AS STRING, timestamps as
  *    `yyyy-MM-dd HH:mm:ss` (UTC) — mirrored exactly by the DuckDB oracle
  *    SQL in SparkEntry.oracleSql
  *
  * Single-scan design: each table is read once and exploded into quads via
  * an array of (p, o) structs — column-pruned, no joins, no shuffle. At
  * 100 TB each table triplizes embarrassingly parallel per input split.
  */
object Triplizer {

  /** keyCols empty → subject is a full-row md5 fingerprint (the synthetic
    * lineitem has no unique business key — `(l_orderkey, l_linenumber)`
    * collides — and full rows are distinct, so the fingerprint is a
    * deterministic unique id both Spark and DuckDB can compute). */
  final case class TableSpec(
      name: String,
      keyCols: Seq[String],
      fks: Map[String, String]) // column → referenced table name

  val tables: Seq[TableSpec] = Seq(
    TableSpec("region", Seq("r_regionkey"), Map.empty),
    TableSpec("nation", Seq("n_nationkey"), Map("n_regionkey" -> "region")),
    TableSpec("customer", Seq("c_custkey"), Map("c_nationkey" -> "nation")),
    TableSpec("supplier", Seq("s_suppkey"), Map("s_nationkey" -> "nation")),
    TableSpec("part", Seq("p_partkey"), Map.empty),
    TableSpec("orders", Seq("o_orderkey"), Map("o_custkey" -> "customer")),
    TableSpec("lineitem", Seq.empty,
      Map("l_orderkey" -> "orders", "l_partkey" -> "part", "l_suppkey" -> "supplier")))

  /** Canonical lexical form of a column value — keep in sync with the
    * DuckDB-side expressions in SparkEntry.oracleSql. */
  def lexical(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case TimestampType => date_format(col(c), "yyyy-MM-dd HH:mm:ss")
      case _ => col(c).cast(StringType)
    }
  }

  def subjectCol(df: DataFrame, spec: TableSpec): Column =
    if (spec.keyCols.nonEmpty)
      concat(lit(spec.name + "/"),
        concat_ws("-", spec.keyCols.map(k => col(k).cast(StringType)): _*))
    else
      concat(lit(spec.name + "/"),
        md5(concat_ws("|", df.columns.toSeq.map(c => lexical(df, c)): _*)))

  /** Quads for one table: (g, s, p, o), one row per non-null cell. */
  def tableQuads(spark: SparkSession, sfDir: String, spec: TableSpec,
      defaultGraph: Boolean = false): DataFrame = {
    // The driver parquet is one small file per table → one input split;
    // without a repartition the explode+md5 projection of the largest
    // table runs on a single core and dominates store materialization.
    // (On a real cluster the reader splits by row group and this shuffle
    // of raw columnar rows is still cheap relative to the projection.)
    val df = spark.read.parquet(s"$sfDir/${spec.name}.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val pairs: Seq[Column] = df.columns.toSeq.map { c =>
      val oCol = spec.fks.get(c) match {
        case Some(ref) => concat(lit(ref + "/"), col(c).cast(StringType))
        case None => lexical(df, c)
      }
      struct(lit(s"${spec.name}#$c").as("p"), oCol.as("o"))
    }
    val g = if (defaultGraph) lit(null).cast(StringType) else lit(s"graph/${spec.name}")
    df.select(g.as("g"), subjectCol(df, spec).as("s"), explode(array(pairs: _*)).as("po"))
      .select(col("g"), col("s"), col("po.p").as("p"), col("po.o").as("o"))
      .filter(col("o").isNotNull)
  }

  /** All tables triplized; each table in its own named graph AND merged
    * into the default graph view by unioning (subjects are table-prefixed,
    * so graphs are disjoint and the merged-default dedup is a no-op). */
  def quads(spark: SparkSession, sfDir: String, defaultGraph: Boolean = true): DataFrame =
    tables.map(t => tableQuads(spark, sfDir, t, defaultGraph)).reduce(_ unionByName _)

  def store(spark: SparkSession, sfDir: String, defaultGraph: Boolean = true): QuadStore =
    QuadStore(spark, quads(spark, sfDir, defaultGraph))

  /** A FRESH mutable store over the cached predicate-clustered quad
    * table: entries that insert/delete get isolation (mutations union in
    * memory on the wrapper, never touching the shared cache) without
    * paying a full re-triplization per call — at sf0.1 the uncached
    * [[store]] costs minutes, the cached read sub-second. */
  def isolatedStore(spark: SparkSession, sfDir: String,
      defaultGraph: Boolean = true): QuadStore =
    QuadStore(spark, cachedStore(spark, sfDir, defaultGraph).quads)

  // Materialized quad tables per (sfDir, defaultGraph): triplize once,
  // write Parquet clustered by predicate, and serve every later query from
  // that table. Clustering by `p` gives row-group min/max + dictionary
  // pruning on the dominant access key — the Spark-native replacement for
  // the reference's gpos/gspo permutation indexes (SURVEY §1.5), and the
  // same layout that scales to a 100 TB quad corpus (predicate-clustered
  // columnar files; the in-memory columnar cache measured 10× slower to
  // build and no faster to scan for this string-heavy schema).
  /** Cache key for a corpus directory: basename (human-readable) + a hash
    * of the CANONICAL path — two corpora with equal basenames under
    * different parents (`/a/sf0.1` vs `/b/sf0.1`) must not share one
    * materialized layout; the basename alone silently served one corpus's
    * files for the other. */
  private def corpusKey(sfDir: String, defaultGraph: Boolean): String = {
    val f = new java.io.File(sfDir)
    val h = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(f.getCanonicalPath))
    f.getName + "_" + h + (if (defaultGraph) "_d" else "_g")
  }

  private val cache = scala.collection.mutable.Map.empty[(String, Boolean), QuadStore]
  def cachedStore(spark: SparkSession, sfDir: String, defaultGraph: Boolean = true): QuadStore =
    synchronized {
      cache.getOrElseUpdate((sfDir, defaultGraph), {
        val key = corpusKey(sfDir, defaultGraph)
        val path = s"/tmp/graft_quads/$key"
        if (!new java.io.File(path, "_SUCCESS").exists()) {
          // RANGE-partitioned by (p, s) rather than hash-by-p (r11): the
          // predicate distribution is Zipf-ish (the fact table's 17
          // predicates dominate), so hashing p funneled most rows through
          // a few sort+write tasks — measured 19.7 s vs 8.2 s for the
          // range layout at sf0.1 (LoadProbe2). Every file still holds a
          // contiguous (p, s) range sorted within, so predicate min/max
          // pruning on p is as tight as before, and a hot predicate now
          // SPLITS across files instead of serializing one scan task —
          // the same fix the 100 TB layout needs (guide §2.5 input skew,
          // §6 sort order on write).
          quads(spark, sfDir, defaultGraph)
            .repartitionByRange(spark.sparkContext.defaultParallelism,
              col("p"), col("s"))
            .sortWithinPartitions("p", "s")
            .write.mode("overwrite").option("compression", "zstd")
            .parquet(path)
        }
        QuadStore(spark, spark.read.parquet(path))
      })
    }

  /** Subject-bucketed quad table: `CLUSTERED BY (s) SORTED BY (s)` into
    * `buckets` files — repeated subject-keyed joins (star joins, rule
    * premise joins on a shared subject) read co-located sorted buckets
    * and plan with NO Exchange on either side, the layout that matters
    * when the same 100 TB corpus serves many star-shaped queries. Spark
    * bucketing needs a catalog table, so this registers
    * `graft_quads_s_<key>` in the session catalog (files under the
    * warehouse dir); per-session registration, same cache discipline as
    * [[cachedStore]]. */
  private val bucketCache = scala.collection.mutable.Map.empty[(String, Boolean, Int), QuadStore]
  def bucketedStore(spark: SparkSession, sfDir: String,
      defaultGraph: Boolean = true, buckets: Int = 32): QuadStore =
    synchronized {
      bucketCache.getOrElseUpdate((sfDir, defaultGraph, buckets), {
        val key = corpusKey(sfDir, defaultGraph).replace(".", "_")
        val table = s"graft_quads_s_$key"
        val srcPath = new java.io.File(sfDir).getCanonicalPath
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
        val marker = new java.io.File(loc, "_graft_buckets")
        // marker line 1: bucket count; line 2: canonical source path —
        // belt-and-braces with the path hash in the table name, so a
        // surviving warehouse dir is never reused for a different corpus
        def writtenBuckets: Option[Int] =
          if (marker.exists()) {
            val lines = java.nio.file.Files.readString(marker.toPath).trim
              .split("\n").toSeq
            lines.drop(1).headOption.foreach(p => require(p == srcPath,
              s"$table was built from $p; requested corpus $srcPath — " +
                s"remove ${loc.getAbsolutePath} to rebuild"))
            Some(lines.head.trim.toInt)
          } else None
        // the FILES' bucket count is the source of truth: declaring a
        // different count would make Spark plan exchange-free joins on
        // wrong bucket assignments — silent wrong results. One table name
        // per corpus, so a different requested count is a hard error.
        if (spark.catalog.tableExists(table) || loc.exists()) {
          val written = writtenBuckets.getOrElse(
            throw new IllegalStateException(
              s"${loc.getAbsolutePath} exists without a _graft_buckets marker; " +
                "remove it to rebuild"))
          require(written == buckets,
            s"$table was written with $written buckets; requested $buckets — " +
              s"remove ${loc.getAbsolutePath} to rebuild")
          if (!spark.catalog.tableExists(table))
            // files survive from an earlier session whose in-memory
            // catalog is gone: re-register an external bucketed table
            spark.sql(
              s"""CREATE TABLE $table (g STRING, s STRING, p STRING, o STRING)
                  USING PARQUET CLUSTERED BY (s) SORTED BY (s) INTO $written BUCKETS
                  LOCATION '${loc.getAbsolutePath}'""")
        } else {
          cachedStore(spark, sfDir, defaultGraph).quads
            // ONE file per bucket (r11): bucketBy writes a file per
            // (write-task, bucket), so an N-partition source yields up to
            // N files per bucket — and a multi-file bucket costs the
            // reader per-file open overhead AND (when several sorted
            // files must merge) a scan-side sort the single-file layout
            // elides. Pre-repartitioning by the bucket key aligns write
            // tasks with buckets: exactly `buckets` files. Measured
            // (S-family, warm, same host): multi-file buckets 1.2-1.8 s
            // per entry vs 0.4-0.5 s single-file.
            .repartition(buckets, col("s"))
            .write.bucketBy(buckets, "s").sortBy("s")
            .mode("overwrite").saveAsTable(table)
          java.nio.file.Files.writeString(marker.toPath, s"$buckets\n$srcPath")
        }
        QuadStore(spark, spark.table(table))
      })
    }

  /** Dictionary-encoded store over MATERIALIZED id/terms tables — the
    * on-disk layout an encoded corpus uses at scale: encode once at
    * ingest (ids clustered by predicate id, terms clustered by id), not
    * per query. The lazy `withDictEncoding` views re-hash the corpus on
    * every decode join; this is the difference between "encoded path
    * exists" and "encoded path is usable". */
  private val encCache = scala.collection.mutable.Map.empty[(String, Boolean), QuadStore]
  def cachedEncodedStore(spark: SparkSession, sfDir: String,
      defaultGraph: Boolean = true): QuadStore =
    synchronized {
      encCache.getOrElseUpdate((sfDir, defaultGraph), {
        val base = cachedStore(spark, sfDir, defaultGraph)
        val key = corpusKey(sfDir, defaultGraph)
        val idsPath = s"/tmp/graft_quads/${key}_ids"
        val termsPath = s"/tmp/graft_quads/${key}_terms"
        // both tables must be complete before either is trusted: terms is
        // written FIRST and ids LAST, so the ids _SUCCESS marker (the one
        // that gates the skip) is the final step of the pair — a crash
        // between the two writes leaves no accepted half-snapshot. The
        // terms marker is still checked for the pre-fix layout.
        if (!new java.io.File(idsPath, "_SUCCESS").exists() ||
            !new java.io.File(termsPath, "_SUCCESS").exists()) {
          base.termsTable
            .repartitionByRange(spark.sparkContext.defaultParallelism, col("id"))
            .sortWithinPartitions("id")
            .write.mode("overwrite").option("compression", "zstd")
            .parquet(termsPath)
          base.encodedQuads
            .repartition(col("p_id"))
            .sortWithinPartitions("p_id", "s_id")
            .write.mode("overwrite").option("compression", "zstd")
            .parquet(idsPath)
        }
        base.withDictEncoding(Some(
          (spark.read.parquet(idsPath), spark.read.parquet(termsPath))))
      })
    }
}
