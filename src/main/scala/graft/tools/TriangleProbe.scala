package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition + skew census for `graph_triangles` (VERDICT r7
  * item 2: the entry's reps wander 3-30 s). Prints the wedge volume,
  * the per-pivot wedge distribution (the skew the wedge self-join
  * shuffles on), and wall time per stage, so a structural fix can be
  * sized from data instead of conf guessing. */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = li.select((col("l_orderkey") * 4).as("src"),
        (col("l_partkey") * 4 + 1).as("dst"))
      .unionAll(li.select((col("l_partkey") * 4 + 1).as("src"),
        (col("l_suppkey") * 4 + 2).as("dst")))
      .unionAll(li.select((col("l_orderkey") * 4).as("src"),
        (col("l_suppkey") * 4 + 2).as("dst")))
    val e = edges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct().localCheckpoint()
    println(s"|E| = ${e.count()}")
    val deg = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    val oriented = e.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint()
    val outdeg = oriented.groupBy("a").agg(count(lit(1)).as("od"))
    println("top-10 oriented out-degrees (wedges per pivot = od*(od-1)/2):")
    outdeg.orderBy(col("od").desc).limit(10).collect()
      .foreach(r => println(s"  a=${r.get(0)} od=${r.getLong(1)} wedges=${r.getLong(1) * (r.getLong(1) - 1) / 2}"))
    val totWedges = outdeg.agg(sum(col("od") * (col("od") - 1) / 2)).first().get(0)
    println(s"total wedges = $totWedges")
    // wall per stage, 3 reps; closure leg A/B: SMJ (sorts the wedge
    // stream) vs shuffled-hash (hash table on the edge side only)
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      val o1 = oriented.as("o1")
      val o2 = oriented.select(col("a"), col("b").as("c")).as("o2")
      val wedges = o1.join(o2, Seq("a")).filter(col("b") < col("c"))
      val nw = wedges.count()
      val tW = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val tri = wedges.join(e,
        col("u") === col("b") && col("v") === col("c"), "left_semi")
      val counts = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("triangles"))
      val n = counts.count()
      val tC = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val triH = wedges.join(e.hint("shuffle_hash"),
        col("u") === col("b") && col("v") === col("c"), "left_semi")
      val countsH = triH.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("triangles"))
      val nH = countsH.count()
      val tH = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep: wedges=$nw ($tW%.2f s), closure SMJ rows=$n ($tC%.2f s), closure SHJ rows=$nH ($tH%.2f s)")
    }
    spark.stop()
  }
}
