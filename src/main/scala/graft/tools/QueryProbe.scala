package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: dump a SUBSET of SparkEntry.queries (named on the command
  * line) plus their oracle SQL, in the Verify layout, so
  * `scripts/local_verify.py` can check just the queries under
  * development without paying the full 130-query dump.
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <outDir> <query> [query...]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = graft.SparkEntry.queries.filter(kv => names.contains(kv._1))
    val missing = names -- qs.keySet
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(", ")}")
    qs.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // same placeholder resolution + index copy as graft.Verify, so ANN
    // replay oracles probe correctly too
    val annSrc = "/tmp/graft_annindex/" + graft.queries.Staging.tag(sfDir)
    val annIdx = s"$outDir/.annidx"
    try {
      val dst = new java.io.File(annIdx)
      org.apache.commons.io.FileUtils.deleteDirectory(dst)
      Seq("ivf", "pq", "ivfpq", "ivfsq", "bq", "pcapq",
          "pq_del16", "bq_maint16", "ivfpq_del16", "maxsim", "maxsim_q",
          "opq", "opqivf", "graph", "graphivf", "graphdelta").foreach { layout =>
        val from = new java.io.File(s"$annSrc/$layout")
        if (from.isDirectory)
          org.apache.commons.io.FileUtils.copyDirectory(from,
            new java.io.File(dst, layout))
      }
    } catch { case e: Throwable =>
      System.err.println(s"[probe] index copy failed: ${e.getMessage}")
    }
    val bpeSrc = "/tmp/graft_bpe/" + graft.queries.Staging.tag(sfDir)
    val bpeIdx = s"$outDir/.bpe"
    try {
      val dst = new java.io.File(bpeIdx)
      org.apache.commons.io.FileUtils.deleteDirectory(dst)
      val from = new java.io.File(s"$bpeSrc/merges")
      if (from.isDirectory)
        org.apache.commons.io.FileUtils.copyDirectory(from,
          new java.io.File(dst, "merges"))
    } catch { case e: Throwable =>
      System.err.println(s"[probe] bpe copy failed: ${e.getMessage}")
    }
    // text-index / cascade / unigram fixture copies (the graft.Verify
    // placeholder contract), so store-replay oracles probe correctly
    val tiSrc = "/tmp/graft_textindex/" + graft.queries.Staging.tag(sfDir)
    val tiIdx = s"$outDir/.textidx"
    val cSrc = "/tmp/graft_cascade/" + graft.queries.Staging.tag(sfDir)
    val cIdx = s"$outDir/.cascade"
    try {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tiIdx))
      Seq("inv", "inv_maint").foreach { d =>
        val from = new java.io.File(s"$tiSrc/$d")
        if (from.isDirectory)
          org.apache.commons.io.FileUtils.copyDirectory(from,
            new java.io.File(tiIdx, d))
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cIdx))
      Seq("text_inv", "text_pos", "dedup_store", "ann_pq").foreach { d =>
        val from = new java.io.File(s"$cSrc/$d")
        if (from.isDirectory)
          org.apache.commons.io.FileUtils.copyDirectory(from,
            new java.io.File(cIdx, d))
      }
    } catch { case e: Throwable =>
      System.err.println(s"[probe] store copy failed: ${e.getMessage}")
    }
    val uniSrc = "/tmp/graft_unigram/" + graft.queries.Staging.tag(sfDir)
    val uniIdx = s"$outDir/.unigram"
    try {
      val dst = new java.io.File(uniIdx)
      org.apache.commons.io.FileUtils.deleteDirectory(dst)
      val from = new java.io.File(s"$uniSrc/vocab")
      if (from.isDirectory)
        org.apache.commons.io.FileUtils.copyDirectory(from,
          new java.io.File(dst, "vocab"))
    } catch { case e: Throwable =>
      System.err.println(s"[probe] unigram copy failed: ${e.getMessage}")
    }
    val ptSrc = "/tmp/graft_pretrain/" + graft.queries.Staging.tag(sfDir)
    val ptIdx = s"$outDir/.pretrain"
    try {
      val dst = new java.io.File(ptIdx)
      org.apache.commons.io.FileUtils.deleteDirectory(dst)
      Seq("packed", "shards").foreach { d =>
        val from = new java.io.File(s"$ptSrc/$d")
        if (from.isDirectory)
          org.apache.commons.io.FileUtils.copyDirectory(from,
            new java.io.File(dst, d))
      }
    } catch { case e: Throwable =>
      System.err.println(s"[probe] pretrain copy failed: ${e.getMessage}")
    }
    val oracles = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => (k, v.replace("__GRAFT_ANNIDX__", annIdx)
        .replace("__GRAFT_BPE__", bpeIdx)
        .replace("__GRAFT_UNI__", uniIdx)
        .replace("__GRAFT_TEXTIDX__", tiIdx)
        .replace("__GRAFT_CASCADE__", cIdx)
        .replace("__GRAFT_PRETRAIN__", ptIdx)) }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracles.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
