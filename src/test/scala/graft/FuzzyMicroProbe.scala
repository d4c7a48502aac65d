package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Micro-decomposition of q111's pipeline variants (round-17 probe). */
object FuzzyMicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-fuzzymicro")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[fuzzymicro] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val df = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    def deleteOne(s: org.apache.spark.sql.Column) =
      array_distinct(concat(array(s), transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))
    val np = 96
    (1 to 2).foreach { round =>
      val variants0 = df.select(col("id"), length(col("name")).as("len"),
        explode(deleteOne(col("name"))).as("v"))
        .select(col("id"), col("len"), xxhash64(col("v")).as("vh"))
      t(s"r$round variants count")(variants0.count())
      val vPart = variants0.repartition(np, col("vh"))
      t(s"r$round cand96 count") {
        val a = vPart.alias("a"); val b = vPart.alias("b")
        a.join(b, col("a.vh") === col("b.vh") && col("a.id") < col("b.id") &&
            abs(col("a.len") - col("b.len")) <= 1)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).count()
      }
      t(s"r$round candNoRep count") {
        val a = variants0.alias("a"); val b = variants0.alias("b")
        a.join(b, col("a.vh") === col("b.vh") && col("a.id") < col("b.id") &&
            abs(col("a.len") - col("b.len")) <= 1)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b")).count()
      }
      t(s"r$round cand96 distinct lev") {
        val a = vPart.alias("a"); val b = vPart.alias("b")
        val cand = a.join(b, col("a.vh") === col("b.vh") && col("a.id") < col("b.id") &&
            abs(col("a.len") - col("b.len")) <= 1)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .repartition(np, col("id_a"), col("id_b")).distinct()
        val names = df
        cand.join(names.select(col("id").as("id_a"), col("name").as("name_a")), "id_a")
          .join(names.select(col("id").as("id_b"), col("name").as("name_b")), "id_b")
          .filter(levenshtein(col("name_a"), col("name_b")) <= 1).count()
      }
    }
    spark.stop()
  }
}
