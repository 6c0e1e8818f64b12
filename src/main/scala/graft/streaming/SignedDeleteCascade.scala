package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Multimodal

/** The cross-family deletion contract all the per-family signed
  * machines compose into — the engine-side mirror of the reference's
  * ON DELETE CASCADE (rabbitmq-to-postgres/app.py:98): when a
  * document is deleted upstream, it must leave EVERY derived index —
  * BM25 postings, phrase positions, the ANN assignment, both
  * dedup-gate signature faces, and the image fingerprint index — in
  * one lifecycle, not family by family on independent schedules.
  *
  * One signed remove per family (same victim ids), then a per-family
  * presence probe of the live faces. The run returns one row per
  * face: (family, rows_before, rows_after) — rows_before > 0 proves
  * the victims were genuinely indexed everywhere, rows_after == 0 is
  * the contract (spec-pinned; rows-only at the driver because the
  * sketch and image faces have no SQL twin). */
object SignedDeleteCascade {

  /** Bounded end-to-end run — the measured driver entry
    * (q_signed_delete_cascade): seed all six faces (five machines)
    * over a corpus slice, stream the SAME victim ids as removals
    * through each machine, and probe each live face for the victims
    * before and after. */
  def deleteCascadeRun(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // a 5% slice keeps the six-index lifecycle bounded; victims are
    // the slice's every-fifth doc so every family indexes them
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").filter(col("doc_id") % 20 === 0)
      .localCheckpoint()
    val emb = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").filter(col("vec_id") % 20 === 0)
      .localCheckpoint()
    val victimCol = col("doc_id") % 100 === 0
    val victims = docs.filter(victimCol).select("doc_id").localCheckpoint()

    val root = java.nio.file.Files.createTempDirectory("graft_del_cascade")
    def rm(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    try {
      StreamMeter.timeSeed("q_signed_delete_cascade") {
        Bm25SignedStream.seedIndex(docs, root.resolve("bm25").toString)
        PhraseSignedStream.seedIndex(docs, root.resolve("phrase").toString)
        DedupSignedStream.seedIndex(docs, root.resolve("dedup").toString)
        IvfSignedStream.seedIndex(emb, root.resolve("ivf").toString)
        ImageSignedStream.seedIndex(
          Multimodal.imageFingerprints(Multimodal.syntheticImages(docs))
            .toDF().filter(col("media_id") < Multimodal.TwinIdBit),
          root.resolve("image").toString)
      }

      def live(name: String) = name match {
        case "bm25" => SignedIndexLayout.livePostings(spark,
          root.resolve("bm25").toString, root.resolve("bm25_d").toString,
          Long.MaxValue, Seq("term", "doc_id", "tf", "dl"))
        case "phrase" => SignedIndexLayout.livePostings(spark,
          root.resolve("phrase").toString, root.resolve("phrase_d").toString,
          Long.MaxValue, Seq("term", "doc_id", "pos"))
        case "dedup_minhash" => DedupSignedStream.liveSignatures(spark,
          root.resolve("dedup").toString, root.resolve("dedup_d").toString)
        case "dedup_simhash" => DedupSignedStream.liveFingerprints(spark,
          root.resolve("dedup").toString, root.resolve("dedup_d").toString)
        case "ivf" => IvfSignedStream.liveAssign(spark,
          root.resolve("ivf").toString, root.resolve("ivf_d").toString)
        case "image" => ImageSignedStream.liveFingerprints(spark,
          root.resolve("image").toString, root.resolve("image_d").toString)
      }
      val families =
        Seq("bm25", "phrase", "dedup_minhash", "dedup_simhash", "ivf", "image")
      def probe(): Map[String, Long] = families.map { f =>
        val idCol = f match {
          case "ivf" => "vec_id"
          case "image" => "media_id"
          case _ => "doc_id"
        }
        f -> live(f)
          .join(victims.select(col("doc_id").as(idCol)), Seq(idCol),
            "left_semi")
          .count()
      }.toMap

      val before = probe()

      // one remove batch per machine, the SAME victim ids everywhere
      def runOps(tag: String, ops: DataFrame,
          maintain: (DataFrame, String, String, String) =>
            org.apache.spark.sql.streaming.StreamingQuery): Unit = {
        val src = root.resolve(s"src_$tag").toString
        ops.write.mode("overwrite").parquet(src)
        val q = maintain(
          spark.readStream.schema(ops.schema).parquet(src),
          root.resolve(tag).toString, root.resolve(s"${tag}_d").toString,
          root.resolve(s"ckpt_$tag").toString)
        try q.processAllAvailable() finally q.stop()
      }
      val textOps = victims
        .select(col("doc_id"), lit("").as("text"), lit("remove").as("op"))
      runOps("bm25", textOps, Bm25SignedStream.indexMaintain)
      runOps("phrase", textOps, PhraseSignedStream.indexMaintain)
      runOps("dedup", textOps, DedupSignedStream.indexMaintain(_, _, _, _))
      runOps("ivf", victims
          .select(col("doc_id").as("vec_id"),
            typedLit(Array.empty[Float]).as("embedding"),
            lit("remove").as("op")),
        IvfSignedStream.indexMaintain)
      runOps("image", victims
          .select(col("doc_id").as("media_id"), lit("image").as("modality"),
            lit(Array.emptyByteArray).as("payload"), lit(0).as("width"),
            lit(0).as("height"), lit(0).as("sample_rate"),
            lit("remove").as("op")),
        ImageSignedStream.indexMaintain)

      val after = probe()
      families.map(f => (f, before(f), after(f)))
        .toDF("family", "rows_before", "rows_after")
        .orderBy("family")
    } finally rm(root)
  }
}
