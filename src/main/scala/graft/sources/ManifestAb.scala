package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Dev-only measurement of the MANIFEST CONSTANT (VERDICT r16 task 6):
  * every commit writes the complete file list (`GraftCommit
  * .commitManifest`) and re-parses it on the next read — O(files) per
  * commit by design. At the engine's operating fidelity that is fine
  * (planning diffs two manifests), but at 10⁵–10⁶ files the question
  * is whether the CONSTANT forces delta-manifests + periodic
  * checkpoints (the Iceberg/Delta shape). This harness seeds tables of
  * 10³–3·10⁵ synthetic file entries and measures, per single-file
  * append commit on top: the full read-modify-write commit wall-clock,
  * the parse alone, the header-only version probe, and the manifest
  * bytes. No Spark session — the commit path is pure JVM I/O.
  * Usage: runMain graft.sources.ManifestAb [reps]
  */
object ManifestAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 20
    println("[manifab] files | manifest KiB | commit ms/op | parse ms | header ms")
    Seq(1000, 10000, 100000, 300000).foreach { files =>
      val root = Files.createTempDirectory("graft_manifab_").toFile
      val rels = (0 until files).map(i => f"part-seed-$i%07d.csv")
      GraftCommit.withMetaLock(root) {
        GraftCommit.commitManifest(root, rels, op = "append")
      }
      def ms(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      // warm-up one commit (page cache, JIT)
      GraftCommit.withMetaLock(root) {
        val m = GraftCommit.readManifestFull(root).get
        GraftCommit.commitManifest(root, m.files :+ "part-warm-00000.csv",
          op = "append", base = Some(m.version))
      }
      val commitMs = (0 until reps).map { j =>
        ms(GraftCommit.withMetaLock(root) {
          val m = GraftCommit.readManifestFull(root).get
          GraftCommit.commitManifest(root, m.files :+ f"part-x-$j%05d.csv",
            op = "append", base = Some(m.version))
        })
      }.sorted.apply(reps / 2)
      val parseMs = (0 until reps).map(_ =>
        ms { GraftCommit.readManifestFull(root).get; () })
        .sorted.apply(reps / 2)
      val headerMs = (0 until reps).map(_ =>
        ms { GraftCommit.currentManifestVersion(root); () })
        .sorted.apply(reps / 2)
      val kib = new File(root, GraftStore.ManifestFile).length() / 1024.0
      println(f"[manifab] $files%7d | $kib%10.1f | $commitMs%10.2f | " +
        f"$parseMs%7.2f | $headerMs%7.3f")
      GraftCommit.deleteRecursively(root)
    }
  }
}
