package graft

import java.nio.file.{Files, Paths}

import graft.operators.Staging

/** Forked-JVM half of the StagingSpec two-process race: drive
  * [[Staging.ensureConf]] on the key given in args(0) (no Spark — the
  * helper only needs a Hadoop configuration), write a component file
  * after a deliberate mid-build delay so the two processes genuinely
  * overlap, then print the committed artifact's content for the parent
  * to compare. Exit 0 only if this process ended up reading one
  * complete finished stage. */
object StagingRaceProbe {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nonce = args(1)
    val conf = new org.apache.hadoop.conf.Configuration()
    Staging.ensureConf(conf, out) { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Thread.sleep(400L)
      // content-keyed contract: every competing builder writes the
      // SAME bytes for the same key — the nonce is per-key, not
      // per-process
      Files.writeString(Paths.get(tmp, "component.txt"), s"payload-$nonce")
    }
    val marker = Paths.get(out, "_SUCCESS")
    val component = Paths.get(out, "component.txt")
    require(Files.exists(marker), s"no finished-stage marker under $out")
    require(Files.exists(component), s"no component under $out")
    println(s"READ:${Files.readString(component)}")
  }
}
