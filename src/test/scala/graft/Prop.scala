package graft

/** Tiny deterministic property harness (scalatestplus-scalacheck is not in
  * the offline cache): seeded splitmix-driven random draws, fixed trial
  * counts, fully reproducible. */
object Prop {
  final class Rng(var s: Long) {
    def nextLong(): Long = { s = graft.synth.ImageSynth.mix(s + 1); s }
    def double(lo: Double, hi: Double): Double =
      lo + ((nextLong() >>> 11).toDouble / (1L << 53).toDouble) * (hi - lo)
    def int(lo: Int, hi: Int): Int = lo + ((nextLong() >>> 1) % (hi - lo + 1)).toInt
  }

  def forAllSeeded(trials: Int = 200, seed: Long = 42L)(body: Rng => Unit): Unit = {
    val rng = new Rng(seed)
    var i = 0
    while (i < trials) { body(rng); i += 1 }
  }
}
