package graft

import java.nio.file.{Files, Paths}

/** Dev diagnostic: dump the evidence base for the mercator-ty reformulation
  * (3→2 transcendentals, `ln(tanφ + 1/cosφ)` → `0.5·ln((1+sinφ)/(1−sinφ))`).
  *
  * Every pipeline oracle replicates the engine's EXACT FP operation order in
  * DuckDB, so the engine and oracle formulas must change in lockstep and the
  * change is only safe if Java's `Math.sin`/`Math.log` and DuckDB's libm
  * `sin`/`ln` agree bit-for-bit ON THIS DOMAIN (the geotag lat distribution,
  * metro-clustered + uniform tail). This main dumps `(latBits, tyBits,
  * tyTile)` for `n` geotag lats as CSV; `tools/merc_parity.py` reconstructs
  * the doubles, evaluates the same expression in DuckDB, and counts bit
  * mismatches — run before any lockstep flip (round-4 deferred the flip for
  * exactly this missing evidence; see BENCH.md round-5 notes for the
  * result). */
object MercParity {
  def tyNewRaw(lat: Double): Double = {
    val latC = math.max(-graft.index.Quadkey.MaxLat,
      math.min(graft.index.Quadkey.MaxLat, lat))
    val latRad = latC / 180.0 * math.Pi
    val s = math.sin(latRad)
    (1.0 - 0.5 * math.log((1.0 + s) / (1.0 - s)) / math.Pi) / 2.0 * 4096.0
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val out = if (args.length > 1) args(1) else "/tmp/merc_parity.csv"
    val sb = new java.lang.StringBuilder(n.toInt * 44)
    sb.append("lat_bits,ty_bits,ty_tile\n")
    var i = 0L
    while (i < n) {
      val (_, lat) = graft.synth.Geotag.of(graft.synth.ImageSynth.seedOf(i))
      val raw = tyNewRaw(lat)
      val tile = math.min(4095L, math.max(0L, math.floor(raw).toLong))
      sb.append(java.lang.Double.doubleToRawLongBits(lat)).append(',')
        .append(java.lang.Double.doubleToRawLongBits(raw)).append(',')
        .append(tile).append('\n')
      i += 1
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[merc] wrote $n rows to $out")
  }
}
