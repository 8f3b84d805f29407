package graft.geo

/** The reference's building "squaring" metric, re-derived with bit-identical
  * constants so golden values agree.
  *
  * Semantics (reference: oshdb-contributions/src/main/java/InteractionsBuilder.java:606-636):
  * project each vertex to UTM (inline formula port, :639-695), walk consecutive
  * vertex triples measuring the corner angle; angles > 135° are taken mod 90;
  * the metric is the mean |angle − 90°|; rings with < 3 coordinates score 100.
  * `@sq` is `after − before` formatted to 4 dp, polygons only (:588-597).
  */
object Squaring {

  /** Deg -> UTM easting/northing; constants verbatim from the reference
    * (InteractionsBuilder.java:688-693). */
  def deg2utm(lat: Double, lon: Double): (Double, Double) = {
    val zone = math.floor(lon / 6 + 31).toInt
    val latR = lat * math.Pi / 180
    val lonR = lon * math.Pi / 180
    val zoneR = (6 * zone - 183) * math.Pi / 180
    val cosLat = math.cos(latR)
    val t = math.sin(lonR - zoneR) * cosLat
    val halfLog = 0.5 * math.log((1 + t) / (1 - t))
    var easting = halfLog * 0.9996 * 6399593.62 /
      math.pow(1 + math.pow(0.0820944379, 2) * math.pow(cosLat, 2), 0.5) *
      (1 + math.pow(0.0820944379, 2) / 2 * math.pow(halfLog, 2) * math.pow(cosLat, 2) / 3) + 500000
    easting = math.round(easting * 100) * 0.01
    var northing = (math.atan(math.tan(latR) / math.cos(lonR - zoneR)) - latR) *
      0.9996 * 6399593.625 / math.sqrt(1 + 0.006739496742 * math.pow(cosLat, 2)) *
      (1 + 0.006739496742 / 2 * math.pow(halfLog, 2) * math.pow(cosLat, 2)) +
      0.9996 * 6399593.625 * (latR - 0.005054622556 * (latR + math.sin(2 * latR) / 2) +
        4.258201531e-05 * (3 * (latR + math.sin(2 * latR) / 2) + math.sin(2 * latR) * math.pow(cosLat, 2)) / 4 -
        1.674057895e-07 * (5 * (3 * (latR + math.sin(2 * latR) / 2) + math.sin(2 * latR) * math.pow(cosLat, 2)) / 4 +
          math.sin(2 * latR) * math.pow(cosLat, 2) * math.pow(cosLat, 2)) / 3)
    if (lat < 0) northing += 10000000 // reference keys this on the UTM letter < 'M' (i.e. southern hemisphere)
    northing = math.round(northing * 100) * 0.01
    (easting, northing)
  }

  /** Unsigned angle (radians) at vertex b of triple (a, b, c) — JTS
    * `Angle.angleBetween` semantics, re-derived. */
  def angleBetween(ax: Double, ay: Double, bx: Double, by: Double, cx: Double, cy: Double): Double = {
    val a1 = math.atan2(ay - by, ax - bx)
    val a2 = math.atan2(cy - by, cx - bx)
    val d = math.abs(a1 - a2)
    if (d > math.Pi) 2 * math.Pi - d else d
  }

  /** Mean squaring offset of a ring given lon/lat coordinate arrays (closed
    * ring: first == last, as JTS `getCoordinates` yields). */
  def avgSquareOffsetProjected(lons: Array[Double], lats: Array[Double]): Double = {
    val n = lons.length
    if (n <= 2) return 100.0
    val ex = new Array[Double](n); val ny = new Array[Double](n)
    var i = 0
    while (i < n) {
      val (e, no) = deg2utm(lats(i), lons(i)); ex(i) = e; ny(i) = no; i += 1
    }
    var sum = 0.0
    var count = 0
    i = 2
    while (i < n) {
      sum += offsetOf(math.toDegrees(angleBetween(ex(i - 2), ny(i - 2), ex(i - 1), ny(i - 1), ex(i), ny(i))))
      count += 1
      i += 1
    }
    // closing corner: (n-2, 0, 1) — "if it's closed -1 == 0" (reference :617)
    sum += offsetOf(math.toDegrees(angleBetween(ex(n - 2), ny(n - 2), ex(0), ny(0), ex(1), ny(1))))
    count += 1
    sum / count
  }

  @inline private def offsetOf(angleDeg: Double): Double = {
    val a = if (angleDeg > 135) angleDeg % 90 else angleDeg
    math.abs(a - 90)
  }

  /** `@sq` value: (after − before), rounded to 4 dp (reference :588-597). */
  def squaringDelta(lonsA: Array[Double], latsA: Array[Double],
                    lonsB: Array[Double], latsB: Array[Double]): Double = {
    val d = avgSquareOffsetProjected(lonsA, latsA) - avgSquareOffsetProjected(lonsB, latsB)
    math.rint(d * 10000.0) / 10000.0
  }
}
