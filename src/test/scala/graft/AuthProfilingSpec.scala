package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.detectors.AuthProfiling

/** Auth-profiling semantics (HogAuth.scala:323-435): cold start learns
  * silently; a known-city login is silent; a new city inside the
  * haversine radius of a known city is tolerated; far cities, new UAs and
  * new services alert.
  */
class AuthProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val spCoords = "-23.5,-46.6" // São Paulo
  private val campinasCoords = "-22.9,-47.06" // ~100 km from SP
  private val berlinCoords = "52.5,13.4" // ~10000 km

  test("atypicalAccess: radius-tolerant city check, UA and service checks") {
    import spark.implicits._
    val profiles = Seq(
      ("HIST20-alice", 50L, Map("SaoPaulo" -> 1.0)),
      ("HIST21-alice", 50L, Map("Firefox" -> 1.0)),
      ("HIST22-alice", 50L, Map("ssh" -> 1.0)),
      ("HIST20-bob", 3L, Map("SaoPaulo" -> 1.0)), // cold start
      ("HIST21-bob", 3L, Map("Firefox" -> 1.0)),
      ("HIST22-bob", 3L, Map("ssh" -> 1.0)),
    ).toDF("name", "size", "buckets")
    val cityCoords = Seq(("SaoPaulo", spCoords)).toDF("city", "coords")
    val auth = Seq(
      // known city, known UA, known service → silent
      ("alice", "SaoPaulo", spCoords, "Firefox", "ssh"),
      // new city but within 400 km of a known one → city tolerated
      ("alice", "Campinas", campinasCoords, "Firefox", "ssh"),
      // far city + new UA → both flags
      ("alice", "Berlin", berlinCoords, "Chrome", "ssh"),
      // cold-start user: everything new but size < 10 → silent
      ("bob", "Berlin", berlinCoords, "Chrome", "vpn"),
    ).toDF("user_name", "city", "coords", "user_agent", "service")
    val out = AuthProfiling.atypicalAccess(auth, profiles, cityCoords)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(5), r.getInt(6), r.getInt(7)))
    assert(out.length == 1)
    val (user, city, c, u, s) = out.head
    assert(user == "alice" && city == "Berlin")
    assert(c == 1 && u == 1 && s == 0)
  }

  test("impossibleTravel: flags superhuman hops, skips slow/degenerate ones") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val nyc = "40.71,-74.00"
    val boston = "42.36,-71.06"
    val berlin = "52.52,13.40"
    val auth = Seq(
      // NYC → Boston in 6h (~55 km/h) → fine
      ("alice", ts(0), "NYC", nyc), ("alice", ts(360), "Boston", boston),
      // Boston → Berlin in 1h (~6000 km/h) → alert
      ("alice", ts(420), "Berlin", berlin),
      // bob: malformed coords then zero gap — neither may alert
      ("bob", ts(0), "Nowhere", "bad"), ("bob", ts(0), "Berlin", berlin),
    ).toDF("user_name", "ts", "city", "coords")
    val out = AuthProfiling.impossibleTravel(auth).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(("alice", "Boston", "Berlin")))
  }
}
