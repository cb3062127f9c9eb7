package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Network/geo scalar functions from the reference, as pure column
  * expressions (no UDFs — everything stays inside codegen).
  */
object NetFunctions {

  /** Haversine distance in km between two "lat,lon" strings
    * (reference: HogGeograph.scala:35-58, radius 6372.8 km). Malformed
    * coordinates → the reference's 9.99e8 error sentinel.
    */
  def haversineCoords(c1: Column, c2: Column): Column = {
    val coordRe = "^-?[0-9.]+,-?[0-9.]+$"
    def lat(c: Column) = split(c, ",").getItem(0).cast("double")
    def lon(c: Column) = split(c, ",").getItem(1).cast("double")
    when(c1.rlike(coordRe) && c2.rlike(coordRe),
      haversine(lat(c1), lon(c1), lat(c2), lon(c2)))
      .otherwise(lit(9.99e8))
  }

  /** Haversine on numeric degrees. */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      pow(sin(dLon / 2), 2) * cos(radians(lat1)) * cos(radians(lat2))
    lit(2 * 6372.8) * asin(sqrt(a))
  }

  /** Pretty-print a byte count (reference humanBytes, HogSFlow.scala:744-752).
    * Thresholds are explicit powers of 1024 (not log-ratio) so the unit
    * boundary is exact and engine-independent.
    */
  def humanBytes(b: Column): Column = {
    val KB = 1024.0; val MB = KB * 1024; val GB = MB * 1024
    when(b < KB, concat(b.cast("long").cast("string"), lit("B")))
      .when(b < MB, format_string("%.1fKB", b / KB))
      .when(b < GB, format_string("%.1fMB", b / MB))
      .otherwise(format_string("%.1fGB", b / GB))
  }

  /** IPv4-or-sentinel normalization (reference HogEvent.scala:44-58):
    * IPv6 → 255.255.6.6, anything not dotted-quad → 255.255.1.1.
    */
  def ipOrSentinel(ip: Column): Column =
    when(ip.contains(":"), lit("255.255.6.6"))
      .when(ip.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), ip)
      .otherwise(lit("255.255.1.1"))

  /** Drop the last octet → /24 network (reference ipSignificantNetwork,
    * HogSFlow.scala:733-742).
    */
  def significantNetwork(ip: Column): Column = substring_index(ip, ".", 3)

  /** Longest-prefix match against a prefix dictionary (the reference's
    * TreeSet blacklist matcher, HogSFlow.scala:2770-2781) as a SCALABLE
    * join: explode each key into its prefixes at the dictionary's distinct
    * lengths, equi-join, keep the longest hit per key. The dictionary side
    * is broadcast; the fact side never shuffles.
    *
    * `keys` must have a string column `keyCol`; `dict` one string column
    * `prefix`. Returns keys + (best_prefix | null).
    */
  def longestPrefixJoin(keys: DataFrame, keyCol: String, dict: DataFrame): DataFrame = {
    val lens = dict.select(length(col("prefix")).as("l")).distinct()
    val cands = keys.crossJoin(broadcast(lens))
      .withColumn("cand", col(keyCol).substr(lit(1), col("l")))
    val hits = cands.join(broadcast(dict), col("cand") === col("prefix"))
      .groupBy(keys.columns.map(col): _*)
      .agg(max_by(col("prefix"), length(col("prefix"))).as("best_prefix"))
    keys.join(hits, keys.columns.toSeq, "left")
  }
}
