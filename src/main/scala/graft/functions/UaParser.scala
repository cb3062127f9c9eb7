package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent family extraction as ordered first-match-wins regex rules —
  * the uap-core semantics the reference gets from the uap library
  * (HogAuth.scala:293-298), re-expressed as pure column expressions so the
  * whole parse stays inside whole-stage codegen (no UDF, no external
  * model). Rule ORDER is the correctness: real-world UA strings embed
  * decoy tokens (every Edge/Opera/Samsung UA also says "Chrome"; every
  * Chrome UA also says "Safari"; every iPhone UA says "like Mac OS X"),
  * so each family must be claimed by the most specific token first.
  */
object UaParser {

  /** Browser family. Order: bots, then Chromium-skinned vendors (Edge,
    * Opera, Samsung), IE (Trident/MSIE — no Chrome token but also no
    * Firefox/Safari marker), the iOS ports (CriOS/FxiOS), then the base
    * engines; Safari requires its `Version/` marker because every WebKit
    * UA carries a trailing `Safari/` token.
    */
  def browserFamily(ua: Column): Column =
    when(ua.rlike("Googlebot/"), "Googlebot")
      .when(ua.rlike("(?i)(?:bot|crawler|spider)[/ ;)]"), "Other Bot")
      .when(ua.rlike("Edg[A-Za-z]*/"), "Edge")
      .when(ua.rlike("OPR/|Opera[ /]"), "Opera")
      .when(ua.rlike("SamsungBrowser/"), "Samsung Internet")
      .when(ua.rlike("MSIE |Trident/"), "IE")
      .when(ua.rlike("CriOS/"), "Chrome Mobile iOS")
      .when(ua.rlike("FxiOS/"), "Firefox iOS")
      .when(ua.rlike("Firefox/"), "Firefox")
      .when(ua.rlike("Chrome/"), "Chrome")
      .when(ua.rlike("Version/[0-9.]+.*Safari/"), "Safari")
      .otherwise("Other")

  /** Major version of the winning family (same rule order; the version
    * token is the family's own, never the decoy Chrome/Safari ones).
    * IE surfaces `rv:11.0` (Trident) or `MSIE 9.0`.
    */
  def browserMajor(ua: Column): Column = {
    def v(re: String) = regexp_extract(ua, re, 1)
    when(ua.rlike("Googlebot/"), v("Googlebot/(\\d+)"))
      .when(ua.rlike("(?i)(?:bot|crawler|spider)[/ ;)]"), lit(""))
      .when(ua.rlike("Edg[A-Za-z]*/"), v("Edg[A-Za-z]*/(\\d+)"))
      .when(ua.rlike("OPR/"), v("OPR/(\\d+)"))
      .when(ua.rlike("Opera[ /]"), v("Opera[ /](\\d+)"))
      .when(ua.rlike("SamsungBrowser/"), v("SamsungBrowser/(\\d+)"))
      .when(ua.rlike("MSIE "), v("MSIE (\\d+)"))
      .when(ua.rlike("Trident/"), v("rv:(\\d+)"))
      .when(ua.rlike("CriOS/"), v("CriOS/(\\d+)"))
      .when(ua.rlike("FxiOS/"), v("FxiOS/(\\d+)"))
      .when(ua.rlike("Firefox/"), v("Firefox/(\\d+)"))
      .when(ua.rlike("Chrome/"), v("Chrome/(\\d+)"))
      .when(ua.rlike("Version/[0-9.]+.*Safari/"), v("Version/(\\d+)"))
      .otherwise(lit(""))
  }

  /** OS family. iOS before macOS ("like Mac OS X" decoy), Android before
    * Linux (Android UAs carry "Linux"), ChromeOS before Linux too.
    */
  def osFamily(ua: Column): Column =
    when(ua.rlike("Windows NT"), "Windows")
      .when(ua.rlike("iPhone|iPad|iPod"), "iOS")
      .when(ua.rlike("Mac OS X"), "macOS")
      .when(ua.rlike("CrOS"), "ChromeOS")
      .when(ua.rlike("Android"), "Android")
      .when(ua.rlike("X11|Linux"), "Linux")
      .otherwise("Other")

  /** Windows marketing version from the NT kernel version (public
    * mapping), e.g. "Windows NT 6.1" → "7". Empty for non-Windows.
    */
  def windowsVersion(ua: Column): Column = {
    val nt = regexp_extract(ua, "Windows NT (\\d+\\.\\d+)", 1)
    when(nt === "10.0", "10").when(nt === "6.3", "8.1").when(nt === "6.2", "8")
      .when(nt === "6.1", "7").when(nt === "6.0", "Vista").when(nt === "5.1", "XP")
      .otherwise(when(nt =!= "", nt).otherwise(lit("")))
  }

  /** Device class: bot / tablet / mobile / desktop. Android tablets are
    * the Androids WITHOUT the "Mobile" token (the public convention).
    */
  def deviceClass(ua: Column): Column =
    when(ua.rlike("(?i)googlebot|bot|crawler|spider"), "bot")
      .when(ua.rlike("iPad") || (ua.rlike("Android") && !ua.rlike("Mobile")), "tablet")
      .when(ua.rlike("Mobi|iPhone|iPod|Android"), "mobile")
      .otherwise("desktop")
}
