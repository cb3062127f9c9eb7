package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UaParser

/** Rule-order edge cases for the UA parser beyond the p9 oracle fixture:
  * vendor skins on mobile, tablet-vs-mobile Android, legacy IE forms,
  * and graceful Other/desktop fallbacks.
  */
class UaParserSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def parse(ua: String): (String, String, String, String, String) = {
    import spark.implicits._
    Seq(ua).toDF("ua").select(
      UaParser.browserFamily(col("ua")), UaParser.browserMajor(col("ua")),
      UaParser.osFamily(col("ua")), UaParser.deviceClass(col("ua")),
      UaParser.windowsVersion(col("ua")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).head
  }

  test("Edge on Android uses the EdgA token, not the decoy Chrome") {
    val ua = "Mozilla/5.0 (Linux; Android 10; HD1913) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36 EdgA/120.0.2210.126"
    assert(parse(ua) == ("Edge", "120", "Android", "mobile", ""))
  }

  test("Android without the Mobile token classifies as tablet") {
    val ua = "Mozilla/5.0 (Linux; Android 13; SM-X710) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/119.0.6045.163 Safari/537.36"
    assert(parse(ua) == ("Chrome", "119", "Android", "tablet", ""))
  }

  test("legacy MSIE form and NT version mapping") {
    val ua = "Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 5.1; Trident/4.0)"
    val p = parse(ua)
    assert((p._1, p._2, p._3, p._5) == ("IE", "8", "Windows", "XP"))
  }

  test("Firefox iOS claims FxiOS before the base Firefox rule") {
    val ua = "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) " +
      "AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/120.0 Mobile/15E148 Safari/605.1.15"
    assert(parse(ua) == ("Firefox iOS", "120", "iOS", "mobile", ""))
  }

  test("unknown strings fall back to Other/desktop, never throw") {
    assert(parse("curl/8.4.0") == ("Other", "", "Other", "desktop", ""))
    assert(parse("") == ("Other", "", "Other", "desktop", ""))
  }

  test("generic crawler token classifies as bot") {
    val ua = "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)"
    val p = parse(ua)
    assert(p._1 == "Other Bot" && p._4 == "bot")
  }
}
