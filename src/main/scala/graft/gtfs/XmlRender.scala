package graft.gtfs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RSS/XML rendering of alert rows (realtime.py:560-621 +
  * dict2xml.py), as column expressions: each alert becomes an RSS
  * <item>, the channel document is a final single-row aggregation.
  */
object XmlRender {

  /** Minimal XML text escaping. */
  def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** One RSS item per alert row (title/link/guid/description). */
  def rssItem(title: Column, link: Column, guid: Column, description: Column): Column =
    concat(
      lit("<item><title>"), xmlEscape(coalesce(title, lit(""))),
      lit("</title><link>"), xmlEscape(coalesce(link, lit(""))),
      lit("</link><guid>"), xmlEscape(coalesce(guid, lit(""))),
      lit("</guid><description><![CDATA["), coalesce(description, lit("")),
      lit("]]></description></item>"))

  /** Assemble the channel document from alert rows.
    * @param alerts needs columns header_text, url, service_alert_id,
    *               description_text (the reference's RSS source shape)
    */
  def rssChannel(alerts: DataFrame, title: String, description: String, language: String): DataFrame =
    alerts
      .select(rssItem(col("header_text"), col("url"), col("service_alert_id"),
        col("description_text")).as("item"),
        col("service_alert_id"))
      .orderBy(col("service_alert_id"))
      .agg(concat_ws("", collect_list(col("item"))).as("items"))
      .select(concat(
        lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
          "<rss version=\"2.0\" xmlns:atom=\"http://www.w3.org/2005/Atom\" " +
          "xmlns:media=\"http://search.yahoo.com/mrss/\"><channel>" +
          s"<title>${title}</title><description>${description}</description>" +
          s"<language>${language}</language>"),
        col("items"),
        lit("</channel></rss>")).as("rss_xml"))
}
