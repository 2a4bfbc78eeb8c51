package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class VariantIngestSpec extends SparkSpec {

  private lazy val landingDir = {
    val dir = Files.createTempDirectory("variant_landing")
    Files.writeString(dir.resolve("part0.json"),
      """{"mdr_report_key":"1","report_number":"RN-1","date_received":"20240101","event_type":"IN","device":[{"brand_name":"PUMP-X"}]}
        |{"mdr_report_key":"2","report_number":"RN-2"}
        |not json at all
        |
        |{"mdr_report_key":"3","date_received":20240202,"device":[]}
        |""".stripMargin)
    dir.toString
  }

  test("bad lines dropped, good lines land as variant with provenance") {
    val landed = VariantIngest.batch(spark, landingDir)
    assert(landed.count() === 3)
    assert(landed.filter(col("src_filename").contains("part0.json")).count() === 3)
  }

  test("missing path yields NULL, never an error (VARIANT semantics)") {
    val h = VariantIngest.header(VariantIngest.batch(spark, landingDir))
      .orderBy("mdr_report_key").collect()
    assert(h(0).getAs[String]("first_brand_name") === "PUMP-X")
    assert(h(1).getAs[String]("date_received_raw") === null)  // absent field
    assert(h(1).getAs[String]("first_brand_name") === null)   // absent array
    assert(h(2).getAs[String]("first_brand_name") === null)   // empty array
  }

  test("variant numeric leaf casts to string late-bound (the ::string analog)") {
    val h = VariantIngest.header(VariantIngest.batch(spark, landingDir))
      .filter(col("mdr_report_key") === "3").collect().head
    assert(h.getAs[String]("date_received_raw") === "20240202")
  }
}
