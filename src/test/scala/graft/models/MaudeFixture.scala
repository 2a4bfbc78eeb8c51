package graft.models

import java.nio.file.{Files, Path}

/**
 * Deterministic MAUDE NDJSON + seed fixture covering FIXTURES.md §1's edge
 * cases: missing arrays (OUTER flatten row preservation), blank-vs-NULL
 * fields, event_type variants, blank narrative fragments, malformed and
 * calendar-invalid dates, case-insensitive manufacturer matching, MAX-order
 * device rollup, and failure-mode keywords.
 */
object MaudeFixture {

  val ndjson: Seq[String] = Seq(
    // R1: full record; blank middle fragment must be skipped by listagg
    """{"mdr_report_key":"1001","report_number":"RN-1","date_received":"20200115","event_date":"20200110","event_type":"INJURY","product_problem":"Leakage","device_report_product_code":"ABC","manufacturer_d_name":"ACME CORP","device":[{"brand_name":"PumpOne"}],"mdr_text":[{"text":"part A"},{"text":"  "},{"text":"part C"}]}""",
    // R2: lowercase event_type; empty-string top-level fields win coalesce; no arrays at all
    """{"mdr_report_key":"1002","report_number":"RN-2","date_received":"20200215","event_type":"malfunction","device_name":"","brand_name":"","manufacturer_d_name":"acme corp"}""",
    // R3: NA event_type; malformed date; blank-vs-value device entries; LEAK narrative
    """{"mdr_report_key":"1003","report_number":"RN-3","date_received":"2020xx01","event_type":"N/A","device":[{"manufacturer_d_name":"  ","brand_name":"BrandX"},{"manufacturer_d_name":"MedTech GmbH"}],"mdr_text":[{"text":"Leak detected near valve"}]}""",
    // R4: mixed-case Death; two non-blank manufacturers -> MAX order wins; FRACTURE before BREAK
    """{"mdr_report_key":"1004","report_number":"RN-4","date_received":"20200403","event_type":"Death","device":[{"manufacturer_d_name":"ACME Corp"},{"manufacturer_d_name":"Zeta Devices"}],"mdr_text":[{"text":"Pump fracture and break observed"}]}""",
    // R5: unmapped manufacturer; calendar-invalid date (Feb 30); THROMB keyword
    """{"mdr_report_key":"1005","report_number":"RN-5","date_received":"20200230","event_type":"Recall","manufacturer_d_name":"NoSuch Inc","mdr_text":[{"text":"thrombus noted"}]}""",
    // R6: null event_type; no date; empty mdr_text array
    """{"mdr_report_key":"1006","report_number":"RN-6","event_type":null,"mdr_text":[]}""")

  val seedCsv: String =
    """RAW_NAME,CANONICAL_NAME,MANUFACTURER_ID
      |ACME CORP,Acme Corporation,1
      |MEDTECH GMBH,MedTech GmbH,2
      |ZETA DEVICES,Zeta Devices,3
      |"SMITH, JONES & CO",Smith Jones,4
      |""".stripMargin

  /** Writes the fixture; returns (landingDir, seedCsvPath). */
  def write(base: Path): (String, String) = {
    val landing = Files.createDirectories(base.resolve("landing"))
    Files.writeString(landing.resolve("maude_part0.json"), ndjson.mkString("\n"))
    val seed = base.resolve("manufacturer.csv")
    Files.writeString(seed, seedCsv)
    (landing.toString, seed.toString)
  }
}
