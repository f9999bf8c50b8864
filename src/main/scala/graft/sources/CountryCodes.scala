package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ISO 3166-1 country-code normalization (reference main.py:208 uses
  * dataprep's clean_country to turn alpha-3 codes into alpha-2 before
  * merging population onto geometries). Implemented as a broadcast
  * literal map -> a codegen'd expression, no external dependency.
  *
  * The table covers ISO 3166-1 (public standard). Unknown codes map
  * to null (mirroring clean_country's behavior of dropping
  * unmatchable rows).
  */
object CountryCodes {

  /** alpha-3 -> alpha-2 (ISO 3166-1, public standard list). */
  val Alpha3To2: Map[String, String] = Map(
    "AFG" -> "AF", "ALB" -> "AL", "DZA" -> "DZ", "AND" -> "AD", "AGO" -> "AO",
    "ARG" -> "AR", "ARM" -> "AM", "AUS" -> "AU", "AUT" -> "AT", "AZE" -> "AZ",
    "BGD" -> "BD", "BLR" -> "BY", "BEL" -> "BE", "BEN" -> "BJ", "BOL" -> "BO",
    "BIH" -> "BA", "BWA" -> "BW", "BRA" -> "BR", "BGR" -> "BG", "BFA" -> "BF",
    "BDI" -> "BI", "KHM" -> "KH", "CMR" -> "CM", "CAN" -> "CA", "CAF" -> "CF",
    "TCD" -> "TD", "CHL" -> "CL", "CHN" -> "CN", "COL" -> "CO", "COG" -> "CG",
    "COD" -> "CD", "CRI" -> "CR", "CIV" -> "CI", "HRV" -> "HR", "CUB" -> "CU",
    "CYP" -> "CY", "CZE" -> "CZ", "DNK" -> "DK", "DJI" -> "DJ", "DOM" -> "DO",
    "ECU" -> "EC", "EGY" -> "EG", "SLV" -> "SV", "ERI" -> "ER", "EST" -> "EE",
    "SWZ" -> "SZ", "ETH" -> "ET", "FRO" -> "FO", "FJI" -> "FJ", "FIN" -> "FI",
    "FRA" -> "FR", "GAB" -> "GA", "GMB" -> "GM", "GEO" -> "GE", "DEU" -> "DE",
    "GHA" -> "GH", "GRC" -> "GR", "GTM" -> "GT", "GIN" -> "GN", "GNB" -> "GW",
    "GUY" -> "GY", "HTI" -> "HT", "HND" -> "HN", "HUN" -> "HU", "ISL" -> "IS",
    "IND" -> "IN", "IDN" -> "ID", "IRN" -> "IR", "IRQ" -> "IQ", "IRL" -> "IE",
    "IMN" -> "IM", "ISR" -> "IL", "ITA" -> "IT", "JAM" -> "JM", "JPN" -> "JP",
    "JOR" -> "JO", "KAZ" -> "KZ", "KEN" -> "KE", "PRK" -> "KP", "KOR" -> "KR",
    "KWT" -> "KW", "KGZ" -> "KG", "LAO" -> "LA", "LVA" -> "LV", "LBN" -> "LB",
    "LSO" -> "LS", "LBR" -> "LR", "LBY" -> "LY", "LIE" -> "LI", "LTU" -> "LT",
    "LUX" -> "LU", "MDG" -> "MG", "MWI" -> "MW", "MYS" -> "MY", "MDV" -> "MV",
    "MLI" -> "ML", "MLT" -> "MT", "MRT" -> "MR", "MUS" -> "MU", "MEX" -> "MX",
    "MDA" -> "MD", "MCO" -> "MC", "MNG" -> "MN", "MNE" -> "ME", "MAR" -> "MA",
    "MOZ" -> "MZ", "MMR" -> "MM", "NAM" -> "NA", "NPL" -> "NP", "NLD" -> "NL",
    "NZL" -> "NZ", "NIC" -> "NI", "NER" -> "NE", "NGA" -> "NG", "MKD" -> "MK",
    "NOR" -> "NO", "OMN" -> "OM", "PAK" -> "PK", "PAN" -> "PA", "PNG" -> "PG",
    "PRY" -> "PY", "PER" -> "PE", "PHL" -> "PH", "POL" -> "PL", "PRT" -> "PT",
    "QAT" -> "QA", "ROU" -> "RO", "RUS" -> "RU", "RWA" -> "RW", "SMR" -> "SM",
    "SAU" -> "SA", "SEN" -> "SN", "SRB" -> "RS", "SLE" -> "SL", "SGP" -> "SG",
    "SVK" -> "SK", "SVN" -> "SI", "SOM" -> "SO", "ZAF" -> "ZA", "SSD" -> "SS",
    "ESP" -> "ES", "LKA" -> "LK", "SDN" -> "SD", "SUR" -> "SR", "SWE" -> "SE",
    "CHE" -> "CH", "SYR" -> "SY", "TWN" -> "TW", "TJK" -> "TJ", "TZA" -> "TZ",
    "THA" -> "TH", "TLS" -> "TL", "TGO" -> "TG", "TTO" -> "TT", "TUN" -> "TN",
    "TUR" -> "TR", "TKM" -> "TM", "UGA" -> "UG", "UKR" -> "UA", "ARE" -> "AE",
    "GBR" -> "GB", "USA" -> "US", "URY" -> "UY", "UZB" -> "UZ", "VEN" -> "VE",
    "VNM" -> "VN", "YEM" -> "YE", "ZMB" -> "ZM", "ZWE" -> "ZW")

  private lazy val alpha2To3: Map[String, String] = Alpha3To2.map(_.swap)

  /** Column expression: normalize alpha-3 codes to alpha-2 (null when
    * unknown). Implemented as a literal map lookup — constant-folded,
    * broadcast-free, codegen'd. */
  def alpha3To2(c: Column): Column = lookup(Alpha3To2, c)

  /** Column expression: alpha-2 -> alpha-3. */
  def alpha2To3Col(c: Column): Column = lookup(alpha2To3, c)

  private def lookup(table: Map[String, String], c: Column): Column = {
    val m = map(table.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    element_at(m, upper(trim(c)))
  }
}
