package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Single source of truth for the reference's energy-timeseries schema.
  *
  * The 51 measure columns mirror the aggregation list at
  * `/root/reference/etl/oedi_etl/transform.py:64-114` — generated from the
  * (fuel → end-uses) structure instead of hand-typed, per SURVEY §7.4(5).
  * Asymmetry preserved: `out.other_fuel.water_systems` has energy_consumption
  * but no `_intensity` (transform.py:110-111).
  *
  * Column names contain dots, so every Column reference must be
  * backtick-quoted — use [[qcol]], never bare `col()`, for these.
  */
object SchemaDefs {

  /** Quote a literal column name that may contain dots. */
  def qcol(name: String): Column = col(s"`$name`")

  private val fuelEndUses: Seq[(String, Seq[String])] = Seq(
    "district_cooling" -> Seq("cooling", "total"),
    "district_heating" -> Seq("heating", "total", "water_systems"),
    "electricity" -> Seq(
      "cooling", "exterior_lighting", "fans", "heat_recovery",
      "heat_rejection", "heating", "interior_equipment", "interior_lighting",
      "pumps", "refrigeration", "total", "water_systems"),
    "natural_gas" -> Seq("heating", "interior_equipment", "total", "water_systems"),
    "other_fuel" -> Seq("cooling", "heating", "total", "water_systems"),
    "site_energy" -> Seq("total"))

  /** The 51 `out.<fuel>.<end_use>.energy_consumption[_intensity]` doubles,
    * in the reference's declared aggregation order. */
  val energyColumns: Seq[String] = fuelEndUses.flatMap { case (fuel, uses) =>
    uses.flatMap { u =>
      val base = s"out.$fuel.$u.energy_consumption"
      if (fuel == "other_fuel" && u == "water_systems") Seq(base)
      else Seq(base, base + "_intensity")
    }
  }

  /** 15-minute per-building timeseries input (FIXTURES §A.1). */
  val timeseriesSchema: StructType = StructType(
    StructField("timestamp", TimestampType, nullable = false) ::
      StructField("bldg_id", LongType, nullable = false) ::
      energyColumns.map(c => StructField(c, DoubleType, nullable = true)).toList)

  /** Expected hourly output columns (`_min`/`_mean` contract, FIXTURES §A.2;
    * join key `bldg_id_min` proven by
    * `/root/reference/sql/saved-queries.sql:14`). */
  val hourlyOutputColumns: Seq[String] =
    Seq("timestamp", "bldg_id_min", "timestamp_min") ++
      energyColumns.map(_ + "_mean")

  /** Metadata dimension columns used by the saved queries (FIXTURES §A.3). */
  val metadataQueryColumns: Seq[String] = Seq(
    "bldg_id", "in.state", "in.county_name",
    "in.comstock_building_type", "in.comstock_building_type_group")
}
