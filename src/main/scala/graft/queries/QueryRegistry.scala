package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Saved-query provisioning (S7): the engine-side analog of the reference's
  * Athena named queries (`/root/reference/sql/saved-queries.sql`, provisioned
  * by `lib/nbi-open-data-analytics-stack.ts:450-506`).
  *
  * Labels are snake_cased the same way the CDK does (stack.ts:472-477);
  * `${...}` placeholders are rendered against caller-supplied table names
  * (our temp views replace the Glue catalog tables). Dialect note: Athena
  * quotes the dotted metadata columns `"in.state"`; Spark SQL uses
  * backticks — the semantic content of the three queries is otherwise
  * unchanged (join on `bldg_id_min` proves the `_min` rename contract).
  */
object QueryRegistry {

  final case class NamedQuery(label: String, description: String, sql: String) {
    /** `stack.ts:472-477`: lower-case, non-alphanumerics → underscores. */
    def snakeName: String = label.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")
  }

  /** The reference's three saved queries, templated on
    * `${metadata_table}` / `${data_table}`. */
  val savedQueries: Seq[NamedQuery] = Seq(
    NamedQuery(
      "Total Number of Individual Building Models",
      "Total unique hospital building models in Ketchikan Gateway Borough, AK.",
      """SELECT COUNT(DISTINCT m.bldg_id) AS total_buildings
        |FROM ${metadata_table} AS m
        |  JOIN ${data_table} AS d ON m.bldg_id = d.bldg_id_min
        |WHERE m.`in.state` = 'AK'
        |  AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
        |  AND m.`in.comstock_building_type` = 'Hospital'""".stripMargin),
    NamedQuery(
      "Number of Buildings by Building Type Group",
      "Unique building count per type group in Ketchikan Gateway Borough, AK.",
      """SELECT m.`in.comstock_building_type_group`,
        |  COUNT(DISTINCT m.bldg_id) AS num_buildings
        |FROM ${metadata_table} AS m
        |  JOIN ${data_table} AS d ON m.bldg_id = d.bldg_id_min
        |WHERE m.`in.state` = 'AK'
        |  AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
        |GROUP BY m.`in.comstock_building_type_group`""".stripMargin),
    NamedQuery(
      "Isolated Individual Building Models",
      "Up to 500 Healthcare building models in Ketchikan Gateway Borough, AK.",
      """WITH filtered_buildings AS (
        |  SELECT DISTINCT m.bldg_id,
        |    m.`in.comstock_building_type_group`,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY m.`in.comstock_building_type_group`
        |      ORDER BY m.bldg_id
        |    ) AS rn
        |  FROM ${metadata_table} AS m
        |    JOIN ${data_table} AS d ON m.bldg_id = d.bldg_id_min
        |  WHERE m.`in.state` = 'AK'
        |    AND m.`in.county_name` = 'AK, Ketchikan Gateway Borough'
        |)
        |SELECT DISTINCT bldg_id,
        |  `in.comstock_building_type_group`
        |FROM filtered_buildings
        |WHERE `in.comstock_building_type_group` = 'Healthcare'
        |  AND rn <= 500""".stripMargin))

  /** `${key}` → value substitution (stack.ts:478-490 analog). */
  def render(sql: String, bindings: Map[String, String]): String =
    bindings.foldLeft(sql) { case (s, (k, v)) =>
      s.replace("$" + s"{$k}", v)
    }

  /** Render + execute one saved query by snake name. */
  def run(spark: SparkSession, snakeName: String,
      bindings: Map[String, String]): DataFrame = {
    val q = savedQueries.find(_.snakeName == snakeName)
      .getOrElse(throw new NoSuchElementException(
        s"no saved query '$snakeName'; have ${savedQueries.map(_.snakeName)}"))
    spark.sql(render(q.sql, bindings))
  }
}
